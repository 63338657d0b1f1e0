package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the orphan-scratch-dir sweep's ownership proof
  * ([[SparkEntry.orphanedScratch]]): the r14 advice's hazard was a
  * recycled pid being mistaken for a live owner (sweep skips forever)
  * or, worse, an unrelated live process's dir being swept. The truth
  * table below IS the safety argument — delete only on pid-dead or a
  * start-instant CONTRADICTION; every ambiguous state skips.
  */
class ScratchSweepSpec extends AnyFunSuite {

  test("sweep verdict truth table") {
    // pid dead → orphan, regardless of tokens
    assert(SparkEntry.orphanedScratch("", None))
    assert(SparkEntry.orphanedScratch("1a2b", None))
    // pid alive, tokens agree → the live OWNER: never sweep
    assert(!SparkEntry.orphanedScratch("1a2b", Some("1a2b")))
    // pid alive, tokens contradict → recycled pid, owner is gone
    assert(SparkEntry.orphanedScratch("1a2b", Some("ffff")))
    // ambiguity always skips: legacy tokenless dir with a live pid,
    // or a live pid whose start instant is unobservable
    assert(!SparkEntry.orphanedScratch("", Some("ffff")))
    assert(!SparkEntry.orphanedScratch("1a2b", Some("")))
    assert(!SparkEntry.orphanedScratch("", Some("")))
  }

  test("this JVM's own scratch dirs are never orphans to a sweeper") {
    // a second graft JVM observing THIS one must reach skip: same pid
    // alive, same start instant token on both sides
    val self = ProcessHandle.current
    val tok = self.info.startInstant
      .map[String](i => java.lang.Long.toHexString(i.toEpochMilli))
      .orElse("")
    assert(!SparkEntry.orphanedScratch(tok, Some(tok)))
  }
}
