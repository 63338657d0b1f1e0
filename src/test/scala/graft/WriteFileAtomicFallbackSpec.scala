package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EpochedTable

/** Executes [[EpochedTable.writeFileAtomic]]'s delete+retry FALLBACK —
  * the branch that only runs on filesystems whose rename refuses an
  * existing destination, which the test filesystem's rename never does,
  * so until this spec the fallback's recovery semantics (and the
  * documented two-writer hazard, `EpochedTable.scala`'s single-writer
  * contract) were argued in scaladoc but never executed. A wrapper over
  * `RawLocalFileSystem` models the refusing class (HDFS-like
  * no-overwrite rename) deterministically, with a pre-rename hook to
  * inject an adversary at the exact instant the contract names.
  */
class WriteFileAtomicFallbackSpec extends AnyFunSuite {

  /** rename(src, dst) REFUSES when dst exists — the filesystem class
    * the fallback exists for. `beforeRename` runs first, so a test can
    * act inside the window between the fallback's delete and its retry
    * (the two-writer hazard's window). `refusals` counts refused
    * renames, proving the fallback branch actually ran. */
  private final class RefusingFs
    extends org.apache.hadoop.fs.RawLocalFileSystem {
    @volatile var beforeRename: Path => Unit = _ => ()
    val refusals = new java.util.concurrent.atomic.AtomicInteger
    override def rename(src: Path, dst: Path): Boolean = {
      beforeRename(dst)
      if (exists(dst)) { refusals.incrementAndGet(); false }
      else super.rename(src, dst)
    }
  }

  private def fsAndDir(): (RefusingFs, java.io.File, Path) = {
    val fs = new RefusingFs
    fs.initialize(java.net.URI.create("file:///"),
      new org.apache.hadoop.conf.Configuration())
    val dir = java.nio.file.Files
      .createTempDirectory("graft-wfa").toFile
    (fs, dir, new Path(dir.getAbsolutePath, "manifest"))
  }

  private def utf8(s: String) =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def contentOf(dest: Path): String = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dest.toUri.getPath)),
    java.nio.charset.StandardCharsets.UTF_8)

  test("single writer: the delete+retry fallback overwrites old with new, complete") {
    val (fs, dir, dest) = fsAndDir()
    try {
      EpochedTable.writeFileAtomic(fs, dest, utf8("old"))
      assert(fs.refusals.get == 0, "first write must commit directly")
      assert(contentOf(dest) == "old")
      // the overwrite: rename refused (dest exists) → delete → retry
      EpochedTable.writeFileAtomic(fs, dest, utf8("new"))
      assert(fs.refusals.get == 1, "overwrite must exercise the fallback")
      assert(contentOf(dest) == "new")
      // no stray tmp siblings survive a successful commit
      val leftovers = dir.listFiles().map(_.getName).filterNot(_ == "manifest")
      assert(leftovers.isEmpty, s"debris after commit: ${leftovers.toSeq}")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("a concurrent reader sees old, new, or nothing — NEVER a torn file") {
    // the contract's exact wording: on a refusing filesystem a reader
    // may briefly see NO file (between the fallback's delete and its
    // retry), but never a truncated one. Distinct-length payloads make
    // any torn read unmistakable — a prefix of one version matches no
    // complete version.
    val (fs, dir, dest) = fsAndDir()
    try {
      def payload(i: Int) = s"v$i-" + ("x" * (100 + i))
      EpochedTable.writeFileAtomic(fs, dest, utf8(payload(0)))
      val complete = (0 to 60).map(payload).toSet
      @volatile var done = false
      val torn = new java.util.concurrent.atomic.AtomicReference[String]
      var sawSome = 0
      var sawNone = 0
      val reader = new Thread(() => {
        val p = java.nio.file.Paths.get(dest.toUri.getPath)
        while (!done && torn.get == null) {
          try {
            val got = new String(java.nio.file.Files.readAllBytes(p),
              java.nio.charset.StandardCharsets.UTF_8)
            if (!complete(got)) torn.set(got) else sawSome += 1
          } catch {
            // "briefly none" — the documented refusing-FS window
            case _: java.nio.file.NoSuchFileException => sawNone += 1
            case _: java.io.FileNotFoundException => sawNone += 1
          }
        }
      }, "wfa-reader")
      reader.start()
      try for (i <- 1 to 60)
        EpochedTable.writeFileAtomic(fs, dest, utf8(payload(i)))
      finally { done = true; reader.join(30000) }
      assert(torn.get == null, s"reader saw a torn file: '${torn.get}'")
      assert(sawSome > 0, "reader never completed a read")
      assert(fs.refusals.get >= 60, "every overwrite must take the fallback")
      assert(contentOf(dest) == payload(60))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("out-of-contract writer swarm: every observable outcome is loud or complete — never torn") {
    // the deterministic hook test above pins ONE interleaving; this
    // drives the documented out-of-contract regime (multiple writers,
    // which every production caller structurally avoids) through
    // whatever interleavings the scheduler produces and asserts the
    // failure-mode CEILING the scaladoc promises: a writer either
    // commits, loses to an identical-guarantee peer, or dies on the
    // require — and a concurrent reader NEVER sees a torn file, only
    // complete payloads or (in the fallback window) nothing.
    val (fs, dir, dest) = fsAndDir()
    try {
      def payload(w: Int, i: Int) = s"w$w-i$i-" + ("z" * (50 + 10 * w + i))
      EpochedTable.writeFileAtomic(fs, dest, utf8("seed"))
      val complete = (for (w <- 0 until 4; i <- 0 until 12)
        yield payload(w, i)).toSet + "seed"
      @volatile var done = false
      val torn = new java.util.concurrent.atomic.AtomicReference[String]
      val loud = new java.util.concurrent.atomic.AtomicInteger
      val reader = new Thread(() => {
        val p = java.nio.file.Paths.get(dest.toUri.getPath)
        while (!done && torn.get == null) {
          try {
            val got = new String(java.nio.file.Files.readAllBytes(p),
              java.nio.charset.StandardCharsets.UTF_8)
            if (!complete(got)) torn.set(got)
          } catch {
            case _: java.nio.file.NoSuchFileException => ()
            case _: java.io.FileNotFoundException => ()
          }
        }
      }, "wfa-swarm-reader")
      // any OTHER exception type is an undocumented failure mode, not
      // a loud loss — collected and asserted empty below, so a future
      // refactor changing the require (or an IOException under
      // contention) cannot silently kill a writer thread and leave the
      // ceiling assertion vacuously reduced to "the file was not torn"
      val unexpected = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val writers = (0 until 4).map { w =>
        new Thread(() => {
          for (i <- 0 until 12)
            try EpochedTable.writeFileAtomic(fs, dest, utf8(payload(w, i)))
            catch {
              case _: IllegalArgumentException => loud.incrementAndGet()
              case e: Throwable =>
                unexpected.add(s"w$w i$i: ${e.getClass.getName}: ${e.getMessage}")
            }
        }, s"wfa-swarm-$w")
      }
      reader.start(); writers.foreach(_.start())
      writers.foreach(_.join(60000))
      assert(writers.forall(!_.isAlive), "a writer hung past the join timeout")
      done = true; reader.join(30000)
      assert(unexpected.isEmpty,
        s"writers died on undocumented exception types: $unexpected")
      assert(torn.get == null, s"reader saw a torn file: '${torn.get}'")
      // the surviving file is SOME writer's complete payload
      assert(complete(contentOf(dest)),
        s"final content is no writer's payload: '${contentOf(dest)}'")
      // losers (if the scheduler produced any) died on the documented
      // require — counted, not asserted: interleavings are the
      // scheduler's choice, and zero collisions is a legal outcome
      assert(loud.get >= 0)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("two writers interleaving in the fallback window: loser dies LOUDLY, winner's file intact") {
    // the scaladoc's hazard, executed: writer A's rename is refused
    // (dest exists), A deletes dest, and IN THAT WINDOW writer B
    // commits its own file — A's retry is refused again and must fail
    // the `require` (rename failed twice) rather than silently drop or
    // truncate B's committed file. The adversary is injected by the
    // pre-rename hook at exactly the retry instant, so the
    // interleaving is deterministic, not scheduler luck.
    val (fs, dir, dest) = fsAndDir()
    try {
      EpochedTable.writeFileAtomic(fs, dest, utf8("old"))
      val adversary = "adversary-committed-" + ("y" * 50)
      fs.beforeRename = dst =>
        if (dst.getName == dest.getName && !fs.exists(dest))
          // B wins the window: a complete file lands at dest (written
          // raw — going through fs would recurse into this hook)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dest.toUri.getPath), utf8(adversary))
      val e = intercept[IllegalArgumentException] {
        EpochedTable.writeFileAtomic(fs, dest, utf8("mine"))
      }
      assert(e.getMessage.contains("rename failed twice"),
        s"loser must die on the documented require: ${e.getMessage}")
      // the winner's committed file is byte-identical — the loser
      // corrupted nothing, and its payload is nowhere at dest
      assert(contentOf(dest) == adversary)
      // the loser's tmp sibling may remain as debris, but it is
      // dot-prefixed (invisible to the manifest readers' name scans)
      val visible = dir.listFiles().map(_.getName)
        .filterNot(n => n.startsWith(".") || n == "manifest")
      assert(visible.isEmpty, s"loser left visible debris: ${visible.toSeq}")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
