package graft

import graft.functions.Fnv32
import graft.operators.AliveKeys

/** Pins the reference-fidelity semantics of the FNV-32 bucket variant:
  * hash collisions merge keys, and a colliding tombstone erases an
  * innocent key — exactly the reference's bitset behavior
  * (`src/metric.rs:262-305`, SURVEY §2.F2).
  */
class Fnv32FidelitySpec extends SparkSuite {

  /** Find two distinct short keys with the same FNV-32-variant hash
    * (birthday search over ~2^17 candidates for a 32-bit space).
    */
  private lazy val collidingPair: (String, String) = {
    val seen = collection.mutable.Map.empty[Long, String]
    val it = Iterator.from(0).map(i => s"key-$i")
    it.flatMap { k =>
      val h = Fnv32.hashBytes(k.getBytes("UTF-8"))
      seen.put(h, k) match {
        case Some(prev) if prev != k => Some((prev, k))
        case _ => None
      }
    }.next()
  }

  test("colliding tombstone erases an innocent key (reference bitset semantics)") {
    val (a, b) = collidingPair
    assert(Fnv32.hashBytes(a.getBytes) == Fnv32.hashBytes(b.getBytes) && a != b)
    // b written alive first, then a (same bucket) tombstoned LAST
    val df = records(
      (0, 0L, 1L, b, "alive-value"),
      (0, 1L, 2L, a, "v"),
      (0, 2L, 3L, a, null))
    // exact op: b survives, a is dead -> 1
    assert(AliveKeys.exact(df) == 1L)
    // fnv bucket op: one bucket whose last write is a tombstone -> 0
    val fnv = rowsOf(AliveKeys.approxFnv32Frame(df)).head("alive_keys_fnv32")
    assert(fnv == 0L)
  }

  test("distinct non-colliding keys count normally in the fnv variant") {
    val df = records((0, 0L, 1L, "x", "v"), (0, 1L, 2L, "y", null))
    assert(rowsOf(AliveKeys.approxFnv32Frame(df)).head("alive_keys_fnv32") == 1L)
  }
}
