package graft

import org.apache.spark.sql.functions._

import graft.functions.HllSketch

/** Pins the pinned-HLL contract ([[graft.functions.HllSketch]]):
  * public hash vectors, order-independence (the property that makes
  * the estimates oracle-checkable), sketch merge algebra, and the
  * estimator's accuracy envelope. Everything here is deterministic —
  * a failure is a real contract break, never a flake.
  */
class HllSketchSpec extends SparkSuite {

  test("fnv-1a 64 matches the published test vectors before the finalizer") {
    // canonical FNV-1a 64 vectors (public): "" → basis, "a", "foobar"
    def fnvOnly(s: String): Long = {
      var h = HllSketch.Fnv64Basis
      s.getBytes("UTF-8").foreach(b => h = (h ^ (b & 0xffL)) * HllSketch.Fnv64Prime)
      h
    }
    assert(fnvOnly("") == 0xcbf29ce484222325L)
    assert(fnvOnly("a") == 0xaf63dc4c8601ec8cL)
    assert(fnvOnly("foobar") == 0x85944171f73967e8L)
    // the shipped hash folds CODEPOINTS (== bytes on these ASCII
    // vectors) and is exactly fmix64 of that fold
    assert(HllSketch.hash64String("foobar") ==
      HllSketch.fmix64(0x85944171f73967e8L))
  }

  test("hash64 column expression equals the scala fold, unicode included") {
    val s = spark
    import s.implicits._
    // the é and CJK entries pin the codepoint (not UTF-8 byte)
    // contract — the DuckDB oracle's unicode() fold sees the same
    // units, so cross-engine parity holds for any script
    val vals = Seq("", "a", "foobar", "text number 7", "0", "4999",
      "café", "日本語", "emoji 😀 tail")
    val got = vals.toDF("s").select(HllSketch.hash64(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == vals.map(HllSketch.hash64String))
    // reference: xor folds the CODEPOINT, so a supplementary-plane
    // char is one unit, not four bytes
    val cp = "😀".codePointAt(0)
    assert(HllSketch.hash64String("😀") == HllSketch.fmix64(
      (HllSketch.Fnv64Basis ^ cp) * HllSketch.Fnv64Prime))
  }

  test("sketches are identical under any partitioning (order-free merge)") {
    val s = spark
    import s.implicits._
    val d = (1 to 5000).map(i => s"doc-$i").toDF("v")
    def sk(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(HllSketch.hllSketch(col("v")).as("sk"))
        .collect()(0).getAs[Array[Byte]]("sk")
    val one = sk(d.repartition(1))
    val many = sk(d.repartition(17))
    val dup = sk(d.union(d)) // idempotent: duplicates cannot move a max
    assert(java.util.Arrays.equals(one, many))
    assert(java.util.Arrays.equals(one, dup))
  }

  test("union of partial sketches equals the sketch of the whole") {
    val s = spark
    import s.implicits._
    val d = (1 to 2000).map(i => (i % 7, s"v$i")).toDF("g", "v")
    val whole = d.agg(HllSketch.hllDistinct(HllSketch.hllSketch(col("v"))))
      .collect()(0).getLong(0)
    val merged = d.groupBy(col("g"))
      .agg(HllSketch.hllSketch(col("v")).as("sk"))
      .agg(HllSketch.hllDistinct(HllSketch.hllUnion(col("sk"))))
      .collect()(0).getLong(0)
    assert(whole == merged, s"whole=$whole merged=$merged")
  }

  test("estimator stays inside the HLL error envelope at several scales") {
    val s = spark
    import s.implicits._
    // ~1.6% standard error at m=4096; allow 5σ (deterministic — these
    // are fixed numbers, the margin documents the expectation)
    Seq(100, 5000, 50000).foreach { n =>
      val est = (1 to n).map(i => s"item-$i").toDF("v")
        .agg(HllSketch.hllDistinct(HllSketch.hllSketch(col("v"))))
        .collect()(0).getLong(0)
      assert(math.abs(est - n) <= math.max(4.0, n * 0.08),
        s"n=$n est=$est")
    }
  }

  test("small-range correction engages and is exact at tiny cardinalities") {
    val s = spark
    import s.implicits._
    val est = (1 to 3).map(i => s"only-$i").toDF("v")
      .agg(HllSketch.hllDistinct(HllSketch.hllSketch(col("v"))))
      .collect()(0).getLong(0)
    assert(est == 3L)
  }

  test("estimate wire constants are the exact integers the oracle splices") {
    // the oracle SQL carries these literals; a drift here is a silent
    // cross-engine divergence, so pin them to their decimal values
    assert(HllSketch.RawNumeratorBig ==
      BigInt("223172747692837245156327424"))
    assert(HllSketch.RawNumeratorBig.toDouble == HllSketch.RawNumerator)
    assert(HllSketch.SmallRangeInt == 10240)
    // raw branch: exact half-up quotient, no floats anywhere
    val regs = Array.fill[Byte](HllSketch.M)(5) // zeros=0 → raw branch
    val sum = BigInt(HllSketch.M) * (BigInt(1) << 59)
    assert(HllSketch.estimateLong(regs) ==
      ((HllSketch.RawNumeratorBig * 2 + sum) / (sum * 2)).toLong)
  }

  test("union aggregate refuses foreign register widths") {
    val s = spark
    import s.implicits._
    val bad = Seq(Array.fill[Byte](16)(1)).toDF("sk")
    val e = intercept[Exception] {
      bad.agg(HllSketch.hllDistinct(HllSketch.hllUnion(col("sk")))).collect()
    }
    assert(e.getMessage != null)
  }
}
