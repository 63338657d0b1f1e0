package graft

import org.apache.spark.sql.functions.col

import graft.functions.ExactMath

/** Pins [[graft.functions.ExactMath.ppmSplitDiv]]'s identity —
  * `(num·10⁶) div den` — at magnitudes the fixtures never reach,
  * against BigInt reference arithmetic. The fixtures exercise the
  * formula only at values where the UNSPLIT form would also have been
  * correct; this spec is the regression canary for the overflow class
  * itself (two design-point instances of which were found and fixed in
  * round 17: the collocations lift and tokenizerFit's ratio).
  */
class ExactMathSpec extends SparkSuite {

  test("split ppm quotient == BigInt (num*1e6) div den at boundary magnitudes") {
    val s = spark
    import s.implicits._
    val cases: Seq[(Long, Long)] = Seq(
      // the design point: 100 TB corpus scale counts
      (13_000_000_000_000L, 14_000_000_000_000L),
      // the unsplit form's overflow threshold and beyond
      (9_223_372_036_855L, 7L),
      // near the SPLIT form's own num ceiling (num·10³ just under 2⁶³);
      // den keeps the RESULT representable too
      (9_000_000_000_000_000L, 2_000_000_000L),
      (9_000_000_000_000_000L, 9_000_000_000_000_001L),
      // extremes of the ratio
      (1L, 9_000_000_000_000_000L),
      (5_000_000_000_000L, 1L),
      // exact-division and remainder-heavy pairs
      (1_000_000L, 3L), (999_999L, 1_000_000L), (0L, 5L),
      (123_456_789_012_345L, 987_654_321L))
    val got = cases.toDF("num", "den")
      .withColumn("ppm", ExactMath.ppmSplitDiv("num", "den"))
      .select(col("num"), col("den"), col("ppm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((n, d) <- cases) {
      val expect = ((BigInt(n) * 1000000) / BigInt(d)).toLong
      assert(got((n, d)) == expect,
        s"ppmSplitDiv($n, $d) = ${got((n, d))}, BigInt says $expect")
    }
  }

  test("500 seeded-random pairs inside the split-safe envelope match BigInt (one job)") {
    // generative sweep of the whole domain the hand-picked boundary
    // cases bracket — seeded, so a failure reproduces; evaluated as
    // ONE frame so the property costs one Spark job, not 500
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(18)
    // & Long.MaxValue, not math.abs: abs(Long.MinValue) is still
    // negative, and a different seed/count could draw it — escaping
    // the num >= 0, den > 0 contract the quotient pins
    val cases = Iterator.continually {
      val num = (rnd.nextLong() & Long.MaxValue) % 9_000_000_000_000_000L
      val den = 1L + (rnd.nextLong() & Long.MaxValue) % 9_000_000_000_000_000L
      (num, den)
    }.filter { case (n, d) =>
      // stay in the callers' domain: the ppm result itself fits a long
      (BigInt(n) * 1000000 / BigInt(d)).isValidLong
    }.take(500).toSeq
    val got = cases.toDF("num", "den")
      .withColumn("ppm", ExactMath.ppmSplitDiv("num", "den"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((n, d) <- cases) {
      val expect = ((BigInt(n) * 1000000) / BigInt(d)).toLong
      assert(got((n, d)) == expect,
        s"ppmSplitDiv($n, $d) = ${got((n, d))}, BigInt says $expect")
    }
  }

  test("composite operands bind as units (the template parenthesizes both substitutions)") {
    // the misparse this pins against: an unparenthesized template
    // would read den = "a + b" as `(x div a) + b` — silently wrong.
    val s = spark
    import s.implicits._
    val r = Seq((10L, 3L, 4L)).toDF("x", "a", "b")
      .withColumn("ppm", ExactMath.ppmSplitDiv("x", "a + b"))
      .withColumn("ppm_num", ExactMath.ppmSplitDiv("a + b", "x"))
      .collect()(0)
    assert(r.getLong(3) == ((BigInt(10) * 1000000) / BigInt(7)).toLong,
      s"composite denominator misparsed: ${r.getLong(3)}")
    assert(r.getLong(4) == ((BigInt(7) * 1000000) / BigInt(10)).toLong,
      s"composite numerator misparsed: ${r.getLong(4)}")
  }

  test("split ppm propagates a null denominator (the nullif guard idiom)") {
    val s = spark
    import s.implicits._
    val r = Seq((5L, 0L)).toDF("num", "raw")
      .withColumn("ppm", ExactMath.ppmSplitDiv("num", "nullif(raw, 0)"))
      .collect()(0)
    assert(r.isNullAt(2), "zero-through-nullif denominator must yield null")
  }
}
