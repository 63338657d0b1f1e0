package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics over the raw `events` table — the windowed /
  * grouped aggregations a topic-metrics engine grows into once records
  * carry event time (SURVEY §2.H notes the reference has none; these
  * are the streaming-ready extensions). Both run unchanged as
  * Structured Streaming aggregations with a watermark on `ts`.
  */
object EventAnalytics {

  /** Tumbling 1-day event-time windows per event type. Uses the real
    * `window()` event-time operator (streaming-compatible), not a
    * date_trunc projection. Money-style sums go through DECIMAL(18,2)
    * so distributed summation order cannot perturb results.
    */
  def dailyWindows(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(to_date(col("w.start")).as("day"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("day"), col("event_type"))

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds `gapMinutes`. Classic two-window plan —
    * lag to flag session starts, running sum to number sessions, then
    * a grouped aggregate — one shuffle on user_id shared by both
    * windows and the final aggregation. Deterministic ordering via
    * (ts, event_id).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(w))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Each user's most frequent event type (ties broken
    * lexicographically) — grouped count + one top-1 window. */
  def topEventTypePerUser(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("cnt").desc, col("event_type"))
    events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("top_type"), col("cnt"))
      .orderBy(col("user_id"))
  }

  /** Discrete (order-statistic) percentiles of `value` per event type:
    * the value at ordered position ceil(p·n) — `percentile_disc`
    * semantics spelled out as a window + positional pick, so every
    * engine computes the identical picked value (no interpolation
    * arithmetic to diverge on). Duplicate boundary values are safe:
    * any row of a tie run carries the same value.
    *
    * SCALE BOUND: the rank window sorts each event type's values on
    * ONE reducer — exact order statistics require a total order per
    * type. Fine for any realistic #event_types × per-type volume, but
    * a 100 TB corpus with one hot type pins that type's sort on a
    * single task: use [[valuePercentilesApprox]] there (mergeable
    * sketch, no global sort; this exact variant stays the oracle).
    */
  def valuePercentiles(events: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    // null values are excluded outright: engines disagree on null sort
    // position (Spark NULLS FIRST vs others' NULLS LAST), and a
    // percentile of nulls is meaningless anyway
    val ranked = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
    val aggs = ps.map { p =>
      max(when(col("rn") === ceil(col("n") * p), col("value")))
        .as(s"p${(p * 100).toInt}")
    }
    ranked.groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("event_type"))
  }
  /** Approximate companion of [[valuePercentiles]] for skew-prone
    * corpora: `percentile_approx` is a mergeable sketch aggregate —
    * map-side partials then one shuffle of fixed-size sketches per
    * type, no per-type global sort — so a hot event type cannot pin a
    * single reducer. Rank error is bounded at n/`accuracy`. Same
    * output schema as the exact variant, which remains the oracle
    * query (sketch merge order makes approx results hash-unstable
    * across engines).
    */
  def valuePercentilesApprox(events: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000): DataFrame = {
    val qs = percentile_approx(
      col("value"), typedLit(ps), lit(accuracy)).as("qs")
    events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(qs)
      .select(col("event_type") +: ps.zipWithIndex.map { case (p, i) =>
        element_at(col("qs"), i + 1).as(s"p${(p * 100).toInt}") }: _*)
      .orderBy(col("event_type"))
  }

  def typeStats(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      countDistinct(col("user_id")).as("n_users"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
      unix_micros(min(col("ts"))).as("first_us"),
      unix_micros(max(col("ts"))).as("last_us"))
      .orderBy(col("event_type"))
}
