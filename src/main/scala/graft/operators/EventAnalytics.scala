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

  /** Per-event-type stats: exact distinct users, decimal-exact value
    * sum, first/last event time. */
  def typeStats(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      countDistinct(col("user_id")).as("n_users"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
      unix_micros(min(col("ts"))).as("first_us"),
      unix_micros(max(col("ts"))).as("last_us"))
      .orderBy(col("event_type"))
}
