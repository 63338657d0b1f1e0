package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization: the native `session_window`
  * aggregate merges a user's events whose ts lie within `gapMinutes`
  * of each other — the streaming counterpart of
  * [[graft.operators.EventAnalytics.sessionize]]. Sessions are
  * identified by their start time rather than a per-user ordinal: an
  * ordinal needs a total per-user order, which an unbounded stream
  * cannot provide (and at 100 TB/day would serialize each user's
  * history through one task anyway).
  *
  * Boundary semantics: `session_window` MERGES events strictly less
  * than the gap apart, while the batch operator's `diff > gap` test
  * also merges the exact-boundary case — an exactly-gap-separated
  * event pair lands in one batch session but two streaming sessions.
  * Microsecond timestamps make ties measure-zero in practice; the
  * parity spec runs on real fixture data.
  *
  * State: one in-flight session row per (user, open session); the
  * watermark closes sessions `delay` past their last event, so state
  * is bounded by concurrently-active users — the standard streaming
  * sessionization contract.
  */
object StreamingSessions {

  def sessionWindows(events: DataFrame, gapMinutes: Int = 30,
      delay: String = "1 hour",
      guardName: String = "sessions_ts_guard"): DataFrame =
    graft.sources.EventsAsRecords.normalizeTs(events, "ts")
      // a timestamp-less event (null ts — in-contract dirty payload)
      // cannot belong to any gap-based session: drop it explicitly
      // rather than hand session_window a null event time (the same
      // rule transitionUpdates applies; the batch twin's NULLS-FIRST
      // window placement is arbitrary, not a contract). The drop is
      // observable via the guardName observe node, the package's
      // standard for silent-drop paths
      .observe(guardName,
        count(when(col("ts").isNull, 1)).as("null_ts_events"),
        count(lit(1)).as("events_seen"))
      .filter(col("ts").isNotNull)
      .withWatermark("ts", delay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.operators.Money.tryDec(col("value"))).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
}
