package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the stateful join surface of Structured
  * Streaming. The canonical instance is event ATTRIBUTION: each click
  * joined to the same user's purchases landing within a bounded
  * horizon after it.
  *
  * The scale contract is the INTERVAL condition + watermarks on BOTH
  * sides: Spark derives from them exactly how long a buffered row can
  * still find a partner (a click is droppable once the purchase
  * watermark passes click_ts + horizon; a purchase once the click
  * watermark passes its ts), so join state is bounded by
  * (event rate × (horizon + watermark delay)) per key group — NOT by
  * stream length. An unconstrained stream-stream join (no time bound)
  * buffers both streams forever; never ship one.
  *
  * Both inputs may derive from the same physical stream (filter by
  * event_type) — Spark plans it as a self-join with two state stores.
  */
object StreamingJoins {

  /** Stream-STATIC enrichment: a streaming fact joined to a batch
    * dimension (user profile, model registry, allowlist). Stateless —
    * no watermark, no join state: each micro-batch plans a fresh
    * batch join against the static side, so updates to a re-read
    * source (e.g. Delta) are picked up per batch; plain parquet
    * snapshots at query start. UNHINTED per the repo's broadcast
    * policy: a "dim" keyed per-user is unbounded-cardinality, so size
    * estimation broadcasts it while it fits and the join degrades to
    * a per-batch shuffle instead of a broadcast OOM when it doesn't.
    * (Streaming frames can never be the broadcast side regardless.)
    */
  def enriched(stream: DataFrame, dim: DataFrame,
      key: String = "user_id"): DataFrame =
    stream.join(dim, Seq(key), "left_outer")

  /** Click→purchase attribution within `horizonMinutes`, inner join.
    * Works identically on batch frames (withWatermark is a no-op in
    * batch), which is how the spec pins stream/batch parity.
    */
  def attribution(clicks: DataFrame, purchases: DataFrame,
      horizonMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.sources.EventsAsRecords.normalizeTs
    val c = normalizeTs(clicks, "ts").withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val p = normalizeTs(purchases, "ts").withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <=
          col("click_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("click_id"), col("user_id"),
        unix_micros(col("click_ts")).as("click_ts_us"),
        col("purchase_id"),
        unix_micros(col("purchase_ts")).as("purchase_ts_us"),
        col("value"))
  }
}
