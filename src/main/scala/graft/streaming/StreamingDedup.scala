package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming exact deduplication for a document ingest pipeline: keep
  * the FIRST document seen for each content fingerprint (md5 of
  * normalized text — the same fingerprint [[graft.operators.Dedup.exact]]
  * groups by in batch), drop every later duplicate.
  *
  * Built on `dropDuplicates`/`dropDuplicatesWithinWatermark`: Spark
  * maintains one state row per distinct fingerprint and emits only
  * first arrivals — the streaming counterpart of the batch
  * `groupBy(fingerprint).agg(min(doc_id))` plan, with "first seen" in
  * arrival order taking the canonical role that "smallest doc_id"
  * plays in batch.
  *
  * State sizing at scale: unbounded-history dedup holds one 16-byte
  * fingerprint (plus row overhead) per distinct document ever seen —
  * use [[dedupedWithinWatermark]] for unbounded streams: duplicates
  * are only suppressed within the watermark horizon and state older
  * than the horizon is evicted, the standard bounded-state trade for
  * infinite ingest.
  */
object StreamingDedup {

  /** Unbounded-history variant: exact global first-seen dedup. */
  def deduped(docs: DataFrame): DataFrame =
    docs
      .withColumn("fingerprint", TextFunctions.fingerprintMd5(col("text")))
      .dropDuplicates("fingerprint")

  /** Bounded-state variant for unbounded streams: `eventTimeCol` must
    * carry a watermark-compatible timestamp; duplicates arriving more
    * than `delay` after the original pass through (and old state is
    * evicted).
    */
  def dedupedWithinWatermark(docs: DataFrame, eventTimeCol: String,
      delay: String): DataFrame =
    docs
      .withColumn("fingerprint", TextFunctions.fingerprintMd5(col("text")))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")
}
