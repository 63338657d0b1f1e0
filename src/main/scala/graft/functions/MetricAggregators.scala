package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.{KafkaRecord, TopicSummary}

/** Typed custom-metric extension point — the Spark-native equivalent of
  * the reference's `MetricHandler` trait (`src/kafka.rs:18-20`:
  * mutable state + per-record update + end-of-scan readout), which is
  * exactly an `Aggregator[IN, BUF, OUT]`: `zero`/`reduce`/`merge`/
  * `finish`. Register with `functions.udaf` for SQL, or use on a
  * `Dataset[KafkaRecord]` directly. Unlike the reference's
  * single-thread fold, `merge` makes the same metric distributable.
  */
object MetricAggregators {

  case class SummaryBuf(
      count: Long, bytes: Long,
      minAliveSize: Long, maxAliveSize: Long,
      minTsUs: Long, maxTsUs: Long)

  /** D1-D6 as one typed aggregator (sentinel semantics per
    * `src/metric.rs:39-62`: Long.MaxValue min-sentinels read out as 0
    * on an all-tombstone topic).
    */
  val topicSummary: Aggregator[KafkaRecord, SummaryBuf, TopicSummary] =
    new Aggregator[KafkaRecord, SummaryBuf, TopicSummary] {
      def zero: SummaryBuf =
        SummaryBuf(0L, 0L, Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue)

      def reduce(b: SummaryBuf, r: KafkaRecord): SummaryBuf = {
        val kLen = if (r.key == null) 0L else r.key.length.toLong
        val vLen = if (r.value == null) 0L else r.value.length.toLong
        val size = kLen + vLen
        // null timestamps are SKIPPED (like SQL min/max), keeping this
        // reduction in lockstep with summaryFrame/summaryFromPartials;
        // the missing-ts -> epoch-0 mapping is the SOURCE's job
        // (KafkaRecordSource.normalizeTimestamp), not the reduction's
        val hasTs = r.timestamp != null
        val tsUs = if (hasTs) graft.model.Timestamps.toMicros(r.timestamp) else 0L
        SummaryBuf(
          b.count + 1, b.bytes + size,
          if (r.value != null) math.min(b.minAliveSize, size) else b.minAliveSize,
          if (r.value != null) math.max(b.maxAliveSize, size) else b.maxAliveSize,
          if (hasTs) math.min(b.minTsUs, tsUs) else b.minTsUs,
          if (hasTs) math.max(b.maxTsUs, tsUs) else b.maxTsUs)
      }

      def merge(a: SummaryBuf, b: SummaryBuf): SummaryBuf =
        SummaryBuf(a.count + b.count, a.bytes + b.bytes,
          math.min(a.minAliveSize, b.minAliveSize),
          math.max(a.maxAliveSize, b.maxAliveSize),
          math.min(a.minTsUs, b.minTsUs),
          math.max(a.maxTsUs, b.maxTsUs))

      def finish(b: SummaryBuf): TopicSummary =
        TopicSummary(
          overall_count = b.count,
          overall_bytes = b.bytes,
          smallest_msg = if (b.minAliveSize == Long.MaxValue) 0L else b.minAliveSize,
          largest_msg = if (b.maxAliveSize == Long.MinValue) 0L else b.maxAliveSize,
          earliest_us = if (b.minTsUs == Long.MaxValue) 0L else b.minTsUs,
          latest_us = if (b.maxTsUs == Long.MinValue) 0L else b.maxTsUs)

      def bufferEncoder: Encoder[SummaryBuf] = Encoders.product[SummaryBuf]
      def outputEncoder: Encoder[TopicSummary] = Encoders.product[TopicSummary]
    }
}
