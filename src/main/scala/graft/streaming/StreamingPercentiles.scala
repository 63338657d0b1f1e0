package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming percentile story for the event surface. The batch engine
  * has an EXACT distributed percentile operator
  * ([[graft.operators.EventAnalytics.valuePercentilesDistributed]]),
  * but its MSD radix select is a driver-looped multi-pass algorithm —
  * structurally impossible under Structured Streaming, which admits
  * only incremental single-pass state. The streaming counterpart is
  * therefore the SKETCH formulation: `percentile_approx` is a
  * `TypedImperativeAggregate` whose buffer is a fixed-size mergeable
  * quantile summary, so Spark maintains one sketch per event type as
  * streaming aggregation state and each micro-batch folds in
  * incrementally — no per-batch recomputation, state size independent
  * of stream length.
  *
  * Accuracy contract: rank error ≤ n/`accuracy`, identical to the
  * batch approx twin ([[graft.operators.EventAnalytics
  * .valuePercentilesApprox]]) — the StreamingSpec brackets the
  * streamed result against the batch EXACT order statistics the same
  * way the batch approx spec does.
  *
  * Run with output mode update or complete. Late data: attach a
  * watermark upstream if bounded state per closed window is needed;
  * the running-totals form here (like [[StreamingTopicMetrics
  * .partitionStats]]) deliberately aggregates the whole stream.
  */
object StreamingPercentiles {

  def valuePercentiles(events: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000): DataFrame =
    graft.operators.EventAnalytics
      .valuePercentilesApproxCore(events, ps, accuracy)
}
