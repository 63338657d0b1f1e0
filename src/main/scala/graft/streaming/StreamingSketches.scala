package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.CorpusOps

/** Streaming face of the distinct-count sketch table
  * ([[CorpusOps.writeDistinctSketches]]): arriving documents fold into
  * per-source HLL register rows per micro-batch, so the dashboard
  * ([[CorpusOps.sourceDistinctFromSketches]]) tracks the growing
  * corpus at ~sources-row read cost — never a corpus rescan.
  *
  * This is the most replay-tolerant ingest loop in the package, and
  * the reason is ALGEBRAIC, not mechanical: HLL registers merge by
  * elementwise max, which is idempotent — an at-least-once replay of
  * any batch (or even a torn half-batch that later commits fully)
  * cannot move a single register, so the distinct estimates are
  * replay-proof BY CONSTRUCTION. Only the `n_docs` side sum needs the
  * mechanical overwrite-once `batch-<id>` discipline the label and
  * PQ-code loops pioneered ([[CorpusOps.appendDistinctSketches]]).
  * [[CorpusOps.compactDistinctSketches]] folds batch rows back to one
  * row per source when file counts grow.
  */
object StreamingSketches {

  /** Streaming twin of
    * [[graft.operators.TextAnalysis.vocabularySummaryApprox]] — the
    * SAME plan on a streaming frame: a `TypedImperativeAggregate`'s
    * byte buffer is legal STREAMING AGGREGATION STATE (each trigger
    * deserializes the stored registers, folds the new rows, and
    * stores them back — which is exactly the sketch's merge contract),
    * so cumulative distinct-terms/docs estimates track the stream in
    * complete/update mode with 8 KiB of state total. StreamingSpec
    * pins streamed == batch on the union of all micro-batches.
    */
  def vocabGrowth(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.vocabularySummaryApprox(docs)

  /** `foreachBatch` because the sketch table is disk-backed shared
    * state no in-operator store models (the same shape as
    * [[StreamingSimilarity.pqIngest]] and
    * [[StreamingDedup.labeledIngest]]). */
  def sketchIngest(docs: DataFrame, dir: String,
      checkpointDir: Option[String] = None)(
      onBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = docs.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          CorpusOps.appendDistinctSketches(batch.toDF(), dir, batchId)
          onBatch(batchId)
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }
}
