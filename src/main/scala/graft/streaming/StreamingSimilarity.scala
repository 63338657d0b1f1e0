package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Streaming face of the inverted-file (IVF) index: arriving vectors
  * route to coarse cells with the SAME driver-held-codebook argmax
  * projection the batch index uses — the codebook is the persisted
  * artifact (rates table / Bloom sketch / codebook: one pattern), so
  * stream-assigned == batch-assigned is an identity, not a parity
  * test that can drift.
  *
  * [[cellCounts]] is the ingest-side drift monitor's state: one count
  * row per coarse cell (state bounded by the codebook size, the
  * smallest state budget in the whole streaming package). Joined
  * against [[Similarity.cellBaseline]]'s at-rest ppm profile, a
  * consumer sees corpus drift (today's embeddings landing in
  * different cells than the index was built for) — the signal to
  * retrain the codebook BEFORE recall quietly decays. The recall
  * report ([[Similarity.annRecall]]) measures the damage; this
  * monitor predicts it.
  */
object StreamingSimilarity {

  /** Stateless per-row cell routing — works on batch and streaming
    * frames alike (narrow projection, no state, no watermark). */
  def cellRouter(vecs: DataFrame,
      book: Array[(Long, Seq[Double])]): DataFrame =
    Similarity.cellAssignments(vecs, book)

  /** Cumulative per-cell arrival counts (Update mode) — one state row
    * per codebook cell. */
  def cellCounts(vecs: DataFrame,
      book: Array[(Long, Seq[Double])]): DataFrame =
    cellRouter(vecs, book)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_arrived"))

  /** Streaming ingest into a persisted IVF-PQ index
    * ([[Similarity.writePqIndex]]): each micro-batch PQ-encodes
    * against the FROZEN sidecar books ([[Similarity.appendToPqIndex]]
    * — never retrained, codes from different books are not
    * comparable) and appends to the cid-partitioned codes table, so
    * probes ([[Similarity.knnIvfPqIndexed]]) see new vectors at the
    * next query with zero rebuild. The ANN twin of
    * [[StreamingDedup.labeledIngest]]: frozen coordinate system at
    * batch-sized ingest cost, retrain-and-rebuild as the scheduled
    * batch job, with [[cellCounts]] as the drift monitor that says
    * when. `foreachBatch` because the index is disk-backed shared
    * state no in-operator store models. At-least-once recovery is
    * IDEMPOTENT at the write: each batch's code rows land in their own
    * overwrite-once `codes_ingest/batch-<id>` dir
    * ([[Similarity.appendToPqIndex]] with the batchId), so a replay
    * rewrites identical rows instead of permanently growing the index
    * on every recovery; the ADC duplicate-collapse remains as the
    * read-path backstop, and [[Similarity.compactPqIndex]] folds
    * ingest dirs back into the cid-partitioned base.
    */
  def pqIngest(vecs: DataFrame, indexDir: String,
      checkpointDir: Option[String] = None)(
      onBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery = {
    // pin the frozen books ONCE at stream start — a per-batch re-read
    // pays three driver-side sidecar reads per micro-batch for
    // immutable data, pure ingest-latency tax at a short trigger
    // interval. A rebuild that changes the books requires restarting
    // this stream regardless (codes from different books are not
    // comparable), so pinning loses nothing.
    val books = Similarity.pinPqBooks(vecs.sparkSession, indexDir)
    val writer = vecs.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          Similarity.appendToPqIndexWith(batch.toDF(), indexDir, books,
            Some(batchId))
          onBatch(batchId)
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }
}
