package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The multimodal plumbing's load-bearing property: results are
  * invariant to the batch size. A real decoder (Arrow batch, GPU call)
  * replaces the stub per batch — if batching leaked into results, the
  * swap would silently change outputs with executor/task sizing.
  */
class MultimodalSpec extends SparkSuite {

  private def media = Multimodal.mediaFromDocuments(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  test("feature extraction is batch-size invariant") {
    val sizes = Seq(1, 7, 64, 100000)
    val results = sizes.map(bs =>
      rowsOf(Multimodal.extractFeatures(media, bs).toDF()
        .orderBy("media_id")))
    assert(results.forall(_ == results.head) && results.head.nonEmpty)
  }

  test("frame sampling is batch-size invariant and counts consistently") {
    val a = rowsOf(Multimodal.sampleFeatures(media, batchSize = 1).toDF()
      .orderBy("media_id"))
    val b = rowsOf(Multimodal.sampleFeatures(media, batchSize = 512).toDF()
      .orderBy("media_id"))
    assert(a == b && a.nonEmpty)
    // kept_frames = ceil(n_frames / everyK) with the default everyK=3
    assert(a.forall { r =>
      val n = r("n_frames").asInstanceOf[Long]
      r("kept_frames").asInstanceOf[Long] == (n + 2) / 3
    })
  }

  test("empty payload decodes to zero features, not a crash") {
    val f = Multimodal.decodeStub(1L, "image", Array.emptyByteArray)
    assert(f.n_bytes == 0L && f.byte_mean == 0.0 && f.stripe3 == 0.0)
    val s = Multimodal.sampleStub(1L, Array.emptyByteArray, 256, 3, 4)
    assert(s.n_frames == 0L && s.strided_len == 0L)
  }
}
