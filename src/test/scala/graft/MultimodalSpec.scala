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

  test("PNG round trip: decoded pixel stats equal the generator's closed form") {
    // the decoder must recover EVERY pixel the generator wrote — PNG is
    // lossless, so equality against the formula proves a real decode,
    // not byte-statistics luck
    for (id <- Seq(0L, 1L, 7L, 255L, 256L, 123456789L)) {
      val Some((w, h, px)) = Multimodal.decodeImage(Multimodal.pngPayload(id))
      assert(w == Multimodal.ImgW && h == Multimodal.ImgH)
      for (p <- 0 until w * h)
        assert(px(p) == ((id * 31 + p) % 256).toInt,
          s"pixel $p of image $id decoded wrong")
    }
  }

  test("image decode query is batch-size invariant and matches the formula") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val png = Multimodal.pngMediaFromDocuments(docs)
    val a = rowsOf(Multimodal.extractImageFeatures(png, batchSize = 1)
      .toDF().orderBy("media_id"))
    val b = rowsOf(Multimodal.extractImageFeatures(png, batchSize = 512)
      .toDF().orderBy("media_id"))
    assert(a == b && a.size == docs.count())
    // spot-check the statistics against the closed form
    assert(a.forall { r =>
      val id = r("media_id").asInstanceOf[Long]
      val px = (0 until 64).map(p => ((id * 31 + p) % 256).toInt)
      r("px_mean") == px.sum.toDouble / 64 &&
        r("stripe0") == px.slice(0, 16).sum.toDouble / 16 &&
        r("stripe3") == px.slice(48, 64).sum.toDouble / 16
    })
  }

  test("corrupt image payloads are dropped, valid ones survive") {
    val s = spark
    import s.implicits._
    val mixed = Seq(
      (1L, Multimodal.pngPayload(1L)),
      (2L, "definitely not a png".getBytes("UTF-8")),
      (3L, Array.emptyByteArray),
      (4L, Multimodal.pngPayload(4L)))
      .toDF("media_id", "payload")
    val got = rowsOf(Multimodal.extractImageFeatures(mixed)
      .toDF().orderBy("media_id"))
    assert(got.map(_("media_id")) == Seq(1L, 4L))
  }

  test("WAV round trip: decoded samples equal the generator's closed form") {
    // the decoder must recover EVERY sample the generator wrote — PCM
    // is lossless, so equality against the formula proves a real
    // decode, not byte-statistics luck
    // negative ids included: truncated % would push samples below
    // -32768 there and wrap in the 16-bit write — floorMod keeps the
    // generator/oracle contract total over the whole id domain
    for (id <- Seq(0L, 1L, 7L, 255L, 256L, 123456789L, -1L, -98765L)) {
      val Some((rate, channels, smp)) =
        Multimodal.decodeAudio(Multimodal.wavPayload(id))
      assert(rate == Multimodal.AudioRate && channels == 1)
      assert(smp.length == Multimodal.AudioSamples)
      for (i <- smp.indices)
        assert(smp(i) ==
          (Math.floorMod(id * 37 + i * 13, 65536L) - 32768).toInt,
          s"sample $i of waveform $id decoded wrong")
    }
  }

  test("audio decode query is batch-size invariant and matches the formula") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wav = Multimodal.wavMediaFromDocuments(docs)
    val a = rowsOf(Multimodal.extractAudioFeatures(wav, batchSize = 1)
      .toDF().orderBy("media_id"))
    val b = rowsOf(Multimodal.extractAudioFeatures(wav, batchSize = 512)
      .toDF().orderBy("media_id"))
    assert(a == b && a.size == docs.count())
    // spot-check the statistics against the closed form
    assert(a.forall { r =>
      val id = r("media_id").asInstanceOf[Long]
      val smp = (0 until 64).map(i =>
        (Math.floorMod(id * 37 + i * 13, 65536L) - 32768).toInt)
      r("amp_mean") == smp.sum.toDouble / 64 &&
        r("stripe0") == smp.slice(0, 16).sum.toDouble / 16 &&
        r("stripe3") == smp.slice(48, 64).sum.toDouble / 16 &&
        r("peak") == smp.map(math.abs).max
    })
  }

  test("corrupt audio payloads are dropped, valid ones survive") {
    val s = spark
    import s.implicits._
    // the truncated case keeps a valid RIFF magic but cuts the data
    // chunk short — exactly the hostile shape the NonFatal containment
    // exists for
    val truncated = Multimodal.wavPayload(9L).take(30)
    val mixed = Seq(
      (1L, Multimodal.wavPayload(1L)),
      (2L, "definitely not a wav".getBytes("UTF-8")),
      (3L, Array.emptyByteArray),
      (4L, truncated),
      (5L, Multimodal.wavPayload(5L)))
      .toDF("media_id", "payload")
    val got = rowsOf(Multimodal.extractAudioFeatures(mixed)
      .toDF().orderBy("media_id"))
    assert(got.map(_("media_id")) == Seq(1L, 5L))
  }

  test("empty payload decodes to zero features, not a crash") {
    val f = Multimodal.decodeStub(1L, "image", Array.emptyByteArray)
    assert(f.n_bytes == 0L && f.byte_mean == 0.0 && f.stripe3 == 0.0)
    val s = Multimodal.sampleStub(1L, Array.emptyByteArray, 256, 3, 4)
    assert(s.n_frames == 0L && s.strided_len == 0L)
  }
}
