package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed partition-locally in
  * batches.
  *
  * IMAGE DECODE IS REAL: PNG/JPEG readers ship in every JDK
  * (`javax.imageio`), so [[decodeImage]] decodes actual pixels and
  * [[extractImageFeatures]] derives statistics from them; the
  * companion query generates deterministic PNGs whose pixel values
  * follow a closed form the DuckDB oracle recomputes directly — PNG is
  * lossless, so a decoder that misreads even one pixel hash-mismatches.
  *
  * AUDIO DECODE IS REAL TOO: WAV/AIFF readers ship in every JDK
  * (`javax.sound.sampled`), so [[decodeAudio]] decodes actual PCM
  * samples and [[extractAudioFeatures]] derives statistics from them;
  * the companion query generates deterministic 16-bit PCM WAVs whose
  * sample values follow a closed form the DuckDB oracle recomputes
  * directly — PCM is lossless, so a decoder that misreads even one
  * sample hash-mismatches.
  *
  * VIDEO DECODE IS A STUB: no video codec ships with the JDK, so
  * [[decodeStub]] derives deterministic fake features (byte statistics
  * standing in for frame statistics). Everything around it is real and
  * tested: the schema, the `binary` payload column, batched
  * partition-local processing (`mapPartitions` + `grouped(batchSize)` —
  * the Scala shape of an Arrow-batched decode loop), and the typed
  * output. Swapping [[decodeStub]] for a real decoder changes no
  * plumbing — [[decodeImage]] and [[decodeAudio]] are the proof.
  *
  * Scale shape: decode is embarrassingly parallel and partition-local —
  * no shuffle anywhere; batch size bounds peak decoder memory per task.
  */
object Multimodal {

  // ImageIO wraps every read/write stream in a FILE-backed cache by
  // default — one temp file per image, disk I/O on a pure in-memory
  // round trip. Payloads here are byte arrays; cache in heap instead.
  // (JVM-global, set once on first use of this object; the executors
  // running the decode tasks are the JVMs that load it.)
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, byte_mean: Double,
      stripe0: Double, stripe1: Double, stripe2: Double, stripe3: Double)

  /** Deterministic media frame over `documents`: payload = UTF-8 bytes
    * of the text (the opaque-blob stand-in), kind cycles
    * image/audio/video by id.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: byte statistics as stand-in features — overall mean
    * plus four quarter-stripe means (the shape of a row-striped pixel
    * statistic). Pure integer/double arithmetic, so the driver oracle
    * can verify the plumbing end-to-end.
    */
  def decodeStub(mediaId: Long, kind: String,
      payload: Array[Byte]): MediaFeatures = {
    val n = payload.length
    def rangeMean(lo: Int, hi: Int): Double =
      if (hi <= lo) 0.0
      else {
        var s = 0L
        var i = lo
        while (i < hi) { s += (payload(i) & 0xff); i += 1 }
        s.toDouble / (hi - lo)
      }
    MediaFeatures(mediaId, kind, n.toLong, rangeMean(0, n),
      rangeMean(0, n / 4), rangeMean(n / 4, n / 2),
      rangeMean(n / 2, 3 * n / 4), rangeMean(3 * n / 4, n))
  }

  /** Batched partition-local feature extraction. `batchSize` bounds
    * per-task decoder working set (a real decoder would decode the
    * whole batch at once, e.g. via an Arrow batch or a GPU call).
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    // null payloads (a failed fetch upstream — certain to exist in a
    // real media table) are DROPPED before the decoder, the same
    // contract the real codecs keep for undecodable blobs; without
    // the filter the stub NPEs on payload.length and one bad row
    // kills the task
    media.select(col("media_id"), col("kind"), col("payload"))
      .filter(col("payload").isNotNull)
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(batch =>
        batch.map { case (id, kind, payload) => decodeStub(id, kind, payload) }))
  }

  /** The driver-facing query: features over the documents-derived
    * media frame, ordered. */
  def featuresQuery(docs: DataFrame): DataFrame =
    extractFeatures(mediaFromDocuments(docs)).toDF().orderBy(col("media_id"))

  /** Generated-image geometry: 8×8 keeps payloads tiny and every mean
    * below a division by a power of two (64, 16) — IEEE-exact, so the
    * decoded statistics hash-match the oracle's closed form bit-for-bit.
    */
  val ImgW = 8
  val ImgH = 8

  /** Deterministic 8×8 grayscale-in-RGB PNG for `id`: pixel (x, y)
    * carries value `(id*31 + y*W + x) mod 256` in all three channels.
    * The formula IS the oracle contract — [[graft.OracleSql]] recomputes
    * the same statistics from it without decoding anything, so the
    * encode→decode round trip is verified end-to-end against an
    * independent engine.
    */
  def pngPayload(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      ImgW, ImgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        val v = ((id * 31 + y * ImgW + x) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real JDK decode: (width, height, row-major gray values), or None
    * when the payload is not a decodable image — corrupt blobs must
    * skip cleanly, not kill the task (at 100 TB some payloads WILL be
    * garbage).
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        Some((w, h, px))
      }
    } catch {
      // NOT just IOException: the JDK readers throw unchecked
      // exceptions (IllegalArgument, ArrayIndexOutOfBounds, …) on
      // truncated/hostile bodies behind valid magic bytes — any of
      // them escaping would kill the task, which is exactly what this
      // Option return exists to prevent
      case scala.util.control.NonFatal(_) => None
    }

  case class ImageFeatures(
      media_id: Long, width: Int, height: Int, px_mean: Double,
      stripe0: Double, stripe1: Double, stripe2: Double, stripe3: Double)

  /** Documents-derived PNG media frame: one real encoded image per
    * document. Partition-local generation — the fixture-writer side of
    * the decode round trip.
    */
  def pngMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, pngPayload(id))))
      .toDF("media_id", "payload")
  }

  /** Batched partition-local REAL image decode: pixel mean plus four
    * quarter-stripe means over the decoded raster (same feature shape
    * as [[decodeStub]], derived from actual pixels). Undecodable
    * payloads are dropped.
    */
  def extractImageFeatures(media: DataFrame,
      batchSize: Int = 64): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap {
        case (id, payload) =>
          decodeImage(payload).map { case (w, h, px) =>
            val n = px.length
            def rangeMean(lo: Int, hi: Int): Double =
              if (hi <= lo) 0.0
              else {
                var s = 0L
                var i = lo
                while (i < hi) { s += px(i); i += 1 }
                s.toDouble / (hi - lo)
              }
            ImageFeatures(id, w, h, rangeMean(0, n),
              rangeMean(0, n / 4), rangeMean(n / 4, n / 2),
              rangeMean(n / 2, 3 * n / 4), rangeMean(3 * n / 4, n))
          }
      }))
  }

  /** The driver-facing query: generate PNGs, decode them with the real
    * JDK reader, return the pixel statistics. */
  def decodeQuery(docs: DataFrame): DataFrame =
    extractImageFeatures(pngMediaFromDocuments(docs))
      .toDF().orderBy(col("media_id"))

  /** Generated-audio geometry: 64 samples of 16-bit mono PCM keeps
    * payloads tiny and every mean below a division by a power of two
    * (64, 16) — IEEE-exact, so the decoded statistics hash-match the
    * oracle's closed form bit-for-bit.
    */
  val AudioSamples = 64
  val AudioRate = 8000

  /** Deterministic 16-bit signed mono PCM WAV for `id`: sample `i`
    * carries value `floorMod(id*37 + i*13, 65536) - 32768`. The formula
    * IS the oracle contract — [[graft.OracleSql]] recomputes the same
    * statistics from it without decoding anything, so the
    * encode→decode round trip is verified end-to-end against an
    * independent engine. Encoding goes through the real JDK WAV writer
    * (`AudioSystem.write`), not a hand-rolled RIFF header, so the
    * fixture exercises the same container format a real corpus would.
    * floorMod, not `%`: a negative id under truncated `%` yields values
    * below -32768, which the 16-bit write would wrap mod 2^16 while
    * the oracle computes unwrapped — the contract must be total over
    * ALL ids, not just the generated non-negative ones.
    */
  def wavPayload(id: Long): Array[Byte] = {
    val data = new Array[Byte](AudioSamples * 2)
    var i = 0
    while (i < AudioSamples) {
      val v = (Math.floorMod(id * 37 + i * 13, 65536L) - 32768).toInt
      // little-endian, matching the AudioFormat below
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      AudioRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, AudioSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real JDK decode: (sampleRate, channels, interleaved samples), or
    * None when the payload is not a decodable audio container —
    * corrupt blobs must skip cleanly, not kill the task. Handles the
    * PCM encodings the JDK readers emit (8-bit signed/unsigned, 16-bit
    * signed either endianness); exotic encodings decode as None rather
    * than silently wrong samples.
    */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val bytes = ais.readAllBytes()
        val enc = fmt.getEncoding
        import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
        val samples: Option[Array[Int]] = fmt.getSampleSizeInBits match {
          case 16 if enc == PCM_SIGNED && bytes.length % 2 == 0 =>
            val n = bytes.length / 2
            val out = new Array[Int](n)
            var i = 0
            while (i < n) {
              val (lo, hi) =
                if (fmt.isBigEndian) (bytes(2 * i + 1), bytes(2 * i))
                else (bytes(2 * i), bytes(2 * i + 1))
              // sign comes from the high byte; the shift-back keeps it
              out(i) = ((hi << 8) | (lo & 0xff)).toShort.toInt
              i += 1
            }
            Some(out)
          case 8 if enc == PCM_SIGNED => Some(bytes.map(_.toInt))
          case 8 if enc == PCM_UNSIGNED => Some(bytes.map(b => (b & 0xff) - 128))
          case _ => None
        }
        samples.map(s => (fmt.getSampleRate.toInt, fmt.getChannels, s))
      } finally ais.close()
    } catch {
      // the JDK audio readers throw UnsupportedAudioFileException on
      // unrecognized containers but also unchecked exceptions on
      // truncated/hostile bodies behind a valid RIFF magic — same
      // containment rationale as [[decodeImage]]
      case scala.util.control.NonFatal(_) => None
    }

  case class AudioFeatures(
      media_id: Long, sample_rate: Int, n_samples: Long, amp_mean: Double,
      stripe0: Double, stripe1: Double, stripe2: Double, stripe3: Double,
      peak: Int)

  /** Documents-derived WAV media frame: one real encoded waveform per
    * document. Partition-local generation — the fixture-writer side of
    * the decode round trip.
    */
  def wavMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, wavPayload(id))))
      .toDF("media_id", "payload")
  }

  /** Batched partition-local REAL audio decode: amplitude mean plus
    * four quarter-stripe means and the peak magnitude over the decoded
    * samples (same feature shape as the image path, derived from actual
    * PCM). Undecodable payloads are dropped.
    */
  def extractAudioFeatures(media: DataFrame,
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap {
        case (id, payload) =>
          decodeAudio(payload).map { case (rate, _, smp) =>
            val n = smp.length
            def rangeMean(lo: Int, hi: Int): Double =
              if (hi <= lo) 0.0
              else {
                var s = 0L
                var i = lo
                while (i < hi) { s += smp(i); i += 1 }
                s.toDouble / (hi - lo)
              }
            var peak = 0
            var i = 0
            while (i < n) { val a = math.abs(smp(i)); if (a > peak) peak = a; i += 1 }
            AudioFeatures(id, rate, n.toLong, rangeMean(0, n),
              rangeMean(0, n / 4), rangeMean(n / 4, n / 2),
              rangeMean(n / 2, 3 * n / 4), rangeMean(3 * n / 4, n), peak)
          }
      }))
  }

  /** The driver-facing query: generate WAVs, decode them with the real
    * JDK reader, return the sample statistics. */
  def audioDecodeQuery(docs: DataFrame): DataFrame =
    extractAudioFeatures(wavMediaFromDocuments(docs))
      .toDF().orderBy(col("media_id"))

  case class MediaSample(
      media_id: Long, n_frames: Long, kept_frames: Long,
      strided_len: Long, strided_md5: String)

  /** STUB resize + frame-sample: a "frame" is a fixed `frameBytes`
    * chunk of the payload; sampling keeps every `everyK`-th frame;
    * "resize" is a byte stride (every `strideK`-th byte). Real codecs
    * replace the byte arithmetic with pixel/frame ops — the chunking,
    * striding, and batched partition-local shape is what carries over.
    */
  def sampleStub(mediaId: Long, payload: Array[Byte],
      frameBytes: Int, everyK: Int, strideK: Int): MediaSample = {
    val n = payload.length
    val nFrames = (n + frameBytes - 1) / frameBytes
    val kept = (nFrames + everyK - 1) / everyK
    val strided = Iterator.range(0, n, strideK).map(payload(_)).toArray
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(strided).map("%02x".format(_)).mkString
    MediaSample(mediaId, nFrames.toLong, kept.toLong, strided.length.toLong, md5)
  }

  def sampleFeatures(media: DataFrame, frameBytes: Int = 256,
      everyK: Int = 3, strideK: Int = 4,
      batchSize: Int = 64): Dataset[MediaSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    // null payloads drop before the sampler — see extractFeatures
    media.select(col("media_id"), col("payload"))
      .filter(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, p) =>
        sampleStub(id, p, frameBytes, everyK, strideK)
      }))
  }

  def sampleQuery(docs: DataFrame): DataFrame =
    sampleFeatures(mediaFromDocuments(docs)).toDF().orderBy(col("media_id"))
}
