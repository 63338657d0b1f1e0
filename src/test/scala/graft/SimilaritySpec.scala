package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSuite {

  private def vecs(rows: (Long, Seq[Float])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def pad(v: Seq[Float]): Seq[Float] =
    v ++ Seq.fill(Similarity.LshDims - v.size)(0.0f)

  test("brute-force knn ranks by cosine with deterministic tie-break") {
    val d = vecs(
      0L -> pad(Seq(1f, 0f)),
      1L -> pad(Seq(1f, 0.1f)),   // closest to 0
      2L -> pad(Seq(0f, 1f)),     // orthogonal
      3L -> pad(Seq(-1f, 0f)))    // opposite
    val r = rowsOf(Similarity.knnBruteForce(d, d.filter(col("vec_id") === 0), 3))
    assert(r.map(_("neighbor_id")) == Seq(1L, 2L, 3L))
    assert(r.head("score").asInstanceOf[Double] > 0.99)
  }

  test("lsh knn achieves high recall vs brute force on fixture embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
    val exact = rowsOf(Similarity.knnBruteForce(e, q, 5))
      .map(r => (r("query_id"), r("neighbor_id"))).toSet
    val approx = rowsOf(Similarity.knnLsh(e, q, 5, tables = 8, planes = 4))
      .map(r => (r("query_id"), r("neighbor_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("zero vectors score 0 instead of NaN-poisoning top-k") {
    val d = vecs(
      0L -> pad(Seq(1f, 0f)),
      1L -> pad(Seq(0.9f, 0.1f)),
      2L -> Seq.fill(Similarity.LshDims)(0.0f)) // failed-encode stand-in
    val r = rowsOf(Similarity.knnBruteForce(d, d.filter(col("vec_id") === 0), 2))
    // the real neighbor ranks first; the zero vector scores 0.0, not NaN
    assert(r.head("neighbor_id") == 1L)
    val zeroRow = r.find(_("neighbor_id") == 2L).get
    assert(zeroRow("score").asInstanceOf[Double] == 0.0)
  }

  test("ivf knn: candidates come from probed cells, reasonable recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
    val exact = rowsOf(Similarity.knnBruteForce(e, q, 5))
      .map(r => (r("query_id"), r("neighbor_id"))).toSet
    val ivf = rowsOf(Similarity.knnIvf(e, q, 5, nCentroids = 16, nProbes = 8))
    assert(ivf.nonEmpty && ivf.forall(_("rank").asInstanceOf[Int] <= 5))
    val recall = exact.intersect(
      ivf.map(r => (r("query_id"), r("neighbor_id"))).toSet).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall too low: $recall")
  }

  test("ivf-pq: codes well-formed, ADC equals reconstructed dot, recall holds") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
    val m = 8; val ksub = 16
    val pq = Similarity.trainPqCodebook(e, m, ksub, iters = 2)
    // codebook shape: m subspaces × ≤ksub cells × dims/m components
    assert(pq.length == m && pq.forall(_.nonEmpty) &&
      pq.forall(_.forall(_.size == pq(0)(0).size)))
    // every vector encodes to m in-range codes (projection, no shuffle)
    val codes = rowsOf(Similarity.encodePq(e, pq))
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r("codes").asInstanceOf[scala.collection.Seq[Int]]
      assert(cs.size == m && cs.forall(c => c >= 0 && c < ksub), s"codes: $cs")
    }
    // the ADC identity the LUT construction promises: for any query,
    // sum of per-subspace LUT lookups == dot(query, decode(codes)) —
    // checked in driver arithmetic on a handful of rows
    val qunit = rowsOf(Similarity.withUnit(q).select(col("vec_id"), col("unit")))
      .map(r => r("vec_id").asInstanceOf[Long] ->
        r("unit").asInstanceOf[scala.collection.Seq[Double]]).toMap
    val dsub = pq(0)(0).size
    codes.take(5).foreach { r =>
      val cs = r("codes").asInstanceOf[scala.collection.Seq[Int]]
      val decoded = (0 until m).flatMap(mi => pq(mi)(cs(mi)))
      qunit.values.take(2).foreach { qv =>
        val adc = (0 until m).map(mi =>
          (0 until dsub).map(d => qv(mi * dsub + d) * pq(mi)(cs(mi))(d)).sum).sum
        val full = qv.zip(decoded).map { case (a, b) => a * b }.sum
        assert(math.abs(adc - full) < 1e-9)
      }
    }
    // end-to-end: exact output columns, exact re-ranked scores, recall
    // vs brute force at the _trained gate level
    val exact = rowsOf(Similarity.knnBruteForce(e, q, 5))
      .map(r => (r("query_id"), r("neighbor_id"))).toSet
    val got = rowsOf(Similarity.knnIvfPq(e, q, 5, nProbes = 8))
    assert(got.nonEmpty && got.forall(_("rank").asInstanceOf[Int] <= 5))
    val recall = exact.intersect(
      got.map(r => (r("query_id"), r("neighbor_id"))).toSet).size.toDouble /
      exact.size
    assert(recall >= 0.3, s"IVF-PQ recall too low: $recall")
    // emitted scores are EXACT dots (the refine stage re-scored them):
    // every returned (query, neighbor) score matches brute force's
    val bf = rowsOf(Similarity.knnBruteForce(e, q, 1000))
      .map(r => (r("query_id"), r("neighbor_id")) -> r("score")).toMap
    got.foreach { r =>
      val key = (r("query_id"), r("neighbor_id"))
      assert(bf(key) == r("score"), s"refined score not exact at $key")
    }
  }

  test("ivf-pq persisted index: listing-pruned probes, inline-identical results") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
    val pq = Similarity.trainPqCodebook(e, 8, 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-index").toString
    try {
      Similarity.writePqIndex(e, dir,
        pqBook = Some(Similarity.PqBook(pq, residual = false)))
      // sidecars exist: codes partitioned by cell + the two codebooks
      val parts = new java.io.File(s"$dir/codes").listFiles()
        .map(_.getName).filter(_.startsWith("cid="))
      assert(parts.nonEmpty, "codes table not partitioned by cid")
      val viaIndex = Similarity.knnIvfPqIndexed(dir, e, q, 5, nProbes = 4)
      val inline = Similarity.knnIvfPq(e, q, 5, nProbes = 4,
        pqBook = Some(Similarity.PqBook(pq, residual = false)))
      val parity = rowsOf(viaIndex) == rowsOf(inline)
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(viaIndex)
      assert(parity)
      // the probe prune is STATIC partition pruning: the codes scan
      // carries the cid predicate under PartitionFilters (files of
      // unprobed cells are never listed), with no cast on the
      // partition column to defeat it
      val plan = viaIndex.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pf = plan.linesIterator
        .filter(_.contains("PartitionFilters")).toList
      assert(pf.exists(l => l.contains("cid") && l.contains("IN")),
        s"no cid partition filter on the codes scan:\n$plan")
      // exactly THREE shuffle exchanges end to end: one query_id
      // repartition serving BOTH the ADC replay-collapse aggregate and
      // the k*refine rank window (the r13 shape hashed the aggregate
      // on (query_id, neighbor_id) and re-exchanged for the window),
      // one for the exact-re-rank window, one for the final orderBy.
      // The frame was executed above, so count in the adaptive plan's
      // FINAL section only (the trailing Initial Plan echo would
      // double-count every exchange).
      val finalPlan = plan.indexOf("== Initial Plan ==") match {
        case -1 => plan
        case i  => plan.substring(0, i)
      }
      val shuffles = raw"\bExchange \(\d+\)".r.findAllIn(finalPlan).length
      assert(shuffles == 3,
        s"ivf-pq probe shuffle count drifted ($shuffles != 3):\n$finalPlan")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  /** Driver-side reconstruction audit over a persisted PQ index:
    * mean |dot(q, x) − estimate| where
    * est_plain(q,x) = Σ_m dot(q_sub, pq[m][code_m]) and
    * est_resid(q,x) = dot(q, coarse[cid]) + Σ_m dot(q_sub, pqr[m][code_m]).
    */
  private def meanPqErr(dir: String, residual: Boolean,
      qunits: Seq[scala.collection.Seq[Double]],
      units: Map[Long, scala.collection.Seq[Double]]): Double = {
    val coarse = rowsOf(spark.read.parquet(s"$dir/coarse_book"))
      .map(r => r("cid").asInstanceOf[Long] ->
        r("cunit").asInstanceOf[scala.collection.Seq[Double]]).toMap
    val pqRows = rowsOf(spark.read.parquet(s"$dir/pq_book"))
      .map(r => (r("mq").asInstanceOf[Int], r("cell").asInstanceOf[Int]) ->
        r("sub").asInstanceOf[scala.collection.Seq[Double]]).toMap
    val codes = rowsOf(spark.read.parquet(s"$dir/codes"))
      .map(r => (r("vec_id").asInstanceOf[Long],
        r("codes").asInstanceOf[scala.collection.Seq[Int]],
        r("cid").toString.toLong))
    val m = pqRows.keys.map(_._1).max + 1
    val dsub = pqRows((0, 0)).size
    val errs = for {
      qv <- qunits
      (vid, cs, cid) <- codes
    } yield {
      val exact = qv.zip(units(vid)).map { case (a, b) => a * b }.sum
      val adc = (0 until m).map(mi =>
        (0 until dsub).map(d =>
          qv(mi * dsub + d) * pqRows((mi, cs(mi)))(d)).sum).sum
      val base =
        if (residual) qv.zip(coarse(cid)).map { case (a, b) => a * b }.sum
        else 0.0
      math.abs(exact - (base + adc))
    }
    errs.sum / errs.size
  }

  private def unitMap(df: DataFrame): Map[Long, scala.collection.Seq[Double]] =
    rowsOf(Similarity.withUnit(df).select(col("vec_id"), col("unit")))
      .map(r => r("vec_id").asInstanceOf[Long] ->
        r("unit").asInstanceOf[scala.collection.Seq[Double]]).toMap

  test("residual PQ: indexed == inline, meta round-trips, estimates sane") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
    val dirP = java.nio.file.Files.createTempDirectory("graft-pq-plain").toString
    val dirR = java.nio.file.Files.createTempDirectory("graft-pq-resid").toString
    try {
      // the trained spherical-k-means book — the honest production
      // configuration for residual encoding (the first-16 stand-in's
      // "centroids" are not cell means; residuals against them
      // measurably WORSEN reconstruction: 0.142 vs 0.074 when this
      // spec first ran that way)
      val coarse = Similarity.trainCentroids(e, k = 16, iters = 3)
      Similarity.writePqIndex(e, dirP, residual = false,
        centroids = Some(coarse))
      Similarity.writePqIndex(e, dirR, residual = true,
        centroids = Some(coarse))
      val units = unitMap(e)
      val qunits = (0L until 8L).map(units)
      val errPlain = meanPqErr(dirP, residual = false, qunits, units)
      val errResid = meanPqErr(dirR, residual = true, qunits, units)
      // on THIS fixture cells are loose (quasi-uniform embeddings:
      // residual magnitudes rival the raw vectors) and residual does
      // NOT win — measured 0.091 vs 0.074. Corpus-dependent, not a
      // bug; the tight-cluster test below shows the designed-for flip.
      // Here pin only sanity; the win/lose relation belongs there.
      info(s"loose cells: plain=$errPlain residual=$errResid")
      assert(errPlain > 0 && errPlain < 0.5 && errResid > 0 && errResid < 0.5)
      // the residual indexed path scores with the centroid add-back
      // (recorded in the meta sidecar) and matches the inline residual
      // path exactly — both train the same deterministic books
      val viaIndex = Similarity.knnIvfPqIndexed(dirR, e, q, 5, nProbes = 8)
      val inline = Similarity.knnIvfPq(e, q, 5, nProbes = 8, residual = true,
        centroids = Some(Similarity.trainCentroids(e, k = 16, iters = 3)))
      val parity = rowsOf(viaIndex) == rowsOf(inline)
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(viaIndex)
      assert(parity)
      val exactTop = rowsOf(Similarity.knnBruteForce(e, q, 5))
        .map(r => (r("query_id"), r("neighbor_id"))).toSet
      val recall = exactTop.intersect(rowsOf(inline)
        .map(r => (r("query_id"), r("neighbor_id"))).toSet).size.toDouble /
        exactTop.size
      assert(recall >= 0.3, s"residual IVF-PQ recall too low: $recall")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirP))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirR))
    }
  }

  test("provided pqBook: mismatched coarse book and geometry refused loudly") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 4)
    val coarseA = Similarity.trainCentroids(e, k = 16, iters = 2)
    val coarseB = Similarity.trainCentroids(e, k = 16, iters = 3) // different
    val residBook = Similarity.trainPq(e, residual = true,
      centroids = Some(coarseA))
    assert(residBook.coarseKey.isDefined)
    // same coarse book → accepted
    Similarity.knnIvfPq(e, q, 3, residual = true,
      centroids = Some(coarseA), pqBook = Some(residBook)).collect()
    // different coarse book → the silent-mis-rank hazard, refused
    val exCoarse = intercept[IllegalArgumentException] {
      Similarity.knnIvfPq(e, q, 3, residual = true,
        centroids = Some(coarseB), pqBook = Some(residBook)).collect()
    }
    assert(exCoarse.getMessage.contains("coarse"))
    // explicit geometry contradicting the book → refused; defaults pass
    val raw = Similarity.trainPq(e, m = 4, ksub = 8)
    Similarity.knnIvfPq(e, q, 3, pqBook = Some(raw)).collect()
    val exGeom = intercept[IllegalArgumentException] {
      Similarity.knnIvfPq(e, q, 3, m = 16, ksub = 32,
        pqBook = Some(raw)).collect()
    }
    assert(exGeom.getMessage.contains("geometry"))
  }

  test("residual PQ cuts reconstruction error when clusters outnumber sub-cells") {
    // the corpus residual PQ is designed for: MANY tight clusters —
    // more than ksub, so plain PQ cannot memorize the sub-center
    // modes (64 modes per subspace vs 16 cells) while residual only
    // quantizes the small noise around each center. 64 deterministic
    // pseudo-random unit centers, 10 vectors each, noise ~0.1.
    val s = spark
    import s.implicits._
    def lcg(idx: Long): Float =
      (((1103515245L * idx + 12345L) % 2147483647L) % 2001L - 1000L) / 1000.0f
    val centers: IndexedSeq[IndexedSeq[Float]] = (0 until 64).map { c =>
      val raw = (0 until 64).map(d => lcg(7919L * c + d))
      val n = math.sqrt(raw.map(x => x * x.toDouble).sum).toFloat
      raw.map(_ / n)
    }
    // id i → cluster i % 64: the lowest-id k-means seeds see one
    // vector per cluster
    val rows = (0L until 640L).map { i =>
      val c = (i % 64).toInt
      i -> (0 until 64).map(d =>
        centers(c)(d) + lcg(104729L * i + d) * 0.1f).toSeq
    }
    val e = rows.toDF("vec_id", "embedding")
    val dirP = java.nio.file.Files.createTempDirectory("graft-pqt-plain").toString
    val dirR = java.nio.file.Files.createTempDirectory("graft-pqt-resid").toString
    try {
      val coarse = Similarity.trainCentroids(e, k = 64, iters = 3)
      Similarity.writePqIndex(e, dirP, residual = false,
        centroids = Some(coarse))
      Similarity.writePqIndex(e, dirR, residual = true,
        centroids = Some(coarse))
      val units = unitMap(e)
      val qunits = (0L until 8L).map(units)
      val errPlain = meanPqErr(dirP, residual = false, qunits, units)
      val errResid = meanPqErr(dirR, residual = true, qunits, units)
      info(s"64 tight clusters: plain=$errPlain residual=$errResid")
      assert(errResid < errPlain,
        s"residual did not win on tight clusters: $errResid >= $errPlain")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirP))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirR))
    }
  }

  test("k-means-trained centroids keep IVF recall and partition every vector") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 8)
    val trained = Similarity.trainCentroids(e, k = 16, iters = 3)
    assert(trained.count() == 16)
    // unit-length centroids (cosine geometry)
    val norms = rowsOf(trained.select(
      Similarity.dot(col("cunit"), col("cunit")).as("n2")))
    assert(norms.forall(r => math.abs(r("n2").asInstanceOf[Double] - 1.0) < 1e-9))
    val exact = rowsOf(Similarity.knnBruteForce(e, q, 5))
      .map(r => (r("query_id"), r("neighbor_id"))).toSet
    val ivf = rowsOf(Similarity.knnIvf(e, q, 5, nProbes = 8,
      centroids = Some(trained)))
    val recall = exact.intersect(
      ivf.map(r => (r("query_id"), r("neighbor_id"))).toSet).size.toDouble / exact.size
    assert(recall >= 0.3, s"trained-IVF recall too low: $recall")
  }

  test("trained-centroid IVF holds pinned recall at sf0.1 (production path gate)") {
    // the production path: k-means-trained codebook, not the
    // deterministic stand-in the oracle uses. The oracle cannot cover
    // it (float avg fold order differs across engines), so this pinned
    // recall-vs-brute-force gate at the driver's bench SF is the
    // CI-visible check that the trained path answers correctly.
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val q = e.filter(col("vec_id") < 16)
    val trained = Similarity.trainCentroids(e, k = 16, iters = 3)
    val exact = rowsOf(Similarity.knnBruteForce(e, q, 5))
      .map(r => (r("query_id"), r("neighbor_id"))).toSet
    val ivf = rowsOf(Similarity.knnIvf(e, q, 5, nProbes = 8,
      centroids = Some(trained)))
    // every vector lands in exactly one of the 16 cells
    assert(ivf.nonEmpty && ivf.forall(_("rank").asInstanceOf[Int] <= 5))
    val recall = exact.intersect(
      ivf.map(r => (r("query_id"), r("neighbor_id"))).toSet).size.toDouble / exact.size
    assert(recall >= 0.8, s"trained-IVF sf0.1 recall regressed: $recall")
  }

  test("ivf knn on an empty corpus returns an empty result, not an error") {
    val e = vecs()
    val r = Similarity.knnIvf(e, e, 5)
    assert(r.count() == 0)
    assert(r.columns.toSeq == Seq("query_id", "rank", "neighbor_id", "score"))
  }

  test("semanticContamination flags near-eval train vectors with argmax eval") {
    val eval = vecs(
      0L -> pad(Seq(1f, 0f)),
      1L -> pad(Seq(0f, 1f)))
    val train = vecs(
      100L -> pad(Seq(0.95f, 0.05f)),  // on top of eval 0
      101L -> pad(Seq(0.1f, 0.9f)),    // on top of eval 1
      102L -> pad(Seq(0f, 0f, 1f)),    // orthogonal to both: clean
      103L -> pad(Seq(0.7f, 0.7f)))    // diagonal: cos ~0.707 to BOTH
    val r = rowsOf(Similarity.semanticContamination(train, eval, 0.6))
    assert(r.map(_("train_id")) == Seq(100L, 101L, 103L)) // 102 clean; ordered
    val m = r.map(x => x("train_id") -> x).toMap
    assert(m(100L)("n_eval_hits") == 1L && m(100L)("top_eval_id") == 0L)
    assert(m(101L)("n_eval_hits") == 1L && m(101L)("top_eval_id") == 1L)
    // collides with both; the exact-equal diagonal scores tie → eval 0
    assert(m(103L)("n_eval_hits") == 2L && m(103L)("top_eval_id") == 0L)
    assert(r.forall(_("top_score").asInstanceOf[Double] >= 0.6))
  }

  test("semanticContamination argmax ties break toward the smaller eval id") {
    val eval = vecs(0L -> pad(Seq(1f, 0f)), 1L -> pad(Seq(1f, 0f)))
    val train = vecs(100L -> pad(Seq(1f, 0f)))
    val r = rowsOf(Similarity.semanticContamination(train, eval, 0.5))
    assert(r.size == 1 && r.head("n_eval_hits") == 2L &&
      r.head("top_eval_id") == 0L)
  }

  test("embeddingAudit counts nulls, wrong dims, zero norms; fixture is clean") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(Seq(
      Row(1L, Seq.fill(4)(0.5f)),  // well-formed, norm exactly 1.0
      Row(2L, null),               // failed encode
      Row(3L, Seq.fill(3)(1.0f)),  // wrong model dimension
      Row(4L, Seq.fill(4)(0.0f)),  // zero norm
      Row(5L, Seq(0.5f, null, 0.5f, 0.5f)) // element null: size passes,
                                   // DotProductExpr would skip the dim
    ).asJava, schema)
    val a = rowsOf(Similarity.embeddingAudit(df, dims = 4)).head
    assert(a("n_vectors") == 5L)
    assert(a("n_null_vec") == 1L)
    assert(a("n_wrong_dim") == 1L)
    assert(a("n_element_null") == 1L)
    assert(a("n_zero_norm") == 1L)
    // norms only over FULLY well-formed rows: the element-null row's
    // partial norm (0.866) must not pollute min/max
    assert(a("min_norm") == 0.0)
    assert(a("max_norm") == 1.0)
    // the driver fixture must audit clean — this doubles as an env guard
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = rowsOf(Similarity.embeddingAudit(e)).head
    assert(r("n_vectors").asInstanceOf[Long] == e.count())
    assert(r("n_null_vec") == 0L && r("n_wrong_dim") == 0L &&
      r("n_element_null") == 0L && r("n_zero_norm") == 0L)
    assert(r("min_norm").asInstanceOf[Double] > 0.0)
  }

  test("embedding hygiene: dirty vectors never rank, band, or reach a codebook") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dims = Similarity.LshDims
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def basis(i: Int) = Seq.tabulate(dims)(d => if (d == i) 1.0f else 0.0f)
    val rows: Seq[Row] = (0 until 6).map(i => Row(i.toLong, basis(i % 3))) ++
      Seq(Row(96L, null), // whole-null
        Row(97L, Seq.tabulate(dims)(d =>
          if (d == 0) null else Float.box(0.1f))), // element-null: would
          // become a stand-in centroid (vec_id order puts low ids first,
          // but collectCoarseBook takes lowest AFTER the unitIndex gate)
        Row(98L, Seq.fill(dims)(0.0f))) // zero norm
    val d = spark.createDataFrame(rows.asJava, schema)
    // brute force: dirty vectors neither query nor candidate — no
    // null-score rows, no null neighbors
    val bf = rowsOf(Similarity.knnBruteForce(d, d, 3))
    assert(bf.nonEmpty)
    assert(!bf.exists(r => r("query_id") == 96L || r("query_id") == 97L ||
      r("neighbor_id") == 96L || r("neighbor_id") == 97L))
    assert(bf.forall(_("score") != null))
    // zero-norm vectors never enter the near-pair band tables (the
    // sig=0 degenerate bucket), and dirty vectors produce no pairs
    val pairs = rowsOf(Similarity.lshNearPairs(d, threshold = 0.35))
    assert(pairs.forall(p => p("vec_a").asInstanceOf[Long] < 90L &&
      p("vec_b").asInstanceOf[Long] < 90L))
    assert(pairs.nonEmpty) // the basis duplicates still pair up
    // the coarse book never carries a null element (the element-null
    // vector is gated before the driver collect)
    val book = Similarity.coarseBook(d, nCentroids = 4)
    assert(book.nonEmpty)
    assert(book.forall(b => !b._2.contains(null)))
    intercept[IllegalArgumentException](
      Similarity.lshNearPairs(d, threshold = 0.0))
  }

  test("diverseSample: every vector once, per-cell caps, repartition-stable") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val quota = 10
    val r = rowsOf(Similarity.diverseSample(e, quota = quota))
    // exactly one verdict per vector
    assert(r.map(_("vec_id")).distinct.size == r.size)
    assert(r.size == e.count())
    // cell accounting: cell_n is the cell's population; kept per cell
    // is min(quota, cell_n) — the quota binds tight, never over
    val byCell = r.groupBy(_("cid"))
    byCell.foreach { case (cid, rows) =>
      val n = rows.head("cell_n").asInstanceOf[Long]
      assert(rows.size.toLong == n, s"cell_n mismatch in cell $cid")
      val kept = rows.count(_("kept").asInstanceOf[Boolean]).toLong
      assert(kept == math.min(quota.toLong, n), s"cell $cid kept $kept of $n")
    }
    // the sample is a membership decision, not an artifact of physical
    // layout: a different partitioning draws the identical sample
    val re = rowsOf(Similarity.diverseSample(e.repartition(7), quota = quota))
    assert(re.toSet == r.toSet)
    // empty corpus: empty frame with the contract columns
    val empty = Similarity.diverseSample(vecs(), quota = quota)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("vec_id", "cid", "cell_n", "kept"))
  }

  test("lsh near pairs returns only pairs above threshold, ordered") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = rowsOf(Similarity.lshNearPairs(e, threshold = 0.3))
    assert(pairs.forall(_("score").asInstanceOf[Double] >= 0.3))
    assert(pairs.forall(p => p("vec_a").asInstanceOf[Long] < p("vec_b").asInstanceOf[Long]))
  }

  test("semantic keep: one representative per epsilon-ball cluster") {
    try {
      // 0≈1≈2 form one semantic cluster (chained — 0 and 2 connect
      // through 1 even if not directly paired), 3 is orthogonal, 4 is
      // opposite: three clusters, representatives 0, 3, 4
      val d = vecs(
        0L -> pad(Seq(1f, 0f)),
        1L -> pad(Seq(1f, 0.05f)),
        2L -> pad(Seq(1f, 0.1f)),
        3L -> pad(Seq(0f, 1f)),
        4L -> pad(Seq(-1f, 0f)))
      val r = rowsOf(Similarity.semanticKeep(d, threshold = 0.9))
      assert(r.map(_("vec_id")) == Seq(0L, 1L, 2L, 3L, 4L))
      assert(r.map(_("cluster")) == Seq(0L, 0L, 0L, 3L, 4L))
      assert(r.filter(_("kept") == true).map(_("vec_id")) == Seq(0L, 3L, 4L))
      // kept representatives = distinct clusters, always (the invariant
      // downstream dedup relies on), checked on the real fixture too
      val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val real = rowsOf(Similarity.semanticKeep(e, threshold = 0.3))
      assert(real.nonEmpty)
      assert(real.filter(_("kept") == true).map(_("vec_id")).toSet ==
        real.map(_("cluster")).toSet)
    } finally {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
  }

  test("semantic keep noise floor: telemetry separates healthy from welded") {
    // The q_semantic_keep registry comment made executable: a
    // threshold ABOVE the fixture's noise floor (0.4) yields small
    // epsilon-balls and a shallow propagation; one AT/BELOW it welds
    // most of the corpus into giant components whose diameter drags
    // the loop through more rounds. The floor is SF-dependent — the
    // sf0.1 fixture the registry comment describes welds at 0.35; this
    // suite's sf0.001 slice (1000 vectors, sparser pair graph) welds
    // at 0.2 (measured: 2 clusters, max 500, rounds 4 vs 938 clusters,
    // max 3, rounds 2 healthy). The observe node carries (n_vectors,
    // n_kept) with every action, so an operator dashboard sees the
    // collapse without a second job.
    try {
      val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      def run(threshold: Double): (Long, Long, Long, Int) = {
        val (df, rounds) = Similarity.semanticKeepCounted(e, threshold = threshold)
        val rows = rowsOf(df)
        val metrics = df.queryExecution.observedMetrics("semantic_keep")
        val maxCluster = rows.groupBy(_("cluster")).values.map(_.size).max
        (metrics.getAs[Long]("n_vectors"), metrics.getAs[Long]("n_kept"),
          maxCluster.toLong, rounds)
      }
      val (nVec, keptHealthy, maxHealthy, roundsHealthy) = run(0.4)
      val (nVec2, keptWelded, maxWelded, roundsWelded) = run(0.2)
      info(s"healthy: kept=$keptHealthy max=$maxHealthy rounds=$roundsHealthy; " +
        s"welded: kept=$keptWelded max=$maxWelded rounds=$roundsWelded")
      assert(nVec == nVec2 && nVec > 0)
      // healthy regime: clusters stay epsilon-ball sized
      assert(maxHealthy <= 32L, s"healthy max cluster: $maxHealthy")
      // noise floor: a giant component swallows a large fraction of
      // the corpus (bound left slack — the exact split is fixture
      // detail, the collapse is the invariant)
      assert(maxWelded >= nVec / 3, s"welded max cluster: $maxWelded of $nVec")
      // ...far fewer representatives survive...
      assert(keptWelded < keptHealthy, s"$keptWelded >= $keptHealthy")
      // ...and its diameter costs extra (jump-accelerated) rounds
      assert(roundsWelded >= roundsHealthy,
        s"rounds: welded=$roundsWelded healthy=$roundsHealthy")
    } finally {
      // semanticKeep's plan embeds label checkpoints (the documented
      // storage contract); restore the suite's clean-session invariant
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
  }

  test("an empty-corpus index builds, compacts, appends loudly, probes empty") {
    // a nightly rebuild over a fully-filtered corpus slice must yield
    // a WORKING empty index: build succeeds, the scheduled
    // compactPqIndex maintenance pass succeeds (an empty
    // hive-partitioned generation used to write only _SUCCESS — no
    // schema-bearing part file — and the compact's read-back died with
    // UNABLE_TO_INFER_SCHEMA), probes return empty, and appends stay
    // loud (codes encoded against no book are undefined)
    val dir = java.nio.file.Files.createTempDirectory("graft-emptyidx").toString
    try {
      val none = vecs()
      val some = vecs(0L -> pad(Seq(1f, 0f)))
      Similarity.writePqIndex(none, dir)
      Similarity.compactPqIndex(spark, dir)
      assert(rowsOf(Similarity.knnIvfPqIndexed(dir, none, some, k = 3)).isEmpty)
      val e = intercept[IllegalArgumentException](
        Similarity.appendToPqIndex(some, dir))
      assert(e.getMessage.contains("no coarse book"), e.getMessage)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("withSemanticKeep scopes the label checkpoint to the caller's body") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def persisted = spark.sparkContext.getPersistentRDDs.keySet
    // force the iterative propagation path: the scoped-release
    // contract under test only materializes a label checkpoint there
    // (this fixture's pair graph takes the checkpoint-free driver
    // closure otherwise)
    System.setProperty("graft.driverEdgeCap", "0")
    try {
      var ids: Seq[Int] = Nil
      val kept = Similarity.withSemanticKeep(e, threshold = 0.4) { verdicts =>
        ids = verdicts.queryExecution.analyzed.collect {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
        }
        val rows = rowsOf(verdicts)
        assert(ids.nonEmpty && ids.forall(persisted.contains),
          "label checkpoint should be live inside the scope")
        rows.count(_("kept") == true)
      }
      assert(kept > 0)
      assert(ids.forall(id => !persisted.contains(id)),
        "scoped exit must release the embedded label checkpoint")
    } finally System.clearProperty("graft.driverEdgeCap")
  }

  test("embeddingOutliers surfaces the lowest-centroid-cosine vectors") {
    // centroids = vecs 0,1 (the stand-in book). v2 hugs centroid 0;
    // v3 sits between both cells; v4 is anti-aligned with centroid 0
    // and orthogonal to centroid 1 => the corpus' worst-explained row
    val d = vecs(
      0L -> pad(Seq(1f, 0f)),
      1L -> pad(Seq(0f, 1f)),
      2L -> pad(Seq(1f, 0.1f)),
      3L -> pad(Seq(0.7f, 0.7f)),
      4L -> pad(Seq(-1f, 0f)))
    val r = rowsOf(Similarity.embeddingOutliers(d, k = 2, nCentroids = 2))
    assert(r.map(_("vec_id")) == Seq(4L, 3L))
    // v4's best cell is centroid 1 (cos 0); v3 ties both cells at
    // cos ~0.7071 and the first-max argmax resolves to the lower cid
    assert(r.map(_("cid")) == Seq(1L, 0L))
    assert(r.head("centroid_score") == 0.0)
    assert(r(1)("centroid_score").asInstanceOf[Double] == 0.707107)
  }

  test("contrastive triplets: best-neighbor positive, salted-hash negative") {
    // two tight pairs + one isolated vector
    val d = vecs(
      0L -> pad(Seq(1f, 0f)),
      1L -> pad(Seq(0.97f, 0.24f)),
      2L -> pad(Seq(0f, 1f)),
      3L -> pad(Seq(0.24f, 0.97f)),
      4L -> pad(Seq(-1f, -1f)))   // near nothing at threshold 0.4
    val r = rowsOf(Similarity.contrastiveTriplets(d, threshold = 0.4,
      negBuckets = 4, negSalt = 1))

    // expected from first principles: positives pair 0<->1 and 2<->3
    // (cosine-best partners); vector 4 is isolated, so never an anchor
    val positives = Map(0L -> 1L, 1L -> 0L, 2L -> 3L, 3L -> 2L)
    // independent bucket recompute with the engine's own hash column
    val bucketOf = rowsOf(d.select(col("vec_id"),
        graft.operators.CorpusOps.hashBucket(col("vec_id"), 4).as("b")))
      .map(m => m("vec_id").asInstanceOf[Long] ->
        m("b").asInstanceOf[Long]).toMap
    val minOfBucket = bucketOf.keys.toSeq.groupBy(bucketOf).view
      .mapValues(_.min).toMap
    val expected = positives.toSeq.sorted.flatMap { case (a, p) =>
      minOfBucket.get((bucketOf(a) + 1) % 4) match {
        case Some(neg) if neg != a && neg != p => Some((a, p, neg))
        case _ => None // empty salted bucket or collision: dropped
      }
    }
    assert(r.map(m => (m("anchor"), m("positive_id"), m("negative_id")))
      == expected, s"expected $expected")
    assert(r.nonEmpty)
    r.foreach(m => assert(m("pos_score").asInstanceOf[Double] >= 0.4))
    // fully deterministic: a second run yields identical triplets
    val again = rowsOf(Similarity.contrastiveTriplets(d, threshold = 0.4,
      negBuckets = 4, negSalt = 1))
    assert(again == r)
  }

  test("annRecall: exact anchors at 1.0, approximate paths bounded") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = rowsOf(Similarity.annRecall(emb, maxQueryId = 8, k = 3))
    assert(r.map(_("method")) == Seq("exact", "ivf", "lsh", "lsh_mp"))
    val byM = r.map(m => m("method") -> m).toMap
    assert(byM("exact")("n_hits") == 24L &&
      byM("exact")("recall") == 1.0)
    // multi-probe candidates are a superset of plain LSH candidates,
    // so its top-k recall can never be lower
    assert(byM("lsh_mp")("n_hits").asInstanceOf[Long] >=
      byM("lsh")("n_hits").asInstanceOf[Long])
    Seq("ivf", "lsh", "lsh_mp").foreach { m =>
      val rec = byM(m)("recall").asInstanceOf[Double]
      assert(rec > 0.0 && rec <= 1.0, s"$m recall $rec")
      assert(byM(m)("n_hits").asInstanceOf[Long] <= 24L)
      // recall is exactly hits/denominator — no float accumulation
      assert(rec == byM(m)("n_hits").asInstanceOf[Long].toDouble / 24.0)
    }
  }

  test("appendToPqIndex: appended vectors probe identically to a one-shot index") {
    val s = spark
    import s.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 =!= 0)
    val q = e.filter(col("vec_id") < 8)
    // one shared coordinate system: coarse + PQ books trained on A
    // only, passed explicitly to BOTH builds (append never retrains)
    val bookA = Similarity.coarseBook(a)
    val pqA = Similarity.PqBook(
      Similarity.trainPqCodebook(a, 8, 16, iters = 2), residual = false)
    val centDf = bookA.toSeq.toDF("cid", "cunit")
    val dirGrown = java.nio.file.Files.createTempDirectory("graft-pq-grow").toString
    val dirOneShot = java.nio.file.Files.createTempDirectory("graft-pq-once").toString
    try {
      Similarity.writePqIndex(a, dirGrown, centroids = Some(centDf),
        pqBook = Some(pqA))
      Similarity.appendToPqIndex(b, dirGrown)
      Similarity.writePqIndex(e, dirOneShot, centroids = Some(centDf),
        pqBook = Some(pqA))
      val grown = Similarity.knnIvfPqIndexed(dirGrown, e, q, 5, nProbes = 8)
      val once = Similarity.knnIvfPqIndexed(dirOneShot, e, q, 5, nProbes = 8)
      val g = rowsOf(grown); val o = rowsOf(once)
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(grown)
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(once)
      assert(g == o, "grown index diverged from one-shot index")
      // the appended half is actually visible: some neighbor is odd
      assert(g.exists(_("neighbor_id").asInstanceOf[Long] % 2 == 1),
        "no appended vector ever surfaced as a neighbor")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirGrown))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirOneShot))
    }
  }

  test("streaming pqIngest: appended batches probe like a one-shot index; replay cannot double a neighbor") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.filter(col("vec_id") % 2 === 0)
    val q = e.filter(col("vec_id") < 8)
    val bookA = Similarity.coarseBook(a)
    val pqA = Similarity.PqBook(
      Similarity.trainPqCodebook(a, 8, 16, iters = 2), residual = false)
    val centDf = bookA.toSeq.toDF("cid", "cunit")
    val dirS = java.nio.file.Files.createTempDirectory("graft-pq-stream").toString
    val dirO = java.nio.file.Files.createTempDirectory("graft-pq-oneshot").toString
    try {
      Similarity.writePqIndex(a, dirS, centroids = Some(centDf),
        pqBook = Some(pqA))
      Similarity.writePqIndex(e, dirO, centroids = Some(centDf),
        pqBook = Some(pqA))
      // stream the odd half in two micro-batches
      // null/degenerate embeddings don't index (unitIndex drops them)
      // and the tuple encoder rejects null arrays/elements — stream
      // only real vectors
      val rows = e.filter(col("vec_id") % 2 =!= 0 &&
          col("embedding").isNotNull &&
          !exists(col("embedding"), _.isNull))
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      val (b1, b2) = rows.partition(_._1 % 4 == 1)
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val stream = mem.toDF().toDF("vec_id", "embedding")
      val qy = graft.streaming.StreamingSimilarity.pqIngest(stream, dirS)()
      mem.addData(b1.toSeq: _*); qy.processAllAvailable()
      mem.addData(b2.toSeq: _*); qy.processAllAvailable()
      qy.stop()
      val streamed = Similarity.knnIvfPqIndexed(dirS, e, q, 5, nProbes = 8)
      val oneShot = Similarity.knnIvfPqIndexed(dirO, e, q, 5, nProbes = 8)
      val g = rowsOf(streamed); val o = rowsOf(oneShot)
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(streamed)
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(oneShot)
      assert(g == o, "streamed index diverged from one-shot index")
      // at-least-once replay: re-append batch 1 verbatim — duplicate
      // code rows must collapse, not occupy two top-k slots
      Similarity.appendToPqIndex(
        b1.toSeq.toDF("vec_id", "embedding"), dirS)
      val replayed = Similarity.knnIvfPqIndexed(dirS, e, q, 5, nProbes = 8)
      val r = rowsOf(replayed)
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(replayed)
      assert(r == o, "replayed append changed probe results")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirS))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirO))
    }
  }

  test("pq ingest: batchId appends are replay-idempotent; compaction folds them") {
    val s = spark
    import s.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 =!= 0)
    val q = e.filter(col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-gen").toString
    try {
      Similarity.writePqIndex(a, dir)
      def codesCount() = {
        val base = spark.read.parquet(s"$dir/codes").count()
        val ing = new java.io.File(s"$dir/codes_ingest")
        base + (if (ing.exists) spark.read.parquet(s"$dir/codes_ingest/*").count()
                else 0L)
      }
      Similarity.appendToPqIndex(b, dir, Some(0L))
      val once = codesCount()
      // at-least-once recovery replays the batch verbatim: the
      // per-batchId dir must rewrite, not grow the index
      Similarity.appendToPqIndex(b, dir, Some(0L))
      assert(codesCount() == once, "replayed PQ append duplicated code rows")
      def probe() = {
        val r = Similarity.knnIvfPqIndexed(dir, e, q, 5, nProbes = 8)
        val rows = rowsOf(r)
        org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(r)
        rows
      }
      val before = probe()
      assert(before.nonEmpty)
      // compaction folds ingest into a fresh cid-partitioned
      // generation; probes see identical rows and regain full
      // listing pruning (PartitionFilters pin below)
      Similarity.compactPqIndex(spark, dir)
      // one-cycle reader grace: the retired generation's dirs survive
      // the compaction that retired them (draining scans), die next
      assert(new java.io.File(s"$dir/codes_ingest").exists,
        "retired codes_ingest deleted immediately")
      assert(new java.io.File(s"$dir/codes_v1/_SUCCESS").exists,
        "compacted generation not committed")
      Similarity.compactPqIndex(spark, dir)
      assert(!new java.io.File(s"$dir/codes_ingest").exists &&
          !new java.io.File(s"$dir/codes").exists,
        "generation 0 outlived its grace cycle")
      assert(new java.io.File(s"$dir/codes_v2/_SUCCESS").exists)
      assert(new java.io.File(s"$dir/codes_v1").listFiles()
        .exists(_.getName.startsWith("cid=")),
        "compacted codes lost the cid partitioning")
      assert(probe() == before, "compaction changed probe results")
      val plan = {
        val r = Similarity.knnIvfPqIndexed(dir, e, q, 5, nProbes = 8)
        val p = r.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(r)
        p
      }
      assert(plan.linesIterator.exists(l =>
          l.contains("PartitionFilters") && l.contains("cid") &&
            l.contains("IN")),
        s"no cid partition filter on the compacted codes scan:\n$plan")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("annRecall: exact anchor stays 1.0 when the corpus has fewer vectors than maxQueryId") {
    // the denominator is the exact top-k's own row count, not the
    // nominal maxQueryId·k — a small corpus (or null embeddings among
    // the low ids) must not deflate every method's recall
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val small = emb.filter(col("vec_id") < 4)
    val r = rowsOf(Similarity.annRecall(small, maxQueryId = 8, k = 3))
    val byM = r.map(m => m("method") -> m).toMap
    assert(byM("exact")("recall") == 1.0,
      s"exact anchor deflated: ${byM("exact")}")
  }

  test("cellBaseline: exact counts and floored ppm shares per cell") {
    val d = vecs(
      0L -> pad(Seq(1f, 0f)), 1L -> pad(Seq(0f, 1f)),
      2L -> pad(Seq(0.9f, 0.1f)), 3L -> pad(Seq(0.1f, 0.9f)),
      4L -> pad(Seq(0.8f, 0.2f)), 5L -> pad(Seq(-1f, 0f)))
    val r = rowsOf(Similarity.cellBaseline(d, nCentroids = 2))
    assert(r.map(_("cid")) == Seq(0L, 1L))
    assert(r.map(_("n").asInstanceOf[Long]).sum == 6L)
    // cell 0 attracts 0,2,4; cell 1 attracts 1,3 and the anti-aligned
    // 5 (cos -1 vs 0: cell 1 wins)
    assert(r.map(m => m("cid") -> m("n")).toMap == Map(0L -> 3L, 1L -> 3L))
    r.foreach(m => assert(m("ppm") == 500000L))
    // floored shares never exceed one million in total
    assert(r.map(_("ppm").asInstanceOf[Long]).sum <= 1000000L)
  }

  test("cellDrift: zero deltas on identical snapshots, exact deltas on subsets") {
    val d = vecs(
      0L -> pad(Seq(1f, 0f)), 1L -> pad(Seq(0f, 1f)),
      2L -> pad(Seq(0.9f, 0.1f)), 3L -> pad(Seq(0.1f, 0.9f)),
      4L -> pad(Seq(0.8f, 0.2f)), 5L -> pad(Seq(0.2f, 0.8f)))
    // identical snapshots: drift is identically zero
    val same = rowsOf(Similarity.cellDrift(d, d, nCentroids = 2))
    assert(same.nonEmpty)
    same.foreach { m =>
      assert(m("delta_ppm") == 0L)
      assert(m("n_ref") == m("n_cur") && m("ppm_ref") == m("ppm_cur"))
    }
    // drop cell-1 dwellers (1,3,5): all current mass moves to cell 0
    val cur = d.filter(col("vec_id") % 2 === 0)
    val drift = rowsOf(Similarity.cellDrift(d, cur, nCentroids = 2))
    val byCid = drift.map(m => m("cid") -> m).toMap
    assert(byCid(0L)("n_ref") == 3L && byCid(0L)("n_cur") == 3L)
    assert(byCid(0L)("ppm_cur") == 1000000L &&
      byCid(0L)("delta_ppm") == 500000L)
    // cell 1 vanished from the current snapshot: zero-filled, not null
    assert(byCid(1L)("n_cur") == 0L && byCid(1L)("ppm_cur") == 0L &&
      byCid(1L)("delta_ppm") == -500000L)
  }
}
