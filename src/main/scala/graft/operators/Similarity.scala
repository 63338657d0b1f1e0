package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, same API:
  *  - [[knnBruteForce]]: exact top-k — broadcast the (small) query set
  *    against the full corpus; one scan, no shuffle of the corpus.
  *    The honest baseline and the recall oracle for the ANN path.
  *  - [[lshNearPairs]] / [[knnLsh]]: random-hyperplane LSH — multiple
  *    signature tables, bucket join, exact cosine only within buckets.
  *    Corpus-side work is linear in rows × tables; the quadratic blowup
  *    is confined to bucket-local candidate sets. This is the
  *    100 TB-scale path.
  *
  * Plan-shape rules learned from `.explain` at scale:
  *  - vectors are unit-normalized ONCE per row up front ([[withUnit]]);
  *    scoring a candidate is then a single dot product — norms are
  *    never recomputed per pair;
  *  - candidate de-dup (`distinct`) runs on id pairs only; vectors are
  *    joined back afterwards — never shuffle or hash-aggregate the
  *    arrays themselves.
  *
  * All arithmetic is element-wise double fold in index order
  * (`zip_with` + sequential `aggregate`) — bit-deterministic, so a
  * DuckDB oracle reproduces scores exactly.
  */
object Similarity {

  /** Sequential index-order fold (acc starts 0.0) — NOT a tree
    * reduction — so oracle engines computing the same fold get
    * bit-identical doubles. Native codegen'd expression; the
    * declarative `aggregate(zip_with(...))` form evaluated its lambdas
    * interpreted and dominated kNN runtime.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayHashExprs.dot_product(
      a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Adds `unit`: the double-cast, unit-normalized vector, via the
    * fused codegen'd [[graft.functions.ArrayHashExprs.UnitVectorExpr]]
    * (one loop per row; the earlier `sqrt(dot)` + per-element
    * `transform` lambda evaluated interpreted). An all-zero vector
    * (common for failed encodes in real embedding dumps) maps to a
    * zero unit vector instead of NaNs — NaN scores would otherwise
    * sort FIRST under descending order and poison every top-k.
    */
  def withUnit(df: DataFrame): DataFrame =
    df.withColumn("unit",
      graft.functions.ArrayHashExprs.unit_vector(
        col("embedding").cast("array<double>")))

  /** The declarative composition [[withUnit]] replaced — kept as the
    * parity oracle for [[graft.functions.ArrayHashExprs.UnitVectorExpr]]. */
  def withUnitDeclarative(df: DataFrame): DataFrame =
    df.withColumn("nrm", norm(col("embedding")))
      .withColumn("unit",
        transform(col("embedding"),
          x => when(col("nrm") === 0.0, lit(0.0))
            .otherwise(x.cast("double") / col("nrm"))))
      .drop("nrm")

  /** Exact top-k neighbors for each query vector. `queries` must be
    * small (it is broadcast); the corpus side never shuffles before
    * the final (tiny) top-k window.
    */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = withUnit(corpus).select(col("vec_id"), col("unit"))
    val q = withUnit(queries).select(col("vec_id"), col("unit"))
    val scored = c.as("c")
      .join(broadcast(q.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        dot(col("q.unit"), col("c.unit")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  val LshDims = 64

  /** Deterministic pseudo-random hyperplane component: table `t`,
    * plane `j`, dimension `d` → value in [-1, 1]. A fixed LCG over the
    * flattened index, reproducible in any engine with int64 arithmetic.
    */
  def planeComponent(t: Int, j: Int, d: Int): Double = {
    val idx = (t.toLong * 1000 + j) * LshDims + d
    (((1103515245L * idx + 12345L) % 2147483647L) % 2001L - 1000L) / 1000.0
  }

  /** Signature for one LSH table: `planes` sign bits packed into a
    * long. Expression-only (literal plane array + zip_with dot). */
  def lshSignature(vec: Column, table: Int, planes: Int): Column =
    (0 until planes).map { j =>
      val plane = array((0 until LshDims).map(d =>
        lit(planeComponent(table, j, d))): _*)
      when(dot(vec, plane) > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** (vec_id, unit, tbl, sig) — one row per vector per LSH table. */
  private def withSigs(unitDf: DataFrame, tables: Int, planes: Int): DataFrame =
    unitDf.select(col("vec_id"), col("unit"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          lshSignature(col("unit"), t, planes).as("sig"))): _*)).as("s"))
      .select(col("vec_id"), col("unit"), col("s.tbl"), col("s.sig"))

  /** Candidate near-pairs via multi-table random-hyperplane LSH, then
    * exact cosine >= threshold on candidates only. Pair de-dup happens
    * on (vec_a, vec_b) ids; unit vectors join back after.
    */
  def lshNearPairs(corpus: DataFrame, tables: Int = 4, planes: Int = 4,
      threshold: Double = 0.35): DataFrame =
    lshNearPairsUnsorted(corpus, tables, planes, threshold)
      .orderBy(col("vec_a"), col("vec_b"))

  /** [[lshNearPairs]] without the presentation sort — for consumers
    * that immediately aggregate or iterate the pairs (the sort's range
    * exchange would be thrown away one operator later). */
  def lshNearPairsUnsorted(corpus: DataFrame, tables: Int = 4,
      planes: Int = 4, threshold: Double = 0.35): DataFrame = {
    val u = withUnit(corpus).select(col("vec_id"), col("unit"))
    val sigs = withSigs(u, tables, planes)
      .select(col("vec_id"), col("tbl"), col("sig"))
    // shared exchange via forced SMJ: both self-join sides demand the
    // same ENSURE_REQUIREMENTS shuffle over identical subplans, which
    // AQE stage-reuses — the 16 hyperplane dot products per vector are
    // computed once (an AQE broadcast conversion would bypass the
    // shared shuffle and recompute them per side; see Dedup)
    val cand = sigs.as("a").join(sigs.as("b").hint("shuffle_merge"),
        col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(u.as("x"), col("vec_a") === col("x.vec_id"))
      .join(u.as("y"), col("vec_b") === col("y.vec_id"))
      .withColumn("score", dot(col("x.unit"), col("y.unit")))
      .filter(col("score") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("score"), 6).as("score"))
  }

  /** SemDeDup-style semantic deduplication: vectors whose cosine
    * similarity exceeds `threshold` form an epsilon-ball graph
    * ([[lshNearPairsUnsorted]] — LSH candidates, exact cosine verify),
    * transitive closure labels each vector with its cluster
    * ([[Dedup.labelPropagate]] — the same min-label iteration the text
    * near-dup stack uses), and the cluster's minimum id is the kept
    * representative. Output: (vec_id, cluster, kept) for every vector;
    * downstream pipelines keep `kept` rows and drop the rest.
    *
    * Scale shape inherits from its two parts: candidate generation is
    * banded LSH (never all-pairs), the iteration touches only
    * graph vertices. STORAGE CONTRACT: same as [[Dedup.nearDupLabels]]
    * — the plan embeds the final label checkpoint; release with
    * `ColumnBridge.unpersistCheckpoint` after the last action.
    */
  def semanticKeep(corpus: DataFrame, tables: Int = 4, planes: Int = 4,
      threshold: Double = 0.35, maxIters: Int = 50): DataFrame =
    semanticKeepCounted(corpus, tables, planes, threshold, maxIters)._1

  /** [[semanticKeep]] also returning the label-propagation round count,
    * and with an `observe` node named `semantic_keep` planting
    * free-of-charge telemetry into every action on the result:
    * `n_vectors` and `n_kept` (= cluster count). Read them from
    * `df.queryExecution.observedMetrics` after any action — the
    * noise-floor check an operator dashboard (or the companion spec)
    * watches: a threshold at the corpus's noise floor shows up as
    * n_kept collapsing toward 1 while rounds climb with the giant
    * component's diameter.
    */
  private[graft] def semanticKeepCounted(corpus: DataFrame, tables: Int = 4,
      planes: Int = 4, threshold: Double = 0.35,
      maxIters: Int = 50): (DataFrame, Int) = {
    val (labels, rounds) = Dedup.labelPropagateCounted(
      lshNearPairsUnsorted(corpus, tables, planes, threshold)
        .select(col("vec_a").as("a"), col("vec_b").as("b")),
      corpus.select(col("vec_id")), maxIters, "semanticKeep")
    (labels
      .withColumn("kept", col("vec_id") === col("cluster"))
      .observe("semantic_keep",
        count(lit(1)).as("n_vectors"),
        coalesce(sum(when(col("kept"), 1L).otherwise(0L)), lit(0L))
          .as("n_kept"))
      .orderBy(col("vec_id")), rounds)
  }

  /** Spherical k-means (Lloyd's) for IVF coarse centroids — the
    * production swap for [[knnIvf]]'s deterministic stand-in.
    * Per iteration:
    *  - ASSIGN is a pure projection: centroids live on the driver
    *    (IVF coarse books are small — k ≤ ~64k), scores are k fused
    *    dot products per row, argmax via `array_position(array_max)`.
    *    No shuffle, no window — the corpus is scanned, never moved.
    *  - UPDATE is one `posexplode` + (cid, dim) aggregate: map-side
    *    partial means bound the shuffle at partitions × k × dims rows.
    *  - means re-normalize to unit length (cosine geometry); an empty
    *    cell keeps its previous centroid.
    * Seeding is the k lowest vec_ids — deterministic, so runs are
    * reproducible given the same corpus. This mirrors the classic
    * MLlib KMeans driver loop re-expressed on DataFrames.
    */
  def trainCentroids(corpus: DataFrame, k: Int = 16, iters: Int = 5): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0 ($k) and iters >= 0 ($iters)")
    val spark = corpus.sparkSession
    // normalize ONCE and materialize: the seed collect plus every
    // iteration's update job re-reads this frame (iters+1 scans).
    // Null embeddings (or null elements — possible in real embedding
    // dumps) are excluded up front: a null unit would NPE the collected
    // mean's unboxing and silently skew assignment.
    val cu = withUnit(corpus).select(col("vec_id"), col("unit"))
      .filter(col("unit").isNotNull &&
        !exists(col("unit"), x => x.isNull))
      .localCheckpoint(true)
    try {
    var cent: Array[Seq[Double]] = cu.orderBy(col("vec_id")).limit(k)
      .collect().map(_.getSeq[Double](1))
    for (_ <- 0 until iters) {
      val scores = array(cent.map(v =>
        dot(col("unit"), typedLit(v))): _*)
      val assigned = cu
        .withColumn("scores", scores)
        // 0-based cell id; first max wins (array_position is 1-based)
        .withColumn("cid",
          (expr("array_position(scores, array_max(scores))") - 1).cast("int"))
      val means = assigned
        .select(col("cid"), posexplode(col("unit")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mean"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cent = cent.indices.map { i =>
        means.get(i).fold(cent(i)) { m =>
          val nrm = math.sqrt(m.map(x => x * x).sum)
          if (nrm == 0.0) cent(i) else m.map(_ / nrm)
        }
      }.toArray
    }
    import spark.implicits._
    cent.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("cid", "cunit")
    } finally
      // the centroids live on the driver once trained — release the
      // checkpointed corpus blocks even when an iteration job fails
      // (a long-lived session would otherwise leak block-manager
      // storage on every call; Dataset.unpersist would be a
      // CacheManager no-op for a local checkpoint)
      ColumnBridge.unpersistCheckpoint(cu)
  }

  /** IVF-style ANN top-k: corpus vectors are assigned to their nearest
    * coarse centroid; a query probes its `nProbes` nearest centroids
    * and scores only the vectors in those cells. The inverted-file
    * plan: corpus cell assignment is a shuffle-free argmax projection
    * over the driver-held codebook, candidate generation is a
    * centroid-id equi-join, and only the (tiny) probe side keeps a
    * top-nProbes window. Centroids default to a deterministic
    * stand-in (the first `nCentroids` vectors) so the oracle can
    * reproduce cell assignment — production passes
    * [[trainCentroids]]; the plan is identical either way.
    */
  def knnIvf(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbes: Int = 4,
      centroids: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    // null-embedding corpus rows are EXCLUDED from the index (no cell
    // for them; trainCentroids applies the same policy). The filter
    // rides the RAW column — `unit IS NULL ⟺ embedding IS NULL`
    // (UnitVectorExpr is a UnaryExpression: null out only for null in;
    // element nulls stay element nulls), and filtering on the derived
    // column instead would inline unitvectorexpr into the scan Filter,
    // re-normalizing every row a second time (round-5 plan sweep).
    val cu = withUnit(corpus.filter(col("embedding").isNotNull))
      .select(col("vec_id"), col("unit"))
    // default: deterministic stand-in centroids (first nCentroids
    // vectors) so the DuckDB oracle can reproduce cell assignment;
    // production passes trainCentroids(corpus) — the plan is identical
    val cent = centroids.getOrElse(
      cu.filter(col("vec_id") < nCentroids)
        .select(col("vec_id").as("cid"), col("unit").as("cunit")))
    // the coarse codebook is tiny by construction (k ≤ ~64k cells), so
    // hold it on the driver: corpus cell ASSIGNMENT is then a pure
    // shuffle-free projection — k fused dots + array_position argmax
    // per row, the same ASSIGN shape as [[trainCentroids]]. (The
    // previous formulation broadcast-joined corpus × nCentroids rows
    // and ranked with a row_number window — a shuffle of k× the corpus
    // just to pick each row's top-1.) The trade: building the plan now
    // runs one tiny collect job for the codebook (a pushed-down filter
    // scan for the stand-in, the k-means result for the trained path).
    val book = cent.select(col("cid"), col("cunit")).orderBy(col("cid"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    if (book.isEmpty) {
      // empty corpus (or no vec_id below nCentroids): no cells exist —
      // return the empty result instead of failing plan construction
      import spark.implicits._
      return Seq.empty[(Long, Int, Long, Double)]
        .toDF("query_id", "rank", "neighbor_id", "score")
    }
    val scores = array(book.map { case (_, v) =>
      dot(col("unit"), typedLit(v)) }: _*)
    // (null exclusion happened at the embedding column above;
    // null-embedding queries still score null against every candidate
    // and rank last, as before)
    val assigned = cu
      .withColumn("scores", scores)
      // first max wins (array_position is 1-based) = lowest cid, since
      // the book is cid-ascending — the same tie-break as the probe
      // window's ORDER BY cscore DESC, cid
      .withColumn("cid", element_at(typedLit(book.map(_._1).toSeq),
        expr("array_position(scores, array_max(scores))").cast("int")))
      .select(col("vec_id"), col("unit"), col("cid"))
    // probe side keeps the top-nProbes window: the query set is tiny,
    // and the broadcast codebook frame is built from driver-held rows
    // (no second corpus scan for the stand-in centroids)
    val centDf = {
      import spark.implicits._
      book.toSeq.toDF("cid", "cunit")
    }
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("cid"))
    val probes = withUnit(queries).select(col("vec_id"), col("unit"))
      .join(broadcast(centDf))
      .withColumn("cscore", dot(col("unit"), col("cunit")))
      .withColumn("crn", row_number().over(pw))
      .filter(col("crn") <= nProbes)
      .select(col("vec_id").as("query_id"), col("unit").as("qunit"), col("cid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dot(col("qunit"), col("unit")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** ANN top-k: LSH candidates (union over tables), exact cosine and
    * per-query top-k on candidates only — the scale path of
    * [[knnBruteForce]]. Recall depends on tables × planes.
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 8, planes: Int = 4): DataFrame = {
    val cu = withUnit(corpus).select(col("vec_id"), col("unit"))
    val qu = withUnit(queries).select(col("vec_id"), col("unit"))
    val cand = withSigs(cu, tables, planes).select(col("vec_id"), col("tbl"), col("sig")).as("c")
      .join(broadcast(withSigs(qu, tables, planes)
        .select(col("vec_id"), col("tbl"), col("sig")).as("q")),
        col("q.tbl") === col("c.tbl") && col("q.sig") === col("c.sig") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cand
      .join(broadcast(qu).as("x"), col("query_id") === col("x.vec_id"))
      .join(cu.as("y"), col("neighbor_id") === col("y.vec_id"))
      .withColumn("score", dot(col("x.unit"), col("y.unit")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }
}
