package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * All arithmetic is element-wise double fold in index order
  * (`zip_with` + sequential `aggregate`) — bit-deterministic, so a
  * DuckDB oracle reproduces scores exactly.
  */
object Similarity {

  /** Sequential left-to-right sum — NOT a tree reduction — so oracle
    * engines computing the same fold get bit-identical doubles. */
  private def seqSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm(a: Column): Column =
    sqrt(seqSum(transform(a, x => x.cast("double") * x.cast("double"))))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector. `queries` must be
    * small (it is broadcast); the corpus side never shuffles — partial
    * top-k per partition then a final merge via window over
    * (query, score) would be the 100 TB refinement; at current scale
    * the window after the broadcast join is already the right plan.
    */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(queries.as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("score"))
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
  def lshSignature(emb: Column, table: Int, planes: Int): Column =
    (0 until planes).map { j =>
      val plane = array((0 until LshDims).map(d =>
        lit(planeComponent(table, j, d))): _*)
      when(dot(emb, plane) > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** Candidate near-pairs via multi-table random-hyperplane LSH, then
    * exact cosine >= threshold on candidates only.
    */
  def lshNearPairs(corpus: DataFrame, tables: Int = 4, planes: Int = 4,
      threshold: Double = 0.35): DataFrame = {
    val sigs = corpus.select(col("vec_id"), col("embedding"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          lshSignature(col("embedding"), t, planes).as("sig"))): _*)).as("s"))
      .select(col("vec_id"), col("embedding"), col("s.tbl"), col("s.sig"))
    sigs.as("a").join(sigs.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.embedding").as("ea"), col("b.embedding").as("eb"))
      .distinct()
      .withColumn("score", cosine(col("ea"), col("eb")))
      .filter(col("score") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("score"), 6).as("score"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** ANN top-k: LSH candidates (union over tables), exact cosine and
    * per-query top-k on candidates only — the scale path of
    * [[knnBruteForce]]. Recall depends on tables × planes.
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 8, planes: Int = 4): DataFrame = {
    def sigs(df: DataFrame) = df.select(col("vec_id"), col("embedding"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          lshSignature(col("embedding"), t, planes).as("sig"))): _*)).as("s"))
      .select(col("vec_id"), col("embedding"), col("s.tbl"), col("s.sig"))
    val cand = sigs(corpus).as("c")
      .join(broadcast(sigs(queries).as("q")),
        col("q.tbl") === col("c.tbl") && col("q.sig") === col("c.sig") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        col("q.embedding").as("qe"), col("c.embedding").as("ce"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cand.withColumn("score", cosine(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }
}
