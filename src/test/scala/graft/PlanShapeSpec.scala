package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression tests: the scale claims made in code comments
  * (exchange reuse, checkpoint-preserved partitioning, pushdown) must
  * hold in the ACTUAL physical plan, not just in prose — a silent
  * optimizer-behavior change should fail here.
  */
class PlanShapeSpec extends SparkSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("checkpointed frames report UnknownPartitioning under AQE (documented)") {
    val s = spark
    import s.implicits._
    // pins the empirical fact the nearDupClusters comment relies on:
    // pre-partitioning before localCheckpoint does NOT survive (the
    // unexecuted AdaptiveSparkPlan has no final partitioning), so the
    // iteration must not be designed around checkpoint-preserved
    // partitioning. If Spark ever starts preserving it, this fails and
    // the clustering loop should be re-planned to exploit it.
    val edges = Seq((1L, 2L), (2L, 1L))
      .toDF("doc_a", "doc_b").repartition(col("doc_b")).localCheckpoint(true)
    val p = plan(edges)
    assert(p.contains("UnknownPartitioning"), s"partitioning metadata:\n$p")
  }

  test("clustering convergence check is a narrow filter, not a join") {
    val s = spark
    import s.implicits._
    // same shape as the nearDupClusters fixpoint test: filter over the
    // checkpointed (doc_id, prev, cluster) frame — no exchange, no join
    val next = Seq((1L, 1L, 1L), (2L, 2L, 1L))
      .toDF("doc_id", "prev", "cluster").localCheckpoint(true)
    val p = plan(next.filter(col("cluster") =!= col("prev")))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"convergence must stay narrow:\n$p")
  }

  test("text projections push column pruning into the parquet scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = plan(graft.operators.TextAnalysis.stats(docs))
    // only (doc_id, text) may be read, however many columns the table has
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"),
      s"expected doc_id,text in ReadSchema: $readSchema")
    assert(!readSchema.contains("lang") || readSchema.count(_ == ',') <= 1,
      s"scan reads more than the projected columns: $readSchema")
  }

  test("brute-force kNN broadcasts the query side, never the corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p = plan(graft.operators.Similarity.knnBruteForce(
      emb, emb.filter(col("vec_id") < 4), 3))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side should broadcast:\n$p")
    // the corpus must not be exchanged before scoring: the only
    // exchange allowed is the hash partitioning for the top-k window
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"too many exchanges ($exchanges):\n$p")
  }
}
