package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps
import graft.sources.CorpusStore

class CorpusStoreSpec extends SparkSuite {

  test("partitioned store: round-trips, prunes at the listing, stays rebuildable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"))
      CorpusStore.write(docs, dir)
      // round-trip: nothing lost, split derivation matches the one
      // definition (the layout is rebuildable from the data)
      val back = spark.read.parquet(dir)
      assert(back.count() == docs.count())
      val mismatch = back.filter(
        col("split") =!= CorpusOps.splitName(col("doc_id"))).count()
      assert(mismatch == 0, "stored split must equal the derived split")
      // a slice read resolves both predicates as PARTITION filters —
      // directory pruning, no data filter touches file contents
      val slice = CorpusStore.readSlice(spark, dir, "train", "en")
      val p = slice.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val partLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(partLine.contains("split") && partLine.contains("lang"),
        s"slice predicates must be partition filters:\n$p")
      val dataLine = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
      assert(!dataLine.contains("split") && !dataLine.contains("lang"),
        s"partition predicates leaked into data filters:\n$p")
      // and the slice content equals the equivalent unpartitioned filter
      val expect = docs
        .filter(CorpusOps.splitName(col("doc_id")) === "train" && col("lang") === "en")
        .count()
      assert(slice.count() == expect && expect > 0)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("partitioned store: joins on a partition column prune dynamically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    try {
      val s = spark
      import s.implicits._
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"))
      CorpusStore.write(docs, dir)
      // dim-side filter on a NON-join column + join on the partition
      // column: static pruning can't help (the pruned langs are only
      // known after the dim filter runs), so the scan must carry a
      // dynamicpruning expression — at 100 TB this is the difference
      // between listing one lang's directories and scanning the store.
      // The dim is parquet-backed: DPP's benefit estimation skips
      // in-memory LocalRelations (verified here), matching production
      // where dims are tables, not literals.
      // the dim predicate must be one DPP's selectivity heuristic
      // recognizes (a comparison — a bare boolean column is not
      // "likely selective" to the rule)
      Seq(("en", 1), ("de", 0), ("es", 0), ("fr", 0), ("zh", 0))
        .toDF("lang", "keep")
        .write.mode("overwrite").parquet(s"$dir-dim")
      val wanted = spark.read.parquet(s"$dir-dim")
      val joined = spark.read.parquet(dir)
        .join(broadcast(wanted.filter(col("keep") === 1)), "lang")
      val p = joined.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      assert(p.contains("dynamicpruning"),
        s"partition-column join must prune dynamically:\n$p")
      assert(joined.count() ==
        docs.filter(col("lang") === "en").count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir-dim"))
    }
  }

  test("bucketed store: same-key joins run shuffle-free and match the plain join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThreshold = spark.conf.get(thresholdKey)
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"))
      val scores = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("score"))
      CorpusStore.writeBucketed(docs, "bkt_docs", s"$dir/docs", buckets = 4)
      CorpusStore.writeBucketed(scores, "bkt_scores", s"$dir/scores", buckets = 4)
      // force the join down the sort-merge path: the claim under test
      // is shuffle ELIMINATION via co-located buckets, which a
      // broadcast of the small test fixture would mask
      spark.conf.set(thresholdKey, "-1")
      val joined = spark.table("bkt_docs")
        .join(spark.table("bkt_scores"), "doc_id")
      assert(joined.count() == docs.count())
      val executed = joined.queryExecution.executedPlan.toString
      assert(!executed.contains("Exchange"),
        s"bucket-aligned join must not shuffle either side:\n$executed")
      // parity: bucketed result == the plain unbucketed join
      val plain = docs.join(scores, "doc_id")
      assert(joined.select(sum(col("score"))).head().getLong(0) ==
        plain.select(sum(col("score"))).head().getLong(0))
    } finally {
      spark.conf.set(thresholdKey, prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_docs")
      spark.sql("DROP TABLE IF EXISTS bkt_scores")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
