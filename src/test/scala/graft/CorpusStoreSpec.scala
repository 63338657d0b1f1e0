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
}
