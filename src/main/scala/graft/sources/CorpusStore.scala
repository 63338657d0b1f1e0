package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Partitioned corpus store — the OUTPUT layout side of the 100 TB
  * design. A curated corpus is written hive-partitioned by
  * (split, lang): the two columns every downstream training job
  * filters on first ("give me the English train split") become
  * directory boundaries, so those filters are resolved by the file
  * LISTING (partition pruning) and never touch file contents — a
  * reader of one split/lang pair opens 1/(splits×langs) of the store
  * regardless of corpus size.
  *
  * Layout discipline at scale:
  *  - partition columns are LOW-cardinality by construction (3 splits
  *    × a bounded language set) — hive-partitioning a high-cardinality
  *    column (doc_id, source×date) explodes the file count and kills
  *    the listing; everything high-cardinality stays INSIDE files
  *    where parquet row-group statistics (min/max on the sorted
  *    doc_id) serve the residual pruning;
  *  - `maxRecordsPerFile` bounds file size instead of a global
  *    repartition — writers stay shuffle-free;
  *  - the split column is derived, deterministic, and re-computable
  *    ([[CorpusOps.splitName]]), so the layout can always be rebuilt
  *    or verified from the data itself.
  */
object CorpusStore {

  /** Write `docs` (doc_id, text, lang, …) hive-partitioned by the
    * derived split and the existing lang column. Shuffle-free: the
    * split is a projection, partitioning happens at the writer.
    */
  def write(docs: DataFrame, path: String,
      maxRecordsPerFile: Long = 1000000L): Unit =
    docs
      .withColumn("split", CorpusOps.splitName(col("doc_id")))
      .write
      .partitionBy("split", "lang")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** Read back one (split, lang) slice. The filters land on partition
    * columns, so they prune at the directory listing — the spec pins
    * that the resulting scan's PartitionFilters carry both predicates
    * and data filters stay empty.
    */
  def readSlice(spark: SparkSession, path: String,
      split: String, lang: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("split") === split && col("lang") === lang)

  /** Bucketed layout — the CO-LOCATED JOIN side of the 100 TB design.
    * Two tables bucketed by the same key into the same bucket count
    * are join-compatible WITHOUT a shuffle: each task reads bucket i
    * of both sides, so the exchange that dominates fact⋈fact joins
    * disappears from every subsequent join on that key. This is the
    * amortization move for keys a pipeline joins on repeatedly
    * (doc_id across dedup labels / quality scores / keyword tables):
    * pay one bucketed write, skip the shuffle on every read-side join
    * forever after.
    *
    * Sizing at scale: `buckets` should put one bucket's worth of one
    * side at ~100–500 MB (e.g. 100 TB / 256 MB ≈ 4×10^5 buckets);
    * too few buckets caps join parallelism — the bucket count IS the
    * task count for shuffle-free joins. `sortBy` the bucket key so
    * parquet row-group stats prune point lookups inside each bucket.
    *
    * Bucketing metadata lives in the session catalog (`saveAsTable`;
    * a path-based `save` cannot carry it) — `path` makes the table
    * EXTERNAL so the files outlive the catalog entry; a production
    * deployment points the same DDL at a shared metastore.
    */
  def writeBucketed(docs: DataFrame, table: String, path: String,
      buckets: Int = 32, bucketCol: String = "doc_id"): Unit =
    docs.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)
}
