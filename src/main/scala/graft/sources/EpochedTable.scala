package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Epoched base+ingest parquet tables — the storage discipline shared
  * by the dedup label table, the three dedup-index tables
  * ([[graft.operators.Dedup]]), and the IVF-PQ codes table
  * ([[graft.operators.Similarity]]).
  *
  * A grown table is (base dir) ∪ (one overwrite-once subdir per
  * ingest batch); compaction folds the union into a FRESH generation
  * and only then retires the old one. Generation N ≥ 1 lives under
  * `<base>_vN` / `<base>_ingest_vN` (a table may keep historical
  * epoch-0 names via `legacyIngest`); the ACTIVE generation is the
  * highest one whose dir carries the output committer's `_SUCCESS`
  * marker. That ordering makes every crash point safe — the property
  * a staged-write → delete → rename swap lacks (a crash between its
  * delete and rename loses the base table; a crash before its ingest
  * delete double-counts ingest rows):
  *   - crash while staging generation N+1: no `_SUCCESS` there, so
  *     readers stay on complete generation N (base AND its ingest);
  *   - crash after N+1 commits but before cleanup: readers are
  *     already on N+1 (higher), generation N's dirs are inert
  *     leftovers a later compaction removes;
  *   - cleanup only ever deletes generations STRICTLY below a
  *     committed one.
  * Appends land in the active generation's ingest dir. CRASHES are
  * safe at every point. Two concurrency caveats remain, both confined
  * to the compaction window: a batch appended to generation N while
  * N+1 is being staged is not folded in and becomes invisible when
  * N+1 commits; and a reader whose plan resolved generation N's file
  * listing before the swap can hit deleted files when the cleanup
  * loop retires N mid-scan (Spark fails such scans unless
  * `spark.sql.files.ignoreMissingFiles` is set). Quiesce ingest AND
  * long-running readers while compacting — the operators' scaladocs
  * say so.
  *
  * `partitionCols` hive-partitions every GENERATION write (the codes
  * table's `cid` layout, so probes keep directory-listing pruning);
  * per-batch ingest dirs stay plain — they are small between
  * compactions and their partition columns ride along as ordinary
  * columns, which `normalizeRead` reconciles with the partition-
  * discovered base schema (e.g. casting an int-inferred partition
  * column back to long).
  */
private[graft] final case class EpochedTable(dir: String, base: String,
    columns: Seq[String], legacyIngest: Option[String] = None,
    partitionCols: Seq[String] = Nil,
    normalizeRead: DataFrame => DataFrame = identity) {

  def tableDir(e: Int): String =
    if (e == 0) s"$dir/$base" else s"$dir/${base}_v$e"
  def ingestDir(e: Int): String =
    if (e == 0) legacyIngest.getOrElse(s"$dir/${base}_ingest")
    else s"$dir/${base}_ingest_v$e"

  private def fsOf(spark: org.apache.spark.sql.SparkSession) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def activeEpoch(spark: org.apache.spark.sql.SparkSession): Int = {
    val fs = fsOf(spark)
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return 0
    val prefix = s"${base}_v"
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) =>
        n.stripPrefix(prefix).toIntOption }
      .flatten
      .filter(e => fs.exists(
        new org.apache.hadoop.fs.Path(s"${tableDir(e)}/_SUCCESS")))
      .maxOption.getOrElse(0)
  }

  /** The active generation's COMMITTED ingest batch dirs: only
    * subdirectories carrying the committer's `_SUCCESS` marker are
    * visible, and only when they hold at least one DATA file — a
    * batch dir torn by a crash mid-write (created, no data files) or
    * committed EMPTY (a no-data micro-batch's overwrite: no task ever
    * opens a writer, so `_SUCCESS` lands with zero part files) would
    * otherwise throw schema-inference errors at every read and wedge
    * the recovery loop that exists to rewrite it.
    * `excludeBatch` hides one batch id: an at-least-once replay
    * must compute against the state BEFORE its own failed attempt,
    * not against its own leftovers (a batch self-matching its prior
    * write changes verdicts — and a verdict-filtered re-append could
    * then overwrite the batch dir with fewer rows than the original).
    */
  def ingestBatchDirs(spark: org.apache.spark.sql.SparkSession, epoch: Int,
      excludeBatch: Option[Long] = None): Seq[String] = {
    val ingest = new org.apache.hadoop.fs.Path(ingestDir(epoch))
    val fs = fsOf(spark)
    if (!fs.exists(ingest)) Nil
    else fs.listStatus(ingest).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => excludeBatch.forall(id => p.getName != s"batch-$id"))
      .filter { p =>
        // ONE listing answers both checks (each RPC is a network
        // round trip on an object store, and this runs per batch dir
        // per read)
        val entries = fs.listStatus(p)
        entries.exists(f => f.isFile && f.getPath.getName == "_SUCCESS") &&
          entries.exists { f =>
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
      }
      .map(_.toString)
  }

  /** True when the active generation has ≥1 COMMITTED ingest batch. */
  def hasIngest(spark: org.apache.spark.sql.SparkSession): Boolean =
    ingestBatchDirs(spark, activeEpoch(spark)).nonEmpty

  /** Normalized read of explicit batch dirs ([[ingestBatchDirs]]). */
  def readBatchDirs(spark: org.apache.spark.sql.SparkSession,
      dirs: Seq[String]): DataFrame =
    normalizeRead(spark.read.parquet(dirs: _*).select(columns.map(col): _*))

  def read(spark: org.apache.spark.sql.SparkSession,
      excludeBatch: Option[Long] = None): DataFrame = {
    val e = activeEpoch(spark)
    val baseDf = normalizeRead(
      spark.read.parquet(tableDir(e)).select(columns.map(col): _*))
    val batches = ingestBatchDirs(spark, e, excludeBatch)
    if (batches.nonEmpty) baseDf.unionAll(readBatchDirs(spark, batches))
    else baseDf
  }

  def appendBatch(rows: DataFrame, batchId: Long): Unit =
    rows.select(columns.map(col): _*)
      .write.mode("overwrite")
      .parquet(s"${ingestDir(activeEpoch(rows.sparkSession))}/batch-$batchId")

  private def writeGeneration(rows: DataFrame, target: Int): Unit = {
    val w = rows.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tableDir(target))
  }

  /** Fold base + ingest into generation `active + 1`, refuse to
    * retire anything unless the new generation's commit marker is
    * present, then delete every older generation. `reshape` lets the
    * caller restore a physical layout (e.g. the band table's join-key
    * repartition) on the compacted output. */
  def compact(spark: org.apache.spark.sql.SparkSession,
      reshape: DataFrame => DataFrame = identity): Unit = {
    val fs = fsOf(spark)
    val e = activeEpoch(spark)
    val next = e + 1
    writeGeneration(reshape(read(spark)), next)
    require(fs.exists(
        new org.apache.hadoop.fs.Path(s"${tableDir(next)}/_SUCCESS")),
      s"${tableDir(next)} committed without a _SUCCESS marker " +
        "(mapreduce.fileoutputcommitter.marksuccessfuljobs disabled?) — " +
        "refusing to retire the previous generation")
    (0 to e).foreach { old =>
      fs.delete(new org.apache.hadoop.fs.Path(tableDir(old)), true)
      fs.delete(new org.apache.hadoop.fs.Path(ingestDir(old)), true)
    }
    // pre-epoch layouts staged compactions under `<base>_staging`;
    // clear any leftover from a crashed run of that scheme
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/${base}_staging"), true)
  }

  /** Replace the table's CONTENT with `rows` (a rebuild, not a
    * fold): a fresh store writes the plain epoch-0 layout; a store
    * with history commits generation `active + 1` first and retires
    * everything older after — the compaction crash contract. */
  def replaceWith(rows: DataFrame): Unit = {
    val spark = rows.sparkSession
    val fs = fsOf(spark)
    val e = activeEpoch(spark)
    val fresh = !fs.exists(new org.apache.hadoop.fs.Path(tableDir(e))) &&
      !fs.exists(new org.apache.hadoop.fs.Path(ingestDir(e)))
    val target = if (fresh) 0 else e + 1
    writeGeneration(rows, target)
    if (target > 0) {
      require(fs.exists(
          new org.apache.hadoop.fs.Path(s"${tableDir(target)}/_SUCCESS")),
        s"${tableDir(target)} committed without a _SUCCESS marker — " +
          "refusing to retire the previous generation")
      (0 until target).foreach { old =>
        fs.delete(new org.apache.hadoop.fs.Path(tableDir(old)), true)
        fs.delete(new org.apache.hadoop.fs.Path(ingestDir(old)), true)
      }
    }
  }
}
