package graft

import org.apache.spark.sql.functions.col

import graft.sources.EpochedTable

/** The storage-concurrency contract of [[graft.sources.EpochedTable]]
  * — the two round-14 compaction-window caveats, each replayed
  * DETERMINISTICALLY (the `onStaged` seam and the explicit-epoch
  * append seam pin the exact interleavings a threaded race test would
  * only sometimes hit), plus the append-before-init read path.
  */
class EpochedTableSpec extends SparkSuite {

  private def table(root: String) =
    EpochedTable(root, "t", Seq("id", "v"))

  private def rows(root: String): Seq[(Long, Long)] = {
    val t = table(root)
    rowsOf(t.read(spark).orderBy(col("id")))
      .map(r => (r("id").asInstanceOf[Long], r("v").asInstanceOf[Long]))
  }

  private def df(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("id", "v")
  }

  test("a batch appended while a compaction is staging is promoted, not lost") {
    val root = java.nio.file.Files.createTempDirectory("graft-ep-race").toString
    try {
      val t = table(root)
      t.replaceWith(df(1L -> 1L))
      t.appendBatch(df(2L -> 2L), batchId = 0L)
      // the late append lands AFTER compact's fold snapshot and commit
      // but BEFORE its cleanup — the exact window where the round-14
      // contract lost the batch ("becomes invisible when N+1 commits").
      // Written RAW (no self-promotion pass — a writer that died right
      // after its batch dir committed), so only the compactor's
      // post-commit re-list can save it
      t.compact(spark, onStaged = () =>
        df(3L -> 3L).write.mode("overwrite")
          .parquet(s"$root/t_ingest/batch-1"))
      assert(rows(root) == Seq(1L -> 1L, 2L -> 2L, 3L -> 3L),
        "late-staged batch vanished at commit")
      // the promoted batch keeps folding forward on later cycles
      t.compact(spark)
      assert(rows(root) == Seq(1L -> 1L, 2L -> 2L, 3L -> 3L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a writer that resolved a stale epoch self-promotes its batch forward") {
    val root = java.nio.file.Files.createTempDirectory("graft-ep-stale").toString
    try {
      val t = table(root)
      t.replaceWith(df(1L -> 1L))
      t.compact(spark) // active is now generation 1
      assert(t.activeEpoch(spark) == 1)
      // a writer that listed the store just before that compaction
      // committed writes into generation 0's ingest dir; its
      // post-write epoch re-check must carry the batch to gen 1
      t.appendBatchAt(df(2L -> 2L), batchId = 0L, epochHint = 0)
      assert(new java.io.File(s"$root/t_ingest_v1/batch-0").exists,
        "stale-epoch batch not promoted into the active generation")
      assert(rows(root) == Seq(1L -> 1L, 2L -> 2L),
        "stale-epoch batch invisible to readers")
      // and it folds like any ordinary batch
      t.compact(spark)
      assert(rows(root) == Seq(1L -> 1L, 2L -> 2L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a reader pinned to the old generation drains across a compaction (no ignoreMissingFiles)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ep-drain").toString
    try {
      assert(spark.conf.getOption("spark.sql.files.ignoreMissingFiles")
        .forall(_ == "false"))
      val t = table(root)
      t.replaceWith(df(1L -> 1L))
      t.appendBatch(df(2L -> 2L), batchId = 0L)
      // this frame's file listing resolves generation 0 (base AND its
      // ingest batch) NOW; executing it after the swap used to hit
      // deleted files mid-scan
      val pinned = t.read(spark).orderBy(col("id"))
      t.compact(spark)
      assert(t.activeEpoch(spark) == 1)
      val got = pinned.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq(1L -> 1L, 2L -> 2L),
        "pinned reader lost rows across the generation swap")
      // the grace is exactly one cycle: after the NEXT compaction the
      // old generation is gone and a still-pinned gen-0 scan may fail
      // — the documented drain bound, not an accident
      t.compact(spark)
      assert(!new java.io.File(s"$root/t").exists &&
          !new java.io.File(s"$root/t_ingest").exists,
        "generation 0 outlived its one-cycle grace")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("append-before-init: a batches-only table reads, dashboards, and compacts") {
    val root = java.nio.file.Files.createTempDirectory("graft-ep-bare").toString
    try {
      val t = table(root)
      // no replaceWith ever ran — the sketchIngest-against-a-fresh-dir
      // pattern the round-14 advice flagged as a permanent wedge
      t.appendBatch(df(1L -> 1L), batchId = 0L)
      t.appendBatch(df(2L -> 2L), batchId = 1L)
      assert(rows(root) == Seq(1L -> 1L, 2L -> 2L),
        "batches-only table unreadable")
      t.compact(spark)
      assert(t.activeEpoch(spark) == 1)
      assert(rows(root) == Seq(1L -> 1L, 2L -> 2L),
        "compaction of a batches-only table lost rows")
      // a table with NEITHER base nor batches still fails loudly
      val bare = EpochedTable(
        java.nio.file.Files.createTempDirectory("graft-ep-none").toString,
        "t", Seq("id", "v"))
      intercept[Exception](bare.read(spark).collect())
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a delayed writer whose batch the compaction snapshot absorbed stands down") {
    // round-15 review finding: the writer's post-write epoch check can
    // be delayed (GC pause) past an ENTIRE compaction that already
    // folded its batch — a then-blind self-promotion would copy the
    // batch into the new ingest on top of its folded rows, and every
    // later fold would carry the duplicate permanently
    val root = java.nio.file.Files.createTempDirectory("graft-ep-dup").toString
    try {
      val t = table(root)
      t.replaceWith(df(1L -> 1L))
      t.appendBatch(df(2L -> 2L), batchId = 7L)
      t.compact(spark) // snapshot absorbs batch-7 into generation 1
      assert(t.activeEpoch(spark) == 1)
      // the delayed writer wakes up and runs its reconcile pass with
      // the stale pre-compaction epoch — the fold manifest must stop it
      t.reconcileBatch(spark, batchId = 7L, epochHint = 0)
      assert(!new java.io.File(s"$root/t_ingest_v1/batch-7").exists,
        "absorbed batch re-promoted — rows now duplicated")
      assert(rows(root) == Seq(1L -> 1L, 2L -> 2L))
      t.compact(spark) // duplication would become permanent here
      assert(rows(root) == Seq(1L -> 1L, 2L -> 2L),
        "fold duplicated the absorbed batch's rows")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a delayed writer must not resurrect a batch a rebuild discarded") {
    val root = java.nio.file.Files.createTempDirectory("graft-ep-res").toString
    try {
      val t = table(root)
      t.replaceWith(df(1L -> 1L))
      t.appendBatch(df(2L -> 2L), batchId = 3L)
      // the rebuild deliberately supersedes batch-3 (it was committed
      // before the rebuild listed its pre-state)
      t.replaceWith(df(9L -> 9L))
      assert(rows(root) == Seq(9L -> 9L))
      t.reconcileBatch(spark, batchId = 3L, epochHint = 0)
      assert(rows(root) == Seq(9L -> 9L),
        "rebuild-discarded batch resurrected by a delayed writer")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a stranded batch (writer died before reconcile) is rescued at cleanup") {
    val root = java.nio.file.Files.createTempDirectory("graft-ep-str").toString
    try {
      val t = table(root)
      t.replaceWith(df(1L -> 1L))
      t.compact(spark) // active generation 1; gen 0 in one-cycle grace
      assert(t.activeEpoch(spark) == 1)
      // a writer that resolved epoch 0 commits its batch AFTER the
      // compaction's post-commit re-list, then dies before its
      // reconcile pass — the batch sits stranded in the retired
      // generation's ingest (written raw: no self-promotion)
      df(5L -> 5L).write.mode("overwrite").parquet(s"$root/t_ingest/batch-9")
      // next compaction's cleanup deletes generation 0 — the rescue
      // must promote batch-9 (no manifest accounts for it) instead of
      // deleting the only copy
      t.compact(spark)
      assert(rows(root) == Seq(1L -> 1L, 5L -> 5L),
        "stranded batch deleted with its generation")
      // and it keeps folding forward like any batch
      t.compact(spark)
      assert(rows(root) == Seq(1L -> 1L, 5L -> 5L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("no manifest chain (legacy layout): stranded batches keep the legacy delete") {
    // without the manifest, "folded" and "stranded" are
    // indistinguishable — promoting would double-count folded rows
    // (the common case), so the rescue must stand down
    val root = java.nio.file.Files.createTempDirectory("graft-ep-leg").toString
    try {
      val t = table(root)
      t.replaceWith(df(1L -> 1L))
      t.compact(spark)
      df(5L -> 5L).write.mode("overwrite").parquet(s"$root/t_ingest/batch-9")
      // simulate a pre-manifest layout: the chain is incomplete
      assert(new java.io.File(s"$root/t_folded_v1").delete())
      t.compact(spark)
      assert(rows(root) == Seq(1L -> 1L),
        "rescue promoted under an incomplete manifest chain")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a torn INITIAL build reads as absent: loud alone, batches-only beside batches") {
    // epoch 0 is the one generation readers resolve without
    // activeEpoch's _SUCCESS gate — a crash mid-way through the first
    // replaceWith used to hand readers the partial base silently
    val root = java.nio.file.Files.createTempDirectory("graft-ep-torn0").toString
    try {
      val t = table(root)
      t.replaceWith(df(1L -> 1L))
      assert(new java.io.File(s"$root/t/_SUCCESS").delete())
      // no committed batches: partial rows must NOT come back silently
      val e = intercept[IllegalStateException](t.read(spark).collect())
      assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
      // committed batches still serve (append-before-init semantics)
      t.appendBatch(df(2L -> 2L), batchId = 0L)
      assert(rows(root) == Seq(2L -> 2L),
        "torn base blocked the committed-batches view")
      // the retried build heals (and, as any rebuild, supersedes the
      // pre-state batches)
      t.replaceWith(df(1L -> 1L))
      assert(rows(root) == Seq(1L -> 1L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a torn batch dir becomes visible once its _SUCCESS lands (negative verdicts uncached)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ep-torn").toString
    try {
      val t = table(root)
      t.replaceWith(df(1L -> 1L))
      // stage a batch dir by hand: data file but no commit marker
      t.appendBatch(df(2L -> 2L), batchId = 0L)
      val bdir = new java.io.File(s"$root/t_ingest/batch-0")
      val marker = new java.io.File(bdir, "_SUCCESS")
      assert(marker.delete())
      assert(rows(root) == Seq(1L -> 1L), "uncommitted batch visible")
      // the commit marker lands later (a slow committer, a recovered
      // writer): the very next read must see the batch — a cached
      // negative verdict would hide it forever on object stores
      assert(marker.createNewFile())
      assert(rows(root) == Seq(1L -> 1L, 2L -> 2L),
        "batch stayed invisible after its _SUCCESS landed")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("partitioned generations never commit unreadable: marker suppression works, empty and non-empty commit readable") {
    val root = java.nio.file.Files.createTempDirectory("graft-ep-marker").toString
    try {
      val s = spark
      import s.implicits._
      // pin the Spark behavior writeGeneration relies on: a per-write
      // option reaches the job's hadoop conf and suppresses the
      // committer's _SUCCESS. If this ever stops holding, the empty
      // partitioned compaction would briefly expose a COMMITTED,
      // UNREADABLE generation (only _SUCCESS on disk) to concurrent
      // readers between writeGeneration's two writes.
      Seq((1L, 1L)).toDF("id", "v").write.mode("overwrite")
        .partitionBy("v")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(s"$root/raw")
      assert(!new java.io.File(s"$root/raw/_SUCCESS").exists(),
        "write option did not suppress the committer marker — " +
          "writeGeneration's committed-unreadable window is back")
      // and the manual-marker path: a partitioned NON-empty generation
      // still commits with _SUCCESS (activeEpoch keys on it) and data
      val t = EpochedTable(root, "pt", Seq("id", "v"),
        partitionCols = Seq("v"),
        normalizeRead = df => df.withColumn("v", col("v").cast("long")))
      t.replaceWith(df(1L -> 1L))
      assert(new java.io.File(s"$root/pt/_SUCCESS").exists(),
        "partitioned generation committed without its marker")
      t.appendBatch(df(2L -> 2L), batchId = 0L)
      t.compact(spark)
      assert(new java.io.File(s"$root/pt_v1/_SUCCESS").exists())
      assert(rowsOf(t.read(spark).orderBy(col("id")))
        .map(r => (r("id").asInstanceOf[Long], r("v").asInstanceOf[Long]))
        == Seq(1L -> 1L, 2L -> 2L))
      // EMPTY partitioned generation (replaceWith of zero rows):
      // commits readable — plain layout, schema-bearing part file
      t.replaceWith(df())
      val gen2 = new java.io.File(s"$root/pt_v2")
      assert(new java.io.File(gen2, "_SUCCESS").exists())
      assert(gen2.listFiles().exists(f =>
        !f.getName.startsWith("_") && !f.getName.startsWith(".")),
        "empty partitioned generation has no schema-bearing part file")
      assert(t.read(spark).count() == 0L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a session-level dynamic partitionOverwriteMode cannot resurrect a crashed attempt's debris") {
    // under `dynamic`, a path overwrite replaces ONLY the partitions
    // present in the written frame — a crashed prior attempt's
    // partition dirs would survive a generation rewrite, hasData would
    // misread the debris as data, and the manual _SUCCESS would commit
    // the crashed attempt's stale rows (worst on an EMPTY rewrite,
    // which writes no partitions at all). writeGeneration pins the
    // mode static per-write; this test holds the session conf at
    // dynamic throughout and asserts the debris never comes back.
    val root = java.nio.file.Files.createTempDirectory("graft-ep-dyn").toString
    def plantDebris(gen: String, pair: (Long, Long)): Unit = {
      df(pair).write.mode("overwrite").partitionBy("v")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(s"$root/$gen")
      assert(!new java.io.File(s"$root/$gen/_SUCCESS").exists())
    }
    try {
      val t = EpochedTable(root, "pt", Seq("id", "v"),
        partitionCols = Seq("v"),
        normalizeRead = d => d.withColumn("v", col("v").cast("long")))
      t.replaceWith(df(1L -> 1L)) // epoch 0
      plantDebris("pt_v1", 99L -> 99L) // crashed attempt at the next target
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try {
        // EMPTY rebuild over the debris: dynamic semantics would keep
        // the v=99 dir and commit it as the generation's content
        t.replaceWith(df())
        assert(t.activeEpoch(spark) == 1)
        assert(t.read(spark).count() == 0L,
          "empty rebuild resurrected crashed-attempt debris")
        // NON-empty rebuild over fresh debris: replaces, never merges
        plantDebris("pt_v2", 98L -> 98L)
        t.replaceWith(df(2L -> 2L))
        val got = rowsOf(t.read(spark).orderBy(col("id")))
          .map(r => (r("id").asInstanceOf[Long], r("v").asInstanceOf[Long]))
        assert(got == Seq(2L -> 2L),
          s"rebuild merged with crashed-attempt debris: $got")
      } finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }
}
