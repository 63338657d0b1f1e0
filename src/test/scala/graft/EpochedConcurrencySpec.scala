package graft

import org.apache.spark.sql.functions.col

import graft.sources.EpochedTable

/** LIVE-interleaving coverage of [[graft.sources.EpochedTable]]'s
  * reader contract — the complement of [[EpochedCrashMatrixSpec]],
  * which constructs crash states by hand: here a reader loop runs
  * CONCURRENTLY with a writer driving append → compact cycles, so the
  * real windows (fold snapshot → generation commit → late-batch
  * promotion → cleanup under the one-cycle grace, plus
  * writeGeneration's suppressed-marker empty-rewrite) are hit at
  * whatever instants the scheduler produces. Invariants asserted on
  * every read:
  *
  *   1. NO FAILED READ — a committed table must never throw at a
  *      reader (the committed-unreadable window this round closed
  *      would surface here as UNABLE_TO_INFER_SCHEMA; a cleanup
  *      racing a pinned listing would surface as
  *      FileNotFoundException);
  *   2. MONOTONE CONTENT — batches only add rows and folds only move
  *      them, so the set of ids seen can only grow, and every id seen
  *      must be one the writer actually committed by then.
  *
  * Single JVM by necessity (the suite's session), but the windows
  * under test are filesystem-visibility windows, not JVM-memory ones
  * — both sides go through the same Hadoop FS calls a cross-JVM
  * reader would. The one same-JVM artifact, the positive
  * committed-batch memo, only ever SKIPS re-checks of already-proven
  * states and is keyed by qualified path.
  */
class EpochedConcurrencySpec extends SparkSuite {

  private def df(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("id", "v")
  }

  /** Writer-side pacing: block until the reader COMPLETES at least one
    * read after this call (or fails, or a generous deadline passes).
    * The contract under test grants a read one concurrent swap of
    * grace; gating each swap on observed read progress keeps in-flight
    * reads to at most one swap REGARDLESS of scheduler speed — a fixed
    * sleep would let a slow CI read straddle two swaps and fail the
    * suite spuriously while exceeding, not testing, the contract. */
  private def awaitReaderProgress(reads: () => Int,
      readerFailed: () => Boolean): Unit = {
    val mark = reads()
    val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
    while (reads() == mark && !readerFailed() && System.nanoTime < deadline)
      Thread.sleep(10)
  }

  // both shipped layouts: plain, and the partitioned one that
  // exercises writeGeneration's suppressed-marker path and the
  // partition-discovery reassembly (the crash matrix's same split)
  private case class Layout(name: String, table: String => EpochedTable)
  private val layouts = Seq(
    Layout("plain", root => EpochedTable(root, "t", Seq("id", "v"))),
    Layout("partitioned", root =>
      EpochedTable(root, "t", Seq("id", "v"), partitionCols = Seq("v"),
        normalizeRead = d => d.withColumn("v", col("v").cast("long")))))

  for (layout <- layouts)
  test(s"[${layout.name}] a reader loop never fails or loses rows across live compaction cycles") {
    val root =
      java.nio.file.Files.createTempDirectory("graft-ep-conc").toString
    try {
      val t = layout.table(root)
      t.replaceWith(df(0L -> 0L))
      val cycles = 6
      @volatile var committedUpTo = 0L // highest id the writer committed
      @volatile var writerDone = false
      @volatile var writerErr: Throwable = null
      @volatile var reads = 0
      @volatile var readerErr: Throwable = null
      val writer = new Thread(() => {
        try {
          var id = 1L
          for (_ <- 1 to cycles) {
            t.appendBatch(df(id -> id), batchId = id)
            committedUpTo = id
            id += 1
            t.compact(spark)
            // the reader grace is ONE cycle: a read whose epoch
            // resolution straddled TWO swaps may legitimately miss its
            // pinned listing. Gate the next swap on the reader having
            // COMPLETED a read since this one — in-flight reads stay
            // within one concurrent swap, testing the contract
            // without exceeding it at any scheduler speed
            awaitReaderProgress(() => reads, () => readerErr != null)
          }
        } catch { case e: Throwable => writerErr = e }
        finally writerDone = true
      }, "epoched-writer")
      val seen = scala.collection.mutable.Set.empty[Long]
      var maxSeen = -1L
      writer.start()
      try {
        while (!writerDone && readerErr == null) {
          try {
            // read the ids visible RIGHT NOW; remember the commit
            // floor from BEFORE the read — everything committed by
            // then must be visible in a read that started after
            val floor = committedUpTo
            val ids = t.read(spark).select(col("id"))
              .collect().map(_.getLong(0)).toSet
            reads += 1
            // no loss: every id committed before the read began is
            // present (ids 0..floor), and nothing ever disappears
            assert((0L to floor).forall(ids),
              s"read $reads lost committed rows: floor=$floor got=$ids")
            assert(ids.max >= maxSeen,
              s"read $reads went backwards: had max $maxSeen, got $ids")
            maxSeen = ids.max
            seen ++= ids
          } catch { case e: Throwable => readerErr = e }
        }
      } finally writer.join(120000)
      assert(writerErr == null, s"writer failed: $writerErr")
      assert(readerErr == null, s"reader failed: $readerErr")
      assert(reads > 0, "reader never completed a read")
      // final state: everything the writer committed is readable
      val finalIds = t.read(spark).select(col("id"))
        .collect().map(_.getLong(0)).toSet
      assert(finalIds == (0L to cycles.toLong).toSet, finalIds.toString)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("an empty table's compaction cycles stay readable under a concurrent reader") {
    val root =
      java.nio.file.Files.createTempDirectory("graft-ep-conc-empty").toString
    try {
      // partitioned: every fold takes the suppressed-marker empty
      // rewrite — the committed-unreadable window this round closed
      val t = layouts.last.table(root)
      t.replaceWith(df()) // epoch-0 base: ZERO rows, partitioned layout
      @volatile var writerDone = false
      @volatile var writerErr: Throwable = null
      @volatile var reads = 0
      @volatile var readerErr: Throwable = null
      val writer = new Thread(() => {
        // empty folds: every generation takes writeGeneration's
        // empty-rewrite path (suppressed marker → plain rewrite) —
        // the exact window a committed-unreadable generation would
        // have lived in. Swaps gated on read progress (see
        // awaitReaderProgress), not wall-clock
        try for (_ <- 1 to 4) {
          t.compact(spark)
          awaitReaderProgress(() => reads, () => readerErr != null)
        }
        catch { case e: Throwable => writerErr = e }
        finally writerDone = true
      }, "epoched-empty-writer")
      writer.start()
      try {
        while (!writerDone && readerErr == null) {
          try {
            assert(t.read(spark).count() == 0L)
            reads += 1
          } catch { case e: Throwable => readerErr = e }
        }
      } finally writer.join(120000)
      assert(writerErr == null, s"writer failed: $writerErr")
      assert(readerErr == null, s"reader failed: $readerErr")
      assert(reads > 0, "reader never completed a read")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }
}
