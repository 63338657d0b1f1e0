package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental (index-once, dedup-deltas) dedup: greedy first-wins
  * verdicts, inline == indexed parity, and the ingest-loop append
  * invariant. */
class IncrementalDedupSpec extends SparkSuite {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the green hills " +
      "and a river runs through the quiet valley under a pale morning sky"
  private val other =
    "completely different text about spark catalyst optimizer rules and physical " +
      "plans for distributed aggregation joins and shuffles at massive scale"

  private def verdicts(df: DataFrame): Map[Long, (String, Long)] =
    rowsOf(df).map(r => r("doc_id").asInstanceOf[Long] ->
      (r("verdict").asInstanceOf[String], r("match_id").asInstanceOf[Long])).toMap

  test("greedy first-wins verdicts: every class on a hand fixture") {
    val corpus = docs(1L -> base, 2L -> other)
    val batch = docs(
      10L -> base,                           // exact copy of corpus doc 1
      11L -> "Fresh   Unseen Content here",  // kept (first of an exact pair)
      12L -> "fresh unseen content HERE",    // exact_batch dup of 11 (normalized)
      13L -> (other + " extra tail words"),  // near_corpus of 2
      14L -> "unique brand new standalone document nothing shares these tokens",
      15L -> ("unique brand new standalone document nothing shares these tokens" +
        " with a small tail"))               // near_batch of 14
    val v = verdicts(Dedup.dedupIncremental(corpus, batch, threshold = 0.3))
    assert(v(10L) == ("exact_corpus", 1L))
    assert(v(11L) == ("kept", -1L))
    assert(v(12L) == ("exact_batch", 11L))
    assert(v(13L) == ("near_corpus", 2L))
    assert(v(14L) == ("kept", -1L))
    assert(v(15L) == ("near_batch", 14L))
  }

  test("priority: exact beats near, corpus beats batch") {
    // batch doc 20 is an exact copy of corpus 1 AND near-dup of batch 19
    // (itself a near-copy of corpus 1): exact_corpus must win for 20,
    // near_corpus (not near_batch, despite 19 < 20 banding with it)
    // must win for 19 only through the corpus-first coalesce order
    val corpus = docs(1L -> base)
    val batch = docs(19L -> (base + " tiny tail"), 20L -> base)
    val v = verdicts(Dedup.dedupIncremental(corpus, batch, threshold = 0.3))
    assert(v(20L) == ("exact_corpus", 1L))
    assert(v(19L) == ("near_corpus", 1L))
  }

  test("indexed equals inline; append makes the batch all exact_corpus") {
    val corpus = docs(1L -> base, 2L -> other,
      3L -> "third corpus document with its own words about rivers and stone bridges")
    val batch = docs(10L -> base, 11L -> (other + " appended words"),
      12L -> "entirely novel tokens assembled into one never before seen document")
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-idx").toString
    try {
      Dedup.writeDedupIndex(corpus, dir)
      val inline = rowsOf(Dedup.dedupIncremental(corpus, batch, threshold = 0.3))
      val indexed = rowsOf(Dedup.dedupIncrementalIndexed(dir, batch, threshold = 0.3))
      assert(indexed == inline)
      // ingest loop: append the batch, re-run — every doc is now IN the
      // corpus, so all verdicts are exact_corpus; the match is the
      // SMALLEST corpus doc with the fingerprint (doc 10 duplicates
      // corpus doc 1, so it matches 1, not itself)
      Dedup.appendToDedupIndex(batch, dir)
      val rerun = verdicts(Dedup.dedupIncrementalIndexed(dir, batch, threshold = 0.3))
      assert(rerun == Map(
        10L -> ("exact_corpus", 1L),
        11L -> ("exact_corpus", 11L),
        12L -> ("exact_corpus", 12L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("a torn rebuild (table/meta build-stamp skew) fails loudly, not silently empty") {
    // the three index tables and the meta sidecar commit independently
    // — a rebuild that crashes in between leaves meta pinning sketch
    // parameters some table was not built with. Probing such a store
    // would band the batch with the WRONG constants and silently find
    // zero candidates; the build stamp turns that into a loud refusal
    val corpus = docs(1L -> base, 2L -> other)
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-torn").toString
    try {
      Dedup.writeDedupIndex(corpus, dir)
      // healthy store probes fine
      assert(rowsOf(Dedup.dedupIncrementalIndexed(dir, docs(10L -> base),
        threshold = 0.3)).nonEmpty)
      // simulate the crash: bands table carries a different build than
      // meta (as if replaceWith committed but the meta write never
      // ran). Drop the local FS's .crc sidecar along with the rewrite
      // — a raw overwrite would otherwise trip ChecksumFileSystem
      // before the stamp is even compared
      val stamp = new java.io.File(dir, "bands_build")
      new java.io.File(dir, ".bands_build.crc").delete()
      java.nio.file.Files.write(stamp.toPath,
        "stale-build-from-crashed-rebuild".getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException](
        Dedup.dedupIncrementalIndexed(dir, docs(10L -> base), threshold = 0.3))
      assert(e.getMessage.contains("torn"), e.getMessage)
      // a fresh rebuild heals the store
      Dedup.writeDedupIndex(corpus, dir)
      assert(rowsOf(Dedup.dedupIncrementalIndexed(dir, docs(10L -> base),
        threshold = 0.3)).nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("streaming ingest loop: batch N+1 dedups against what batch N kept") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup-idx").toString
    try {
      // seed: an index over a 1-doc corpus
      Dedup.writeDedupIndex(docs(1L -> base), dir)
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val stream = mem.toDF().toDF("doc_id", "text")
      val seen = scala.collection.mutable.Map[Long, (String, Long)]()
      val q = graft.streaming.StreamingDedup.incrementalIngest(
        stream, dir, threshold = 0.3) { (verdicts, _) =>
        seen.synchronized { seen ++= verdicts.collect().map(r =>
          r.getLong(0) -> (r.getString(1), r.getLong(2))) }
      }
      // batch 1: an exact dup of the seed corpus, a fresh doc, and an
      // in-batch near-dup of that fresh doc
      mem.addData((10L, base), (11L, other), (12L, other + " extra tail"))
      q.processAllAvailable()
      // batch 2: exact copy of batch-1's KEPT doc (cross-batch exact),
      // near-dup of it (cross-batch near), and a dropped-doc copy
      mem.addData((20L, other), (21L, other + " trailing bits"), (22L, base))
      q.processAllAvailable()
      q.stop()
      assert(seen(10L) == ("exact_corpus", 1L))
      assert(seen(11L) == ("kept", -1L))
      assert(seen(12L) == ("near_batch", 11L))
      // 11 was appended, so batch 2 sees it as CORPUS; 22 matches the
      // original seed doc — dropped docs (10, 12) are NOT in the index,
      // which is why 20 matches 11 and not 12
      assert(seen(20L) == ("exact_corpus", 11L))
      assert(seen(21L) == ("near_corpus", 11L))
      assert(seen(22L) == ("exact_corpus", 1L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("hot-bucket cap only ever moves near verdicts toward kept") {
    val corpus = docs((1L to 6L).map(i => i -> (base + s" tail $i")): _*)
    val batch = docs((10L to 14L).map(i => i -> (base + s" tail b $i")): _*)
    val full = verdicts(Dedup.dedupIncremental(corpus, batch, threshold = 0.3))
    val capped = verdicts(
      Dedup.dedupIncremental(corpus, batch, threshold = 0.3, maxBucket = Some(1)))
    // with every doc a near-dup of every other, cap=1 drops all buckets
    capped.foreach { case (id, (verdict, _)) =>
      val fullV = full(id)._1
      assert(verdict == fullV || verdict == "kept",
        s"cap may only drop candidates, never add: $id $fullV -> $verdict")
    }
    assert(full.exists(_._2._1 != "kept"), "fixture must produce near-dups uncapped")
    assert(capped.forall(_._2._1 == "kept"), "cap=1 must drop every banded bucket")
  }

  test("cap counts are prunable: unprobed corpus buckets cannot change verdicts") {
    // The cap path semi-join-prunes the persisted bands table to the
    // buckets the batch probes (index contract: delta work ∝ batch).
    // That prune is only sound if an over-cap bucket the batch never
    // probes has NO effect on verdicts — pin exactly that: adding a
    // large family of mutual near-dups (a hot bucket) in a disjoint
    // shingle universe leaves every batch verdict byte-identical,
    // capped and uncapped.
    val corpus = docs(1L -> base, 2L -> other)
    val hotFamily = (100L to 120L).map(i =>
      i -> ("orbital telescopes map distant galaxies while silent probes " +
        s"drift past frozen moons recording faint signals number $i"))
    val corpusHot = docs((Seq(1L -> base, 2L -> other) ++ hotFamily): _*)
    val batch = docs(10L -> (base + " small tail"), 11L -> "totally novel words")
    for (cap <- Seq(None, Some(3))) {
      val lean = verdicts(
        Dedup.dedupIncremental(corpus, batch, threshold = 0.3, maxBucket = cap))
      val hot = verdicts(
        Dedup.dedupIncremental(corpusHot, batch, threshold = 0.3, maxBucket = cap))
      assert(lean == hot,
        s"unprobed hot bucket changed verdicts under cap=$cap: $lean vs $hot")
    }
  }

  test("streaming labeled ingest: labels grow; batch N+1 inherits batch N clusters") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-lingest").toString
    try {
      // seed: 1-doc corpus, indexed and labeled
      Dedup.writeDedupIndex(docs(1L -> base), s"$root/idx")
      Dedup.writeDedupLabels(docs(1L -> base), s"$root/lbl")
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val stream = mem.toDF().toDF("doc_id", "text")
      val q = graft.streaming.StreamingDedup.labeledIngest(
        stream, s"$root/idx", s"$root/lbl", threshold = Some(0.3)) { (_, _) => () }
      // batch 1: a novel pair (10 canonical) — nothing matches the seed
      mem.addData((10L, other), (11L, other + " extra tail"))
      q.processAllAvailable()
      // batch 2: near-dup of batch-1's doc 11 (now in the index, labeled
      // 10) inherits 10 TRANSITIVELY through the appended label rows;
      // near-dup of the seed inherits 1
      mem.addData((20L, other + " extra tail bits"), (21L, base + " tiny tail"))
      q.processAllAvailable()
      q.stop()
      val labels = rowsOf(
        Dedup.readDedupLabels(spark, s"$root/lbl").orderBy(col("doc_id")))
        .map(r => r("doc_id") -> r("cluster")).toMap
      assert(labels == Map(1L -> 1L, 10L -> 10L, 11L -> 10L,
        20L -> 10L, 21L -> 1L), s"label table after two batches: $labels")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("appendDedupLabels is idempotent under at-least-once replay") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-replay").toString
    try {
      Dedup.writeDedupLabels(docs(1L -> base), s"$root/lbl")
      val batchLabels = Seq((10L, 10L), (11L, 10L)).toDF("doc_id", "cluster")
      Dedup.appendDedupLabels(batchLabels, s"$root/lbl", batchId = 0L)
      // foreachBatch replay: the same batchId lands again — the
      // overwrite-per-batch layout must rewrite, not duplicate
      Dedup.appendDedupLabels(batchLabels, s"$root/lbl", batchId = 0L)
      val all = rowsOf(Dedup.readDedupLabels(spark, s"$root/lbl")
        .orderBy(col("doc_id")))
        .map(r => (r("doc_id"), r("cluster")))
      assert(all == Seq((1L, 1L), (10L, 10L), (11L, 10L)),
        s"replayed append duplicated label rows: $all")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("compactDedupLabels folds ingest batches into the base, rows unchanged") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    try {
      Dedup.writeDedupLabels(docs(1L -> base), s"$root/lbl")
      Dedup.appendDedupLabels(
        Seq((10L, 10L), (11L, 10L)).toDF("doc_id", "cluster"),
        s"$root/lbl", batchId = 0L)
      Dedup.appendDedupLabels(
        Seq((20L, 1L)).toDF("doc_id", "cluster"), s"$root/lbl", batchId = 1L)
      def snapshot() = rowsOf(
        Dedup.readDedupLabels(spark, s"$root/lbl").orderBy(col("doc_id")))
        .map(r => (r("doc_id"), r("cluster")))
      val before = snapshot()
      Dedup.compactDedupLabels(spark, s"$root/lbl")
      assert(snapshot() == before, "compaction changed label rows")
      // one-cycle reader grace: the retired generation (base AND its
      // ingest) survives THIS compaction so pinned scans drain; only
      // the next cycle deletes it
      assert(new java.io.File(s"$root/lbl/ingest").exists,
        "retired ingest deleted immediately — draining readers break")
      // a later batch starts a fresh ingest generation cleanly
      Dedup.appendDedupLabels(
        Seq((30L, 30L)).toDF("doc_id", "cluster"), s"$root/lbl", batchId = 2L)
      assert(snapshot() == before :+ ((30L, 30L)))
      Dedup.compactDedupLabels(spark, s"$root/lbl")
      assert(snapshot() == before :+ ((30L, 30L)),
        "second compaction changed label rows")
      assert(!new java.io.File(s"$root/lbl/ingest").exists &&
          !new java.io.File(s"$root/lbl/labels").exists,
        "generation 0 outlived its grace cycle")
      assert(new java.io.File(s"$root/lbl/labels_ingest_v1").exists,
        "the JUST-retired generation's ingest must stay for one cycle")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("appendToDedupIndex with a batchId is idempotent under replay") {
    val root = java.nio.file.Files.createTempDirectory("graft-idx-replay").toString
    try {
      Dedup.writeDedupIndex(docs(1L -> base), s"$root/idx")
      val batch = docs(10L -> other)
      Dedup.appendToDedupIndex(batch, s"$root/idx", Some(0L))
      def fpCount() = spark.read.parquet(s"$root/idx/fp")
        .unionAll(spark.read.parquet(s"$root/idx/fp_ingest/*")).count()
      val once = fpCount()
      // an at-least-once recovery replays the batch verbatim: the
      // per-batchId overwrite dir must rewrite, not duplicate —
      // a bare append here would grow fp/bands/shingles every recovery
      Dedup.appendToDedupIndex(batch, s"$root/idx", Some(0L))
      assert(fpCount() == once, "replayed index append duplicated rows")
      // and the probe still sees the appended doc as corpus content
      val v = verdicts(Dedup.dedupIncrementalIndexed(s"$root/idx",
        docs(20L -> other), threshold = 0.3))
      assert(v(20L) == ("exact_corpus", 10L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("incrementalIngest replay window: verdicts recompute pre-batch; kept docs survive the rewrite") {
    val root = java.nio.file.Files.createTempDirectory("graft-idx-window").toString
    try {
      Dedup.writeDedupIndex(docs(1L -> base), s"$root/idx")
      // 10 is novel (kept), 11 duplicates corpus doc 1 (dropped)
      val batch = docs(10L -> other, 11L -> base)
      // the foreachBatch body incrementalIngest runs: probe EXCLUDING
      // this batch's own leftovers, then append only the kept docs
      // into the per-batch dir
      def runBody(): Map[Long, (String, Long)] = {
        val v = Dedup.dedupIncrementalIndexed(s"$root/idx", batch,
          threshold = 0.3, excludeBatchId = Some(7L))
        val kept = v.filter(col("verdict") === "kept").select(col("doc_id"))
        Dedup.appendToDedupIndex(
          batch.join(kept, Seq("doc_id"), "left_semi"), s"$root/idx",
          Some(7L))
        verdicts(v)
      }
      val first = runBody()
      assert(first(10L) == ("kept", -1L) && first(11L)._1 != "kept")
      // at-least-once window: the append committed but the micro-batch
      // did not — the body re-runs with the SAME batchId. Without the
      // excludeBatchId probe, doc 10 would self-match exact_corpus,
      // keptIds would go empty, and the rewrite would ERASE doc 10
      // from the index
      val replay = runBody()
      assert(replay == first, "replay verdicts diverged from the original run")
      val probe = verdicts(Dedup.dedupIncrementalIndexed(s"$root/idx",
        docs(20L -> other), threshold = 0.3))
      assert(probe(20L) == ("exact_corpus", 10L),
        "kept doc vanished from the index after the replay rewrite")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a torn (uncommitted) ingest batch dir is invisible to probes, not a wedge") {
    val root = java.nio.file.Files.createTempDirectory("graft-idx-torn").toString
    try {
      Dedup.writeDedupIndex(docs(1L -> base), s"$root/idx")
      // simulate a crash mid-append: the committer created the batch
      // dir but no data files or _SUCCESS marker ever landed
      for (t <- Seq("fp", "bands", "shingles"))
        new java.io.File(s"$root/idx/${t}_ingest/batch-3").mkdirs()
      // a recovery probe must still run (reading the torn dir would
      // throw schema inference errors and wedge every retry)
      val v = verdicts(Dedup.dedupIncrementalIndexed(s"$root/idx",
        docs(20L -> base), threshold = 0.3))
      assert(v(20L) == ("exact_corpus", 1L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a committed-but-EMPTY ingest batch dir is invisible, not a wedge") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-empty-b").toString
    try {
      Dedup.writeDedupLabels(docs(1L -> base), s"$root/lbl")
      // a genuinely empty micro-batch append: whatever files Spark
      // does or does not produce, later reads must survive it
      Dedup.appendDedupLabels(
        Seq.empty[(Long, Long)].toDF("doc_id", "cluster"),
        s"$root/lbl", batchId = 7L)
      // and the worst-case simulation: _SUCCESS with zero part files
      // (no task opened a writer) — schema inference has nothing to
      // read there, so the dir must be skipped, not scanned
      val b8 = new java.io.File(s"$root/lbl/ingest/batch-8")
      assert(b8.mkdirs())
      assert(new java.io.File(b8, "_SUCCESS").createNewFile())
      val all = rowsOf(Dedup.readDedupLabels(spark, s"$root/lbl"))
        .map(r => (r("doc_id"), r("cluster")))
      assert(all == Seq((1L, 1L)), s"unexpected rows: $all")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("compactDedupIndex folds batch dirs; probes unchanged; generations advance") {
    val root = java.nio.file.Files.createTempDirectory("graft-idx-compact").toString
    try {
      Dedup.writeDedupIndex(docs(1L -> base), s"$root/idx")
      Dedup.appendToDedupIndex(docs(10L -> other), s"$root/idx", Some(0L))
      def probe() = verdicts(Dedup.dedupIncrementalIndexed(s"$root/idx",
        docs(20L -> base, 21L -> other), threshold = 0.3))
      val before = probe()
      Dedup.compactDedupIndex(spark, s"$root/idx")
      assert(probe() == before, "compaction changed probe verdicts")
      for (t <- Seq("fp", "bands", "shingles")) {
        // one-cycle reader grace: retired gen-0 dirs survive the
        // compaction that retired them, die on the next one
        assert(new java.io.File(s"$root/idx/${t}_ingest").exists,
          s"retired ${t}_ingest deleted immediately")
        assert(new java.io.File(s"$root/idx/${t}_v1/_SUCCESS").exists,
          s"${t}_v1 not committed with a _SUCCESS marker")
      }
      Dedup.compactDedupIndex(spark, s"$root/idx")
      assert(probe() == before, "second compaction changed probe verdicts")
      for (t <- Seq("fp", "bands", "shingles"))
        assert(!new java.io.File(s"$root/idx/${t}_ingest").exists &&
            !new java.io.File(s"$root/idx/$t").exists,
          s"$t generation 0 outlived its grace cycle")
      // the next ingest generation starts cleanly and is read back
      Dedup.appendToDedupIndex(docs(30L -> (other + " more")), s"$root/idx",
        Some(1L))
      val v = verdicts(Dedup.dedupIncrementalIndexed(s"$root/idx",
        docs(40L -> (other + " more")), threshold = 0.3))
      assert(v(40L) == ("exact_corpus", 30L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("label generations: repeated compaction + rebuild stay readable at every step") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-lbl-gen").toString
    try {
      def snapshot() = rowsOf(
        Dedup.readDedupLabels(spark, s"$root/lbl").orderBy(col("doc_id")))
        .map(r => (r("doc_id"), r("cluster")))
      Dedup.writeDedupLabels(docs(1L -> base), s"$root/lbl")
      Dedup.appendDedupLabels(Seq((10L, 1L)).toDF("doc_id", "cluster"),
        s"$root/lbl", batchId = 0L)
      Dedup.compactDedupLabels(spark, s"$root/lbl")  // -> generation 1
      assert(snapshot() == Seq((1L, 1L), (10L, 1L)))
      // appends land in the ACTIVE generation's ingest dir and fold on
      // the next compaction — generation 2
      Dedup.appendDedupLabels(Seq((20L, 20L)).toDF("doc_id", "cluster"),
        s"$root/lbl", batchId = 1L)
      assert(new java.io.File(s"$root/lbl/labels_ingest_v1/batch-1").exists,
        "append missed the active generation's ingest dir")
      Dedup.compactDedupLabels(spark, s"$root/lbl")
      assert(snapshot() == Seq((1L, 1L), (10L, 1L), (20L, 20L)))
      assert(new java.io.File(s"$root/lbl/labels_v2/_SUCCESS").exists)
      // grace: v1 (just retired) drains one cycle; gen 0 (two behind)
      // is gone
      assert(new java.io.File(s"$root/lbl/labels_v1").exists,
        "just-retired generation deleted under draining readers")
      assert(!new java.io.File(s"$root/lbl/labels").exists,
        "generation 0 outlived its grace cycle")
      // a REBUILD over the compacted store must supersede generation 2
      // (writing the legacy epoch-0 dir would be invisible to readers)
      Dedup.writeDedupLabels(docs(1L -> base, 2L -> other), s"$root/lbl")
      assert(snapshot() == Seq((1L, 1L), (2L, 2L)))
      assert(new java.io.File(s"$root/lbl/labels_v3/_SUCCESS").exists)
      assert(!new java.io.File(s"$root/lbl/labels_v1").exists,
        "generation 1 outlived its grace cycle across the rebuild")
      assert(new java.io.File(s"$root/lbl/labels_v2").exists,
        "rebuild deleted the draining generation immediately")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("a crashed compaction (no _SUCCESS) is invisible: readers stay on the old generation") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-lbl-crash").toString
    try {
      Dedup.writeDedupLabels(docs(1L -> base), s"$root/lbl")
      Dedup.appendDedupLabels(Seq((10L, 1L)).toDF("doc_id", "cluster"),
        s"$root/lbl", batchId = 0L)
      def snapshot() = rowsOf(
        Dedup.readDedupLabels(spark, s"$root/lbl").orderBy(col("doc_id")))
        .map(r => (r("doc_id"), r("cluster")))
      val before = snapshot()
      // simulate a compaction that died mid-stage: a labels_v1 dir
      // with data files but NO commit marker must not capture readers
      // (it may hold a partial, ingest-less fold — switching to it
      // would drop rows); nor may appends land in its ingest dir
      Seq((99L, 99L)).toDF("doc_id", "cluster")
        .write.parquet(s"$root/lbl/labels_v1")
      new java.io.File(s"$root/lbl/labels_v1/_SUCCESS").delete()
      assert(snapshot() == before,
        "reader switched to an uncommitted generation")
      Dedup.appendDedupLabels(Seq((20L, 20L)).toDF("doc_id", "cluster"),
        s"$root/lbl", batchId = 1L)
      assert(new java.io.File(s"$root/lbl/ingest/batch-1").exists,
        "append left the active (old) generation")
      assert(snapshot() == before :+ ((20L, 20L)))
      // the NEXT compaction re-stages generation 1 (active is still 0,
      // so active+1 OVERWRITES the torn dir — mode=overwrite, so the
      // crashed content cannot bleed into the fold), commits it, and
      // retires generation 0
      Dedup.compactDedupLabels(spark, s"$root/lbl")
      assert(snapshot() == before :+ ((20L, 20L)),
        "crashed staging content bled into the compacted generation")
      assert(new java.io.File(s"$root/lbl/labels_v1/_SUCCESS").exists)
      // grace: the retired generation drains one cycle, then dies
      assert(new java.io.File(s"$root/lbl/labels").exists,
        "retired generation deleted under draining readers")
      Dedup.compactDedupLabels(spark, s"$root/lbl")
      assert(snapshot() == before :+ ((20L, 20L)))
      assert(!new java.io.File(s"$root/lbl/labels").exists,
        "generation 0 outlived its grace cycle")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("assignDedupLabels: inherit, chain, novel group, singleton, frozen bridge") {
    val third =
      "third corpus family text about mountain passes goat trails and high " +
        "meadow flowers blooming beneath late summer snow fields far away"
    // corpus: {1,2} one near-dup cluster (labeled 1), {3} another, {5} other
    val corpus = docs(1L -> base, 2L -> (base + " tiny tail"), 3L -> third,
      5L -> other)
    val root = java.nio.file.Files.createTempDirectory("graft-assign").toString
    try {
      Dedup.writeDedupIndex(corpus, s"$root/idx", bands = 8)
      Dedup.writeDedupLabels(corpus, s"$root/lbl", bands = 8,
        threshold = 0.3)
      val batch = docs(
        10L -> (base + " extra words"),     // near-copy of cluster {1,2} -> 1
        12L -> (base + " extra words tail"),// chains through 10 -> 1
        14L -> "novel duplicated content assembled for this batch test",
        16L -> "novel duplicated content assembled for this batch test x",
        18L -> "completely isolated singleton nothing shared with anything",
        // bridges corpus clusters 1 and 3 (half of each text): assigned
        // min(1, 3) = 1, corpus table untouched
        20L -> (base + " " + third))
      val got = rowsOf(Dedup.assignDedupLabels(s"$root/idx", s"$root/lbl", batch))
        .map(r => r("doc_id") -> r("cluster")).toMap
      assert(got(10L) == 1L, s"inherit: $got")
      assert(got(12L) == 1L, s"chain through batch: $got")
      assert(got(14L) == 14L && got(16L) == 14L, s"novel group: $got")
      assert(got(18L) == 18L, s"singleton: $got")
      assert(got(20L) == 1L, s"bridge takes min cluster: $got")
      // frozen corpus: the persisted label table is untouched by the
      // assignment — cluster 3 still exists even though a batch doc
      // bridged it to cluster 1
      val corpusLabels = rowsOf(
        Dedup.readDedupLabels(spark, s"$root/lbl").orderBy(col("doc_id")))
        .map(r => r("doc_id") -> r("cluster")).toMap
      assert(corpusLabels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 5L -> 5L),
        s"corpus labels mutated: $corpusLabels")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}
