package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Epoched base+ingest parquet tables — the storage discipline shared
  * by the dedup label table, the three dedup-index tables
  * ([[graft.operators.Dedup]]), the IVF-PQ codes table
  * ([[graft.operators.Similarity]]), and the distinct-sketch table
  * ([[graft.operators.CorpusOps]]).
  *
  * A grown table is (base dir) ∪ (one overwrite-once subdir per
  * ingest batch); compaction folds the union into a FRESH generation
  * and only then retires old ones. Generation N ≥ 1 lives under
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
  *     already on N+1 (higher), older generations are inert
  *     leftovers a later compaction removes;
  *   - cleanup only ever deletes generations STRICTLY below the
  *     PREVIOUS active one — see the concurrency contract below.
  *
  * Concurrency contract (the two round-14 compaction-window caveats,
  * closed in round 15):
  *   - ''Appends racing a compaction'': [[compact]] folds an explicit
  *     SNAPSHOT of the committed batch dirs, records that snapshot in
  *     a FOLD MANIFEST (`<base>_folded_vN+1`, written before the new
  *     generation can commit), and after committing it re-lists and
  *     PROMOTES (copies, tmp+atomic-rename) every batch that landed
  *     after the snapshot into the new generation's ingest dir — a
  *     late append is folded next cycle instead of vanishing. The
  *     residual writer-side race (an append that resolved the old
  *     epoch but finished writing after the promotion re-list) is
  *     closed in [[appendBatch]]: the writer re-resolves the active
  *     epoch after its write and self-promotes its batch forward
  *     until the observed epoch is the one it wrote to — UNLESS a
  *     fold manifest along the epoch chain already names the batch:
  *     then the compaction's snapshot absorbed it (its rows live in
  *     the newer base — a copy would double-count them permanently)
  *     or a rebuild deliberately discarded it, and the writer stands
  *     down. Promotion is by COPY into a per-attempt-unique hidden
  *     tmp dir + atomic rename with a skip-if-present guard, so the
  *     promoter and the self-repairing writer can race each other
  *     safely (two attempts can never interleave writes inside one
  *     staging dir), and a draining reader of the OLD generation
  *     (which may have listed the late batch) keeps its files. A
  *     crashed attempt's tmp dir is inert (dot-prefixed, skipped by
  *     readers) and dies with its generation.
  *   - ''Stranded batches'': a batch committed to a retired
  *     generation's ingest whose writer died before its self-promote
  *     pass is RESCUED by the next compaction's cleanup — before
  *     deleting a generation it promotes any committed batch the
  *     manifest chain does not account for. The rescue requires the
  *     full manifest chain to exist (pre-manifest layouts keep the
  *     old delete: without the manifest, "folded" and "stranded" are
  *     indistinguishable, and promoting a folded batch would
  *     double-count).
  *   - ''Readers racing a compaction'': a reader's plan pins the
  *     generation at listing time ([[read]] resolves the epoch once).
  *     Cleanup retains the immediately-retired generation — base AND
  *     ingest — for ONE further compaction cycle (it deletes strictly
  *     below the previous active), so an in-flight scan that resolved
  *     generation N's listing just before N+1 committed reads intact
  *     files. The grace costs one generation of extra storage between
  *     compactions (the snapshot-retention trade every MVCC table
  *     store makes); a scan must drain within one full compaction
  *     cycle — only then is its generation deleted.
  *
  * A table populated ONLY via [[appendBatch]] (e.g. a streaming
  * sketch ingest against a dir never initialized by a base write)
  * reads as just its committed batches — a missing base generation
  * dir is an empty base, not an error, as long as at least one
  * committed batch dir exists. Reading a table with neither base nor
  * batches still fails loudly (AnalysisException: path does not
  * exist): that is a caller bug, not a recoverable state.
  *
  * `partitionCols` hive-partitions every GENERATION write (the codes
  * table's `cid` layout, so probes keep directory-listing pruning);
  * per-batch ingest dirs stay plain — they are small between
  * compactions and their partition columns ride along as ordinary
  * columns, which `normalizeRead` reconciles with the partition-
  * discovered base schema (e.g. casting an int-inferred partition
  * column back to long).
  */
private[graft] object EpochedTable {
  private[graft] val log =
    org.slf4j.LoggerFactory.getLogger(classOf[EpochedTable])

  /** JVM-wide memo of POSITIVE per-batch-dir committed-and-has-data
    * verdicts — see [[EpochedTable.ingestBatchDirs]]. Bounded by a
    * crude clear-on-overflow; a few thousand re-listings after a rare
    * clear cost less than the bookkeeping of real eviction. */
  private val CacheCap = 4096
  private val committedWithData =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Commit `bytes` to `dest` atomically: write a unique dot-prefixed
    * tmp sibling, then rename — a reader sees the old file, the new
    * file, or (only on filesystems whose rename refuses an existing
    * destination, forcing the delete+retry fallback) briefly none;
    * NEVER a truncated one. The one rename-commit discipline shared by
    * fold manifests and the dedup store's build stamps, so a fix to
    * the fallback semantics cannot silently diverge between them.
    * (Directory promotion keeps its own copy+rename in
    * [[EpochedTable.promoteBatch]] — its skip-if-present race rules
    * and lost-race debris handling are directory-specific.)
    *
    * REQUIRES a single writer per `dest` at a time. Under two
    * concurrent writers the delete+retry fallback can interleave
    * (A deletes, B deletes, A renames, B deletes A's just-committed
    * file and renames its own — or both renames refuse and one
    * writer dies), so last-write-wins is NOT guaranteed on
    * rename-refusing filesystems. Every caller satisfies this
    * structurally: fold manifests and ledger merges are written only
    * by the single compactor ([[EpochedTable.compact]]'s contract),
    * and build stamps only by the single rebuild owner. A new caller
    * must bring the same discipline or serialize externally. */
  private[graft] def writeFileAtomic(fs: org.apache.hadoop.fs.FileSystem,
      dest: org.apache.hadoop.fs.Path, bytes: Array[Byte]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dest.getParent,
      s".${dest.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes)
    finally out.close()
    if (!fs.rename(tmp, dest)) {
      fs.delete(dest, false)
      require(fs.rename(tmp, dest),
        s"atomic commit of $dest failed (rename failed twice)")
    }
  }
}

private[graft] final case class EpochedTable(dir: String, base: String,
    columns: Seq[String], legacyIngest: Option[String] = None,
    partitionCols: Seq[String] = Nil,
    normalizeRead: DataFrame => DataFrame = identity,
    codec: Option[String] = None) {

  /** Apply the table's parquet compression codec, when one is pinned.
    * Per-TABLE, not per-session: the codec is part of the at-rest
    * format contract (golden-store v2 re-encoded the sketch family as
    * zstd — high-entropy register blobs compress materially better
    * than under snappy, and at 100 TB the ratio is storage + scan IO
    * cost). Reads are codec-transparent (parquet is self-describing),
    * so v1 snappy stores stay readable under the same reader —
    * GoldenFormatSpec proves that every build. */
  private def withCodec(
      w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row])
      : org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =
    codec.fold(w)(c => w.option("compression", c))

  def tableDir(e: Int): String =
    if (e == 0) s"$dir/$base" else s"$dir/${base}_v$e"
  def ingestDir(e: Int): String =
    if (e == 0) legacyIngest.getOrElse(s"$dir/${base}_ingest")
    else s"$dir/${base}_ingest_v$e"
  /** The fold manifest of the transition that CREATED generation `e`:
    * the batch names (of generation e−1's ingest) the fold snapshot
    * absorbed — or, for [[replaceWith]], deliberately discarded.
    * Written BEFORE generation `e` can commit, so any observer of an
    * active epoch can trust its manifest is the committing attempt's
    * (a crashed attempt's manifest is overwritten by the retry before
    * that retry writes any data). */
  def manifestPath(e: Int): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$dir/${base}_folded_v$e")

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem, e: Int,
      names: Seq[String]): Unit =
    // atomic commit: an in-place write torn by a crash leaves a
    // TRUNCATED manifest, and a partial last line ("batch-1" torn from
    // "batch-12") would falsely account a batch that was never folded
    // — the appendBatchAt replay stand-down would then skip the only
    // write of that batch's rows. With the rename, a manifest either
    // exists complete or not at all.
    EpochedTable.writeFileAtomic(fs, manifestPath(e),
      names.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** None = no manifest (pre-manifest layout or a fresh table). */
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      e: Int): Option[Set[String]] = readNamesAt(fs, manifestPath(e))

  /** One accounting file's names; None when it does not exist — or
    * vanished between a listing and this read (the lister's
    * merge-then-delete order means a superset survives elsewhere). */
  private def readNamesAt(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[Set[String]] =
    try {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toSet)
      finally in.close()
    } catch {
      case _: java.io.FileNotFoundException => None
    }

  private def fsOf(spark: org.apache.spark.sql.SparkSession) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every surviving accounting file's batch names, from ONE root LIST
    * (cleanup deletes retired manifests with their generations, so the
    * surviving set is short — per-epoch `exists` probes would pay
    * O(epochs) RPCs on an object store for what is almost always one
    * or two files): the fold manifests PLUS the transient overwrite
    * shadow [[cleanupBelow]] parks while it atomically replaces the
    * chain head. The replay stand-downs consult this UNION, so the
    * accounting invariant — "some surviving file names every batch
    * ever folded or discarded" — holds at every instant, including
    * mid-swap on filesystems whose rename refuses an existing
    * destination. A file deleted between the LIST and its read is
    * skipped: whoever deleted it had already committed a superset
    * (merge-then-delete order). */
  private def accountedNames(
      fs: org.apache.hadoop.fs.FileSystem): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) Set.empty
    else {
      val prefix = s"${base}_folded_v"
      fs.listStatus(root).toSeq
        .map(_.getPath)
        .filter(p => !p.getName.startsWith(".") &&
          p.getName.startsWith(prefix))
        .flatMap(p => readNamesAt(fs, p).getOrElse(Set.empty))
        .toSet
    }
  }

  /** Epochs with ANY surviving on-disk piece (table dir, ingest dir,
    * fold manifest) — the same single-root-LIST discipline as
    * [[manifestEpochs]]. Cleanup iterates THESE instead of every
    * integer below the active epoch: a long-lived streaming table's
    * epoch counter grows without bound, and probing each retired
    * number would pay O(current-epoch) RPCs per compaction against
    * dirs deleted cycles ago. */
  private def existingEpochs(
      fs: org.apache.hadoop.fs.FileSystem): Set[Int] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) Set.empty
    else {
      val ingest0 = new org.apache.hadoop.fs.Path(ingestDir(0)).getName
      fs.listStatus(root).toSeq.map(_.getPath.getName).flatMap { n =>
        if (n == base || n == ingest0) Some(0)
        else
          Seq(s"${base}_v", s"${base}_ingest_v", s"${base}_folded_v")
            .collectFirst {
              case p if n.startsWith(p) => n.stripPrefix(p).toIntOption }
            .flatten
      }.toSet
    }
  }

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
      .filter(st =>
        excludeBatch.forall(id => st.getPath.getName != s"batch-$id"))
      // promotion staging dirs (`.batch-N.tmp`) are never readable
      .filter(st => !st.getPath.getName.startsWith("."))
      .filter { st =>
        val p = st.getPath
        // the committed-and-has-data verdict per batch dir is one
        // extra LIST round trip — on an object store that RPC runs
        // per batch dir per read, so a steady-state probe path with a
        // long un-compacted ingest run pays O(batches) RPCs per call.
        // POSITIVE verdicts are memoized JVM-wide by path: once a
        // batch dir is committed-with-data it stays so (a replay's
        // mode(overwrite) TEARS the dir, so appendBatchAt drops the
        // verdict before writing and the torn window re-checks;
        // deletion removes it from the always-live parent listing
        // above and cleanup purges the dying generation's entries, so
        // a stale TRUE can never resurrect a dir). Negative verdicts are NOT
        // cached — a torn dir whose _SUCCESS lands later must become
        // visible on the very next read, and dir mtimes are not
        // trustworthy change signals on object stores
        val memo = EpochedTable.committedWithData
        memo.contains(p.toString) || {
          val ok =
            try {
              val entries = fs.listStatus(p)
              entries.exists(f =>
                  f.isFile && f.getPath.getName == "_SUCCESS") &&
                entries.exists { f =>
                  val n = f.getPath.getName
                  f.isFile && !n.startsWith("_") && !n.startsWith(".")
                }
            } catch {
              // the dir vanished between the parent listing and this
              // one — a replay's mode(overwrite) tearing it down for
              // the rewrite, or another JVM's cleanup deleting a
              // retired ingest. Either way it is not committed-visible
              // RIGHT NOW; the documented re-check behavior, not a
              // crash out of the whole read
              case _: java.io.FileNotFoundException => false
            }
          if (ok) {
            // crude overflow bound: entries for retired generations
            // would otherwise accumulate for the process lifetime
            if (memo.size > EpochedTable.CacheCap) memo.clear()
            memo.add(p.toString)
          }
          ok
        }
      }
      .map(_.getPath.toString)
  }

  /** Normalized read of explicit batch dirs ([[ingestBatchDirs]]). */
  def readBatchDirs(spark: org.apache.spark.sql.SparkSession,
      dirs: Seq[String]): DataFrame =
    normalizeRead(spark.read.parquet(dirs: _*).select(columns.map(col): _*))

  /** Base ∪ explicit batch dirs at a pinned epoch — the assembly
    * [[read]] and [[compact]] share; compact MUST pass the snapshot
    * it listed (re-listing inside would race late appends back in).
    * A missing base dir with committed batches is a batches-only
    * table (the append-before-init pattern); missing base AND no
    * batches surfaces the reader's own path-does-not-exist error. */
  private def assemble(spark: org.apache.spark.sql.SparkSession, epoch: Int,
      batches: Seq[String]): DataFrame = {
    val fs = fsOf(spark)
    val baseDirExists =
      fs.exists(new org.apache.hadoop.fs.Path(tableDir(epoch)))
    // generations ≥ 1 are _SUCCESS-gated by activeEpoch, but EPOCH 0 is
    // resolved unconditionally — a crash mid-way through the INITIAL
    // build would otherwise hand readers a partial base silently, the
    // one crash point the generation scheme didn't cover. An
    // uncommitted epoch-0 base reads as ABSENT (committed batches still
    // serve, the append-before-init pattern); with no batches either,
    // fail LOUDLY instead of returning the torn dir's partial rows.
    val hasBase = baseDirExists && (epoch > 0 || fs.exists(
      new org.apache.hadoop.fs.Path(s"${tableDir(0)}/_SUCCESS")))
    if (!hasBase && batches.nonEmpty) readBatchDirs(spark, batches)
    else if (!hasBase && baseDirExists)
      throw new IllegalStateException(
        s"${tableDir(epoch)} exists without a _SUCCESS marker and no " +
          "committed ingest batches exist — the initial build crashed " +
          "mid-write; re-run it before reading")
    else {
      val baseDf = normalizeRead(
        spark.read.parquet(tableDir(epoch)).select(columns.map(col): _*))
      if (batches.nonEmpty) baseDf.unionAll(readBatchDirs(spark, batches))
      else baseDf
    }
  }

  def read(spark: org.apache.spark.sql.SparkSession,
      excludeBatch: Option[Long] = None): DataFrame = {
    val e = activeEpoch(spark)
    assemble(spark, e, ingestBatchDirs(spark, e, excludeBatch))
  }

  /** Copy a committed batch dir into `epoch`'s ingest dir under the
    * same batch name, via a hidden tmp dir + atomic rename. Skips
    * when the destination already exists (the promoter and a
    * self-repairing writer may race; overwrite-once per batchId makes
    * their contents identical, so first-wins is correct). COPY, not
    * move: a draining reader of the source generation may have listed
    * the source files. The tmp dir is PER-ATTEMPT-UNIQUE: a shared
    * tmp name would let two racing attempts interleave delete/copy
    * inside one staging dir and rename a partial copy (with its
    * `_SUCCESS`, which copies first) into the destination — silent
    * row loss a reader cannot detect. A crashed attempt's tmp leaks
    * until its generation retires; it is dot-prefixed, so readers
    * never see it.
    */
  private def promoteBatch(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      src: org.apache.hadoop.fs.Path, epoch: Int): Unit = {
    val destRoot = new org.apache.hadoop.fs.Path(ingestDir(epoch))
    val dest = new org.apache.hadoop.fs.Path(destRoot, src.getName)
    if (fs.exists(dest)) return
    fs.mkdirs(destRoot)
    val tmp = new org.apache.hadoop.fs.Path(destRoot,
      s".${src.getName}.tmp-${java.util.UUID.randomUUID()}")
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, tmp, false, conf)
    // losing the race here is fine either way: a rename that fails on
    // an existing dest loses to an identical-content promotion; a
    // filesystem that merges instead merges byte-identical files
    if (fs.exists(dest) || !fs.rename(tmp, dest)) {
      fs.delete(tmp, true)
      require(fs.exists(dest),
        s"promotion of ${src.getName} to epoch $epoch neither renamed " +
          "nor found an existing destination")
    }
    // a LOST race can also end with rename returning true: Hadoop
    // rename semantics move the source INSIDE a destination directory
    // that appeared between the exists check and the rename — the tmp
    // is then a hidden child of the committed batch dir (dot-prefixed,
    // so readers skip it) and the delete above no-oped on its old
    // path. Purge it so the debris doesn't ride the batch dir through
    // every later fold's promotion copies.
    val strayed = new org.apache.hadoop.fs.Path(dest, tmp.getName)
    if (fs.exists(strayed)) fs.delete(strayed, true)
  }

  /** Append one overwrite-once batch dir to the active generation's
    * ingest, then SELF-PROMOTE if a compaction committed a newer
    * generation while the write was in flight: the writer re-resolves
    * the active epoch after its write and copies the batch forward
    * until the observed epoch is the one the batch lives in. Together
    * with [[compact]]'s post-commit promotion re-list this closes the
    * append/compaction race from both sides — whichever of the two
    * sees the batch last carries it into the surviving generation,
    * and the copy+skip-if-present discipline makes their overlap
    * harmless. The loop terminates: epochs only grow, and each pass
    * either observes a stable epoch (exit) or a strictly higher one.
    *
    * ID CONTRACT: `batchId` keys replay idempotence, so it must be
    * FRESH for fresh data — never recycle an id for different rows.
    * The store cannot tell a replay from a recycled id: a recycled id
    * either overwrites the original batch's history (same epoch,
    * pre-fold) or is stood down as an already-folded replay (a
    * surviving fold manifest names it — see below) and the new rows
    * are never written. Concretely: after wiping a streaming query's
    * checkpoint (ids restart at 0) do NOT resume ingest into a store
    * that has already seen those ids; start a fresh store, or offset
    * the ids. Structured Streaming's own monotone batch ids satisfy
    * this for the lifetime of one checkpoint, which is the supported
    * flow.
    */
  def appendBatch(rows: DataFrame, batchId: Long): Unit =
    appendBatchAt(rows, batchId, activeEpoch(rows.sparkSession))

  /** [[appendBatch]] with the target epoch made explicit — the seam
    * that lets a spec replay the exact race: a writer that resolved
    * the active epoch just BEFORE a compaction committed a newer
    * generation. */
  private[graft] def appendBatchAt(rows: DataFrame, batchId: Long,
      epochHint: Int): Unit = {
    val spark = rows.sparkSession
    val fs = fsOf(spark)
    // an at-least-once REPLAY of a batch an intervening compaction
    // already folded (or a rebuild deliberately discarded) must stand
    // down BEFORE writing — the same rule [[reconcileBatch]] applies
    // after the write, which alone cannot catch this case: when the
    // replay's resolved epoch equals the active one its loop body never
    // runs, yet the batch's rows already live in the active base (the
    // fold absorbed them), so rewriting the batch into the active
    // ingest would double-count them at the next fold, permanently.
    // One root LIST resolves the surviving accounting files; a table
    // with no compaction history reads zero of them, so the
    // steady-state streaming append pays one LIST and nothing else.
    // The check is DURABLE: cleanup merges a retiring manifest's names
    // into the chain head before deleting it (the ledger invariant in
    // [[cleanupBelow]]), so a replay delayed across any number of
    // compaction cycles still stands down.
    if (accountedNames(fs).contains(s"batch-$batchId")) {
      // loud, not silent: for an IN-contract replay this is routine
      // at-least-once dedup, but for an out-of-contract recycled id
      // (e.g. a wiped streaming checkpoint restarting batch ids at 0
      // against a surviving store — the documented footgun above)
      // this is the only signal the new rows were dropped.
      EpochedTable.log.warn(
        s"appendBatch stand-down: batch-$batchId of table $dir/$base is " +
          "already accounted for by a fold manifest; dropping this write. " +
          "Expected for an at-least-once replay — but if this is a fresh " +
          "stream whose checkpoint was wiped, its recycled batch ids are " +
          "out of contract: start a fresh store or offset the ids.")
      return
    }
    val path = new org.apache.hadoop.fs.Path(
      s"${ingestDir(epochHint)}/batch-$batchId")
    // a replay's mode(overwrite) TEARS this dir (delete, rewrite,
    // _SUCCESS last); a memoized committed-with-data verdict would let
    // a concurrent same-JVM reader skip the commit check and scan the
    // torn dir — drop the verdict first, so such a reader re-checks
    // and filters the dir out until _SUCCESS lands again
    EpochedTable.committedWithData.remove(fs.makeQualified(path).toString)
    withCodec(rows.select(columns.map(col): _*)
      .write.mode("overwrite")).parquet(path.toString)
    reconcileBatch(spark, batchId, epochHint)
  }

  /** The writer's post-write promotion pass: carry `batchId`, written
    * to `epochHint`'s ingest, forward until the observed active epoch
    * is the one it lives in — UNLESS a fold manifest along the chain
    * already names the batch. Then the batch is ACCOUNTED FOR: a
    * compaction's snapshot absorbed it (its rows are in the newer
    * base — promoting a copy would double-count them in every later
    * fold, permanently) or a [[replaceWith]] deliberately discarded
    * it (the rebuild supersedes it exactly as it supersedes the old
    * base). A missing manifest (pre-manifest layout) promotes, the
    * pre-round-15 behavior. The loop terminates: epochs only grow,
    * and each pass either observes a stable epoch (exit) or a
    * strictly higher one. Steady state (no concurrent compaction)
    * reads ZERO manifests — the loop body never runs.
    * `private[graft]` as the seam for the delayed-writer spec. */
  private[graft] def reconcileBatch(spark: org.apache.spark.sql.SparkSession,
      batchId: Long, epochHint: Int): Unit = {
    val fs = fsOf(spark)
    val conf = spark.sparkContext.hadoopConfiguration
    var wrote = epochHint
    var now = activeEpoch(spark)
    while (now != wrote) {
      // the UNION of surviving accounting files (not just the chain
      // (wrote, now]): a name in ANY of them means folded or
      // superseded — recycled ids are out of contract (see
      // appendBatch), so a wider match can only be this batch
      if (accountedNames(fs).contains(s"batch-$batchId")) return
      promoteBatch(fs, conf,
        new org.apache.hadoop.fs.Path(s"${ingestDir(wrote)}/batch-$batchId"),
        now)
      wrote = now
      now = activeEpoch(spark)
    }
  }

  private def writeGeneration(rows: DataFrame, target: Int): Unit = {
    // an EMPTY frame written with partitionBy produces a dir holding
    // only _SUCCESS — no schema-bearing part file — which Spark cannot
    // read back (UNABLE_TO_INFER_SCHEMA, verified on 4.1.2): the next
    // compact/read of the table would crash. Write an empty generation
    // PLAIN instead: the empty part file then carries the full schema
    // (partition columns as ordinary columns, which normalizeRead
    // already reconciles), and directory pruning is moot on zero rows.
    // Emptiness is detected FROM THE WRITTEN DIR (one LIST), not by a
    // pre-write isEmpty probe: the probe re-executes the assembled
    // compaction plan, and an upstream shuffle cannot short-circuit
    // under limit(1) — a meaningful extra job on every large
    // compaction to guard a rare case. The rare empty rewrite builds
    // its frame from rows.schema (no plan re-execution). Because
    // [[activeEpoch]] keys on _SUCCESS, the partitioned write runs
    // with the job committer's marker SUPPRESSED and the marker is
    // created by hand only once the dir is in its final readable form
    // — otherwise the empty case would briefly expose a COMMITTED,
    // UNREADABLE generation (only _SUCCESS on disk) to concurrent
    // readers between the two writes. A crash before the manual
    // marker leaves an uncommitted dir, exactly like a crash
    // mid-write today — the retry overwrites it (no new crash state).
    if (partitionCols.isEmpty) {
      withCodec(rows.write.mode("overwrite")).parquet(tableDir(target))
    } else {
      // partitionOverwriteMode is pinned STATIC per-write (the
      // per-write option overrides the session conf): under a
      // session-level `dynamic`, overwrite replaces only the
      // partitions present in `rows`, so a crashed prior attempt's
      // partition dirs would survive the rewrite — hasData below
      // would misread that debris as data and the manual _SUCCESS
      // would commit the crashed attempt's stale rows. Static mode
      // truncates the whole generation dir, which is the semantics
      // every generation write requires (a generation is a complete
      // snapshot, never a partition-wise patch).
      withCodec(rows.write.mode("overwrite").partitionBy(partitionCols: _*))
        .option("partitionOverwriteMode", "static")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(tableDir(target))
      val fs = fsOf(rows.sparkSession)
      val dest = new org.apache.hadoop.fs.Path(tableDir(target))
      // non-empty partitioned writes leave `col=value` child dirs;
      // only dot-tmp/underscore names (or no dir at all — committer
      // behavior on zero tasks is not contractual) means empty
      val hasData = fs.exists(dest) && fs.listStatus(dest).exists { st =>
        val n = st.getPath.getName
        !(n.startsWith("_") || n.startsWith("."))
      }
      if (!hasData)
        // the plain rewrite uses the normal committer: its own
        // _SUCCESS lands after the schema-bearing empty part file,
        // so the generation commits readable
        withCodec(rows.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), rows.schema)
          .write.mode("overwrite")).parquet(tableDir(target))
      else
        fs.create(new org.apache.hadoop.fs.Path(dest, "_SUCCESS"), true)
          .close()
    }
  }

  /** Delete every generation STRICTLY below `keep` — the one-cycle
    * reader grace: the generation retired by THIS swap survives until
    * the next one, so scans that pinned its listing drain intact.
    * Before a generation dies, RESCUE any committed batch its ingest
    * still holds that no fold manifest in (old, next] accounts for —
    * a writer that died between its batch commit and its
    * [[reconcileBatch]] pass left it stranded, and deleting it here
    * would be the last silent-loss window. The rescue runs only under
    * a COMPLETE manifest chain: a missing manifest (pre-manifest
    * layout) means "folded" and "stranded" are indistinguishable, and
    * promoting a folded batch would double-count its rows — the
    * legacy delete stands there. */
  private def cleanupBelow(spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, keep: Int, next: Int): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    // LEDGER MERGE — batch-id accounting must never expire. The replay
    // stand-downs (appendBatchAt pre-write, reconcileBatch post-write)
    // are only as durable as the manifests they consult; deleting a
    // retired fold's manifest outright would re-open the double-count
    // for a replay delayed past its retirement (a writer down across
    // two compaction cycles is slow, not wrong). So before a manifest
    // dies, its names are folded into the surviving chain head —
    // manifest `next` becomes the union of its own snapshot and all
    // retired history, and the invariant "the union of SURVIVING
    // manifests names every batch ever folded or discarded" holds
    // across unbounded compactions. Merge-then-delete order makes a
    // crash here safe (redundant names are harmless; lost ones are
    // not). Cost: the ledger grows by one name per ever-folded batch
    // (~12 bytes each) inside a single file — a year of hourly
    // streaming folds is ~100 KiB, read once per append.
    // one root LIST resolves which retired epochs still have pieces on
    // disk; everything below iterates only those (not every integer
    // below the active epoch — see existingEpochs)
    val below = existingEpochs(fs).filter(_ < keep).toSeq.sorted
    val retired = below
      .flatMap(old => readManifest(fs, old).getOrElse(Set.empty)).toSet
    if (retired.nonEmpty) {
      val head = readManifest(fs, next).getOrElse(Set.empty)
      if (!retired.subsetOf(head)) {
        // OVERWRITE SHADOW: writeFileAtomic's delete+retry fallback
        // (filesystems whose rename refuses an existing destination)
        // has an instant where manifest(next) is ABSENT — and its
        // fold-snapshot names live nowhere else (the retiring
        // manifests hold only older history), so a replay probing the
        // accounting in exactly that instant would rewrite a folded
        // batch. Park a copy under the shadow name for the swap's
        // duration: accountedNames scans every `<base>_folded_v*`
        // file, so the union covers the snapshot throughout, while
        // the int-keyed chain readers never parse the shadow. A crash
        // leaves the shadow as a harmless subset; the delete below
        // (or this epoch's own retirement) clears it.
        val shadow = new org.apache.hadoop.fs.Path(
          s"$dir/${base}_folded_v${next}shadow")
        if (head.nonEmpty)
          EpochedTable.writeFileAtomic(fs, shadow,
            head.mkString("", "\n", "\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        writeManifest(fs, next, (head ++ retired).toSeq.sorted)
        fs.delete(shadow, false)
      }
    }
    below.foreach { old =>
      if (fs.exists(new org.apache.hadoop.fs.Path(ingestDir(old)))) {
        val chain = (old + 1 to next).map(k => readManifest(fs, k))
        if (chain.nonEmpty && chain.forall(_.isDefined)) {
          val accounted = chain.flatMap(_.get).toSet
          ingestBatchDirs(spark, old).foreach { d =>
            val p = new org.apache.hadoop.fs.Path(d)
            if (!accounted.contains(p.getName))
              promoteBatch(fs, conf, p, next) // skip-if-present dedups
          }
        }
      }
      fs.delete(new org.apache.hadoop.fs.Path(tableDir(old)), true)
      // the memo holds fully-qualified batch-dir paths; purge entries
      // under the dying ingest dir so a later table at the same path
      // (epoch reuse after a root wipe) can never hit a stale verdict
      val ingestPrefix = fs.makeQualified(
        new org.apache.hadoop.fs.Path(ingestDir(old))).toString + "/"
      EpochedTable.committedWithData.removeIf(_.startsWith(ingestPrefix))
      fs.delete(new org.apache.hadoop.fs.Path(ingestDir(old)), true)
      // a crashed merge's stale shadow (subset of its manifest —
      // harmless while it lives) retires with its epoch, BEFORE the
      // manifest: the manifest is what keeps the epoch visible to
      // existingEpochs, so a crash between the two deletes leaves a
      // retryable state, never an orphaned shadow nothing revisits
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$dir/${base}_folded_v${old}shadow"), false)
      fs.delete(manifestPath(old), false)
    }
    // pre-epoch layouts staged compactions under `<base>_staging`;
    // clear any leftover from a crashed run of that scheme
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/${base}_staging"), true)
  }

  /** Fold base + a SNAPSHOT of the committed ingest batches into
    * generation `active + 1`, refuse to retire anything unless the
    * new generation's commit marker is present, promote batches that
    * landed after the snapshot, then delete generations below the
    * previous active one (one-cycle reader grace — see the class
    * contract). `reshape` lets the caller restore a physical layout
    * (e.g. the band table's join-key repartition) on the compacted
    * output. `onStaged` is a test seam run between the new
    * generation's commit-marker check and the late-batch re-list, the
    * exact window a concurrent append previously vanished in. */
  def compact(spark: org.apache.spark.sql.SparkSession,
      reshape: DataFrame => DataFrame = identity,
      onStaged: () => Unit = () => ()): Unit = {
    val fs = fsOf(spark)
    val e = activeEpoch(spark)
    val next = e + 1
    val folded = ingestBatchDirs(spark, e)
    // the manifest must exist before generation `next` CAN commit: a
    // writer observing `next` active reads it to learn whether its
    // batch was in this snapshot (promoting an absorbed batch would
    // double-count). A crash after this write is harmless — the
    // retry overwrites it with its own snapshot before writing data.
    writeManifest(fs, next,
      folded.map(d => new org.apache.hadoop.fs.Path(d).getName))
    writeGeneration(reshape(assemble(spark, e, folded)), next)
    require(fs.exists(
        new org.apache.hadoop.fs.Path(s"${tableDir(next)}/_SUCCESS")),
      s"${tableDir(next)} committed without a _SUCCESS marker " +
        "(mapreduce.fileoutputcommitter.marksuccessfuljobs disabled?) — " +
        "refusing to retire the previous generation")
    onStaged()
    // late-append promotion: anything committed to the OLD ingest dir
    // since the fold snapshot rides forward instead of vanishing
    val conf = spark.sparkContext.hadoopConfiguration
    val foldedSet = folded.toSet
    ingestBatchDirs(spark, e).filterNot(foldedSet).foreach(d =>
      promoteBatch(fs, conf, new org.apache.hadoop.fs.Path(d), next))
    cleanupBelow(spark, fs, keep = e, next = next)
  }

  /** Replace the table's CONTENT with `rows` (a rebuild, not a
    * fold): a fresh store writes the plain epoch-0 layout; a store
    * with history commits generation `active + 1` first and cleans up
    * with the same one-cycle grace as [[compact]] — the retired
    * generation (whose rows the rebuild deliberately discards) stays
    * on disk one cycle for draining readers. An append racing the
    * rebuild is promoted into the new generation like compact's late
    * batches — semantically a batch appended to a rebuilt table,
    * which is what a racing appender observes anyway. */
  def replaceWith(rows: DataFrame): Unit = {
    val spark = rows.sparkSession
    val fs = fsOf(spark)
    val e = activeEpoch(spark)
    val fresh = !fs.exists(new org.apache.hadoop.fs.Path(tableDir(e))) &&
      !fs.exists(new org.apache.hadoop.fs.Path(ingestDir(e)))
    val target = if (fresh) 0 else e + 1
    val pre = if (fresh) Nil else ingestBatchDirs(spark, e)
    // the rebuild's manifest lists the batches it DISCARDS: a delayed
    // writer must not resurrect them, and the cleanup rescue must not
    // either — the rebuild supersedes them like it supersedes the base
    if (target > 0)
      writeManifest(fs, target,
        pre.map(d => new org.apache.hadoop.fs.Path(d).getName))
    writeGeneration(rows, target)
    if (target == 0)
      // epoch 0 is the one generation readers resolve without a
      // _SUCCESS check of their own (assemble gates it instead) —
      // surface a disabled committer marker at BUILD time, like the
      // target>0 branch below does
      require(fs.exists(
          new org.apache.hadoop.fs.Path(s"${tableDir(0)}/_SUCCESS")),
        s"${tableDir(0)} committed without a _SUCCESS marker " +
          "(mapreduce.fileoutputcommitter.marksuccessfuljobs disabled?) " +
          "— readers would treat the fresh build as torn")
    if (target > 0) {
      require(fs.exists(
          new org.apache.hadoop.fs.Path(s"${tableDir(target)}/_SUCCESS")),
        s"${tableDir(target)} committed without a _SUCCESS marker — " +
          "refusing to retire the previous generation")
      val conf = spark.sparkContext.hadoopConfiguration
      val preSet = pre.toSet
      ingestBatchDirs(spark, e).filterNot(preSet).foreach(d =>
        promoteBatch(fs, conf, new org.apache.hadoop.fs.Path(d), target))
      cleanupBelow(spark, fs, keep = e, next = target)
    }
  }
}
