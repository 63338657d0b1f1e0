package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. The dump loop
  * and escaper are shared with [[graft.tools.VerifyOne]] (the single-query
  * iteration tool) so the two surfaces cannot drift. */
object Verify {

  /** The session every verify surface uses — results must be
    * comparable to the driver's gate, so there is exactly one config.
    * The two extra env knobs DEFAULT to that one config and exist only
    * for the config-invariance sweep (`scripts/config_invariance.sh`):
    * on a real cluster the physical partitioning never matches
    * local[32], so every oracle-checked result must be IDENTICAL under
    * a hostile partition count and with AQE's runtime re-planning
    * disabled — a float fold whose value depends on partition order,
    * or a limit riding an unpinned sort, would pass the canonical
    * config forever and differ on the thousand-executor layout.
    *
    * SPARK_GRAFT_TASK_CHAOS=<n> (default off) arms the chaos listener:
    * every n-th FIRST-attempt task is killed via
    * `SparkContext.killTaskAttempt` and rescheduled (TaskKilled does
    * not count toward spark.task.maxFailures, so the default local
    * master suffices), which extends the execution-history axis from
    * RetryDeterminismSpec's curated operators to the WHOLE registry:
    * the oracle compare must stay 141/141 hash-exact while tasks are
    * being killed and re-run throughout the dump
    * (`scripts/retry_chaos_sweep.sh`). Retried attempts are never
    * killed, so every stage terminates.
    *
    * SPARK_GRAFT_SPILL=1 (default off) arms the forced-spill axis
    * (`scripts/spill_sweep.sh`): sf≤0.1 in a 128 GiB sandbox never
    * exercises hash-aggregate sort-fallback, external-sort merge, or
    * shuffle spill, yet at 100 TB spilling is STEADY-STATE and the
    * spill/merge paths are the classic home of order- and
    * precision-dependent bugs (a float fold that survives one
    * in-memory partition order can diverge once partial buffers spill
    * and merge in sorted-key order). The knobs force every such path
    * at tiny thresholds, all public Spark confs:
    *   - `TungstenAggregate.testFallbackStartsAt=64,8192` — every
    *     hash aggregate with >8192 input rows per task abandons its
    *     map and finishes sort-based (spill + sorted merge of partial
    *     buffers). The second number is the per-REFILL row budget —
    *     Spark resets the counter after each map destruct, so a tiny
    *     value ("2,5" in the first attempts) destructs-and-merges a
    *     sorter every 5 rows: ~500k chained sorters at sf0.1, whose
    *     final merge exhausted the 20k fd limit ("too many open
    *     files") after first blowing the TB-scale spill accounting;
    *     8192 keeps the fallback firing on every non-trivial
    *     aggregate with the chained-sorter count bounded in the
    *     hundreds;
    *   - `objectHashAggregate.sortBased.fallbackThreshold=2` — the
    *     ObjectHashAggregate family (our TypedImperativeAggregate
    *     sketches ride it) falls back to sort-based merge;
    *   - window / sort-merge-join / session-window / cartesian
    *     buffers go EXTERNAL at 16 rows (every non-trivial group
    *     exercises the ExternalAppendOnlyUnsafeRowArray → sorter
    *     path) but FILE-spill at the shared 256k-element bound — an
    *     sf0.1 attempt with file spills at 16 rows exhausted a 16 GiB
    *     direct-memory budget because per-group spill readers churn
    *     1 MiB direct buffers faster than an unpressured heap GC
    *     reclaims them (direct buffers are only freed when their heap
    *     handles are collected);
    *   - `shuffle.spill.numElementsForceSpillThreshold=262144` — every
    *     UnsafeExternalSorter (SortExec, shuffle writers, the
    *     sort-fallback's KV sorter) force-spills each 256k elements,
    *     so external merges genuinely run many-way on the
    *     row-explosion queries while the spill-FILE count stays
    *     bounded. The bound is load-bearing: `getSortedIterator`
    *     opens a reader per spill file SIMULTANEOUSLY at merge time,
    *     each holding ≥1 MiB of buffers (the conf floor), and sweep
    *     attempts at thresholds 2000/16384 OOM'd the JVM from
    *     q_dup_ngrams' hundreds of per-task spill files — spill
    *     granularity is a memory knob, not just an IO knob, the same
    *     arithmetic that sizes a real cluster's
    *     `maxRemoteBlockSizeFetchToMem`/merge fan-in. Read-ahead is
    *     disabled (`unsafe.sorter.spill.read.ahead.enabled=false`)
    *     to halve per-open-file buffering, and
    *     `diskWriteBufferSize=64k` shrinks writer-side buffers.
    * The fired-guard is metric-based: the session counts
    * memory/diskBytesSpilled across all tasks and main() prints
    * `VERIFY_SPILL mem=<B> disk=<B>`; the sweep FAILS on zero (a
    * sweep that never spilled is a plain re-dump). */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spillForced = sys.env.get("SPARK_GRAFT_SPILL").contains("1")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (spillForced) {
      builder
        .config("spark.sql.TungstenAggregate.testFallbackStartsAt", "64,8192")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
        .config("spark.sql.windowExec.buffer.in.memory.threshold", "16")
        .config("spark.sql.windowExec.buffer.spill.threshold", "262144")
        .config("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "16")
        .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "262144")
        .config("spark.sql.sessionWindow.buffer.in.memory.threshold", "16")
        .config("spark.sql.sessionWindow.buffer.spill.threshold", "262144")
        .config("spark.sql.cartesianProductExec.buffer.in.memory.threshold", "16")
        .config("spark.sql.cartesianProductExec.buffer.spill.threshold", "262144")
        .config("spark.shuffle.spill.numElementsForceSpillThreshold", "262144")
        .config("spark.shuffle.spill.diskWriteBufferSize", "65536")
        .config("spark.unsafe.sorter.spill.read.ahead.enabled", "false")
    }
    val spark = builder.getOrCreate()
    // spill accounting rides on EVERY session (cheap): the spill
    // sweep's fired-guard reads the totals, and a canonical run
    // printing mem=0 disk=0 documents that the default regime really
    // never spills — the gap the sweep exists to close
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            spilledMem.addAndGet(m.memoryBytesSpilled)
            spilledDisk.addAndGet(m.diskBytesSpilled)
          }
        }
      })
    spark.sparkContext.setLogLevel("WARN")
    val chaosN = sys.env.get("SPARK_GRAFT_TASK_CHAOS").map(_.toInt)
      .filter(_ > 0)
    chaosN.foreach { n =>
      val seen = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskStart(
              t: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
            // first attempts only — a retried attempt is never killed,
            // so every stage terminates; the kill races task completion
            // harmlessly (a finished task's kill no-ops or throws)
            if (t.taskInfo.attemptNumber == 0 &&
                seen.incrementAndGet() % n == 0) {
              try {
                // count only kills the scheduler ACCEPTED (returns
                // true): the listener bus is async, so this frequently
                // races tasks that already finished — a no-op kill
                // (false) incrementing the counter could satisfy the
                // sweep's killed>=1 fired-guard with zero tasks
                // actually rescheduled, a vacuous chaos pass
                if (spark.sparkContext.killTaskAttempt(t.taskInfo.taskId,
                    interruptThread = false,
                    reason = "graft chaos sweep: forced reschedule"))
                  chaosKilled.incrementAndGet()
              } catch { case _: Throwable => () }
            }
        })
    }
    // the EFFECTIVE config, read back from the live session — the
    // config-invariance sweep asserts this line echoes its requested
    // knobs, so a renamed/typo'd env var degrades to a loud gate
    // failure instead of a silent canonical-config re-run that
    // "passes" forever
    println(s"VERIFY_CONF master=${spark.sparkContext.master}" +
      s" shuffle=${spark.conf.get("spark.sql.shuffle.partitions")}" +
      s" aqe=${spark.conf.get("spark.sql.adaptive.enabled")}" +
      s" chaos=${chaosN.map(_.toString).getOrElse("off")}" +
      // read BACK from the live conf, not the env var: the spill
      // sweep's knob-took-effect check keys on this token, so a
      // builder refactor dropping the configs degrades loudly
      s" spill=${if (spark.conf.getOption(
          "spark.sql.TungstenAggregate.testFallbackStartsAt").isDefined)
        "forced" else "off"}")
    spark
  }

  /** Bytes spilled across all tasks of the session — the spill
    * sweep's fired-guard (`VERIFY_SPILL mem=<B> disk=<B>`, printed
    * after `spark.stop()` so the async listener bus has drained). */
  private[graft] val spilledMem = new java.util.concurrent.atomic.AtomicLong
  private[graft] val spilledDisk = new java.util.concurrent.atomic.AtomicLong

  /** Kill count of the chaos listener — printed at the end of a dump
    * (`VERIFY_CHAOS killed=<n>`) so the chaos sweep can assert the
    * injection actually FIRED rather than silently running a plain
    * re-dump (the same vacuousness guard as RetryDeterminismSpec's
    * fired counter and the sweeps' knob-took-effect check). */
  private[graft] val chaosKilled = new java.util.concurrent.atomic.AtomicLong

  /** Run the named queries (all when `names` is empty), dump each to
    * `outDir/<name>` parquet, release per-query storage. */
  def dumpQueries(spark: SparkSession, sfDir: String, outDir: String,
      names: Seq[String] = Nil): Unit = {
    new java.io.File(outDir).mkdirs()
    val selected =
      if (names.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter(kv => names.contains(kv._1))
    selected.foreach { case (name, fn) =>
      // hold the frame so its embedded checkpoint storage (near-dup
      // label family) can be released after the write — the execution
      // boundary is the ONE place a lazily-consumed result's
      // checkpoints can be freed (see Dedup.nearDupLabels' contract);
      // without this the suite accumulates one persisted frame per
      // label-consuming query for the session lifetime
      var df: Option[org.apache.spark.sql.DataFrame] = None
      val ok =
        try {
          val d = fn(spark, sfDir); df = Some(d)
          d.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name"); true
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          false
        }
      StorageHygiene.releaseAndSweep(spark, "verify", name, df, ok)
    }
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump the oracle map (all entries, or only `names`) as the
    * oracle_sql.json the comparing harness consumes. */
  def dumpOracleSql(outDir: String, names: Seq[String] = Nil): Unit = {
    val selected =
      if (names.isEmpty) SparkEntry.oracleSql
      else SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = selected
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = session()
    dumpQueries(spark, sfDir, outDir)
    dumpOracleSql(outDir)
    if (sys.env.contains("SPARK_GRAFT_TASK_CHAOS"))
      println(s"VERIFY_CHAOS killed=${chaosKilled.get()}")
    // stop() drains the listener bus, so the totals are complete here
    spark.stop()
    println(s"VERIFY_SPILL mem=${spilledMem.get()} disk=${spilledDisk.get()}")
  }
}
