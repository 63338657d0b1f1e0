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
    * killed, so every stage terminates. */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
                spark.sparkContext.killTaskAttempt(t.taskInfo.taskId,
                  interruptThread = false,
                  reason = "graft chaos sweep: forced reschedule")
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
      s" chaos=${chaosN.map(_.toString).getOrElse("off")}")
    spark
  }

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
    spark.stop()
  }
}
