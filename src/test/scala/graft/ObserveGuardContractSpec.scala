package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** THE observe-guard contract, in one table: every `observe` node the
  * streaming package plants (the silent-drop observability discipline
  * adopted in round 17) with its DEFAULT guard name, its metric column
  * names, and what its dropped-counter counts. Ops dashboards key on
  * these names via `StreamingQueryProgress.observedMetrics`; a
  * refactor that renames a guard or a metric silently breaks every
  * consumer, so the names are pinned HERE, once, next to a
  * completeness check that forces any NEW observe node in
  * `streaming/` to register in this table.
  */
class ObserveGuardContractSpec extends SparkSuite {

  /** (guard name, metric column names) of every CollectMetrics node in
    * the frame's logical plan. */
  private def guardsOf(df: DataFrame): Seq[(String, Seq[String])] =
    df.queryExecution.logical.collect {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics =>
        (c.name, c.metrics.map(_.name))
    }

  // THE CONTRACT. Columns: operator, default guard name,
  // (dropped-counter, total-counter), dropped-counter semantics.
  private val contract = Seq(
    ("StreamingTransitions.transitionUpdates",
      "transitions_ts_guard", Seq("null_ts_events", "events_seen"),
      "events with null ts (no event-time placement) — dropped pre-fold"),
    ("StreamingTransitions.transitionUpdatesWithTtl",
      "transitions_ttl_ts_guard", Seq("null_ts_events", "events_seen"),
      "events with null ts — dropped pre-watermark"),
    ("StreamingSessions.sessionWindows",
      "sessions_ts_guard", Seq("null_ts_events", "events_seen"),
      "events with null ts (no gap-based session membership)"),
    ("StreamingTopicMetrics.aliveKeyUpdatesWithTtl",
      "alive_ttl_guard", Seq("epoch0_keyed", "keyed_records"),
      "keyed records with the epoch-0 missing-timestamp encoding — " +
        "late once the watermark moves; total counts KEYED records only"))

  private def opFrame(operator: String): DataFrame = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    operator match {
      case "StreamingTransitions.transitionUpdates" =>
        graft.streaming.StreamingTransitions.transitionUpdates(
          MemoryStream[(Long, java.sql.Timestamp, Long, String)].toDF()
            .toDF("user_id", "ts", "event_id", "event_type")).toDF()
      case "StreamingTransitions.transitionUpdatesWithTtl" =>
        graft.streaming.StreamingTransitions.transitionUpdatesWithTtl(
          MemoryStream[(Long, java.sql.Timestamp, Long, String)].toDF()
            .toDF("user_id", "ts", "event_id", "event_type"),
          java.time.Duration.ofMinutes(1)).toDF()
      case "StreamingSessions.sessionWindows" =>
        graft.streaming.StreamingSessions.sessionWindows(
          MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
            .toDF()
            .toDF("user_id", "ts", "event_id", "event_type", "value"))
      case "StreamingTopicMetrics.aliveKeyUpdatesWithTtl" =>
        graft.streaming.StreamingTopicMetrics.aliveKeyUpdatesWithTtl(
          MemoryStream[graft.model.KafkaRecord].toDS(),
          java.time.Duration.ofMinutes(1)).toDF()
    }
  }

  test("every streaming guard carries its contracted name and metric columns") {
    for ((operator, guard, metrics, _) <- contract) {
      val got = guardsOf(opFrame(operator))
      assert(got == Seq((guard, metrics)),
        s"$operator's observe contract drifted: expected " +
          s"($guard, $metrics), plan carries $got")
    }
  }

  test("default guard names are distinct (two guarded operators compose in one query)") {
    val names = contract.map(_._2)
    assert(names.distinct == names,
      s"observed-metric names must be query-unique; defaults collide: $names")
  }

  test("alive_ttl_guard counts epoch-0 keyed records against a keyed-only total") {
    // StreamingSpec's "TTL footgun guard" test already pins the
    // epoch0_keyed COUNTING (drop + count across watermark movement);
    // what is new here is the TOTAL's semantics: keyed_records counts
    // KEYED records only — the null-key record is filtered BEFORE the
    // observe (tombstone-style unkeyed traffic is out of scope for an
    // alive-KEY operator), so epoch0_keyed/keyed_records reads as a
    // true misconfiguration RATIO on a dashboard. The epoch-0 assert
    // stays as the denominator's cross-check on this fixture.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.model.KafkaRecord]
    val q = graft.streaming.StreamingTopicMetrics
      .aliveKeyUpdatesWithTtl(mem.toDS(), java.time.Duration.ofMinutes(1))
      .writeStream.format("memory").queryName("alive_ttl_guard_sem")
      .outputMode("update").start()
    val base = 1700000000000L
    try {
      mem.addData(
        graft.model.KafkaRecord(0, 0L, ts(base), b("a"), b("v1")),
        graft.model.KafkaRecord(0, 1L, ts(0L), b("b"), b("v2")),
        graft.model.KafkaRecord(0, 2L, ts(base), null, b("v3")))
      q.processAllAvailable()
      val rows = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("alive_ttl_guard")))
      assert(rows.map(_.getAs[Long]("epoch0_keyed")).sum == 1L,
        "the epoch-0 keyed record must be counted")
      assert(rows.map(_.getAs[Long]("keyed_records")).sum == 2L,
        "the total must count keyed records only (null key excluded)")
    } finally q.stop()
  }

  test("the contract is COMPLETE: every .observe( in streaming/ is a contract row") {
    // forces registration: a new observe node lands in this table (so
    // its names are pinned) or this count breaks the build
    val dir = java.nio.file.Paths.get("src/main/scala/graft/streaming")
    val stream = java.nio.file.Files.walk(dir)
    // walk + regular-file filter: a future subpackage under streaming/
    // must extend the scan, not crash it with an is-a-directory read
    val files = try scala.jdk.CollectionConverters
      .IteratorHasAsScala(stream.iterator()).asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.toString.endsWith(".scala"))
      .toSeq.sortBy(_.toString)
    finally stream.close()
    val n = files.map { p =>
      val src = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      src.sliding(".observe(".length).count(_ == ".observe(")
    }.sum
    assert(n == contract.size,
      s"streaming/ has $n observe sites but the contract table pins " +
        s"${contract.size} — register the new guard's name, metrics and " +
        "drop semantics in ObserveGuardContractSpec.contract")
  }
}
