package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.KafkaRecord

/** Stop → restart-FROM-CHECKPOINT recovery of the stateful streaming
  * twins — the one lifecycle event every long-running pipeline hits
  * (deploys, preemptions, OOM restarts) and the one no other spec
  * exercised: batch-level replay tests re-feed data into a LIVE query,
  * which never touches the state-store restore path. Each test puts a
  * fact into flatMapGroupsWithState state, kills the query, restarts
  * it from the same checkpoint, and asserts on output only derivable
  * from the RECOVERED state (a positive signal — not the absence of a
  * crash). Sinks are foreachBatch: the memory sink refuses checkpoint
  * recovery by design, and foreachBatch is the recoverable production
  * pattern anyway.
  */
class StreamingRestartSpec extends SparkSuite {

  /** processAllAvailable + stop with the stop in a FINALLY: a failed
    * micro-batch would otherwise leave a running query in the SHARED
    * suite session (whose checkpoint dir withCkpt then deletes out
    * from under it) — background stack traces poisoning later suites
    * and masking the original failure. */
  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try q.processAllAvailable() finally q.stop()

  private def withCkpt(tag: String)(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-restart-$tag")
    try f(dir.toString)
    finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("alive-key LWW state survives a restart: an older tombstone cannot regress a recovered key") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withCkpt("alive") { ckpt =>
      val mem = MemoryStream[KafkaRecord]
      val got = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(String, Boolean)]())
      def start() = graft.streaming.StreamingTopicMetrics
        .aliveKeyUpdates(mem.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            graft.streaming.StreamingTopicMetrics.KeyUpdate], _: Long) =>
          batch.collect().foreach(u => got.add((u.key, u.alive)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      mem.addData(
        KafkaRecord(0, 10L, ts(1000), b("a"), b("v1")), // a alive @ off 10
        KafkaRecord(0, 11L, ts(1000), b("b"), null))    // b tombstoned
      drain(q1)
      got.clear() // only post-restart emissions matter below
      // post-restart input: an OLDER tombstone for a (offset 5 < 10 —
      // replayed or out-of-order). Recovered LWW state outranks it and
      // re-emits a's CURRENT alive=true; lost state would seat the
      // tombstone and emit alive=false. b gets a normal revival.
      mem.addData(
        KafkaRecord(0, 5L, ts(900), b("a"), null),
        KafkaRecord(0, 12L, ts(1100), b("b"), b("v2")))
      val q2 = start()
      drain(q2)
      val out = got.toArray(Array.empty[(String, Boolean)]).toMap
      val ka = java.util.Base64.getEncoder.encodeToString(b("a"))
      val kb = java.util.Base64.getEncoder.encodeToString(b("b"))
      assert(out.get(ka).contains(true),
        s"LWW state lost across restart: the older tombstone won ($out)")
      assert(out.get(kb).contains(true), s"b should revive: $out")
    }
  }

  test("dedup fingerprint state survives a restart: a post-restart duplicate stays suppressed") {
    // third state-store shape (dropDuplicates' own state, not a
    // flatMapGroupsWithState fold): a duplicate arriving after the
    // restart is suppressed ONLY by recovered state — lost state
    // would pass it through as novel
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withCkpt("dedup") { ckpt =>
      val mem = MemoryStream[(Long, String)]
      val got = java.util.Collections.synchronizedList(
        new java.util.ArrayList[java.lang.Long]())
      def start() = graft.streaming.StreamingDedup
        .deduped(mem.toDF().toDF("doc_id", "text"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          batch.collect().foreach(r => got.add(r.getAs[Long]("doc_id")))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      mem.addData((1L, "same text"), (2L, "other text"))
      drain(q1)
      got.clear()
      // post-restart: a near-identical duplicate of doc 1 (whitespace/
      // case variants share the fingerprint), one genuinely new doc,
      // and a null-text doc (must pass through per the r17 rule)
      mem.addData((3L, "SAME   text"), (4L, "brand new"), (5L, null: String))
      val q2 = start()
      drain(q2)
      val out = scala.jdk.CollectionConverters.ListHasAsScala(got)
        .asScala.map(_.longValue).toSet
      assert(out == Set(4L, 5L),
        s"dedup state lost across restart (3 should be suppressed, " +
          s"4 kept, 5 passed through): $out")
    }
  }

  test("session-window merge state survives a restart: one closed session spans the boundary") {
    // fourth shape: session_window aggregation state (window-merging
    // store). Events land on BOTH sides of the restart within one gap;
    // the closed session counts all of them ONLY if the open-window
    // state recovered — lost state would emit two fragments (or one
    // undercounting session)
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withCkpt("sess") { ckpt =>
      val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val got = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Long, Long, Double)]())
      def start() = graft.streaming.StreamingSessions
        .sessionWindows(mem.toDF()
            .toDF("user_id", "ts", "event_id", "event_type", "value"),
          gapMinutes = 30, delay = "0 seconds")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          batch.collect().foreach(r => got.add((r.getAs[Long]("user_id"),
            r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val base = 1700000000000L
      val min = 60L * 1000
      val q1 = start()
      mem.addData((1L, ts(base), 0L, "a", 1.0),
        (1L, ts(base + 1 * min), 1L, "b", 2.0))
      drain(q1)
      assert(got.isEmpty, s"session closed prematurely: $got")
      // the session CONTINUES after the restart (within the 30-min
      // gap), then a far-future event closes it via the watermark
      mem.addData((1L, ts(base + 2 * min), 2L, "c", 4.0))
      val q2 = start()
      try {
        q2.processAllAvailable()
        mem.addData((2L, ts(base + 5L * 3600 * 1000), 3L, "a", 1.0))
        q2.processAllAvailable()
      } finally q2.stop()
      val u1 = got.toArray(Array.empty[(Long, Long, Double)])
        .toSeq.filter(_._1 == 1L)
      assert(u1 == Seq((1L, 3L, 7.0)),
        s"session state lost/fragmented across restart: $u1")
    }
  }

  test("TTL transition state (event-time timeout) survives a restart within its horizon") {
    // fifth shape: flatMapGroupsWithState WITH EventTimeTimeout — the
    // recovery must restore both the fold state and its timeout
    // timestamp. The successor lands after the restart but inside the
    // TTL, so the pair is only emittable from recovered state.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withCkpt("ttl") { ckpt =>
      val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val got = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Long, String, String)]())
      def start() = graft.streaming.StreamingTransitions
        .transitionUpdatesWithTtl(mem.toDF()
            .toDF("user_id", "ts", "event_id", "event_type"),
          ttl = java.time.Duration.ofHours(1),
          watermarkDelay = "10 seconds")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            graft.streaming.StreamingTransitions.Transition], _: Long) =>
          batch.collect().foreach(t =>
            got.add((t.user_id, t.event_type, t.next_type)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val base = 1700000000000L
      val q1 = start()
      mem.addData((1L, ts(base), 0L, "a"))
      drain(q1)
      assert(got.isEmpty, s"no pair should exist before the successor: $got")
      mem.addData((1L, ts(base + 60L * 1000), 1L, "b")) // within the TTL
      val q2 = start()
      drain(q2)
      val pairs = got.toArray(Array.empty[(Long, String, String)]).toSeq
      assert(pairs == Seq((1L, "a", "b")),
        s"TTL chain state lost across restart: $pairs")
    }
  }

  test("restart under a CHANGED shuffle-partition conf still recovers state") {
    // deploys change configs: a restarted job whose session now sets a
    // different spark.sql.shuffle.partitions must keep reading the
    // state store laid out at FIRST start (Spark pins the state
    // partition count in the checkpoint's offset-log metadata, not the
    // session conf). This pins that our stateful twins inherit that
    // contract — a twin that derived its own key partitioning from the
    // live conf would shard keys away from their recovered state and
    // silently forget them.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val confKey = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(confKey)
    withCkpt("confchange") { ckpt =>
      val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val got = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Long, String, String)]())
      def start() = graft.streaming.StreamingTransitions
        .transitionUpdates(mem.toDF()
          .toDF("user_id", "ts", "event_id", "event_type"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            graft.streaming.StreamingTransitions.Transition], _: Long) =>
          batch.collect().foreach(t =>
            got.add((t.user_id, t.event_type, t.next_type)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try {
        val q1 = start()
        // several users so state occupies multiple store partitions —
        // a conf-derived resharding would misroute at least one
        mem.addData((1L, ts(1000), 0L, "a"), (2L, ts(1000), 1L, "x"),
          (3L, ts(1000), 2L, "p"))
        drain(q1)
        assert(got.isEmpty, s"no pair should exist before successors: $got")
        spark.conf.set(confKey, "7") // the deploy "tuned" the conf
        mem.addData((1L, ts(2000), 3L, "b"), (2L, ts(2000), 4L, "y"),
          (3L, ts(2000), 5L, "q"))
        val q2 = start()
        drain(q2)
        val pairs = got.toArray(Array.empty[(Long, String, String)])
          .toSeq.sortBy(_._1)
        assert(pairs == Seq((1L, "a", "b"), (2L, "x", "y"), (3L, "p", "q")),
          s"state lost/misrouted after restart under a changed conf: $pairs")
      } finally spark.conf.set(confKey, orig)
    }
  }

  test("transition chain state survives a restart: the emitted pair spans the stop/start boundary") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withCkpt("trans") { ckpt =>
      val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val got = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Long, String, String)]())
      def start() = graft.streaming.StreamingTransitions
        .transitionUpdates(mem.toDF()
          .toDF("user_id", "ts", "event_id", "event_type"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            graft.streaming.StreamingTransitions.Transition], _: Long) =>
          batch.collect().foreach(t =>
            got.add((t.user_id, t.event_type, t.next_type)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      mem.addData((1L, ts(1000), 0L, "a")) // first event: no pair yet
      drain(q1)
      assert(got.isEmpty, s"no pair should exist before the successor: $got")
      // the successor arrives AFTER the restart: the a->b pair can only
      // be emitted from recovered LastEvent state
      mem.addData((1L, ts(2000), 1L, "b"))
      val q2 = start()
      drain(q2)
      val pairs = got.toArray(Array.empty[(Long, String, String)]).toSeq
      assert(pairs == Seq((1L, "a", "b")),
        s"chain state lost across restart: $pairs")
    }
  }
}
