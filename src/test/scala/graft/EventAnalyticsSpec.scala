package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSuite {

  private def events(rows: (Long, Long, Long, String, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, tsMs, user, typ, v) =>
      (id, new java.sql.Timestamp(tsMs), user, typ, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("sessionize splits on gaps greater than the threshold") {
    val min = 60L * 1000
    val df = events(
      (0L, 0 * min, 1L, "a", 1.0),
      (1L, 10 * min, 1L, "a", 1.0),   // same session (10 min gap)
      (2L, 50 * min, 1L, "a", 1.0),   // 40 min gap -> new session
      (3L, 55 * min, 1L, "a", 1.0),
      (4L, 0 * min, 2L, "b", 1.0))    // other user: own session
    val r = rowsOf(EventAnalytics.sessionize(df, gapMinutes = 30))
    assert(r.length == 3)
    val u1 = r.filter(_("user_id") == 1L)
    assert(u1.map(_("n_events")) == Seq(2L, 2L))
    assert(u1.head("session_start_us") == 0L)
    assert(u1(1)("session_start_us") == 50 * min * 1000L)
  }

  test("approx percentiles bracket the exact order statistics") {
    // the scale variant must agree with the exact (oracle) variant up
    // to its rank-error bound: each approx pNN lies within the exact
    // [p-2%, p+2%] order-statistic bracket per event type
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val ev = graft.sources.EventsAsRecords
        .readEvents(spark, "/root/testdata/sf0.01")
      val ps = Seq(0.5, 0.9, 0.99)
      val lo = EventAnalytics.valuePercentiles(ev, ps.map(p => (p - 0.02).max(0.01)))
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      val hi = EventAnalytics.valuePercentiles(ev, ps.map(p => (p + 0.02).min(1.0)))
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      val approx = EventAnalytics.valuePercentilesApprox(ev, ps).collect()
      assert(approx.nonEmpty)
      approx.foreach { r =>
        val t = r.getString(0)
        ps.indices.foreach { i =>
          val a = r.getDouble(i + 1)
          val l = lo(t)(i).asInstanceOf[Double]
          val h = hi(t)(i).asInstanceOf[Double]
          assert(a >= l && a <= h,
            s"$t p${(ps(i) * 100).toInt}: approx $a outside exact bracket [$l, $h]")
        }
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("sessionize invariants on random streams: events partition into sessions") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(3 * 24 * 60) * 60000L, (i % 7).toLong, "t", 1.0)
    }
    val df = events(rows: _*)
    val sessions = rowsOf(EventAnalytics.sessionize(df, gapMinutes = 45))
    assert(sessions.map(_("n_events").asInstanceOf[Long]).sum == 300L)
    // sessions of one user are disjoint and ordered
    sessions.groupBy(_("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_("session_idx").asInstanceOf[Long])
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a("session_end_us").asInstanceOf[Long] <
            b("session_start_us").asInstanceOf[Long])
        case _ =>
      }
    }
  }

  test("top event type per user breaks ties lexicographically") {
    val df = events(
      (0L, 1000L, 1L, "view", 1.0),
      (1L, 2000L, 1L, "view", 1.0),
      (2L, 3000L, 1L, "click", 1.0),
      (3L, 1000L, 2L, "zz", 1.0),
      (4L, 2000L, 2L, "aa", 1.0))     // tie 1-1 -> aa wins
    val r = rowsOf(EventAnalytics.topEventTypePerUser(df))
      .map(m => m("user_id") -> m("top_type")).toMap
    assert(r(1L) == "view" && r(2L) == "aa")
  }

  test("value percentiles pick exact order statistics") {
    val df = events((0 until 10).map(i =>
      (i.toLong, 1000L * i, 1L, "t", (i + 1).toDouble)): _*)
    val r = rowsOf(EventAnalytics.valuePercentiles(df)).head
    // n=10: p50 -> ceil(5)=5th value = 5.0; p90 -> 9th = 9.0; p99 -> 10th = 10.0
    assert(r("p50") == 5.0 && r("p90") == 9.0 && r("p99") == 10.0)
  }

  test("cleanText strips urls/emails, collapses punctuation and whitespace") {
    val s = spark
    import s.implicits._
    val got = Seq("See https://example.com/x?q=1 and mail bob@example.com !!!  Wow...  ")
      .toDF("text")
      .select(TextFunctions.cleanText(col("text")).as("c"))
      .collect()(0).getString(0)
    assert(got == "see and mail ! wow.")
  }
}
