package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.KafkaRecord

/** One shared local session for all suites (sbt forks one test JVM).
  * Master carries maxFailures=2 (the `local[N, F]` form) so a task
  * failure is retried once — the cluster default is 4, and local[N]'s
  * no-retry default is the one configuration NO real deployment runs.
  * This is load-bearing for RetryDeterminismSpec (which injects a
  * first-attempt task failure and asserts results are unchanged) and
  * inert elsewhere: a deterministic test bug still fails on attempt 2.
  */
object SparkSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.spark

  def ts(ms: Long): java.sql.Timestamp = new java.sql.Timestamp(ms)

  def b(s: String): Array[Byte] =
    if (s == null) null else s.getBytes("UTF-8")

  /** Record-log frame from (partition, offset, tsMillis, key, value). */
  def records(rows: (Int, Long, Long, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (p, o, t, k, v) => KafkaRecord(p, o, ts(t), b(k), b(v)) }
      .toDS().toDF()
  }

  def rowsOf(df: DataFrame): Seq[Map[String, Any]] = {
    val cols = df.columns
    df.collect().toSeq.map(r => cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
  }

  /** Shared rank-error bracket contract for the approx-percentile
    * family (batch sketch AND its streaming twin): each pNN in `got`
    * must lie within the EXACT [p−2%, p+2%] order-statistic bracket
    * for its event type, and every type must be present. One
    * definition so the two specs cannot drift apart.
    */
  def assertPercentileBracket(ev: DataFrame,
      got: Seq[org.apache.spark.sql.Row], ps: Seq[Double]): Unit = {
    val lo = graft.operators.EventAnalytics.valuePercentiles(
        ev, ps.map(p => (p - 0.02).max(0.01)))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val hi = graft.operators.EventAnalytics.valuePercentiles(
        ev, ps.map(p => (p + 0.02).min(1.0)))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(got.nonEmpty && got.length == lo.size)
    got.foreach { r =>
      val t = r.getString(0)
      ps.indices.foreach { i =>
        val a = r.getDouble(i + 1)
        val l = lo(t)(i).asInstanceOf[Double]
        val h = hi(t)(i).asInstanceOf[Double]
        assert(a >= l && a <= h,
          s"$t p${(ps(i) * 100).toInt}: $a outside exact bracket [$l, $h]")
      }
    }
  }
}
