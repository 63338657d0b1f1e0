package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.KafkaRecord

/** One shared local session for all suites (sbt forks one test JVM). */
object SparkSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
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
}
