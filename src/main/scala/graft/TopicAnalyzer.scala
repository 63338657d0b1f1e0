package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{PartitionStats, TopicSummary}
import graft.operators.{AliveKeys, TopicMetrics}
import graft.report.Report

/** The engine's user-facing facade: the reference's whole program
  * (`src/main.rs:29-180`) as a three-call API — scan a record log,
  * aggregate per-partition + global stats in one pass, optionally count
  * alive keys, render the report.
  */
object TopicAnalyzer {

  final case class Result(
      partitionStats: Seq[PartitionStats],
      summary: TopicSummary,
      aliveKeys: Option[Long])

  /** Analyze a record-log frame ([[graft.model.RecordSchema]] shape).
    * One scan for all C/D/E metrics; a second key-partitioned
    * aggregation only when `countAliveKeys` (mirroring the reference's
    * optional `-c` handler registration, `src/main.rs:77-80`).
    */
  def analyze(records: DataFrame, countAliveKeys: Boolean = false): Result = {
    val statsRaw = TopicMetrics.partitionStats(records)
    val stats = typedStats(TopicMetrics.withDerived(statsRaw))
    val summary = TopicMetrics.summarize(statsRaw)
    val alive = if (countAliveKeys) Some(AliveKeys.exact(records)) else None
    Result(stats, summary, alive)
  }

  private def typedStats(derived: DataFrame): Seq[PartitionStats] = {
    val spark = derived.sparkSession
    import spark.implicits._
    val ds: Dataset[PartitionStats] = derived
      .select(col("partition"), col("start_offset"), col("end_offset"),
        col("total"), col("alive"), col("tombstones"), col("dirty_ratio"),
        col("key_null"), col("key_non_null"), col("p_bytes"),
        col("key_bytes"), col("value_bytes"), col("avg_key_size"),
        col("avg_value_size"), col("avg_msg_size"))
      .as[PartitionStats]
    ds.collect().toSeq.sortBy(_.partition)
  }

  def report(result: Result, topic: String, elapsedSecs: Long): String =
    Report.render(result.partitionStats, result.summary, topic,
      elapsedSecs, result.aliveKeys)
}
