package graft

import graft.functions.MetricAggregators
import graft.model.KafkaRecord

/** End-to-end facade + typed-aggregator parity. */
class AnalyzerSpec extends SparkSuite {

  test("TopicAnalyzer end-to-end over fixture mapping, with report") {
    val rec = sources.EventsAsRecords.records(spark, "/root/testdata/sf0.001")
    val result = TopicAnalyzer.analyze(rec, countAliveKeys = true)
    assert(result.partitionStats.size == 8)
    assert(result.summary.overall_count == 1000L)
    assert(result.aliveKeys.exists(_ > 0))
    val report = TopicAnalyzer.report(result, "events-sf0.001", 1L)
    assert(report.contains("| P ") && report.contains("Alive keys:"))
    assert(result.partitionStats.map(_.total).sum == result.summary.overall_count)
  }

  test("all three summary reductions agree (SQL, driver-side, typed Aggregator)") {
    val s = spark
    import s.implicits._
    val data = Seq(
      KafkaRecord(0, 0L, ts(5000), b("k"), b("vvvv")),
      KafkaRecord(0, 1L, ts(1000), b("kk"), b("v")),
      KafkaRecord(1, 0L, ts(9000), b("huge-key"), null))
    val raw = operators.TopicMetrics.partitionStats(data.toDS().toDF())
    val viaSql = operators.TopicMetrics.summarize(raw)
    val derived = operators.TopicMetrics.withDerived(raw)
    val rows = derived.collect().toSeq
    val idx = derived.columns.zipWithIndex.toMap
    val viaPartials = operators.TopicMetrics.summaryFromPartials(rows, idx)
    val viaAgg = data.toDS()
      .select(MetricAggregators.topicSummary.toColumn).collect()(0)
    assert(viaSql == viaPartials && viaPartials == viaAgg)
  }

  test("typed Aggregator (MetricHandler equivalent) matches SQL summary") {
    val s = spark
    import s.implicits._
    val data = Seq(
      KafkaRecord(0, 0L, ts(5000), b("k"), b("vvvv")),
      KafkaRecord(0, 1L, ts(1000), b("kk"), b("v")),
      KafkaRecord(1, 0L, ts(9000), b("huge-key"), null))
    val viaAgg = data.toDS()
      .select(MetricAggregators.topicSummary.toColumn).collect()(0)
    val viaSql = operators.TopicMetrics.summarize(
      operators.TopicMetrics.partitionStats(data.toDS().toDF()))
    assert(viaAgg == viaSql)
  }
}
