package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.KafkaRecordSource

/** Drives the Kafka-source projection with a synthetic frame in the
  * documented Kafka source schema — the closest a broker-less
  * environment gets to the live path: same columns, same types, same
  * -1 ms "no timestamp" encoding, then the full analyze pipeline on
  * top of the projected record log.
  */
class KafkaSourceSpec extends SparkSuite {

  /** The batch/streaming Kafka source schema, per the Spark docs. */
  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = false)))

  private def kafkaFrame(rows: Seq[(Array[Byte], Array[Byte], Int, Long, Long)]) = {
    import scala.jdk.CollectionConverters._
    val data = rows.map { case (k, v, p, o, tsMs) =>
      org.apache.spark.sql.Row(k, v, "t", p, o,
        if (tsMs == Long.MinValue) null else ts(tsMs), 0)
    }
    spark.createDataFrame(data.asJava, kafkaSchema)
  }

  test("projection maps the Kafka schema to the record-log contract") {
    val df = KafkaRecordSource.project(kafkaFrame(Seq(
      (b("k1"), b("v1"), 0, 0L, 1000L),
      (null, b("v2"), 0, 1L, 2000L),
      (b("k2"), null, 1, 0L, 3000L), // tombstone
      (b("k3"), b("v3"), 1, 1L, -1L), // kafka "no timestamp" = -1 ms
      (b("k4"), b("v4"), 1, 2L, Long.MinValue)))) // defensive NULL
    assert(df.columns.toSeq ==
      Seq("partition", "offset", "timestamp", "key", "value"))
    val rows = rowsOf(df.orderBy("partition", "offset"))
    // -1 ms and NULL both normalize to epoch 0 (reference unwrap_or(0))
    assert(rows(3)("timestamp") == ts(0L) && rows(4)("timestamp") == ts(0L))
    assert(rows(1)("key") == null)
    assert(rows(2)("value") == null)
  }

  test("full analyze pipeline runs on the projected Kafka frame") {
    val records = KafkaRecordSource.project(kafkaFrame(Seq(
      (b("a"), b("v1"), 0, 0L, 1000L),
      (b("a"), null, 0, 1L, 2000L), // a retracted
      (b("b"), b("v2"), 1, 0L, 1500L))))
    val r = TopicAnalyzer.analyze(records, countAliveKeys = true)
    assert(r.summary.overall_count == 3L)
    assert(r.aliveKeys.contains(1L)) // only b survives
    assert(r.partitionStats.map(_.partition) == Seq(0, 1))
    assert(r.partitionStats.head.tombstones == 1L)
  }
}
