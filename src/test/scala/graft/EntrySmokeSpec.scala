package graft
class EntrySmokeSpec extends SparkSuite {
  test("entry() returns rows on sf0.001") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }
}
