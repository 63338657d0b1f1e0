package graft

import graft.report.Progress

class ProgressSpec extends SparkSuite {

  test("progress listener observes records read by a scan") {
    val p = Progress.attach(spark, every = 100L)
    try {
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .selectExpr("count(*)").collect()
      // listener bus is async; poll until delivered
      val deadline = System.nanoTime() + 10000000000L
      while (p.recordsRead < 6000L && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(p.recordsRead >= 6000L, s"saw ${p.recordsRead}")
    } finally spark.sparkContext.removeSparkListener(p)
  }
}
