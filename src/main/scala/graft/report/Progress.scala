package graft.report

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scan-progress reporting (SURVEY §2.A5): the reference renders a
  * spinner with the running record count (`src/kafka.rs:85-86,111-113`);
  * the Spark-native equivalent observes task completion through a
  * `SparkListener` and reports records processed so far. Cosmetic, not
  * semantic — attach only when a console progress line is wanted.
  */
final class Progress(every: Long = 10000L) extends SparkListener {
  private val records = new AtomicLong(0L)
  private val lastPrinted = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      val n = records.addAndGet(m.inputMetrics.recordsRead)
      val last = lastPrinted.get()
      if (n - last >= every && lastPrinted.compareAndSet(last, n)) {
        System.err.println(s"[progress] records read: $n")
      }
    }
  }

  def recordsRead: Long = records.get()
}

object Progress {
  /** Attach a reporter to the session; returns it for inspection /
    * later removal via `spark.sparkContext.removeSparkListener`. */
  def attach(spark: SparkSession, every: Long = 10000L): Progress = {
    val p = new Progress(every)
    spark.sparkContext.addSparkListener(p)
    p
  }
}
