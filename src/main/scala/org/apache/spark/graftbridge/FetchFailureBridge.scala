package org.apache.spark.graftbridge

import org.apache.spark.SparkEnv
import org.apache.spark.shuffle.FetchFailedException

/** Injection bridge: [[FetchFailedException]] is `private[spark]` at
  * the Scala level (its bytecode is public — Spark's own scheduler
  * tests construct it to simulate executor loss), so the one place
  * graft injects a fetch failure lives in this package. Constructing
  * the exception inside a task marks the task fetch-failed via
  * TaskContext — the supported injection point. Used ONLY by the
  * stage-resubmission gates (StageResubmissionSpec's curated shapes
  * and Verify's SPARK_GRAFT_FETCH_CHAOS registry sweep); nothing here
  * touches Spark state.
  */
object FetchFailureBridge {
  /** Throw a fetch failure naming `shuffleId`'s map output 0 on this
    * executor's own block manager. Must be called INSIDE a task. */
  def inject(shuffleId: Int, message: String): Nothing =
    throw new FetchFailedException(
      SparkEnv.get.blockManager.blockManagerId, shuffleId,
      0L, 0, 0, message)
}
