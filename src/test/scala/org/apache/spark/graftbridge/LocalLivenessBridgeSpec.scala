package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Pins the exit-56 fuse fix: after the DAGScheduler-style
  * removeExecutor(driver) a fetch failure triggers, block-manager
  * re-registration (the heartbeat recovery path) must SUCCEED in
  * local mode. Pre-stub it threw through the master's
  * IsExecutorAlive guard (`RpcEndpointNotFoundException:
  * CoarseGrainedScheduler`) on every heartbeat until the executor
  * called System.exit(56) — the r21 "ForkMain exit 56" driver crash,
  * reproduced locally this round with every test green. Lives in this
  * package for the same `private[spark]` access the bridge needs.
  */
class LocalLivenessBridgeSpec extends graft.SparkSuite {

  test("re-registration heals after executor removal instead of arming the fuse") {
    val sc = spark.sparkContext
    // the shared session installed the stub at startup; a second
    // install reports "already present" and never double-registers
    assert(!LocalLivenessBridge.install(sc),
      "install must be idempotent — the endpoint already exists")
    val bm = sc.env.blockManager
    // what a fetch failure makes the DAGScheduler do: unregister the
    // serving executor's block manager from the master
    bm.master.removeExecutor(SparkContext.DRIVER_IDENTIFIER)
    assert(bm.master.getMemoryStatus.isEmpty,
      "removal should leave the master with no registered block manager")
    // the exact call the executor heartbeater retries; without the
    // stub this throws (wrapped RpcEndpointNotFoundException) forever
    bm.reregister()
    assert(bm.master.getMemoryStatus.nonEmpty,
      "re-registration must heal the master's view of the driver BM")
    // and the healed session still runs a job end-to-end
    assert(spark.range(10).count() == 10L)
  }
}
