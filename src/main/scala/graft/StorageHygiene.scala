package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Execution-boundary storage hygiene shared by the driver-contract
  * mains (Bench/Verify): after a query's last action, release the
  * checkpoints its plan embeds (the near-dup label family's storage
  * contract — see `Dedup.nearDupLabels`) and assert the session is
  * back at its persistent-RDD fixed point, sweeping loudly if not.
  * One definition so release semantics (blocking, failure handling,
  * reporting) cannot drift between the two callers.
  */
object StorageHygiene {

  /** Make a checkpoint-embedding frame's storage contract STRUCTURAL:
    * run `f` over `df`, then release `df`'s embedded checkpoints in
    * `finally` (blocking). The scoped form of the scaladoc plea on
    * `Dedup.nearDupLabels` / `Similarity.semanticKeep` — a forgetful
    * caller in a long-lived session otherwise accumulates one
    * persisted frame per invocation in the block manager.
    *
    * CONTRACT: every action over `df` (or any frame derived from it)
    * must happen INSIDE `f`. The checkpoint truncated the frame's
    * lineage, so after release its blocks cannot be recomputed — a
    * lazy frame smuggled out of `f` and executed later fails with
    * missing blocks (loudly, not wrongly). Return materialized
    * results (collected rows, counts, a frame written to storage).
    */
  def scoped[D <: Dataset[_], A](df: D)(f: D => A): A = {
    var primary: Throwable = null
    try f(df)
    catch { case t: Throwable => primary = t; throw t }
    finally {
      // the release must not MASK the body's failure: a blocking
      // unpersist can itself throw when the body's error was an
      // executor/session death, and a finally that throws replaces
      // the root cause — suppress the release failure onto it instead
      try ColumnBridge.unpersistCheckpoint(df, blocking = true)
      catch {
        case t: Throwable =>
          if (primary ne null) primary.addSuppressed(t) else throw t
      }
    }
  }

  /** Release `df`'s embedded checkpoints — BLOCKING, so the next
    * measurement genuinely starts from a clean block manager rather
    * than racing asynchronous block removal — then sweep stragglers.
    *
    * Returns the number of persistent RDDs the sweep had to absorb.
    * `cleanRun` says whether the query's action completed normally:
    * after a clean run + release, any non-zero return is an operator
    * storage-contract violation (a checkpoint the release handle could
    * not reach) and is blamed as such; after a crash, leftovers are
    * expected debris — still released (targeted when the frame was
    * bound before the failing action) and swept, but not blamed on the
    * operator. Callers should count only clean-run sweeps as leaks.
    */
  def releaseAndSweep(spark: SparkSession, tag: String, ctx: String,
      df: Option[Dataset[_]], cleanRun: Boolean = true): Int = {
    df.foreach(ColumnBridge.unpersistCheckpoint(_, blocking = true))
    val left = spark.sparkContext.getPersistentRDDs
    if (left.nonEmpty) {
      val blame =
        if (cleanRun) "after checkpoint release — sweeping (fix the operator!)"
        else "behind a failed run — sweeping (crash debris, not an operator bug)"
      System.err.println(s"[$tag] $ctx left ${left.size} persistent RDD(s) $blame")
      left.values.foreach(_.unpersist(blocking = true))
    }
    left.size
  }
}
