package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The anchored pushdown barrier — ONE home for the idiom (three
  * hand-copied sites predated this; PLANS.md round 5 records why the
  * bare form rots). Filter conditions get no subexpression
  * elimination, so a gate predicate over expensive derived columns
  * must not be pushed/inlined below the projection that computes
  * them. A bare unused `rand()` column in that projection stops the
  * push only until column pruning drops it (any outer projection
  * suffices); the durable form REFERENCES the barrier as the gate's
  * leading conjunct — a filter whose first conjunct is
  * non-deterministic can neither move nor shed the column anchoring
  * it. `rand ∈ [0, 1)`, so the conjunct is vacuously true but
  * unfoldable.
  */
object Barrier {
  val ColName = "_pushdown_barrier"

  /** The barrier column — add to the scoring projection. */
  def column: Column = rand(7).as(ColName)

  /** Wrap a gate predicate so it stays above the barrier projection. */
  def anchored(gate: Column): Column = col(ColName) >= 0 && gate
}
