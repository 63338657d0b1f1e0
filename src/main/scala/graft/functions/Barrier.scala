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

  // ---- reuse anchors -------------------------------------------------
  //
  // THE OTHER de-canonicalization class this object guards against:
  // AQE stage-reuses an exchange only when the two consumers' child
  // plans canonicalize BYTE-IDENTICAL. Catalyst breaks that identity in
  // two ways, each needing a differently-shaped vacuous fence:
  //
  //  (a) column pruning — a consumer that stops referencing a column
  //      rewrites ITS copy of a shared aggregate (e.g. into a bare
  //      distinct, functions=[]), de-canonicalizing it from its twin's;
  //      the corpus then scans/shuffles TWICE. Fence: a vacuously-true
  //      gate that keeps the column referenced and that the optimizer
  //      can neither fold nor push.
  //  (b) constraint inference — a consumer whose join/comparison infers
  //      IsNotNull constraints pushes them under ITS copy of the
  //      exchange, again splitting the twins. Fence: apply those exact
  //      not-null predicates EXPLICITLY below the shared exchange so
  //      inference has nothing left to add to either side.
  //
  // Foldability and pushability decide which anchor form is safe:
  // `>= 1` on a COUNT output never folds (no range constraint is
  // inferred for aggregate outputs) and never pushes (filters on
  // aggregate-function outputs cannot move below the aggregate). A
  // GROUP-KEY reference must instead lead with a non-deterministic
  // conjunct: a deterministic group-key predicate WOULD push below the
  // aggregate, and `isNotNull` alone folds to true the moment the
  // column is statically non-nullable. A filter whose first conjunct is
  // non-deterministic can neither move nor shed the columns anchoring
  // it. These encode deep optimizer behavior — a Spark upgrade can
  // invalidate them in either direction, so every call site routes
  // through here and carries a plan-shape spec pinning the reuse it
  // protects.

  /** Reuse anchor for a COUNT-output column: vacuously true (count
    * emits ≥ 1 by construction), unfoldable, unpushable — keeps
    * `countRef` referenced so the enclosing plan node canonicalizes
    * identical to its exchange twin (case (a) above).
    */
  def reuseAnchor(countRef: Column): Column = countRef >= 1

  /** Reuse anchor for a GROUP-KEY column: the leading `rand` conjunct
    * makes the gate non-deterministic (unmovable, unprunable) because a
    * deterministic key predicate would push below the aggregate and a
    * bare `isNotNull` folds away on non-nullable columns (case (a),
    * key-shaped).
    */
  def reuseAnchorKey(keyRef: Column): Column =
    rand(7) >= 0 && keyRef.isNotNull

  /** Pre-empt constraint-inference pushdown below a shared exchange:
    * the conjunction of exactly the IsNotNull constraints downstream
    * joins/comparisons would infer, applied once below the exchange so
    * every consumer's child stays byte-identical (case (b) above).
    * Vacuous only when the columns carry no nulls — semantically it IS
    * the inferred constraint set, stated early.
    */
  def notNullCanonical(cols: Column*): Column =
    cols.map(_.isNotNull).reduce(_ && _)
}
