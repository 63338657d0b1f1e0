package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The exact-money idiom shared by the relational suite: the source
  * doubles are 2-dp money values, so DECIMAL(18,2) casts are EXACT and
  * decimal arithmetic is associative — distributed fold order cannot
  * perturb a sum. Cast back to double only at the output edge (the
  * DuckDB oracles mirror the same operation sequence).
  */
private[graft] object Money {
  def dec(c: Column): Column = c.cast("decimal(18,2)")
  val one: Column = lit(1.0).cast("decimal(18,2)")
  val zero: Column = lit(0.0).cast("decimal(18,2)")

  /** [[dec]] with TRY_CAST semantics — for the EVENTS money column,
    * whose source is an ingested stream rather than the TPC-H
    * contract: a corrupt value (NaN, ±Inf, 1e308) becomes NULL and
    * aggregates as missing, instead of one bad row killing the whole
    * job under ANSI cast overflow. The TPC-H columns keep the plain
    * cast: their non-null 2-dp domain IS the reference contract, and
    * loud failure on a violated contract is correct there. The DuckDB
    * oracles mirror this with TRY_CAST (plus an explicit isnan guard
    * — DuckDB 1.0.0's TRY_CAST throws on NaN→DECIMAL instead of
    * returning NULL), so parity holds on any data. */
  def tryDec(c: Column): Column = c.try_cast("decimal(18,2)")

  /** `l_extendedprice × (1 − l_discount)` — the revenue term. */
  def discPrice: Column =
    dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
}
