package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The exact-money idiom shared by the relational suite: the source
  * doubles are 2-dp money values, so DECIMAL(18,2) casts are EXACT and
  * decimal arithmetic is associative — distributed fold order cannot
  * perturb a sum. Cast back to double only at the output edge (the
  * DuckDB oracles mirror the same operation sequence).
  */
private[operators] object Money {
  def dec(c: Column): Column = c.cast("decimal(18,2)")
  val one: Column = lit(1.0).cast("decimal(18,2)")
  val zero: Column = lit(0.0).cast("decimal(18,2)")

  /** `l_extendedprice × (1 − l_discount)` — the revenue term. */
  def discPrice: Column =
    dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
}
