package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Exact integer-ratio idioms shared by the corpus accounting
  * operators — ONE definition of the overflow-safe ppm quotient
  * instead of three hand-kept copies that could typo independently
  * (the repo's one-definition discipline: dup_tax_ppm, pad_ppm and
  * pieces_per_mchar all previously inlined it).
  */
object ExactMath {

  /** `(num · 10⁶) div den` WITHOUT the 10⁶ multiply overflowing:
    * split 10⁶ = 10³·10³ and carry the remainder —
    *
    *   ((num·10³) div den)·10³ + ((num·10³ mod den)·10³) div den
    *     ≡ (num·10⁶) div den
    *
    * in exact integer arithmetic (num ≥ 0, den > 0; callers guard
    * den). The split raises the long ceiling from ~9.2×10¹² to
    * ~9.2×10¹⁵ for `num` — above the 100 TB design point's ~10¹³⁻¹⁴
    * token/piece counts, where the unsplit form silently wraps. The
    * DuckDB oracles keep the unsplit HUGEINT form; the two agree
    * wherever longs don't overflow, which [[graft.ExactMathSpec]]
    * pins at boundary magnitudes against BigInt.
    *
    * `num`/`den` are code-controlled SQL expressions (never user
    * input) — the `div` integer-division operator has no Column-API
    * form, so the one definition is an expr template. The template
    * parenthesizes BOTH substitutions itself, so a composite operand
    * like `a + b` binds as one unit instead of silently re-associating
    * with the template's own operators (`x div a + b`).
    */
  def ppmSplitDiv(num: String, den: String): Column = expr(
    s"((($num) * 1000) div ($den)) * 1000" +
      s" + (((($num) * 1000) % ($den)) * 1000) div ($den)")
}
