package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving IEEE-754 bit mapping — the radix key under the
  * distributed exact order statistics in
  * [[graft.operators.EventAnalytics]]. `orderableBits(v)` returns a
  * long that, compared as UNSIGNED, orders exactly like the doubles:
  * `-Inf < … < -0.0 < +0.0 < … < +Inf < NaN` (NaN-greatest matches
  * both Spark's and DuckDB's sort order). The standard transform: for
  * non-negative bit patterns set the top bit, for negative patterns
  * flip all bits.
  *
  * Why bits instead of value-range histogram arithmetic: selecting an
  * exact order statistic by recursive range refinement must assign
  * every row to exactly one bin PER LEVEL, with level N+1's bins
  * nesting exactly inside level N's. Floating-point boundary
  * arithmetic (`floor((v-lo)/w*B)`) can round a value across a bin
  * edge differently at different levels, silently dropping it from the
  * refined histogram and corrupting the rank bookkeeping. Bit shifts
  * cannot: the level-N bin is literally the top 10·N bits of this key,
  * so nesting is exact by construction. All downstream comparisons use
  * `shiftrightunsigned`, never signed order on the raw key.
  *
  * The mapping distinguishes -0.0 from +0.0 (adjacent keys) — SQL `=`
  * treats them equal but both engines' sort orders also place -0.0
  * first, so order statistics agree.
  */
object DoubleBits {

  def orderable(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b >= 0) b ^ java.lang.Long.MIN_VALUE else ~b
  }

  case class OrderableBitsExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {
    override def graftInputTypes: Seq[DataType] = Seq(DoubleType)
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any =
      orderable(v.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val b = ctx.freshName("b")
        s"""
           |long $b = Double.doubleToLongBits($c);
           |${ev.value} = ($b >= 0L) ? ($b ^ Long.MIN_VALUE) : (~$b);
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): OrderableBitsExpr =
      copy(child = newChild)
  }

  /** orderableBits(doubleCol) as a Column. */
  def orderableBits(c: Column): Column =
    ColumnBridge.column(OrderableBitsExpr(ColumnBridge.expression(c)))
}
