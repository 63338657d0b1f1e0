package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so
  * graft's custom Catalyst expressions can surface as user-facing
  * `Column`s. Lives under `org.apache.spark.sql` purely for access; no
  * Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge for `ImplicitCastInputTypes`: its `inputTypes` signature
  * names the `private[sql]` `AbstractDataType`, so expressions outside
  * this namespace implement `graftInputTypes` with public `DataType`s
  * instead.
  */
trait GraftInputTypes
  extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  def graftInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    graftInputTypes
}
