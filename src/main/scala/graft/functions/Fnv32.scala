package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Reference-compat FNV-1a-VARIANT 32-bit hash over bytes
  * (`src/fnv32.rs:74-102`): starting from the offset basis
  * `0x811c9dc5`, per byte `hash ^= b; hash *= 0x811c9dc5`. Note the
  * quirk the reference ships: the multiplier is the OFFSET BASIS, not
  * the canonical FNV-1a 32-bit prime `0x01000193` — a non-standard
  * FNV-ish hash (SURVEY §2.F1). Provided purely for bit-compat
  * experiments with the reference's alive-key bitset
  * (`src/metric.rs:256-260`); the engine's own approximate path uses
  * `xxhash64`.
  */
object Fnv32 {

  val Basis: Int = 0x811c9dc5 // wraps exactly like the reference's u32

  def hashBytes(bytes: Array[Byte]): Long = {
    var h: Int = Basis
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xff)) * Basis
      i += 1
    }
    h.toLong & 0xffffffffL
  }

  case class Fnv32Expr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.GraftInputTypes {
    override def graftInputTypes: Seq[org.apache.spark.sql.types.DataType] =
      Seq(org.apache.spark.sql.types.BinaryType)
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any =
      hashBytes(v.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        s"""
           |int $h = ${Basis};
           |for (int $i = 0; $i < $c.length; $i++) {
           |  $h = ($h ^ ($c[$i] & 0xff)) * ${Basis};
           |}
           |${ev.value} = ((long) $h) & 0xffffffffL;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Fnv32Expr =
      copy(child = newChild)
  }

  /** fnv32(binaryCol) as a Column. */
  def fnv32(c: Column): Column =
    ColumnBridge.column(Fnv32Expr(ColumnBridge.expression(c)))
}
