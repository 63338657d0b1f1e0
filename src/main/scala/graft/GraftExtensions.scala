package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ArrayHashExprs.{DotProductExpr, MinHashSigExpr, PolyHash31Expr, ShingleHashExpr, SimHashExpr, UnitVectorExpr}
import graft.functions.Fnv32.Fnv32Expr

/** SQL surface for graft's custom Catalyst expressions. Two ways in:
  *
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (the
  *    `SparkSessionExtensions` injection path);
  *  - runtime: `GraftExtensions.register(spark)` on any live session.
  *
  * Registered functions:
  *   graft_poly_hash31(str)      31-bit polynomial string hash
  *   graft_fnv32(bin)            reference-compat FNV-1a-variant
  *   graft_simhash(arr<long>)    32-bit SimHash of element hashes
  *   graft_minhash(arr<long>)    16-permutation MinHash signature
  *   graft_shingle_hashes(str)   fused word-3-gram shingle hash set
  *   graft_dot(a, b)             sequential-fold dot product
  *   graft_unit_vector(arr)      unit normalization (0-vector → zeros)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_poly_hash31",
      new ExpressionInfo(classOf[PolyHash31Expr].getName, "graft_poly_hash31"),
      (args: Seq[Expression]) => PolyHash31Expr(args.head)),
    ("graft_fnv32",
      new ExpressionInfo(classOf[Fnv32Expr].getName, "graft_fnv32"),
      (args: Seq[Expression]) => Fnv32Expr(args.head)),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHashExpr(args.head, 32)),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSigExpr(args.head, 16)),
    ("graft_shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashExpr].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashExpr(args.head, 3)),
    ("graft_dot",
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProductExpr(args.head, args(1))),
    ("graft_unit_vector",
      new ExpressionInfo(classOf[UnitVectorExpr].getName, "graft_unit_vector"),
      (args: Seq[Expression]) => UnitVectorExpr(args.head)))

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
