package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ArrayHashExprs.{DotProductExpr, MinHashSigExpr, PolyHash31Expr, ShingleHashExpr, SimHashExpr, UnitVectorExpr}
import graft.functions.Fnv32.Fnv32Expr
import graft.functions.TextExprs.{BpePunctCountsExpr, CleanTextExpr, RollingHashExpr, StopwordHitsExpr}
import graft.functions.TextFunctions
import graft.operators.CorpusOps

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
  *   graft_rolling_hash(str)     codepoint rolling hash mod 1e9+7
  *   graft_lang_hits(str)        per-language stopword hits (array<int>)
  *   graft_bpe_punct_counts(str) [bpe_tokens, punct] counts (array<int>)
  *   graft_clean_text(str)       fused URL/email/ctrl/punct/ws cleaner
  *   graft_split_name(id)        deterministic train/val/test assignment
  *   graft_hash_bucket(id, n)    FNV bucket in [0, n) of the id string
  *   graft_sample_keep(id, pm)   hash-Bernoulli keep decision (pm ‰)
  *   graft_redact_pii(str)       email/SSN/phone scrub to placeholders
  *
  * Contract: these are the RAW expressions. Like graft_shingle_hashes,
  * the text functions expect already-normalized input (the Scala
  * wrappers `TextFunctions.rollingHash`/`langHits` apply `normText`
  * first) — SQL callers compose e.g.
  * `graft_lang_hits(lower(trim(regexp_replace(text, '\\s+', ' '))))`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  /** Wrap a builder with strict arity validation: a wrong argument
    * count raises the same wrong-number-of-arguments AnalysisException
    * Spark's built-in function builders throw, instead of an
    * IndexOutOfBounds (too few) or silent truncation (too many). */
  private def checked(name: String, arity: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != arity)
        throw org.apache.spark.sql.graftbridge.ColumnBridge
          .wrongNumArgsError(name, arity, args.length)
      build(args)
    }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_poly_hash31",
      new ExpressionInfo(classOf[PolyHash31Expr].getName, "graft_poly_hash31"),
      checked("graft_poly_hash31", 1)(args => PolyHash31Expr(args.head))),
    ("graft_fnv32",
      new ExpressionInfo(classOf[Fnv32Expr].getName, "graft_fnv32"),
      checked("graft_fnv32", 1)(args => Fnv32Expr(args.head))),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      checked("graft_simhash", 1)(args => SimHashExpr(args.head, 32))),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      checked("graft_minhash", 1)(args => MinHashSigExpr(args.head, 16))),
    ("graft_shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashExpr].getName, "graft_shingle_hashes"),
      checked("graft_shingle_hashes", 1)(args => ShingleHashExpr(args.head, 3))),
    ("graft_dot",
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      checked("graft_dot", 2)(args => DotProductExpr(args.head, args(1)))),
    ("graft_unit_vector",
      new ExpressionInfo(classOf[UnitVectorExpr].getName, "graft_unit_vector"),
      checked("graft_unit_vector", 1)(args => UnitVectorExpr(args.head))),
    ("graft_rolling_hash",
      new ExpressionInfo(
        classOf[RollingHashExpr].getName,
        "graft_rolling_hash"),
      checked("graft_rolling_hash", 1)(args =>
        RollingHashExpr(args.head))),
    ("graft_lang_hits",
      new ExpressionInfo(
        classOf[StopwordHitsExpr].getName,
        "graft_lang_hits"),
      checked("graft_lang_hits", 1)(args =>
        StopwordHitsExpr(args.head,
          TextFunctions.Langs
            .map(TextFunctions.Stopwords)))),
    ("graft_bpe_punct_counts",
      new ExpressionInfo(
        classOf[BpePunctCountsExpr].getName,
        "graft_bpe_punct_counts"),
      checked("graft_bpe_punct_counts", 1)(args =>
        BpePunctCountsExpr(args.head))),
    ("graft_clean_text",
      new ExpressionInfo(
        classOf[CleanTextExpr].getName,
        "graft_clean_text"),
      checked("graft_clean_text", 1)(args =>
        CleanTextExpr(args.head))),
    // curation surface: compositions of the same Column definitions the
    // DataFrame API uses (one source of truth for the arithmetic) —
    // the bridge converts the built Column back to an Expression tree,
    // so these stay codegen'd built-ins, not UDFs
    ("graft_split_name",
      new ExpressionInfo(CorpusOps.getClass.getName, "graft_split_name"),
      checked("graft_split_name", 1)(args =>
        expr(CorpusOps.splitName(colOf(args.head))))),
    ("graft_hash_bucket",
      new ExpressionInfo(CorpusOps.getClass.getName, "graft_hash_bucket"),
      checked("graft_hash_bucket", 2)(args =>
        expr(CorpusOps.hashBucket(colOf(args.head), colOf(args(1)))))),
    ("graft_sample_keep",
      new ExpressionInfo(CorpusOps.getClass.getName, "graft_sample_keep"),
      checked("graft_sample_keep", 2)(args =>
        expr(CorpusOps.sampleKeep(colOf(args.head), colOf(args(1)))))),
    ("graft_redact_pii",
      new ExpressionInfo(TextFunctions.getClass.getName, "graft_redact_pii"),
      checked("graft_redact_pii", 1)(args =>
        expr(TextFunctions.redactPii(colOf(args.head))))))

  private def colOf(e: Expression) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  // eager conversion: a builder-returned tree never passes the
  // plan-level ColumnNode resolution, so the lazy wrapper would
  // survive to codegen and throw (see ColumnBridge.catalystExpression)
  private def expr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.catalystExpression(c)

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
