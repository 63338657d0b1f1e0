package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{ArrayHashExprs, Fnv32, TextFunctions}

/** Every custom Catalyst expression must actually COMPILE under
  * whole-stage codegen. With the default configs a Janino failure
  * silently drops the whole stage to interpreted execution (round-1:
  * ShingleHashExpr emitted an erased-generic iterator and all 7 shingle
  * queries degraded without failing a single test). Here we force
  * CODEGEN_ONLY + no fallback so a codegen break fails `sbt test`
  * loudly, and we pin codegen output == interpreted output.
  */
class CodegenNoFallbackSpec extends SparkSuite {

  private val Keys = Seq(
    "spark.sql.codegen.fallback" -> "false",
    "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
    "spark.sql.codegen.wholeStage" -> "true")

  private def withNoFallback[A](f: => A): A = {
    val prev = Keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    Keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Collect `df` twice — interpreted-tolerant (default confs) and
    * CODEGEN_ONLY — and require bit-identical results.
    */
  private def assertCodegenParity(df: => DataFrame): Unit = {
    val loose = df.collect().map(_.toString).sorted
    val strict = withNoFallback(df.collect().map(_.toString).sorted)
    assert(loose.sameElements(strict))
    assert(strict.nonEmpty)
  }

  test("shingle_hashes compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(docs.select(col("doc_id"),
      ArrayHashExprs.shingle_hashes(
        TextFunctions.normText(col("text")), 3).as("xs")))
  }

  test("poly_hash31 compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(docs.select(col("doc_id"),
      ArrayHashExprs.poly_hash31(TextFunctions.normText(col("text"))).as("h")))
  }

  test("hash64 (fmix64∘fnv1a64) compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(docs.select(col("doc_id"),
      graft.functions.HllSketch.hash64(
        TextFunctions.fingerprintMd5(col("text"))).as("h")))
  }

  test("simhash_bits + minhash_sig compile and match under CODEGEN_ONLY") {
    assertCodegenParity(docs
      .select(col("doc_id"),
        ArrayHashExprs.shingle_hashes(
          TextFunctions.normText(col("text")), 3).as("xs"))
      .select(col("doc_id"),
        ArrayHashExprs.simhash_bits(col("xs"), 64).as("sh"),
        ArrayHashExprs.minhash_sig(col("xs"), 16).as("mh")))
  }

  test("dot_product compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(emb.limit(50).select(col("vec_id"),
      graft.operators.Similarity.dot(col("embedding"), col("embedding")).as("d")))
  }

  test("unit_vector compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(emb.limit(50).select(col("vec_id"),
      ArrayHashExprs.unit_vector(
        col("embedding").cast("array<double>")).as("u")))
  }

  test("pq_adc compiles and matches under CODEGEN_ONLY") {
    // codes from vec_id bits, a fixed LUT literal — and EVERY
    // defensive branch live: an out-of-range code (99), a NULL code
    // element, a NULL LUT row, and a NULL LUT element each contribute
    // 0, never an index error (eval and codegen agree)
    assertCodegenParity(emb.limit(50).select(col("vec_id"),
      ArrayHashExprs.pq_adc(
        array((col("vec_id") % 4).cast("int"),
          (col("vec_id") % 3).cast("int"),
          lit(99).cast("int"),
          lit(null).cast("int"),           // null code element
          (col("vec_id") % 2).cast("int")),
        typedLit[Seq[Seq[java.lang.Double]]](Seq(
          Seq[java.lang.Double](0.5, 1.0, 1.5, 2.0),
          Seq[java.lang.Double](10.0, 20.0, 30.0),
          Seq[java.lang.Double](7.0),
          Seq[java.lang.Double](1.0),
          Seq[java.lang.Double](2.0, null)))).as("adc")))
    // null LUT ROW: built with a when() branch (a typedLit of a Seq
    // containing a null Seq does not round-trip literals cleanly)
    assertCodegenParity(emb.limit(50).select(col("vec_id"),
      ArrayHashExprs.pq_adc(
        array((col("vec_id") % 2).cast("int"), lit(0).cast("int")),
        array(
          when(lit(true), typedLit(Seq(0.5, 1.0))),
          when(lit(false), typedLit(Seq(9.0, 9.0))))).as("adc")))
  }

  test("vec_sub compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(emb.limit(50).select(col("vec_id"),
      ArrayHashExprs.vec_sub(
        col("embedding").cast("array<double>"),
        array(lit(0.25), lit(null).cast("double"), lit(-1.5))).as("r")))
  }

  test("rolling_hash compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(docs.select(col("doc_id"),
      graft.functions.TextExprs.rolling_hash(
        TextFunctions.normText(col("text"))).as("h")))
  }

  test("stopword_hits compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(docs.select(col("doc_id"),
      graft.functions.TextExprs.stopword_hits(
        TextFunctions.normText(col("text")),
        TextFunctions.Langs.map(TextFunctions.Stopwords)).as("hits")))
  }

  test("clean_text compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(docs.select(col("doc_id"),
      graft.functions.TextExprs.clean_text(col("text")).as("c")))
  }

  test("bpe_punct_counts compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(docs.select(col("doc_id"),
      graft.functions.TextExprs.bpe_punct_counts(col("text")).as("c")))
  }

  test("fnv32 compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(docs.select(col("doc_id"),
      Fnv32.fnv32(col("text").cast("binary")).as("h")))
  }

  test("orderable_bits compiles and matches under CODEGEN_ONLY") {
    assertCodegenParity(docs.select(col("doc_id"),
      graft.functions.DoubleBits.orderableBits(
        (col("doc_id") * 0.37 - 90.0).cast("double")).as("u")))
  }

  test("bloom_hits compiles and matches under CODEGEN_ONLY") {
    val bytes = graft.operators.CorpusOps.evalShingleBloom(
      docs.filter(col("doc_id") < 50), shingleN = 3)
    assertCodegenParity(docs.select(col("doc_id"),
      ArrayHashExprs.bloom_hits(
        ArrayHashExprs.shingle_hashes(
          TextFunctions.normText(col("text")), 3), bytes).as("h")))
  }
}
