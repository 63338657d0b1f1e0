package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSuite {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("token and bpe counts") {
    val r = rowsOf(TextAnalysis.stats(docs(1L -> "Hello,  world! 42")))
    val m = r.head
    assert(m("n_tokens") == 3L)          // hello, world! 42
    // bpe-ish: [Hello][,][world][!][4][2]
    assert(m("n_bpe_tokens") == 6L)
    assert(m("n_punct") == 2L)
    assert(m("n_chars_norm") == 16L)     // "hello,  world! 42" collapsed
  }

  test("langId picks the language with most stopword hits, und when none") {
    val d = docs(
      1L -> "the cat and the dog is in that house for a while",
      2L -> "der hund und die katze ist nicht zu haus",
      3L -> "xyzzy qwerty")
    val r = rowsOf(TextAnalysis.langIdFrame(d)).map(m => m("doc_id") -> m("lang_pred")).toMap
    assert(r(1L) == "en" && r(2L) == "de" && r(3L) == "und")
  }

  test("quality score stays in [0,1]") {
    val d = docs(
      1L -> "the project is a good and clear document that it covers for the reader in depth",
      2L -> "!!! ??? ,,, ... ;;;",
      3L -> "x")
    val r = rowsOf(TextAnalysis.quality(d))
    r.foreach { m =>
      val q = m("quality").asInstanceOf[Double]
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("rolling hash matches a reference implementation") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val text = "hello world"
    val got = rowsOf(docs(1L -> text)
      .select(TextFunctions.rollingHash(col("text")).as("h"))).head("h")
    assert(got == ref(text))
  }

  test("fused rolling hash matches the declarative aggregate chain") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = rowsOf(d.select(
      TextFunctions.rollingHash(col("text")).as("fused"),
      TextFunctions.rollingHashDeclarative(col("text")).as("decl")))
    assert(pairs.nonEmpty)
    pairs.foreach(m => assert(m("fused") == m("decl")))
    // non-ASCII codepoints fold identically too
    val zh = rowsOf(docs(1L -> "这 是 中文 テスト é ü").select(
      TextFunctions.rollingHash(col("text")).as("fused"),
      TextFunctions.rollingHashDeclarative(col("text")).as("decl"))).head
    assert(zh("fused") == zh("decl"))
  }

  test("fused stopword hits match the declarative filter passes") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .union(docs(
        100001L -> "der hund 的 und die 是 katze for the of é mixed",
        100002L -> "",
        100003L -> "   "))
    val fused = d.select(col("doc_id") +:
      TextFunctions.Langs.zipWithIndex.map { case (l, i) =>
        element_at(TextFunctions.langHits(col("text")), i + 1).as(s"${l}_hits")
      }: _*)
    val decl = d.select(col("doc_id") +:
      TextFunctions.Langs.map { l =>
        TextFunctions.stopwordHitsDeclarative(
          col("text"), TextFunctions.Stopwords(l)).as(s"${l}_hits")
      }: _*)
    val f = rowsOf(fused.orderBy(col("doc_id")))
    val g = rowsOf(decl.orderBy(col("doc_id")))
    assert(f.nonEmpty && f.size == g.size)
    f.zip(g).foreach { case (a, b) => assert(a == b) }
  }

  test("fused bpe/punct counts match the regexp_extract_all forms") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .union(docs(
        100001L -> "Hello,  world! 42 ... é中文\t\nmixed-case_X99",
        100002L -> "",
        100003L -> "   \t\n  ",
        100004L -> "!!!abc123def!!!"))
    val pairs = rowsOf(d.select(
      TextFunctions.bpeTokenCount(col("text")).as("bpe_f"),
      TextFunctions.bpeTokenCountDeclarative(col("text")).as("bpe_d"),
      TextFunctions.punctCount(col("text")).as("p_f"),
      TextFunctions.punctCountDeclarative(col("text")).as("p_d")))
    assert(pairs.nonEmpty)
    pairs.foreach { m =>
      assert(m("bpe_f") == m("bpe_d"), m.toString)
      assert(m("p_f") == m("p_d"), m.toString)
    }
  }

  test("repetition ratio: looping text scores high, novel text scores 0") {
    val loop = Seq.fill(10)("the cat sat on the mat").mkString(" ")
    val novel = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val r = rowsOf(TextAnalysis.repetition(docs(1L -> loop, 2L -> novel)))
      .map(m => m("doc_id") -> m("dup_ratio").asInstanceOf[Double]).toMap
    assert(r(1L) > 0.8 && r(2L) == 0.0)
  }

  test("md5 fingerprint is normalization-invariant") {
    val r = rowsOf(TextAnalysis.fingerprints(docs(
      1L -> "Hello   World", 2L -> "hello world")))
    assert(r(0)("fp_md5") == r(1)("fp_md5"))
  }
}
