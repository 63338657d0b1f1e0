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

  test("fused cleanText matches the 5-pass regex chain on adversarial inputs") {
    val rnd = new scala.util.Random(42)
    // fragments chosen to hit every pass boundary: URLs (valid, bare,
    // uppercase, embedded), '@' placements, control chars, same/mixed
    // punct runs, unicode, whitespace shapes
    val frags = Array(
      "http://x.com/a", "https://y", "http://", "https://", "HTTP://Z",
      "ahttp://b", "xhttps://", "a@b.com", "@tail", "head@", "a@", "@a",
      "a@@b", "@@", "@a@", "a@b@c", "\u0001", "\u0000\u001f", "\u000b",
      "!!", "!!!", "?.,;;::", "!?!?", "...", "a..b", "Hello", "WORLD",
      "中文", "é", "😀", "42", " ", "  ", "\t", "\n", "\r", "")
    val texts = (0 until 300).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => frags(rnd.nextInt(frags.length)))
        .mkString(rnd.nextInt(3) match {
          case 0 => "" case 1 => " " case _ => "  " })
    } :+ "" :+ "   " :+ "http://only" :+ "a@b"
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .union(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id") + 1000000L, col("text")))
    val rows = rowsOf(df.select(col("doc_id"),
      TextFunctions.cleanText(col("text")).as("fused"),
      TextFunctions.cleanTextDeclarative(col("text")).as("decl")))
    assert(rows.size > 300)
    rows.foreach(m => assert(m("fused") == m("decl"),
      s"doc ${m("doc_id")}: fused=${m("fused")} decl=${m("decl")}"))
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

  test("approx vocabulary summary brackets the exact distinct counts") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val approx = rowsOf(TextAnalysis.vocabularySummaryApprox(d)).head
    val ex = d.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .agg(countDistinct(col("token")).as("terms"),
        countDistinct(col("doc_id")).as("docs"),
        count(lit(1)).as("tokens")).collect()(0)
    // pinned HLL at m=4096 (~1.6% standard error): allow ~6 standard
    // errors — deterministic, so this cannot flake, only break loudly
    def within(a: Long, e: Long) = math.abs(a - e) <= (e * 0.1).max(4)
    assert(within(approx("distinct_terms_approx").asInstanceOf[Long], ex.getLong(0)),
      s"terms approx=${approx("distinct_terms_approx")} exact=${ex.getLong(0)}")
    assert(within(approx("distinct_docs_approx").asInstanceOf[Long], ex.getLong(1)),
      s"docs approx=${approx("distinct_docs_approx")} exact=${ex.getLong(1)}")
    // token total is exact — must match, not bracket
    assert(approx("total_tokens") == ex.getLong(2))
  }

  test("approx vocabulary summary on an EMPTY corpus is a zeros row") {
    val r = rowsOf(TextAnalysis.vocabularySummaryApprox(docs())).head
    assert(r("distinct_terms_approx") == 0L &&
      r("distinct_docs_approx") == 0L && r("total_tokens") == 0L)
  }

  test("empty docs contribute no phantom '' term to vocabulary or its approx twin") {
    // tokens("") is Array("") — enough empty docs would otherwise put
    // the empty string in the top-k, displacing a real term (the
    // family convention: tokenRarity/searchTopK/collocations filter it)
    val d = docs((1L, "alpha beta alpha"), (2L, "beta gamma"),
      (3L, ""), (4L, "   "), (5L, ""))
    val v = rowsOf(TextAnalysis.vocabulary(d, k = 10))
    assert(!v.exists(_("token") == ""), s"phantom empty term: $v")
    assert(v.map(_("token")) == Seq("alpha", "beta", "gamma"))
    val a = rowsOf(TextAnalysis.vocabularySummaryApprox(d)).head
    assert(a("total_tokens") == 5L) // 3 + 2 real tokens, zero phantoms
  }

  test("langConfidence: margin separates confident from ambiguous docs") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog and then it sleeps",
      2L -> "the fox und der hund and die katze with das pferd on und the",
      3L -> "zxqv wploft grimbx vontrel")
    val r = rowsOf(TextAnalysis.langConfidence(d))
      .map(m => m("doc_id").asInstanceOf[Long] -> m).toMap
    // consistency with the hit-count frame: top == max of the 5 columns
    val hits = rowsOf(TextAnalysis.langIdFrame(d))
      .map(m => m("doc_id").asInstanceOf[Long] -> m).toMap
    r.foreach { case (id, m) =>
      val hs = TextFunctions.Langs.map(l => hits(id)(s"${l}_hits").asInstanceOf[Long])
      assert(m("top_hits") == hs.max)
      assert(m("lang_pred") == hits(id)("lang_pred"))
      assert(m("margin").asInstanceOf[Long] ==
        m("top_hits").asInstanceOf[Long] - m("second_hits").asInstanceOf[Long])
    }
    // a pure-English doc is more confident than a mixed en/de doc
    assert(r(1L)("margin").asInstanceOf[Long] > r(2L)("margin").asInstanceOf[Long])
    // no stopword evidence at all: und prediction, zero margin
    assert(r(3L)("lang_pred") == "und")
    assert(r(3L)("top_hits") == 0L && r(3L)("margin") == 0L)
  }

  test("tokenRarity: common text scores high, gibberish low, exact identities") {
    // "the cat sat" words appear in every common doc; the gibberish
    // doc's tokens appear nowhere else
    val d = docs(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat near the mat",
      3L -> "the mat sat on the cat",
      4L -> "zxqv wploft grimbx vontrel")
    val r = rowsOf(TextAnalysis.tokenRarity(d))
    val byId = r.map(m => m("doc_id").asInstanceOf[Long] -> m).toMap
    // gibberish: every token unique in the corpus
    assert(byId(4L)("min_ctf") == 1L)
    assert(byId(4L)("mean_ctf") == 1.0)
    // common docs: far above the gibberish floor
    assert(byId(1L)("mean_ctf").asInstanceOf[Double] > 3.0)
    // exact identity: sum over docs of n_tokens == total corpus tokens,
    // and mean_ctf is exactly sum_ctf / n_tokens (one division, no fold)
    r.foreach { m =>
      assert(m("mean_ctf") ==
        m("sum_ctf").asInstanceOf[Long].toDouble /
          m("n_tokens").asInstanceOf[Long].toDouble)
    }
    assert(r.map(_("n_tokens").asInstanceOf[Long]).sum == 6L + 6L + 6L + 4L)
  }

  test("searchTopK scores candidates by tf times linear rarity") {
    // vocab by (ctf desc, term): apple ctf=4 df=3, banana ctf=3 df=2,
    // cherry ctf=1 df=1; N=3 docs => w(apple)=0, w(banana)=1
    val d = docs(
      1L -> "apple apple banana",
      2L -> "apple banana banana cherry",
      3L -> "apple")
    // one term per query: q0={apple}, q1={banana}
    val r1 = rowsOf(TextAnalysis.searchTopK(d, nTerms = 2,
      termsPerQuery = 1, skipTop = 0, k = 2))
    val q1rows = r1.filter(_("query_id") == 1L)
    // banana: doc2 scores 2*1=2 over doc1 1*1=1
    assert(q1rows.map(m => (m("doc_id"), m("score"))) ==
      Seq((2L, 2L), (1L, 1L)))
    // apple has weight 0: every hit ties at 0, doc_id breaks the tie
    val q0rows = r1.filter(_("query_id") == 0L)
    assert(q0rows.map(m => (m("doc_id"), m("score"))) ==
      Seq((1L, 0L), (2L, 0L)))

    // both terms in ONE query: scores add, n_hit_terms counts matches
    val r2 = rowsOf(TextAnalysis.searchTopK(d, nTerms = 2,
      termsPerQuery = 2, skipTop = 0, k = 3))
    assert(r2.map(m => (m("doc_id"), m("score"), m("n_hit_terms"))) ==
      Seq((2L, 2L, 2L), (1L, 1L, 2L), (3L, 0L, 1L)))
  }

  test("searchTopK skipTop drops the Zipf head from the probe terms") {
    val d = docs(
      1L -> "the the the rare",
      2L -> "the common common",
      3L -> "the rare common")
    // ranked: the(ctf 5), common(3), rare(2); skipTop=1 => probe
    // terms are {common, rare}, "the" never generates candidates
    val r = rowsOf(TextAnalysis.searchTopK(d, nTerms = 2,
      termsPerQuery = 2, skipTop = 1, k = 3))
    // w(common)=3-2=1, w(rare)=3-2=1: doc2 2*1=2; doc1 1; doc3 1+1=2
    assert(r.map(m => (m("doc_id"), m("score"), m("n_hit_terms"))) ==
      Seq((2L, 2L, 1L), (3L, 2L, 2L), (1L, 1L, 1L)))
  }

  test("collocations rank pairs by exact-integer lift with tie-break") {
    val d = docs(
      1L -> "new york is big",
      2L -> "new york has new people",
      4L -> "solo") // 1-token doc: no bigram, no crash
    // pairs: (new,york)x2, others x1; total 7
    // left marginals: new 3, york 2, is 1, has 1
    // right marginals: york 2, is 1, big 1, has 1, new 1, people 1
    val r = rowsOf(TextAnalysis.collocations(d, minCount = 1, k = 10))
    assert(r.map(m => (m("w1"), m("w2"), m("lift"))) == Seq(
      ("has", "new", 7.0), ("is", "big", 7.0),
      ("york", "has", 3.5), ("york", "is", 3.5),
      ("new", "people", 7.0 / 3.0), ("new", "york", 14.0 / 6.0)))
    assert(r.head("n_pair") == 1L)
    val top = r.filter(m => m("w1") == "new" && m("w2") == "york").head
    assert(top("n_pair") == 2L && top("n_left") == 3L && top("n_right") == 2L)
    // minCount prunes the noise tail before any join
    val r2 = rowsOf(TextAnalysis.collocations(d, minCount = 2, k = 10))
    assert(r2.map(m => (m("w1"), m("w2"))) == Seq(("new", "york")))
  }

  test("searchTopK matches a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 5) {
      val vocabSize = 6 + rnd.nextInt(5)
      val nDocs = 8 + rnd.nextInt(8)
      val corpus = (1L to nDocs).map { id =>
        val len = 3 + rnd.nextInt(12)
        // Zipf-ish draws so term ranks are non-trivial
        id -> Seq.fill(len)(
          s"w${(math.sqrt(rnd.nextInt(vocabSize * vocabSize))).toInt}")
          .mkString(" ")
      }
      val skipTop = rnd.nextInt(3)
      val nTerms = 2 + rnd.nextInt(3)
      val tpq = 1 + rnd.nextInt(2)
      val k = 2 + rnd.nextInt(3)
      val got = rowsOf(TextAnalysis.searchTopK(docs(corpus: _*),
          nTerms = nTerms, termsPerQuery = tpq, skipTop = skipTop, k = k))
        .map(m => (m("query_id"), m("rank"), m("doc_id"), m("score"),
          m("n_hit_terms")))

      // brute-force reference over the same tokenization
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
      val tf = toks.flatMap { case (id, ws) =>
        ws.groupBy(identity).map { case (w, g) => (id, w, g.size.toLong) } }
      val vocab = tf.groupBy(_._2).map { case (w, rows) =>
        (w, rows.map(_._3).sum, rows.map(_._1).distinct.size.toLong) }.toSeq
      val ranked = vocab.sortBy { case (w, ctf, _) => (-ctf, w) }
      val probes = ranked.slice(skipTop, skipTop + nTerms).zipWithIndex
        .map { case ((w, _, df), idx) =>
          (w, idx.toLong / tpq, toks.size.toLong - df) }
      val scores = tf.flatMap { case (id, w, f) =>
        probes.filter(_._1 == w).map { case (_, qid, wt) => (qid, id, f * wt) } }
        .groupBy { case (qid, id, _) => (qid, id) }
        .map { case ((qid, id), rows) =>
          (qid, id, rows.map(_._3).sum, rows.size.toLong) }.toSeq
      val want = scores.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy { case (_, id, sc, _) => (-sc, id) }.take(k).zipWithIndex
          .map { case ((_, id, sc, nh), i) => (qid, i + 1, id, sc, nh) }
      }.sortBy(r => (r._1, r._2))
      assert(got == want, s"skipTop=$skipTop nTerms=$nTerms tpq=$tpq k=$k")
    }
  }

  test("collocations match a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(53)
    for (_ <- 1 to 5) {
      val vocab = (0 until 5).map(i => s"w$i")
      val corpus = (1L to (6 + rnd.nextInt(6))).map { id =>
        id -> Seq.fill(2 + rnd.nextInt(10))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val minCount = 1 + rnd.nextInt(2)
      val k = 5 + rnd.nextInt(10)
      val got = rowsOf(TextAnalysis.collocations(docs(corpus: _*),
          minCount = minCount, k = k))
        .map(m => (m("w1"), m("w2"), m("n_pair"), m("n_left"),
          m("n_right"), m("lift")))

      val bigrams = corpus.flatMap { case (_, t) =>
        val ws = t.split(" ").toSeq
        ws.zip(ws.drop(1))
      }
      val pair = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val left = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val right = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val total = bigrams.size.toLong
      val want = pair.toSeq
        .filter(_._2 >= minCount)
        .map { case ((a, b), n) =>
          (a, b, n, left(a), right(b),
            (n * total).toDouble / (left(a) * right(b)).toDouble) }
        .sortBy { case (a, b, _, _, _, l) => (-l, a, b) }
        .take(k)
      assert(got == want, s"minCount=$minCount k=$k")
    }
  }
}
