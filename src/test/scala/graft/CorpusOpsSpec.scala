package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fnv32
import graft.operators.CorpusOps

class CorpusOpsSpec extends SparkSuite {

  test("effectiveTokens: canonical-only totals and exact dup tax") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(
      (1L, base, "en", "sA"),
      (2L, base + " tail", "en", "sA"),          // near-dup of 1 -> cluster 1
      (3L, "totally different words living in this doc", "en", "sA"),
      (5L, "second source with its very own content stream", "en", "sB"))
    val labels = graft.operators.Dedup.nearDupLabels(d, threshold = 0.3)
    val r = rowsOf(CorpusOps.effectiveTokens(d, labels))
      .map(m => m("source") -> m).toMap
    org.apache.spark.sql.graftbridge.ColumnBridge
      .unpersistCheckpoint(labels)
    // sA: raw = 10 + 11 + 7 = 28; doc 2 collapses into cluster 1, so
    // effective = 10 + 7 = 17; tax = floor(11e6/28)
    assert(r("sA")("n_docs") == 3L && r("sA")("raw_tokens") == 28L &&
      r("sA")("effective_tokens") == 17L, s"sA: ${r("sA")}")
    assert(r("sA")("dup_tax_ppm") == 11L * 1000000L / 28L)
    // sB: singleton — no tax
    assert(r("sB")("raw_tokens") == r("sB")("effective_tokens") &&
      r("sB")("dup_tax_ppm") == 0L, s"sB: ${r("sB")}")
  }

  private def docs(rows: (Long, String, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** English fixture docs: (id, text) with lang=en, source=s0. */
  private def enDocs(rows: (Long, String)*): DataFrame =
    docs(rows.map { case (id, t) => (id, t, "en", "s0") }: _*)

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the green hills " +
      "and a river runs through the quiet valley under a pale morning sky"

  test("hashBucket matches the reference FNV-1a-variant over the id string") {
    val d = enDocs((0L until 20L).map(i => i -> s"doc $i"): _*)
    val got = rowsOf(d.select(col("doc_id"),
        CorpusOps.hashBucket(col("doc_id"), 100).as("b")))
      .map(r => r("doc_id").asInstanceOf[Long] -> r("b").asInstanceOf[Long])
      .toMap
    (0L until 20L).foreach { i =>
      val expected = Fnv32.hashBytes(i.toString.getBytes("UTF-8")) % 100
      assert(got(i) == expected, s"doc $i")
    }
  }

  test("splitStats partitions every doc into exactly one split") {
    val d = enDocs((0L until 200L).map(i => i -> s"text $i"): _*)
    val r = rowsOf(CorpusOps.splitStats(d))
    assert(r.map(_("split")).toSet.subsetOf(Set[Any]("train", "val", "test")))
    assert(r.map(_("n_docs").asInstanceOf[Long]).sum == 200L)
    assert(r.map(_("total_chars").asInstanceOf[Long]).sum ==
      (0L until 200L).map(i => s"text $i".length.toLong).sum)
    // hash-based assignment is stable under repartitioning
    val r2 = rowsOf(CorpusOps.splitStats(d.repartition(7)))
    assert(r.toSet == r2.toSet)
  }

  test("sampleByHash agrees with stratifiedSampleStats kept counts") {
    val d = docs((0L until 300L).map(i =>
      (i, s"text $i", if (i % 3 == 0) "en" else "de", s"s${i % 4}")): _*)
    val stats = rowsOf(CorpusOps.stratifiedSampleStats(d,
      permilleByLang = Map("en" -> 250), defaultPermille = 1000))
    val keptEn = stats.find(_("lang") == "en").get("n_kept").asInstanceOf[Long]
    val keptDe = stats.find(_("lang") == "de").get("n_kept").asInstanceOf[Long]
    // default rate 1000 keeps everything
    assert(keptDe == 200L)
    val sampledEn = CorpusOps
      .sampleByHash(d.filter(col("lang") === "en"), col("doc_id"), 250)
      .count()
    assert(sampledEn == keptEn)
    // a 250‰ rate should actually downsample (not keep all / none)
    assert(keptEn > 0L && keptEn < 100L)
  }

  test("decontaminate flags planted eval leakage, skips clean docs") {
    // doc 1000 contains an exact 10-token run from eval doc 1;
    // doc 1001 shares no 5-gram with any eval doc
    val leak = "rain falls on the green hills and a river runs"
    val d = enDocs(
      1L -> base,
      2L -> "completely different evaluation prompt about catalyst optimizer rules",
      1000L -> s"unrelated training prose first then $leak then more words after",
      1001L -> "entirely disjoint training document with no overlapping runs at all")
    val r = rowsOf(CorpusOps.decontaminateById(d, evalMaxId = 100, shingleN = 5))
    assert(r.exists(p => p("train_doc") == 1000L && p("eval_doc") == 1L))
    assert(!r.exists(p => p("train_doc") == 1001L))
    // shared counts the distinct common 5-gram hashes — a planted run
    // of 10 tokens contains exactly 6 distinct 5-grams
    val shared = r.find(p => p("train_doc") == 1000L && p("eval_doc") == 1L)
      .get("shared").asInstanceOf[Long]
    assert(shared == 6L)
  }

  test("decontaminate takes a separate eval frame; ids may overlap freely") {
    // real pipelines hold benchmarks in their own table, so the same
    // doc_id can exist on both sides — membership comes from WHICH
    // frame a doc is in, never an id-range convention
    val leak = "rain falls on the green hills and a river runs"
    val train = enDocs(
      1L -> s"training text around $leak embedded in the middle",
      2L -> "clean training document sharing nothing with the benchmark")
    val eval = enDocs(1L -> base, 2L -> "benchmark prompt about optimizer rules")
    val r = rowsOf(CorpusOps.decontaminate(train, eval))
    assert(r.exists(p => p("train_doc") == 1L && p("eval_doc") == 1L))
    assert(!r.exists(p => p("train_doc") == 2L))
    // the unhinted variant (for eval frames NOT known-small) must give
    // identical results through a shuffle join
    val unhinted = rowsOf(CorpusOps.decontaminate(train, eval,
      shingleN = 5, minShared = 1L, broadcastEval = false))
    assert(unhinted == r)
  }

  test("splitLeakage flags near-dup clusters straddling splits, skips clean ones") {
    // ids 0..30 share one text → one cluster; with 80/10/10 FNV splits
    // 31 ids certainly span at least two splits. 100 is a singleton.
    val d = enDocs(
      ((0L to 30L).map(i => i -> base) :+ (100L -> "a lone unrelated document")): _*)
    val r = rowsOf(CorpusOps.splitLeakage(d))
    assert(r.size == 1, s"expected exactly the one planted leak: $r")
    val c = r.head
    assert(c("cluster") == 0L)
    assert(c("n_docs") == 31L)
    assert(c("n_splits").asInstanceOf[Long] >= 2L)
    // the reported split pair must agree with recomputing memberships
    val splits = rowsOf(d.filter(col("doc_id") <= 30L)
      .select(CorpusOps.splitName(col("doc_id")).as("s")).distinct())
      .map(_("s").asInstanceOf[String]).sorted
    assert(c("n_splits") == splits.size.toLong)
    assert(c("split_a") == splits.min && c("split_b") == splits.max)
  }

  test("repairSplits heals the planted leak; singletons never move") {
    val d = enDocs(
      ((0L to 30L).map(i => i -> base) :+ (100L -> "a lone unrelated document")): _*)
    // precondition: the planted cluster leaks under id-derived splits
    assert(rowsOf(CorpusOps.splitLeakage(d)).nonEmpty)
    val r = rowsOf(CorpusOps.repairSplits(d))
    assert(r.size == 32 && r.map(_("doc_id")) == ((0L to 30L) :+ 100L))
    // repaired: every cluster sits in exactly one split
    val byCluster = r.groupBy(_("cluster"))
    byCluster.foreach { case (c, rows) =>
      assert(rows.map(_("split")).distinct.size == 1,
        s"cluster $c still straddles splits after repair")
    }
    // the whole dup cluster inherits its min member's (id 0) split
    val cluster0 = byCluster(0L)
    val want = rowsOf(d.limit(1).select(
      CorpusOps.splitName(lit(0L)).as("s"))).head("s")
    assert(cluster0.size == 31 && cluster0.forall(_("split") == want))
    // moved is exactly "id-split differs from cluster-split"; a
    // singleton's cluster IS its id, so it can never move
    val single = r.find(_("doc_id") == 100L).get
    assert(single("cluster") == 100L && single("moved") == false &&
      single("old_split") == single("split"))
    r.foreach { row =>
      assert(row("moved") == (row("old_split") != row("split")))
    }
  }

  test("decontaminateBloom ≡ decontaminate (exact output through the sketch)") {
    // the sketch is a PREFILTER: no false negatives (Bloom guarantee),
    // false positives die in the exact join — so the two variants must
    // agree row-for-row, on the planted fixture and the real one
    val leak = "rain falls on the green hills and a river runs"
    val d = enDocs(
      1L -> base,
      2L -> "completely different evaluation prompt about catalyst optimizer rules",
      1000L -> s"unrelated training prose first then $leak then more words after",
      1001L -> "entirely disjoint training document with no overlapping runs at all")
    assert(rowsOf(CorpusOps.decontaminateBloomById(d)) ==
      rowsOf(CorpusOps.decontaminateById(d)))
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    assert(rowsOf(CorpusOps.decontaminateBloomById(real)) ==
      rowsOf(CorpusOps.decontaminateById(real)))
  }

  test("bloom prefilter prunes disjoint postings, keeps every true match") {
    val leak = "rain falls on the green hills and a river runs"
    val train = enDocs(
      1L -> s"training text around $leak embedded in the middle",
      2L -> "clean training document sharing nothing with the benchmark and long")
    val eval = enDocs(10L -> base)
    def postings(df: org.apache.spark.sql.DataFrame, as: String) =
      graft.operators.Dedup.shingleHashFrame(df, 5)
        .select(col("doc_id").as(as), explode_outer(col("xs")).as("g"))
    val trainPost = postings(train, "train_doc")
    val kept = CorpusOps.bloomPrefilter(trainPost, postings(eval, "eval_doc"),
      expectedEvalShingles = 1L << 12)
    val keptG = rowsOf(kept).map(_("g")).toSet
    val matchG = rowsOf(trainPost.join(postings(eval, "eval_doc"), Seq("g")))
      .map(_("g")).toSet
    assert(matchG.subsetOf(keptG), "a Bloom filter must never drop a true match")
    assert(kept.count() < trainPost.count(),
      "the prefilter should prune the disjoint doc's postings")
    // empty eval set: no sketch to build — zero postings survive
    assert(CorpusOps.bloomPrefilter(trainPost,
      postings(eval.filter(lit(false)), "eval_doc"), 1L << 12).count() == 0L)
  }

  test("sourceCube margins are consistent with the cell aggregate") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cube = rowsOf(graft.operators.CorpusOps.sourceCube(d))
    val cells = cube.filter(r => r("source") != null && r("lang") != null)
    val grand = cube.find(r => r("source") == null && r("lang") == null).get
    assert(grand("n_docs") == cells.map(_("n_docs").asInstanceOf[Long]).sum)
    assert(grand("n_docs") == d.count())
    // each per-source margin equals the sum of its cells
    cube.filter(r => r("source") != null && r("lang") == null).foreach { m =>
      assert(m("n_docs") ==
        cells.filter(_("source") == m("source"))
          .map(_("n_docs").asInstanceOf[Long]).sum)
    }
  }

  test("cleanCorpus = training docs minus every flagged doc") {
    val leak = "rain falls on the green hills and a river runs"
    val train = enDocs(
      1000L -> s"prose around $leak embedded here",
      1001L -> "clean document sharing nothing with the benchmark at all")
    val eval = enDocs(1L -> base)
    val clean = rowsOf(graft.operators.CorpusOps.cleanCorpus(train, eval))
      .map(_("doc_id"))
    assert(clean == Seq(1001L))
  }

  test("packAssignments: every doc lands in exactly one bin, streams are " +
      "contiguous, and bins respect the budget boundary") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val budget = 256
    val rows = rowsOf(graft.operators.CorpusOps.packAssignments(d, budget, 4))
    assert(rows.length == d.count())
    // a doc's bin is where its first token lands: start_tok/budget
    rows.foreach { r =>
      val start = r("start_tok").asInstanceOf[Long]
      assert(r("bin_id") == start / budget)
    }
    // per stream: bins are contiguous from 0 and the running total is
    // the sum of everything before it (no token lost or double-packed)
    rows.groupBy(_("pack_bucket")).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_("doc_id").asInstanceOf[Long])
      var running = 0L
      sorted.foreach { r =>
        assert(r("start_tok") == running)
        running += r("n_tokens").asInstanceOf[Long]
      }
      val bins = sorted.map(_("bin_id").asInstanceOf[Long]).distinct
      assert(bins == bins.sorted && bins.head == 0L)
    }
    // determinism: a different partitioning gives identical assignments
    val re = rowsOf(graft.operators.CorpusOps.packAssignments(
      d.repartition(7), budget, 4))
    assert(re.toSet == rows.toSet)
  }

  test("docKeywords ranks a planted rare term above shared vocabulary") {
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val d = enDocs(
      1L -> (common + " zyxwvut"),
      2L -> common,
      3L -> common)
    val r = rowsOf(graft.operators.CorpusOps.docKeywords(d, k = 2))
    val top1 = r.find(p => p("doc_id") == 1L && p("rank") == 1).get
    // tf=1, df=1, N=3 → score 3.0 beats any shared term (df=3 → tf×1)
    assert(top1("term") == "zyxwvut" && top1("score") == 3.0)
    assert(r.count(_("doc_id") == 1L) == 2)
  }

  test("bestOfCluster keeps the highest-quality doc per near-dup cluster") {
    // 1-2 form a near-dup cluster (different lengths → different
    // quality); 10 is a singleton
    val d = enDocs(
      1L -> base,
      2L -> (base + " extra trailing words here"),
      10L -> "short standalone document")
    val r = rowsOf(CorpusOps.bestOfCluster(d))
    assert(r.map(_("n_docs").asInstanceOf[Long]).sum == 3L)
    val c1 = r.find(_("cluster") == 1L).get
    assert(c1("n_docs") == 2L)
    // the argmax must agree with recomputing quality directly
    val q = rowsOf(d.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q")))
      .map(x => x("doc_id").asInstanceOf[Long] -> x("q").asInstanceOf[Double])
      .toMap
    val expectBest = Seq(1L, 2L).maxBy(id => (q(id), -id))
    assert(c1("best_doc_id") == expectBest)
    assert(c1("best_quality") == q(expectBest))
    assert(r.find(_("cluster") == 10L).get("best_doc_id") == 10L)
  }

  test("redactPii scrubs planted emails, SSNs, and phone runs") {
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions
    val d = Seq(
      (1L, "contact alice.smith+spam@example.co.uk for details"),
      (2L, "ssn 123-45-6789 and phone +1 (415) 555-0123 on file"),
      (3L, "clean text with no identifiers at all"),
      (4L, "card-ish digit run 4111111111111 inline"))
      .toDF("doc_id", "text")
    val r = rowsOf(d.select(col("doc_id"),
        TextFunctions.redactPii(col("text")).as("red")))
      .map(x => x("doc_id").asInstanceOf[Long] -> x("red").asInstanceOf[String])
      .toMap
    assert(r(1L) == "contact <email> for details")
    // the SSN must redact as one token, not half-match the phone rule;
    // "+1 (415) 555-0123" redacts from the leading + through the digits
    assert(r(2L) == "ssn <ssn> and phone <phone> on file")
    assert(r(3L) == "clean text with no identifiers at all")
    assert(r(4L) == "card-ish digit run <phone> inline")
  }

  test("sourceOverlap attributes near-dup pairs to unordered source pairs") {
    val d = docs(
      (1L, base, "en", "srcA"),
      (2L, base + " extra trailing words here", "en", "srcB"),
      (3L, base + " other small tail", "en", "srcB"),
      (10L, "entirely different content about query planners and shuffles and joins at massive scale everywhere", "en", "srcC"))
    val r = rowsOf(CorpusOps.sourceOverlap(d))
    val cells = r.map(x => (x("source_lo"), x("source_hi")) ->
      x("n_pairs").asInstanceOf[Long]).toMap
    // total cells must equal the pair count, orderless
    val nPairs = graft.operators.Dedup.minhashPairs(d).count()
    assert(cells.values.sum == nPairs)
    // the cross-source pair (1,2) lands in the (srcA, srcB) cell
    assert(cells.contains(("srcA", "srcB")))
    assert(!cells.keySet.exists { case (lo, hi) =>
      lo.asInstanceOf[String] > hi.asInstanceOf[String] })
  }

  test("langConfusion and sourceStats partition the corpus") {
    val d = docs(
      (1L, "the and is in it you that he was for " * 3, "en", "s1"),
      (2L, "der die und in den von zu das mit sich " * 3, "de", "s2"),
      (3L, "zz qq ww ee rr", "de", "s3")) // no stopword hits → und
    val conf = rowsOf(CorpusOps.langConfusion(d))
    assert(conf.map(_("n_docs").asInstanceOf[Long]).sum == 3L)
    assert(conf.exists(r => r("lang_label") == "en" && r("lang_pred") == "en"))
    assert(conf.exists(r => r("lang_label") == "de" && r("lang_pred") == "de"))
    assert(conf.exists(r => r("lang_pred") == "und"))
    val src = rowsOf(CorpusOps.sourceStats(d))
    assert(src.length == 3)
    assert(src.map(_("n_docs").asInstanceOf[Long]).sum == 3L)
  }

  test("token-budget selection equals the global prefix-sum definition") {
    import graft.functions.TextFunctions
    // real corpus slice: varied quality, forces a partial boundary bin
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = d.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    for (budget <- Seq(0L, 500L, 2000L, Long.MaxValue)) {
      val expected = rowsOf(scored
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .filter(col("cum") <= budget)
        .select(col("doc_id")).orderBy(col("doc_id")))
        .map(_("doc_id"))
      val got = rowsOf(CorpusOps.selectByTokenBudget(d, budgetTokens = budget))
        .map(_("doc_id"))
      assert(got == expected, s"budget=$budget: $got vs $expected")
      // hard budget: the selection never exceeds it (except the
      // everything-fits sentinel case)
      if (budget != Long.MaxValue) {
        val total = rowsOf(CorpusOps.selectByTokenBudget(d, budget))
          .map(_("n_tokens").asInstanceOf[Long]).sum
        assert(total <= budget)
      }
    }
  }

  test("token-budget boundary refinement recurses instead of sorting a huge bin") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import graft.functions.TextFunctions
    val scored = d.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val expected = rowsOf(scored
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= 2000L)
      .select(col("doc_id")).orderBy(col("doc_id"))).map(_("doc_id"))
    // windowMaxRows = 1 forces refinement all the way to the depth cap
    // (and the final quality-tie window) — the result must not change
    val got = rowsOf(CorpusOps.selectByTokenBudget(d, 2000L,
      windowMaxRows = 1L)).map(_("doc_id"))
    assert(got == expected)
    // coarse bins force a populated boundary bin at every level
    val gotCoarse = rowsOf(CorpusOps.selectByTokenBudget(d, 2000L,
      bins = 2, windowMaxRows = 1L)).map(_("doc_id"))
    assert(gotCoarse == expected)
    // degenerate bins are an error, not a silently ignored budget
    intercept[IllegalArgumentException] {
      CorpusOps.selectByTokenBudget(d, 2000L, bins = 0)
    }
  }

  test("source quota keeps the cap best docs per source") {
    val d = docs(
      (1L, base + " one", "en", "sA"),
      (2L, base, "en", "sA"),
      (3L, base + " three more words here", "en", "sA"),
      (4L, "tiny", "en", "sB"),
      (5L, base + " five", "en", "sB"))
    val r = rowsOf(CorpusOps.sourceQuota(d, cap = 2))
    assert(r.map(_("doc_id")) == Seq(1L, 2L, 3L, 4L, 5L))
    // per-source ranks are a permutation of 1..n_source
    val bySrc = r.groupBy(_("source"))
    assert(bySrc("sA").map(_("src_rank").asInstanceOf[Int]).sorted == Seq(1, 2, 3))
    assert(bySrc("sB").map(_("src_rank").asInstanceOf[Int]).sorted == Seq(1, 2))
    // cap=2: exactly 2 kept in sA, both kept in sB
    assert(r.count(m => m("source") == "sA" && m("kept") == true) == 2)
    assert(r.count(m => m("source") == "sB" && m("kept") == true) == 2)
    // kept docs are the top-quality ones within their source
    val sA = bySrc("sA").sortBy(_("src_rank").asInstanceOf[Int])
    assert(sA.map(_("quality").asInstanceOf[Double]).reverse.sorted ==
      sA.map(_("quality").asInstanceOf[Double]).reverse)
    assert(!sA.last("kept").asInstanceOf[Boolean])
  }

  test("distributed source quota == window formulation on a skewed corpus") {
    // one mega-source dominating the corpus (the exact shape that
    // bottlenecks the window formulation), small satellites, and
    // exact-duplicate texts so quality TIES cross the radix floor
    val words = base.split(" ")
    val megaRows = (0L until 400L).map { i =>
      val t =
        if (i % 4 == 0) base // duplicates → tied qualities
        else words.take((i % 37 + 3).toInt).mkString(" ") + s" tail$i"
      (i, t, "en", "mega")
    }
    val smallRows = (400L until 430L).map(i =>
      (i, s"small doc $i " + words.take((i % 11 + 2).toInt).mkString(" "),
        "en", s"s${i % 3}"))
    val d = docs((megaRows ++ smallRows): _*)
    val expected = rowsOf(CorpusOps.sourceQuota(d, cap = 5))
    // binMaxRows=8 forces hot-bin recursion on the mega source (and
    // the 60-bit tie floor for the duplicate texts)
    val dist = CorpusOps.sourceQuotaDistributed(d, cap = 5, binMaxRows = 8L)
    val got = rowsOf(dist)
    org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(dist)
    assert(got == expected)
  }

  test("distributed source quota, no-skew path (level-1 histogram only)") {
    val d = docs(
      (1L, base + " one", "en", "sA"),
      (2L, base, "en", "sA"),
      (3L, base + " three more words here", "en", "sA"),
      (4L, "tiny", "en", "sB"),
      (5L, base + " five", "en", "sB"))
    val expected = rowsOf(CorpusOps.sourceQuota(d, cap = 2))
    val dist = CorpusOps.sourceQuotaDistributed(d, cap = 2)
    val got = rowsOf(dist)
    org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(dist)
    assert(got == expected)
  }

  test("distributed source quota keeps null-source rows (window-twin parity)") {
    // round-15 review finding: the probe equi-join on source never
    // matched null === null, so null-source docs vanished from the
    // distributed path while the window twin ranked them — a silent
    // row loss no output-equality check had covered
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, base + " one", "en", "sA", 10L),
      (2L, base, "en", null.asInstanceOf[String], 10L),
      (3L, base + " three", "en", null.asInstanceOf[String], 10L),
      (4L, base + " four", "en", null.asInstanceOf[String], 10L),
      (5L, base + " five", "en", "sB", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val expected = rowsOf(CorpusOps.sourceQuota(d, cap = 2))
    assert(expected.count(_("source") == null) == 3,
      "window twin must rank null-source docs")
    val dist = CorpusOps.sourceQuotaDistributed(d, cap = 2)
    val got = rowsOf(dist)
    org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(dist)
    assert(got == expected)
  }

  test("token-less sources: mixture keeps them whole, padding buckets them at zero") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, base, "en", "real", 10L),
      (2L, base + " two", "en", "real", 10L),
      (3L, null.asInstanceOf[String], "en", "ghost", 0L),
      (4L, null.asInstanceOf[String], "en", "ghost", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // a source whose every doc has null text previously got ppm NULL
    // (sum of all-null tokens) and mixtureSample silently dropped the
    // whole source; it must instead be kept whole (it is the smallest
    // source there is, and its docs cost the mixture zero tokens)
    val rates = rowsOf(CorpusOps.mixtureRates(d))
      .map(m => m("source") -> m).toMap
    assert(rates("ghost")("tokens") == 0L && rates("ghost")("ppm") == 1000000L)
    assert(rates("real")("ppm").asInstanceOf[Long] > 0L,
      "zero-token source dragged real rates down")
    val kept = rowsOf(CorpusOps.mixtureSample(d))
      .map(_("doc_id").asInstanceOf[Long]).toSet
    assert(Set(3L, 4L).subsetOf(kept), s"ghost docs dropped: $kept")
    // batchPadding: a null-text doc is a ZERO-token doc (bucket 0),
    // not a max_tokens-padded phantom in the top bucket
    val pads = rowsOf(CorpusOps.batchPadding(d, batchSize = 8, streams = 1,
      bucketTokens = 4, maxBucket = 8))
    val top = pads.filter(_("len_bucket") == 8L)
    assert(top.isEmpty || top.forall(_("n_docs") == 0L),
      s"null-text docs reached the top bucket: $top")
    assert(pads.map(_("n_docs").asInstanceOf[Long]).sum == 4L)
  }

  test("null-source docs sample under the null group's rate; the streaming gate mirrors the draw") {
    val s = spark
    import s.implicits._
    def w(n: Int) = Seq.fill(n)("w").mkString(" ")
    // null source totals 100 tokens, "small" totals 4 → the null
    // group's rate is floor(sqrt(4/100)·1e6) = 200000 ppm. A plain
    // equi-join sampler would vanish all ten docs; a left-join gate
    // would admit all ten at rate 1 — both wrong, both distinguishable
    // from the correct 200000-ppm draw below.
    val d = ((0L to 9L).map(i => (i, w(10), "en", null.asInstanceOf[String])) ++
      (10L to 13L).map(i => (i, w(1), "en", "small")))
      .toDF("doc_id", "text", "lang", "source")
    val stats = rowsOf(CorpusOps.mixtureSampleStats(d))
    val nullRow = stats.find(_("source") == null)
      .getOrElse(fail("null-source row vanished from mixture stats"))
    assert(nullRow("ppm") == 200000L && nullRow("n_docs") == 10L)
    // membership must follow the null GROUP's rate — the FNV rule at
    // 200000 ppm — not the absent-source rate-1 default
    val expectKept = rowsOf(d.filter(col("source").isNull)
        .select(col("doc_id"),
          CorpusOps.hashBucket(col("doc_id"), 1000000).as("h")))
      .filter(_("h").asInstanceOf[Long] < 200000L)
      .map(_("doc_id").asInstanceOf[Long]).toSet
    assert(expectKept.size < 10,
      "fixture ids must make the 200000-ppm draw actually drop docs")
    val kept = rowsOf(CorpusOps.mixtureSample(d))
    assert(kept.filter(_("source") == null)
        .map(_("doc_id").asInstanceOf[Long]).toSet == expectKept,
      "null-source membership diverged from the null group's rate")
    assert(nullRow("n_kept") == expectKept.size.toLong)
    // the streaming gate's null-safe join admits EXACTLY the batch
    // sampler's draw — including the null-source docs
    val gate = rowsOf(graft.streaming.StreamingCuration.mixtureGate(
        d, CorpusOps.mixtureRates(d)))
      .map(_("doc_id").asInstanceOf[Long]).toSet
    assert(gate == kept.map(_("doc_id").asInstanceOf[Long]).toSet,
      "streaming gate diverged from the batch sampler on null sources")
  }

  test("snapshot diff classifies added/removed/changed and drops unchanged") {
    val old = enDocs(
      1L -> "alpha text", 2L -> "beta text", 3L -> "gamma text",
      4L -> "delta text")
    val neu = enDocs(
      1L -> "alpha text",          // unchanged -> filtered out
      2L -> "beta text revised",   // changed
      // 3 absent -> removed
      4L -> "delta text",          // unchanged -> filtered out
      5L -> "epsilon text")        // added
    val got = rowsOf(CorpusOps.snapshotDiff(old, neu))
    assert(got.map(r => r("doc_id") -> r("status")) ==
      Seq(2L -> "changed", 3L -> "removed", 5L -> "added"))
    // fingerprint null-ness mirrors presence
    val byId = got.map(r => r("doc_id").asInstanceOf[Long] -> r).toMap
    assert(byId(3L)("new_fp") == null && byId(3L)("old_fp") != null)
    assert(byId(5L)("old_fp") == null && byId(5L)("new_fp") != null)
    assert(byId(2L)("old_fp") != byId(2L)("new_fp"))
    // identical snapshots diff to nothing
    assert(rowsOf(CorpusOps.snapshotDiff(old, old)).isEmpty)
    // the synthetic next crawl hits all three classes on the fixture
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val statuses = rowsOf(CorpusOps.snapshotDiff(
        real, CorpusOps.syntheticNextSnapshot(real)))
      .map(_("status")).toSet
    assert(statuses == Set("added", "removed", "changed"))
  }

  test("docChunks: window/stride boundaries, short docs, full coverage") {
    val d = enDocs(
      0L -> "a b c d e",            // 5 toks, W3 S2 -> [a b c][c d e]
      1L -> "x y",                  // shorter than window -> ONE chunk
      2L -> "a b c d e f g",        // 7 toks -> 3 chunks, last ends at n
      3L -> "t1 t2 t3 t4 t5 t6")    // 6 toks -> last chunk short (2)
    val got = rowsOf(CorpusOps.docChunks(d, window = 3, stride = 2))
      .map(r => (r("doc_id"), r("chunk_id"), r("chunk"), r("n_tokens")))
    assert(got == Seq(
      (0L, 0L, "a b c", 3L), (0L, 1L, "c d e", 3L),
      (1L, 0L, "x y", 2L),
      (2L, 0L, "a b c", 3L), (2L, 1L, "c d e", 3L), (2L, 2L, "e f g", 3L),
      (3L, 0L, "t1 t2 t3", 3L), (3L, 1L, "t3 t4 t5", 3L),
      (3L, 2L, "t5 t6", 2L)))
    // coverage property on the real fixture: with stride <= window the
    // per-doc chunk token counts telescope to n + overlap*(chunks-1),
    // i.e. every token is covered and consecutive chunks overlap by
    // exactly window - stride except possibly at the tail
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val perDoc = rowsOf(CorpusOps.docChunks(real, 32, 16)
      .groupBy("doc_id")
      .agg(sum("n_tokens").as("covered"), count("*").as("chunks"),
        max(col("chunk_id") * 16 + col("n_tokens")).as("last_end")))
    val nToks = rowsOf(real.select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n")))
      .map(r => r("doc_id") -> r("n").asInstanceOf[Long]).toMap
    perDoc.foreach { r =>
      val (n, chunks) = (nToks(r("doc_id")), r("chunks").asInstanceOf[Long])
      // the final chunk reaches exactly the last token
      assert(r("last_end") == n, s"doc ${r("doc_id")} tail")
      // sum of chunk sizes = n + 16*(chunks-1) when every overlap is
      // the full window-stride, and never less than n (full coverage)
      val covered = r("covered").asInstanceOf[Long]
      assert(covered >= n && covered <= n + 16L * (chunks - 1),
        s"doc ${r("doc_id")} coverage")
    }
    // stride > window would leave token gaps — refuse it
    intercept[IllegalArgumentException](
      CorpusOps.docChunks(d, window = 3, stride = 4))
  }

  test("docChunks reconstruction: dropping the overlap reassembles every doc") {
    // THE chunking invariant: chunk 0 plus each later chunk minus its
    // first (window − stride) tokens is exactly the token stream — no
    // token lost, none duplicated beyond the declared overlap. Checked
    // generatively over seeded random lengths and (W, S) corners
    // (wide overlap, no overlap W==S, stride 1).
    val rnd = new scala.util.Random(12021)
    val lens = Seq(1, 2, 3) ++ Seq.fill(37)(1 + rnd.nextInt(50))
    val d = enDocs(lens.zipWithIndex.map { case (n, id) =>
      id.toLong -> (0 until n).map(j => s"t${id}x$j").mkString(" ")
    }: _*)
    for ((w, s) <- Seq((32, 16), (8, 3), (5, 5), (4, 1))) {
      val byDoc = rowsOf(CorpusOps.docChunks(d, w, s))
        .groupBy(_("doc_id").asInstanceOf[Long])
      lens.zipWithIndex.foreach { case (n, id) =>
        val chunks = byDoc(id.toLong)
          .sortBy(_("chunk_id").asInstanceOf[Long])
          .map(_("chunk").asInstanceOf[String].split(" ").toSeq)
        val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(w - s))
        assert(rebuilt == (0 until n).map(j => s"t${id}x$j"),
          s"doc $id W=$w S=$s")
        // every non-final chunk is full; the final one is never empty
        chunks.dropRight(1).foreach(c => assert(c.length == w))
        assert(chunks.last.nonEmpty)
      }
    }
  }

  test("sourceMixture: exact closed form, flattening, max-normalized") {
    // 3 sources with token counts 100 / 25 / 4 (docs of "w "*n text)
    def doc(id: Long, n: Int, src: String) =
      (id, Seq.fill(n)("w").mkString(" "), "en", src)
    val d = docs(
      doc(0L, 60, "big"), doc(1L, 40, "big"),
      doc(2L, 25, "mid"),
      doc(3L, 4, "small"))
    val r = rowsOf(CorpusOps.sourceMixture(d))
      .map(m => m("source").asInstanceOf[String] -> m).toMap
    assert(r("big")("tokens") == 100L && r("mid")("tokens") == 25L &&
      r("small")("tokens") == 4L)
    // sqrt closed forms: sqrt(100)=10, sqrt(25)=5, sqrt(4)=2 — exact
    assert(r("big")("rel_weight") == 1.0)
    assert(r("mid")("rel_weight") == 0.5)
    assert(r("small")("rel_weight") == 0.2)
    assert(r("big")("raw_share") == 100.0 / 129)
    // flattening: every non-largest source's relative weight exceeds
    // its relative size — the operator's reason to exist
    assert(0.5 > 25.0 / 100 && 0.2 > 4.0 / 100)
    // raw shares are exact integer-ratio doubles summing to ~1
    val shares = r.values.map(_("raw_share").asInstanceOf[Double]).sum
    assert(math.abs(shares - 1.0) < 1e-12)
  }

  test("mixtureSample: exact ppm rates, smallest source keeps all, stats agree") {
    // token sums 100 / 25 / 4 → rates sqrt(4/100)=0.2, sqrt(4/25)=0.4,
    // sqrt(4/4)=1 — exact doubles, so the ppm floors are closed-form
    def doc(id: Long, n: Int, src: String) =
      (id, Seq.fill(n)("w").mkString(" "), "en", src)
    val d = docs(Seq(
      doc(0L, 60, "big"), doc(1L, 40, "big"),
      doc(2L, 25, "mid")) ++
      (3L to 6L).map(i => doc(i, 1, "small")): _*)
    val stats = rowsOf(CorpusOps.mixtureSampleStats(d))
      .map(m => m("source").asInstanceOf[String] -> m).toMap
    assert(stats("big")("ppm") == 200000L)
    assert(stats("mid")("ppm") == 400000L)
    assert(stats("small")("ppm") == 1000000L)
    // the smallest source is never downsampled
    assert(stats("small")("n_kept") == stats("small")("n_docs"))
    assert(stats("small")("kept_tokens") == 4L)
    // the kept-row frame and the accounting must be the same draw
    val kept = rowsOf(CorpusOps.mixtureSample(d))
    val bySrc = kept.groupBy(_("source")).view.mapValues(_.size.toLong).toMap
    stats.foreach { case (src, m) =>
      assert(bySrc.getOrElse(src, 0L) == m("n_kept").asInstanceOf[Long], src)
    }
    // membership is the documented FNV rule, not an RNG draw
    kept.foreach { r =>
      val id = r("doc_id").asInstanceOf[Long]
      val src = r("source").asInstanceOf[String]
      val hv = rowsOf(d.filter(col("doc_id") === id).select(
        CorpusOps.hashBucket(col("doc_id"), 1000000).as("h"))).head("h")
      assert(hv.asInstanceOf[Long] < stats(src)("ppm").asInstanceOf[Long])
    }
  }

  test("batchPadding: homogeneous buckets, full partition, exact waste") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = rowsOf(CorpusOps.batchPadding(real,
      batchSize = 8, streams = 4, bucketTokens = 16, maxBucket = 8))
    def l(r: Map[String, Any], c: String) = r(c).asInstanceOf[Long]
    // every document lands in exactly one batch
    assert(rows.map(l(_, "n_docs")).sum == real.count())
    rows.foreach { r =>
      assert(l(r, "n_docs") <= 8, "batch over size")
      // bucket homogeneity: a batch in bucket b only holds docs whose
      // n_tokens div 16 == b (capped), so its max obeys the bucket edge
      val b = l(r, "len_bucket")
      assert(b >= 0 && b <= 8)
      if (b < 8) assert(l(r, "max_tokens") < (b + 1) * 16,
        s"bucket $b leaked a longer doc: ${l(r, "max_tokens")}")
      // padding is the pad-to-longest identity, never negative
      assert(l(r, "padding_tokens") ==
        l(r, "max_tokens") * l(r, "n_docs") - l(r, "batch_tokens"))
      assert(l(r, "padding_tokens") >= 0L)
    }
    // within each (bucket, stream): contiguous batch ids from 0, and
    // only the LAST batch may be short — the row_number construction
    rows.groupBy(r => (l(r, "len_bucket"), l(r, "stream"))).foreach {
      case (_, group) =>
        val ids = group.map(l(_, "batch_id")).sorted
        assert(ids == (0L until ids.length).toSeq, s"gaps in $ids")
        group.sortBy(l(_, "batch_id")).dropRight(1).foreach(r =>
          assert(l(r, "n_docs") == 8L, "short batch before the last"))
    }
    // length bucketing must beat one unbucketed stream on padding:
    // the whole point of the operator
    val unbucketed = rowsOf(CorpusOps.batchPadding(real,
      batchSize = 8, streams = 1, bucketTokens = 1000000, maxBucket = 0))
    assert(rows.map(l(_, "padding_tokens")).sum <
      unbucketed.map(l(_, "padding_tokens")).sum)
  }

  test("source distinct sketches: estimates and union bracket exact counts") {
    // s0: 2 distinct texts (one exact dup); s1: 2 distinct
    val d = docs(
      (1L, "alpha beta", "en", "s0"),
      (2L, "gamma delta", "en", "s0"),
      (3L, "alpha beta", "en", "s0"),   // dup of 1 within s0
      (4L, "epsilon zeta", "en", "s1"),
      (5L, "alpha beta", "en", "s1"))   // cross-source dup of 1
    val r = rowsOf(graft.operators.CorpusOps.sourceDistinctApprox(d))
    assert(r.map(_("source")) == Seq("__all__", "s0", "s1"))
    val bySrc = r.map(m => m("source") -> m).toMap
    // tiny cardinalities: HLL is exact at this size
    def est(s: String) = bySrc(s)("distinct_approx").asInstanceOf[Long]
    assert(est("s0") == 2L && bySrc("s0")("n_docs") == 3L)
    assert(est("s1") == 2L && bySrc("s1")("n_docs") == 2L)
    // the union row merges SKETCHES: global distinct is 3 (the
    // cross-source dup collapses), not the per-source sum 4
    assert(est("__all__") == 3L)
    assert(bySrc("__all__")("n_docs") == 5L)
  }

  test("source distinct sketches: union equals sketching the corpus directly") {
    val d = docs((1L to 40L).map(i =>
      (i, s"text number ${i % 17}", "en", s"s${i % 3}")): _*)
    val r = rowsOf(graft.operators.CorpusOps.sourceDistinctApprox(d))
    val union = r.find(_("source") == "__all__").get("distinct_approx")
      .asInstanceOf[Long]
    // direct single-sketch estimate over the same fingerprints — the
    // union of per-source register maxes must equal sketching the
    // whole corpus in one aggregate (max is associative)
    val direct = rowsOf(d.select(graft.functions.TextFunctions
        .fingerprintMd5(org.apache.spark.sql.functions.col("text")).as("fp"))
      .agg(graft.functions.HllSketch.hllDistinct(
        graft.functions.HllSketch.hllSketch(
          org.apache.spark.sql.functions.col("fp"))).as("e")))
      .head("e").asInstanceOf[Long]
    assert(union == 17L && direct == 17L,
      s"union=$union direct=$direct")
  }

  test("distinct dashboard on an EMPTY corpus: one __all__ row of zeros") {
    // oracle parity on the degenerate input: the LEFT JOIN + COALESCE
    // mirror of the operator's coalesced sum + zero-sketch estimate
    val r = rowsOf(graft.operators.CorpusOps.sourceDistinctApprox(docs()))
      .map(m => (m("source"), m("n_docs"), m("distinct_approx")))
    assert(r == Seq(("__all__", 0L, 0L)))
  }

  test("distinct dashboard off persisted sketches equals the inline recompute") {
    val d = docs((1L to 60L).map(i =>
      (i, s"body ${i % 23} of source", "en", s"s${i % 4}")): _*)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-distsk-spec").toString
    try {
      graft.operators.CorpusOps.writeDistinctSketches(d, dir)
      val fromDisk = rowsOf(graft.operators.CorpusOps
        .sourceDistinctFromSketches(
          graft.operators.CorpusOps.readDistinctSketches(spark, dir)))
      val inline = rowsOf(graft.operators.CorpusOps.sourceDistinctApprox(d))
      // not just close — IDENTICAL: registers are deterministic, so
      // persist→read→derive must reproduce the inline rows exactly
      assert(fromDisk == inline)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("corpusHealth equals exact aggregates of its component audits") {
    val d = docs(
      (0L, "alpha beta gamma delta epsilon zeta", "en", "s0"),
      (2L, "prefix alpha beta gamma delta epsilon zeta suffix", "en", "s0"),
      (3L, "the cat and the dog is in that house for a while", "en", "s1"),
      (4L, "the cat and the dog is in that house for a while", "en", "s1"),
      (5L, "der hund und die katze ist nicht zu haus", "de", "s1"))
    val r = rowsOf(graft.operators.CorpusOps.corpusHealth(
      d, evalMaxId = 2L)).head
    assert(r("n_docs") == 5L)
    // docs 3 and 4 share a fingerprint: 4 distinct, 1 exact dup
    assert(r("n_distinct_fp") == 4L && r("n_exact_dup_docs") == 1L)
    // component parity: the report's counts equal aggregating the
    // individually oracle-checked component operators
    val langs = rowsOf(graft.operators.TextAnalysis.langIdFrame(
      d.select(col("doc_id"), col("text"))))
    assert(r("n_lang") == langs.count(_("lang_pred") == "en").toLong)
    val quals = rowsOf(graft.operators.TextAnalysis.quality(
      d.select(col("doc_id"), col("text"))))
    assert(r("n_quality_pass") == quals.count(
      _("quality").asInstanceOf[Double] >= 0.65).toLong)
    val cont = rowsOf(graft.operators.CorpusOps.decontaminateById(
      d, evalMaxId = 2L)).map(_("train_doc")).distinct
    assert(cont == Seq(2L) && r("n_contaminated") == 1L)
    assert(r("n_leaky_clusters") == rowsOf(
      graft.operators.CorpusOps.splitLeakage(d)).size.toLong)
  }

  test("paddingSweep: finer buckets reduce padding while in range") {
    // lengths stay below maxBucket*min(bucketSizes) = 32 so no config
    // overflows into the mixed-length cap bucket — the regime where
    // the monotone claim holds (out of range, the overflow bucket
    // makes the sweep non-monotone: that is WHY the sweep exists, and
    // the sf0.01 oracle run covers that case)
    val d = docs((1L to 40L).map(i =>
      (i, ("tok " * (i % 28 + 1).toInt).trim, "en", "s0")): _*)
    val r = rowsOf(graft.operators.CorpusOps.paddingSweep(
      d.select(col("doc_id"), col("text")),
      bucketSizes = Seq(64, 4, 16)))
    // sorted, deduped output regardless of argument order
    assert(r.map(_("bucket_tokens")) == Seq(4, 16, 64))
    // identical corpus accounting under every config
    assert(r.map(_("n_docs")).distinct == Seq(40L))
    assert(r.map(_("real_tokens")).distinct.size == 1)
    // the monotone claim: finer length buckets never pad more
    val pads = r.map(_("padding_tokens").asInstanceOf[Long])
    assert(pads == pads.sorted, s"padding not monotone: $pads")
    assert(pads.head < pads.last, s"sweep shows no spread: $pads")
    r.foreach { m =>
      val ppm = m("pad_ppm").asInstanceOf[Long]
      val pad = m("padding_tokens").asInstanceOf[Long]
      val real = m("real_tokens").asInstanceOf[Long]
      assert(ppm == pad * 1000000L / (real + pad))
    }
  }
}
