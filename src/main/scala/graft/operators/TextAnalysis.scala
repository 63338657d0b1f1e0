package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis queries over the `documents` table: token counting,
  * language ID, quality scoring, fingerprinting. All pure codegen'd
  * column expressions (see [[graft.functions.TextFunctions]]) — a
  * narrow projection per document, no shuffle at all, which is the
  * shape that scales: at 100 TB these run at parquet-scan speed with
  * column pruning down to (doc_id, text).
  */
object TextAnalysis {

  def stats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
      punctCount(col("text")).cast("long").as("n_punct"),
      length(normText(col("text"))).cast("long").as("n_chars_norm"))
      .orderBy(col("doc_id"))

  def langIdFrame(docs: DataFrame): DataFrame =
    // materialize the fused 5-list hit array once; the per-language
    // columns and the argmax are then cheap element_at projections
    docs.select(col("doc_id"), langHits(col("text")).as("hits"))
      .select(col("doc_id") +:
        Langs.zipWithIndex.map { case (l, i) =>
          element_at(col("hits"), i + 1).cast("long").as(s"${l}_hits") } :+
        langIdFromHits(col("hits")).as("lang_pred"): _*)
      .orderBy(col("doc_id"))

  /** Language-ID confidence — the gate that separates "predicted en"
    * from "confidently en": the top and runner-up stopword hit counts
    * and their margin, all integers (a likelihood-ratio analogue
    * without a single float). A tie between two languages yields
    * margin 0 — exactly the "don't trust this label" signal; short
    * docs expose their small evidence base via `n_tokens`. Downstream
    * gates pick their own threshold (absolute margin or margin per
    * token) — the operator reports evidence, not policy. Same fused
    * one-pass [[graft.functions.TextFunctions.langHits]] scan as
    * langId; the ranked hits come from one `sort_array` (dup-safe:
    * tied maxima sort adjacent, so runner-up is well-defined with no
    * argmax-index bookkeeping).
    */
  def langConfidence(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langHits(col("text")).as("hits"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("sorted", sort_array(col("hits"), asc = false))
      .select(col("doc_id"),
        langIdFromHits(col("hits")).as("lang_pred"),
        element_at(col("sorted"), 1).cast("long").as("top_hits"),
        element_at(col("sorted"), 2).cast("long").as("second_hits"),
        (element_at(col("sorted"), 1) - element_at(col("sorted"), 2))
          .cast("long").as("margin"),
        col("n_tokens"))
      .orderBy(col("doc_id"))

  def quality(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      fingerprintMd5(col("text")).as("fp_md5"),
      rollingHash(col("text")).as("rolling_hash"))
      .orderBy(col("doc_id"))

  /** Repetition ratio — the classic within-document repetition quality
    * signal: 1 − distinct-shingles / total-shingles. 0 for fully
    * novel text, → 1 for text that loops the same phrases. Distinctness
    * is by shingle hash (the fused [[Dedup.shingleHashFrame]] output);
    * total shingle count derives from the token count.
    */
  def repetition(docs: DataFrame, shingleN: Int = 3): DataFrame =
    // normalize ONCE: the regex chain in normText is the expensive part,
    // and CollapseProject keeps this projection boundary because the
    // norm column is referenced twice below (non-cheap, multi-ref).
    docs.select(col("doc_id"), normText(col("text")).as("norm"))
      .select(col("doc_id"),
        size(split(col("norm"), " ")).as("n_tokens"),
        graft.functions.ArrayHashExprs.shingle_hashes(
          col("norm"), shingleN).as("xs"))
      .select(col("doc_id"),
        greatest(col("n_tokens") - (shingleN - 1), lit(1)).cast("long")
          .as("total_shingles"),
        size(col("xs")).cast("long").as("distinct_shingles"))
      .withColumn("dup_ratio",
        lit(1.0) - col("distinct_shingles").cast("double") / col("total_shingles"))
      .orderBy(col("doc_id"))

  /** Corpus vocabulary stats: per-token total occurrences and document
    * frequency, top `k` by (tf desc, token) — explode + two-level
    * aggregate, the canonical distributed word-count shape.
    */
  def vocabulary(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      // empty/whitespace-only docs tokenize to one "" token — a
      // phantom term that would displace a real one from the top-k
      // once empty docs outnumber the k-th term's tf (the family's
      // convention: tokenRarity/searchTopK/collocations all filter it)
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"),
        countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)

  /** The (doc_id, term, tf) posting aggregate shared by
    * [[tokenRarity]] and [[searchTopK]] — ONE definition of the
    * tokenize/explode/empty-filter/per-doc-tf shuffle both pay (two
    * hand-kept copies could silently diverge on the empty-term rule
    * or a reuse-anchor change). */
  private def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus-relative token-commonness score — the LM-lite quality
    * signal (the CCNet idea with a unigram model and EXACT
    * arithmetic): per document, how common its tokens are in the
    * corpus' own distribution. Boilerplate/spam scores HIGH
    * (`mean_ctf` near the head of the Zipf curve), gibberish and
    * OCR noise score LOW (`min_ctf` = 1 means a token occurs nowhere
    * else in the corpus). A true n-gram-LM perplexity would sum
    * `log p` — a libm call whose ulp drift breaks cross-engine
    * hash comparison — so the score is kept in the exact domain:
    * integer token counts, integer corpus-frequency sums, and ONE
    * terminal division (IEEE-correctly-rounded from identical
    * integers on every engine; the [[graft.operators.CorpusOps
    * .sourceMixture]] rule).
    *
    * Overflow bound: per-doc `sum_ctf = Σ tf·ctf` is bounded by
    * doc_tokens × corpus_tokens — 10⁵ × 10¹³ ≈ 10¹⁸ at the 100 TB
    * design point, inside 2⁶³ ≈ 9.2×10¹⁸ with ~9× headroom. A
    * 10 PB corpus or unchunked 10⁶-token documents would need the
    * decimal treatment; at that point revisit (the collocations lift
    * already crossed this line and multiplies in double).
    *
    * Plan shape: tokenize once; corpus term frequency is
    * RE-AGGREGATED from the per-doc tf aggregate (never a
    * term-partitioned window — Zipfian head terms made that a
    * one-task hot spot in docKeywords, same reasoning) and
    * equi-joined back with the tf exchange stage-reused via the
    * [[graft.functions.Barrier.reuseAnchor]] gate, so the corpus
    * tokenizes and shuffles ONCE. Head-term join skew is
    * AQE-splittable.
    */
  def tokenRarity(docs: DataFrame): DataFrame = {
    val tf = termFrequencies(docs)
    val ctf = tf.filter(graft.functions.Barrier.reuseAnchor(col("tf")))
      .groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    tf.join(ctf, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("tf") * col("ctf")).cast("long").as("sum_ctf"),
        min(col("ctf")).cast("long").as("min_ctf"))
      .withColumn("mean_ctf",
        col("sum_ctf").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("doc_id"))
  }

  /** Corpus vocabulary summary via MERGEABLE sketches — the 100 TB
    * scale companion to [[vocabulary]]'s exact top-k: HLL registers
    * for distinct terms and distinct documents, plus exact token
    * totals, in ONE pass with no `countDistinct` re-shuffle (exact
    * distinct counting rewrites into a two-phase aggregate whose
    * first phase keys on the VALUE — a full extra exchange of the
    * exploded token stream; an HLL register set is 4 KiB per
    * partition and merges associatively). The sketch is
    * [[graft.functions.HllSketch]] — graft's pinned HLL rather than
    * `approx_count_distinct` — identical scale shape, but the
    * registers are public fnv64 arithmetic, so the DuckDB oracle
    * replays both estimates hash-exactly (~1.6% standard error at
    * m = 4096; `TextAnalysisSpec` still brackets against the exact
    * counts). `doc_id` hashes its canonical decimal-string form so
    * the oracle folds the same bytes.
    */
  def vocabularySummaryApprox(docs: DataFrame): DataFrame = {
    import graft.functions.HllSketch.{hash64, hllDistinct, hllSketchOfHash}
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "") // the vocabulary phantom-term rule
      // both hashes in the codegen'd post-explode projection
      .select(hash64(col("token")).as("th"),
        hash64(col("doc_id").cast("string")).as("dh"))
      .agg(
        hllDistinct(hllSketchOfHash(col("th"))).as("distinct_terms_approx"),
        hllDistinct(hllSketchOfHash(col("dh"))).as("distinct_docs_approx"),
        count(lit(1)).as("total_tokens"))
  }

  /** Document length histogram: n_chars bucketed by `bucket`. */
  def lengthHistogram(docs: DataFrame, bucket: Int = 50): DataFrame =
    docs.select((floor(length(col("text")) / bucket) * bucket)
        .cast("long").as("len_bucket"))
      .groupBy(col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("len_bucket"))

  /** Keyword retrieval over an inverted posting list — tf×rarity
    * scored top-k per query, the classic sparse-retrieval shape (the
    * exact-arithmetic cousin of BM25: the idf factor is kept LINEAR,
    * `w(t) = N − df(t)`, because `log` is a libm call whose ulp drift
    * breaks cross-engine hash comparison — the docKeywords rule — and
    * the score is a pure BIGINT dot product `Σ tf·w`, no float until
    * nothing).
    *
    * The queries are self-derived so the operator is closed over the
    * corpus: the `nTerms` terms ranked `skipTop+1 … skipTop+nTerms` by
    * (corpus tf desc, term) — skipping the Zipf head keeps the probe
    * terms mid-frequency, i.e. actually selective — grouped
    * `termsPerQuery` at a time into multi-term queries.
    *
    * Plan shape for 100 TB: the corpus tokenizes and aggregates into
    * postings ONCE (the same (doc_id, term) shuffle vocabulary/
    * tokenRarity pay); the query-term table is limit-bounded and
    * BROADCAST, so candidate generation is a map-side hash-join that
    * prunes the posting stream to rows matching a query term BEFORE
    * the per-(query, doc) aggregate. The rank window partitions by
    * query_id over candidates only — bounded by the probed terms'
    * document frequency, which is the retrieval cost model working as
    * intended (df-bounded, not corpus-bounded; probing a Zipf-head
    * stopword would degrade it to a corpus scan, which is exactly why
    * `skipTop` exists).
    */
  def searchTopK(docs: DataFrame, nTerms: Int = 6, termsPerQuery: Int = 2,
      skipTop: Int = 20, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = termFrequencies(docs)
    val vocab = tf.groupBy(col("term"))
      .agg(sum(col("tf")).as("ctf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("ctf").desc, col("term")).limit(skipTop + nTerms)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val qterms = vocab
      .withColumn("rn",
        row_number().over(Window.orderBy(col("ctf").desc, col("term"))))
      .filter(col("rn") > skipTop)
      .crossJoin(broadcast(nDocs))
      .select(
        expr(s"CAST((rn - 1 - $skipTop) div $termsPerQuery AS BIGINT)")
          .as("query_id"),
        col("term"), (col("n_docs") - col("df")).as("w"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qterms), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("tf") * col("w")).as("score"),
        count(lit(1)).as("n_hit_terms"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"),
        col("n_hit_terms"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Collocation mining — top-k adjacent-token pairs by lift (the
    * PMI idea with the log dropped: `lift = P(w1,w2) / (P(w1)·P(w2))`
    * over the BIGRAM distribution, ranked directly since log is
    * monotone — and a libm log would break the cross-engine hash;
    * the keywords/tokenRarity rule). "new york" scores high,
    * "of the" scores ~1.
    *
    * One corpus scan, one shuffle: bigrams explode from a guarded
    * `transform` projection (no self-join, no per-doc window) into
    * the (w1, w2) count aggregate; the marginals and the total are
    * RE-AGGREGATED from that pair table (tiny, vocab²-bounded — the
    * tokenRarity shape, reuse-anchored so all four consumers share
    * the ONE pair exchange at runtime) rather than re-tokenizing the
    * corpus for unigram counts. `minCount` prunes the noise tail
    * before the joins; the k-cut is a TakeOrderedAndProject. The
    * lift multiplies IN DOUBLE: a BIGINT product n_pair·n_total
    * silently wraps at the design point (a 100 TB corpus holds ~10¹³
    * bigrams; a Zipf-head pair count times that total is ~10²³ ≫
    * 2⁶³ — and DuckDB would promote to HUGEINT where Spark wraps, so
    * the engines would diverge exactly when it matters). Double
    * multiplication is correctly rounded from identical integers on
    * both engines — still hash-exact, and EXACT below 2⁵³ (every
    * fixture), while degrading to ~1 ulp instead of garbage at
    * corpus scale.
    */
  def collocations(docs: DataFrame, minCount: Int = 3, k: Int = 50): DataFrame = {
    val pairs = docs
      .select(tokens(col("text")).as("toks"))
      .select(explode(expr(
        """CASE WHEN size(toks) >= 2
          |THEN transform(sequence(1, size(toks) - 1),
          |       i -> named_struct('w1', toks[i-1], 'w2', toks[i]))
          |ELSE array() END""".stripMargin)).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
    val anchored = pairs.filter(graft.functions.Barrier.reuseAnchor(col("n_pair")))
    val left = anchored.groupBy(col("w1")).agg(sum(col("n_pair")).as("n_left"))
    val right = anchored.groupBy(col("w2")).agg(sum(col("n_pair")).as("n_right"))
    val total = anchored.agg(sum(col("n_pair")).as("n_total"))
    pairs.filter(col("n_pair") >= minCount)
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("lift",
        (col("n_pair").cast("double") * col("n_total").cast("double")) /
          (col("n_left").cast("double") * col("n_right").cast("double")))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("n_pair"), col("n_left"),
        col("n_right"), col("lift"))
  }

  def simhashFrame(docs: DataFrame): DataFrame =
    Dedup.shingleHashFrame(docs)
      .select(col("doc_id"), Dedup.simhashFromHashes(col("xs")).as("simhash"))
      .orderBy(col("doc_id"))
}
