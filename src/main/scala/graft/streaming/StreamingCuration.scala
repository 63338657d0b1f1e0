package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.CorpusOps

/** Streaming corpus curation: the per-document scrub-and-gate stage a
  * continuous ingest pipeline runs before documents ever land in the
  * corpus store — language gate, quality gate, PII redaction, split
  * assignment, content fingerprint.
  *
  * Everything here is a STATELESS projection/filter (the same Column
  * definitions the batch operators use — `TextFunctions.langId`/
  * `qualityScore`/`redactPii`, `CorpusOps.splitName`), so it composes
  * with any streaming source/sink, needs no watermark, keeps no state,
  * and is trivially scale-parallel: each micro-batch partition scrubs
  * independently. Chain [[StreamingDedup]] after it for stateful
  * first-seen dedup of the survivors (cheaper in that order — dedup
  * state only holds docs that passed the gates).
  *
  * Batch parity is BY CONSTRUCTION: the same expressions run in both
  * modes, pinned by the spec's batch-vs-stream comparison.
  */
object StreamingCuration {

  /** Gate + scrub: keep `lang`-identified documents at or above
    * `minQuality`, emit (doc_id, split, redacted text, fingerprint).
    * The langHits array is materialized first so the fused stopword
    * pass runs once, not per CaseWhen branch (the same CSE boundary
    * the batch corpus filter documents).
    */
  def curated(docs: DataFrame, lang: String = "en",
      minQuality: Double = 0.65): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        TextFunctions.langHits(col("text")).as("hits"))
      .select(col("doc_id"), col("text"),
        TextFunctions.qualityScoreFromHits(col("text"), col("hits"))
          .as("quality"),
        TextFunctions.langIdFromHits(col("hits")).as("lang"),
        // anchored pushdown barrier (functions.Barrier): the gate must
        // lead with a non-deterministic conjunct or the quality/langid
        // chains inline into the Filter condition and run twice per
        // document — legal in streaming projections, and per-batch
        // seeding is fine for a vacuously-true guard
        graft.functions.Barrier.column)
      .filter(graft.functions.Barrier.anchored(
        col("quality") >= minQuality && col("lang") === lang))
      .select(col("doc_id"),
        CorpusOps.splitName(col("doc_id")).as("split"),
        TextFunctions.redactPii(col("text")).as("text"))
      // fingerprint the EMITTED (redacted) text, in a second select:
      // an alias is not visible to its select-list siblings, so a
      // single select would fingerprint the pre-redaction input —
      // internally inconsistent with the text column beside it, and
      // mismatching every downstream recomputation (dedup indexes and
      // snapshot diffs fingerprint the STORED text). The boundary also
      // keeps redactPii evaluated once (non-cheap, referenced twice —
      // CollapseProject preserves it).
      .select(col("doc_id"), col("split"), col("text"),
        TextFunctions.fingerprintMd5(col("text")).as("fingerprint"))

  /** Temperature-sampling admission gate — the streaming face of
    * [[CorpusOps.mixtureSample]]: a stream-static left join against a
    * rate table ([[CorpusOps.mixtureRates]], computed from the
    * at-rest corpus and re-read per micro-batch like any static dim)
    * plus the SAME deterministic FNV membership rule the batch
    * sampler uses — so a doc admitted here is exactly the doc the
    * batch sampler would keep under those rates. Stateless: no
    * watermark, no state, per-batch broadcast of the tiny rate table
    * (unhinted — AQE sizes it; the broadcast policy note on
    * [[StreamingJoins.enriched]] applies).
    *
    * A source ABSENT from the rate table passes at rate 1 (ppm
    * defaults to 1e6): a brand-new domain was by definition too small
    * to appear in yesterday's totals, and the mixture rule keeps the
    * smallest sources whole — dropping unknown sources would starve
    * every new domain out of the corpus forever.
    *
    * The join is NULL-SAFE on source, like the batch sampler's: a
    * null-source (unattributed) doc matches the rate table's
    * null-source row when yesterday's corpus had one — under a plain
    * equi left join it would always null-pad and pass at rate 1,
    * silently diverging from the batch sampler this gate promises to
    * mirror. Only a source genuinely absent from the table (null or
    * not) takes the rate-1 default.
    */
  def mixtureGate(stream: DataFrame, rates: DataFrame): DataFrame =
    // BOTH rate columns are renamed before the join: a stream that
    // already carries a ppm column (rated once upstream) would
    // otherwise make col("ppm") ambiguous and fail at analysis
    stream
      .join(rates.select(col("source").as("r_source"),
          col("ppm").as("r_ppm")),
        col("source") <=> col("r_source"), "left_outer")
      .filter(CorpusOps.mixtureKeep(col("doc_id"),
        coalesce(col("r_ppm"), lit(1000000L))))
      .drop("r_ppm", "r_source")

  /** Streaming decontamination gate — the ingest face of
    * [[CorpusOps.decontaminateBloom]]: each arriving document's
    * shingle hashes probe the PERSISTED eval-set Bloom sketch
    * ([[CorpusOps.evalShingleBloom]], computed batch-side once); a
    * doc with `minShared` or more possible eval shingles is marked
    * `quarantined`. Stateless narrow projection — no state store, no
    * watermark, the sketch rides as a literal in the plan.
    *
    * The contract is CONSERVATIVE, and deliberately so: Bloom filters
    * have no false negatives, so every document the exact batch
    * decontaminator would flag is quarantined here — contamination
    * cannot leak through the stream path. The fpp sliver of clean
    * docs quarantined alongside is re-admitted by the exact batch
    * pass downstream (the quarantine is a holding pen, not a drop).
    * Spec-pinned as a superset relation against the batch flags.
    */
  def decontaminationGate(docs: DataFrame, bloomBytes: Array[Byte],
      shingleN: Int = 5, minShared: Int = 1): DataFrame = {
    if (bloomBytes == null)
      return docs.withColumn("n_possible_hits", lit(0L))
        .withColumn("quarantined", lit(false))
    // fused codegen'd probe-count: the previous
    // size(filter(xs, g => mightContain(...))) shape evaluated its
    // lambda INTERPRETED per shingle per document every micro-batch
    // (ArrayFilter is CodegenFallback) — the exact tax the hygiene
    // gates were rewritten to remove; bloom_hits keeps the identical
    // count (null elements are misses) inside whole-stage codegen,
    // deserializing the sketch once per task instead of never leaving
    // the interpreted path
    docs
      .withColumn("xs", graft.functions.ArrayHashExprs.shingle_hashes(
        TextFunctions.normText(col("text")), shingleN))
      .withColumn("n_possible_hits",
        graft.functions.ArrayHashExprs.bloom_hits(col("xs"), bloomBytes))
      .drop("xs")
      .withColumn("quarantined", col("n_possible_hits") >= minShared)
  }
}
