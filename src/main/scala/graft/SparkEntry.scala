package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AliveKeys, CorpusOps, Dedup, EventAnalytics, Similarity, TextAnalysis, TopicMetrics}
import graft.sources.EventsAsRecords

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY §2 surfaces here as a named
  * query over the driver's parquet tables, with a DuckDB oracle in
  * [[oracleSql]] where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  private def records(s: SparkSession, dir: String): DataFrame =
    EventsAsRecords.records(s, dir)

  /** One warehouse-table read — every relational query loads tables
    * through here. */
  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TopicMetrics.report(records(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.C + §2.E + §2.G1: the 15-column per-partition report
    "q_partition_stats" -> ((s, dir) => TopicMetrics.report(records(s, dir))),
    // §2.D: global topic summary re-reduced from per-partition partials
    "q_topic_summary" -> ((s, dir) =>
      TopicMetrics.summaryFrame(TopicMetrics.partitionStats(records(s, dir)))),
    // §2.A2: watermark/offset discovery
    "q_offsets" -> ((s, dir) => TopicMetrics.offsets(records(s, dir))),
    // §4.3(c): per-partition + grand-total in one grouping-sets pass
    "q_rollup_stats" -> ((s, dir) => TopicMetrics.rollupStats(records(s, dir))),
    // offset-gap audit over a deterministically gapped log (every 17th
    // offset dropped — the fixture's offsets are dense by construction,
    // so gaps must be synthesized for the query to demonstrate anything)
    "q_offset_gaps" -> ((s, dir) =>
      TopicMetrics.offsetGaps(records(s, dir).filter(col("offset") % 17 =!= 0))),
    // event-time throughput buckets per partition
    "q_partition_throughput" -> ((s, dir) =>
      TopicMetrics.partitionThroughput(records(s, dir))),
    // exact distinct-key cardinality per partition
    "q_key_cardinality" -> ((s, dir) =>
      TopicMetrics.keyCardinality(records(s, dir))),
    // scale twin: pinned-HLL distinct keys (4 KiB per partition per
    // task crosses the wire, never the keyed record stream) —
    // hash-exact: the oracle replays the registers
    "q_key_cardinality_approx" -> ((s, dir) =>
      TopicMetrics.keyCardinalityApprox(records(s, dir))),
    // producer-skew diagnosis: top-k hottest keys with tombstone share
    // and partition spread (one agg + TakeOrderedAndProject)
    "q_hot_keys" -> ((s, dir) => TopicMetrics.hotKeys(records(s, dir))),
    // §2.F2: exact last-write-wins alive-key count
    "q_alive_keys" -> ((s, dir) => AliveKeys.exactFrame(records(s, dir))),
    // per-partition post-compaction footprint (bytes a compacted log
    // retains) — the priced-in-bytes companion to the dirty ratio
    "q_compaction_estimate" -> ((s, dir) =>
      AliveKeys.compactionEstimate(records(s, dir))),
    // §2.F1 fidelity: alive keys bucketed by the reference's FNV-variant
    "q_alive_keys_fnv32" -> ((s, dir) =>
      AliveKeys.approxFnv32Frame(records(s, dir))),
    // event-time analytics (streaming-ready windowed aggregations)
    "q_event_windows" -> ((s, dir) =>
      EventAnalytics.dailyWindows(EventsAsRecords.readEvents(s, dir))),
    "q_event_type_stats" -> ((s, dir) =>
      EventAnalytics.typeStats(EventsAsRecords.readEvents(s, dir))),
    "q_sessions" -> ((s, dir) =>
      EventAnalytics.sessionize(EventsAsRecords.readEvents(s, dir))),
    "q_user_top_type" -> ((s, dir) =>
      EventAnalytics.topEventTypePerUser(EventsAsRecords.readEvents(s, dir))),
    // Markov transition matrix over per-user event sequences: exact
    // integer counts + one terminal division per (from, to) cell
    "q_event_transitions" -> ((s, dir) =>
      EventAnalytics.typeTransitions(EventsAsRecords.readEvents(s, dir))),
    "q_value_percentiles" -> ((s, dir) =>
      EventAnalytics.valuePercentiles(EventsAsRecords.readEvents(s, dir))),
    // scale variant: deterministic fixed-width-histogram percentiles
    // (no per-type global sort; bins×types state regardless of input
    // size) — pinned IEEE arithmetic, so hash-exact vs the oracle.
    // Caller-supplied domain [0, 1024) = the SINGLE-SCAN mode (the
    // adaptive two-scan path remains the default for unknown domains);
    // out-of-domain values clamp into the end bins, so the hash
    // contract holds for any data. The percentile_approx sketch
    // remains the STREAMING twin's path (StreamingPercentiles),
    // bracketed by its spec.
    "q_value_percentiles_approx" -> ((s, dir) =>
      EventAnalytics.valuePercentilesHistogram(
        EventsAsRecords.readEvents(s, dir),
        domain = Some((0.0, 1024.0)))),
    // the ADAPTIVE two-scan mode (exact min/max pre-scan, no
    // caller-supplied domain) registered in its own right: it is what
    // a production caller with an unknown domain gets, and since the
    // single-scan domain mode took over q_value_percentiles_approx
    // (r15) it would otherwise be spec-pinned but never oracle-checked
    // against real data by the driver
    "q_value_percentiles_adaptive" -> ((s, dir) =>
      EventAnalytics.valuePercentilesHistogram(
        EventsAsRecords.readEvents(s, dir), domain = None)),
    // EXACT scale variant: distributed radix select over the IEEE bit
    // key — same values as q_value_percentiles (shared oracle), no
    // per-type global sort; windowMaxRows=256 forces real refinement
    // levels even at verify scale so the gate exercises the descent
    "q_value_percentiles_dist" -> ((s, dir) =>
      EventAnalytics.valuePercentilesDistributed(
        EventsAsRecords.readEvents(s, dir), windowMaxRows = 256L)),
    // anomaly surface: integer-exact trailing-window spike flags
    "q_daily_spikes" -> ((s, dir) =>
      EventAnalytics.dailySpikes(EventsAsRecords.readEvents(s, dir))),
    // analytic-function surface: lag gaps, rolling frames, rank/ntile
    "q_event_gaps" -> ((s, dir) =>
      EventAnalytics.interEventGaps(EventsAsRecords.readEvents(s, dir))),
    "q_rolling_value" -> ((s, dir) =>
      EventAnalytics.rollingValue(EventsAsRecords.readEvents(s, dir))),
    "q_spend_deciles" -> ((s, dir) =>
      EventAnalytics.userSpendDeciles(EventsAsRecords.readEvents(s, dir))),
    // EXACT scale variant: histogram-prefix global rank + per-bin
    // windows instead of the one-reducer ntile (shared oracle)
    "q_spend_deciles_dist" -> ((s, dir) =>
      EventAnalytics.userSpendDecilesDistributed(
        EventsAsRecords.readEvents(s, dir))),
    // as-of join (union-merge formulation) + set operations
    "q_asof_join" -> ((s, dir) =>
      EventAnalytics.asOfLastPrior(EventsAsRecords.readEvents(s, dir))),
    "q_audience_set_ops" -> ((s, dir) =>
      EventAnalytics.audienceSetOps(EventsAsRecords.readEvents(s, dir))),
    // semi-structured JSON extraction with an explicit schema
    "q_props_stats" -> ((s, dir) =>
      EventAnalytics.propsStats(EventsAsRecords.readEvents(s, dir))),
    // pivot (explicit value list) and its lossless long-form melt
    "q_event_pivot" -> ((s, dir) =>
      EventAnalytics.eventTypePivot(EventsAsRecords.readEvents(s, dir))),
    "q_event_unpivot" -> ((s, dir) =>
      EventAnalytics.eventTypeLong(EventsAsRecords.readEvents(s, dir))),
    // explicit skew salting (result == plain join; oracle is unsalted)
    "q_salted_enrich" -> ((s, dir) =>
      graft.operators.Skew.saltedUserEnrichment(
        EventsAsRecords.readEvents(s, dir))),
    // gaps-and-islands incidents + banded range join over the intervals
    "q_incident_range_join" -> ((s, dir) => {
      val ev = EventsAsRecords.readEvents(s, dir)
      EventAnalytics.incidentEvents(ev, EventAnalytics.errorIncidents(ev))
    }),
    // relational side: classic TPC-H shapes over the warehouse tables
    "q_tpch_q1" -> ((s, dir) =>
      graft.operators.Relational.pricingSummary(
        tbl(s, dir, "lineitem"))),
    "q_tpch_q3" -> ((s, dir) =>
      graft.operators.Relational.shippingPriority(
        tbl(s, dir, "customer"),
        tbl(s, dir, "orders"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q5" -> ((s, dir) =>
      graft.operators.Relational.localSupplierRevenue(
        tbl(s, dir, "region"),
        tbl(s, dir, "nation"),
        tbl(s, dir, "supplier"),
        tbl(s, dir, "customer"),
        tbl(s, dir, "orders"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q14" -> ((s, dir) =>
      graft.operators.Relational.promoRevenue(
        tbl(s, dir, "lineitem"),
        tbl(s, dir, "part"))),
    "q_tpch_q6" -> ((s, dir) =>
      graft.operators.Relational.forecastRevenue(
        tbl(s, dir, "lineitem"))),
    "q_tpch_q10" -> ((s, dir) =>
      graft.operators.Relational.returnedItemRevenue(
        tbl(s, dir, "customer"),
        tbl(s, dir, "orders"),
        tbl(s, dir, "lineitem"),
        tbl(s, dir, "nation"))),
    "q_tpch_q18" -> ((s, dir) =>
      graft.operators.Relational.largeOrders(
        tbl(s, dir, "customer"),
        tbl(s, dir, "orders"),
        tbl(s, dir, "lineitem"))),
    // join-surface breadth: left-semi (Q4-style) and left-anti
    // (Q22-style) over the warehouse tables
    "q_tpch_q4" -> ((s, dir) =>
      graft.operators.Relational.orderPriorityCheck(
        tbl(s, dir, "orders"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q22" -> ((s, dir) =>
      graft.operators.Relational.inactiveHighBalanceCustomers(
        tbl(s, dir, "customer"),
        tbl(s, dir, "orders"))),
    // DecisionSupport: the remaining TPC-H shapes (see that object's
    // scaladoc for the partsupp-free adaptations) — suite complete
    "q_tpch_q2" -> ((s, dir) =>
      graft.operators.DecisionSupport.minCostSupplier(
        tbl(s, dir, "region"),
        tbl(s, dir, "nation"),
        tbl(s, dir, "supplier"),
        tbl(s, dir, "part"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q7" -> ((s, dir) =>
      graft.operators.DecisionSupport.volumeShipping(
        tbl(s, dir, "nation"),
        tbl(s, dir, "supplier"),
        tbl(s, dir, "customer"),
        tbl(s, dir, "orders"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q8" -> ((s, dir) =>
      graft.operators.DecisionSupport.marketShare(
        tbl(s, dir, "region"),
        tbl(s, dir, "nation"),
        tbl(s, dir, "supplier"),
        tbl(s, dir, "customer"),
        tbl(s, dir, "orders"),
        tbl(s, dir, "lineitem"),
        tbl(s, dir, "part"))),
    "q_tpch_q9" -> ((s, dir) =>
      graft.operators.DecisionSupport.productProfit(
        tbl(s, dir, "nation"),
        tbl(s, dir, "supplier"),
        tbl(s, dir, "part"),
        tbl(s, dir, "orders"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q11" -> ((s, dir) =>
      graft.operators.DecisionSupport.importantParts(
        tbl(s, dir, "lineitem"))),
    "q_tpch_q12" -> ((s, dir) =>
      graft.operators.DecisionSupport.lateShipmentPriority(
        tbl(s, dir, "orders"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q13" -> ((s, dir) =>
      graft.operators.DecisionSupport.customerDistribution(
        tbl(s, dir, "customer"),
        tbl(s, dir, "orders"))),
    "q_tpch_q15" -> ((s, dir) =>
      graft.operators.DecisionSupport.topSupplier(
        tbl(s, dir, "supplier"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q16" -> ((s, dir) =>
      graft.operators.DecisionSupport.partSupplierCounts(
        tbl(s, dir, "supplier"),
        tbl(s, dir, "part"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q17" -> ((s, dir) =>
      graft.operators.DecisionSupport.smallQuantityRevenue(
        tbl(s, dir, "part"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q19" -> ((s, dir) =>
      graft.operators.DecisionSupport.discountedRevenue(
        tbl(s, dir, "part"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q20" -> ((s, dir) =>
      graft.operators.DecisionSupport.dominantSuppliers(
        tbl(s, dir, "nation"),
        tbl(s, dir, "supplier"),
        tbl(s, dir, "part"),
        tbl(s, dir, "lineitem"))),
    "q_tpch_q21" -> ((s, dir) =>
      graft.operators.DecisionSupport.waitingSuppliers(
        tbl(s, dir, "supplier"),
        tbl(s, dir, "orders"),
        tbl(s, dir, "lineitem"))),
    "q_repetition" -> ((s, dir) => TextAnalysis.repetition(docs(s, dir))),
    "q_vocabulary" -> ((s, dir) => TextAnalysis.vocabulary(docs(s, dir))),
    // LM-lite quality signal: corpus-relative token commonness in
    // exact integer arithmetic (one terminal division)
    "q_token_rarity" -> ((s, dir) => TextAnalysis.tokenRarity(docs(s, dir))),
    // scale variant: HLL distinct counts (mergeable sketch, no
    // countDistinct re-shuffle) via graft's PINNED HLL (fnv64 +
    // max-merged registers + exact-integer estimate sum) — order-free,
    // so hash-exact vs the oracle; TextAnalysisSpec still brackets
    // the estimates against the exact counts.
    "q_vocab_summary_approx" -> ((s, dir) =>
      TextAnalysis.vocabularySummaryApprox(docs(s, dir))),
    "q_length_hist" -> ((s, dir) => TextAnalysis.lengthHistogram(docs(s, dir))),
    "q_text_clean" -> ((s, dir) =>
      transformDigest(docs(s, dir),
        graft.functions.TextFunctions.cleanText(col("text")), "clean")),
    // LLM-pipeline: text analysis over `documents`
    "q_text_stats" -> ((s, dir) => TextAnalysis.stats(docs(s, dir))),
    "q_lang_id" -> ((s, dir) => TextAnalysis.langIdFrame(docs(s, dir))),
    // language-ID confidence: top/runner-up hits + margin, integers only
    "q_lang_confidence" -> ((s, dir) =>
      TextAnalysis.langConfidence(docs(s, dir))),
    "q_quality" -> ((s, dir) => TextAnalysis.quality(docs(s, dir))),
    "q_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(docs(s, dir))),
    // sparse retrieval: tf×(N−df) scored top-k over broadcast
    // mid-frequency query terms (posting list pruned BEFORE the agg)
    "q_text_search" -> ((s, dir) => TextAnalysis.searchTopK(docs(s, dir))),
    // collocation mining: top-k adjacent pairs by exact-integer lift,
    // marginals re-aggregated from the ONE bigram exchange
    "q_collocations" -> ((s, dir) => TextAnalysis.collocations(docs(s, dir))),
    // distributed BPE tokenizer training on the distinct-word table
    // (one corpus shuffle, then vocab-sized argmax rounds).
    // Hash-exact: the constant-round loop UNROLLS into chained argmax
    // CTEs in the oracle (a recursive CTE could not express it);
    // BpeSpec additionally pins parity with an independent
    // single-machine reference trainer.
    "q_bpe_merges" -> ((s, dir) => graft.operators.Bpe.mergesFrame(docs(s, dir))),
    // tokenizer APPLY: per-doc piece counts under the PINNED shipped
    // merge table (Bpe.PinnedMerges) — segmentation folds once per
    // DISTINCT word (vocab-sized), the corpus only joins integer
    // counts. No training in the plan (train-time cost is
    // q_bpe_merges), and a hash-exact replace-chain oracle; BpeSpec
    // additionally pins reference-encoder parity + invariants.
    "q_bpe_encode" -> ((s, dir) =>
      graft.operators.Bpe.encodePinnedQuery(docs(s, dir))),
    // tokenizer-fit: per-source compression of the shipped merge
    // table (pieces per million chars, exact integers) — the
    // fertility check before committing a tokenizer to a mixture
    "q_tokenizer_fit" -> ((s, dir) =>
      graft.operators.Bpe.tokenizerFit(docs(s, dir))),
    // effective tokens: per-source raw vs cluster-canonical-only
    // token totals off the persisted label table — the dedup-aware
    // correction input for mixture weights computed from raw counts
    "q_effective_tokens" -> ((s, dir) =>
      CorpusOps.effectiveTokens(docs(s, dir),
        Dedup.readDedupLabels(s, labelsDir(s, dir)))),
    // LLM-pipeline: dedup family
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir)).orderBy(col("canonical_doc_id"))),
    "q_dedup_minhash" -> ((s, dir) => Dedup.minhashPairs(docs(s, dir))),
    "q_dedup_clusters" -> ((s, dir) => Dedup.nearDupClusters(docs(s, dir))),
    // same semantics, bucketed-edge-table iteration (the 100 TB path:
    // per-round joins run co-located, only the update stream shuffles).
    // Scratch state lives under one FIXED per-JVM dir, overwritten on
    // each invocation — a fresh temp dir per call would leak one final
    // labels parquet per bench warmup/pass, unboundedly. Queries run
    // serially within a JVM's Bench/Verify; earlier invocations'
    // frames are discarded before the next overwrite. The dir is an
    // ensureBuilt registration (no-op build — the query rewrites the
    // content per invocation): that PID+token-keys the path, so a
    // bench and a verify JVM racing in CI never overwrite each other's
    // bucketed tables mid-round, and the exit reaper + orphan sweep
    // reclaim it like every other scratch artifact.
    "q_dedup_clusters_bucketed" -> ((s, dir) =>
      Dedup.nearDupClustersBucketed(docs(s, dir),
        ensureBuilt("ndbq", dir)(_ => ()),
        buckets = s.conf.get("spark.sql.shuffle.partitions").toInt)),
    "q_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccardPairs(docs(s, dir))),
    // wholesale-copy vs scattered-overlap: longest contiguous shared
    // token span per near-dup pair (diagonal gaps-and-islands over
    // positional shingles, bounded to the banded candidate pairs)
    "q_shared_spans" -> ((s, dir) => Dedup.sharedSpans(docs(s, dir))),
    // are quality filtering and dedup redundant? per quality bucket,
    // the near-duplicated share as exact-integer ppm
    "q_quality_dup_profile" -> ((s, dir) =>
      Dedup.qualityDupProfile(docs(s, dir))),
    "q_dup_ngrams" -> ((s, dir) => Dedup.duplicatedNgrams(docs(s, dir))),
    "q_source_dup_profile" -> ((s, dir) => Dedup.sourceDupProfile(docs(s, dir))),
    // incremental ingest: dedup the batch (doc_id % 5 = 0) against the
    // rest of the corpus — exact + LSH near-dup, greedy first-wins
    "q_dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.dedupIncremental(
        d.filter(col("doc_id") % 5 =!= 0), d.filter(col("doc_id") % 5 === 0))
    }),
    // the production shape of the same ingest: corpus sketches come
    // from a writeDedupIndex table built once per JVM (Bench warmup /
    // Verify first call), so timed passes measure the delta probe —
    // batch×bands band joins against the persisted index — never a
    // corpus re-hash. Identical core ⇒ identical verdicts ⇒ shares
    // the inline twin's oracle.
    "q_dedup_incremental_indexed" -> ((s, dir) => {
      val d = docs(s, dir)
      val ix = ensureBuilt("dedupidx", dir)(p =>
        Dedup.writeDedupIndex(d.filter(col("doc_id") % 5 =!= 0), p))
      Dedup.dedupIncrementalIndexed(ix, d.filter(col("doc_id") % 5 === 0))
    }),
    // ingest-side labeling: the batch (doc_id % 5 = 0) is ASSIGNED
    // cluster labels against the FROZEN corpus clustering — band
    // probes of the persisted index, verified matches projected to
    // persisted cluster ids, batch-internal propagation; corpus rows
    // never iterate. Index + label table built once per JVM.
    "q_assign_labels" -> ((s, dir) => {
      val d = docs(s, dir)
      // the index is the SAME artifact q_dedup_incremental_indexed
      // builds (identical corpus + parameters) — share it instead of
      // fingerprinting/banding the corpus a second time per JVM
      val ix = ensureBuilt("dedupidx", dir)(p =>
        Dedup.writeDedupIndex(d.filter(col("doc_id") % 5 =!= 0), p))
      val lbl = ensureBuilt("asgnlbl", dir)(p =>
        Dedup.writeDedupLabels(d.filter(col("doc_id") % 5 =!= 0), p))
      Dedup.assignDedupLabels(ix, lbl, d.filter(col("doc_id") % 5 === 0))
    }),
    "q_simhash" -> ((s, dir) => TextAnalysis.simhashFrame(docs(s, dir))),
    "q_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir))),
    // LLM-pipeline: multimodal binary-column plumbing (stubbed decode)
    "q_multimodal_features" -> ((s, dir) =>
      graft.operators.Multimodal.featuresQuery(docs(s, dir))),
    "q_multimodal_sample" -> ((s, dir) =>
      graft.operators.Multimodal.sampleQuery(docs(s, dir))),
    // REAL image decode: generated PNGs → javax.imageio → pixel stats;
    // the oracle recomputes the stats from the generator's closed form
    "q_multimodal_decode" -> ((s, dir) =>
      graft.operators.Multimodal.decodeQuery(docs(s, dir))),
    // REAL audio decode: generated PCM WAVs → javax.sound.sampled →
    // sample stats; the oracle recomputes them from the generator's
    // closed form
    "q_multimodal_audio" -> ((s, dir) =>
      graft.operators.Multimodal.audioDecodeQuery(docs(s, dir))),
    // LLM-pipeline: embedding similarity search
    "q_embed_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnBruteForce(e, e.filter(col("vec_id") < 16), 5)
    }),
    "q_embed_knn_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnLsh(e, e.filter(col("vec_id") < 16), 5)
    }),
    // multi-probe variant: each table also probes the planes buckets
    // one bit-flip away — recall for probe volume, index unchanged
    "q_embed_knn_lsh_mp" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnLshMultiProbe(e, e.filter(col("vec_id") < 16), 5)
    }),
    "q_embed_near_pairs" -> ((s, dir) => Similarity.lshNearPairs(emb(s, dir))),
    // SemDeDup-style: epsilon-ball clusters over the embedding LSH
    // graph, min-id representative kept per cluster. Threshold 0.4 on
    // the synthetic embeddings yields realistic dedup structure
    // (clusters up to ~15); the default 0.35 sits at this fixture's
    // noise floor and welds 78% of vectors into one giant component
    // whose diameter drags the propagation loop through many rounds
    "q_semantic_keep" -> ((s, dir) =>
      Similarity.semanticKeep(emb(s, dir), threshold = 0.4)),
    "q_embed_knn_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnIvf(e, e.filter(col("vec_id") < 16), 5)
    }),
    // cluster-stratified diversity sampling: cap each embedding-space
    // cell's contribution, deterministic hash-order draw within cells
    "q_diverse_sample" -> ((s, dir) => Similarity.diverseSample(emb(s, dir))),
    // embedding-dump data-quality gate: nulls / wrong dims / zero
    // norms / norm range, one scan, one row
    "q_embedding_audit" -> ((s, dir) => Similarity.embeddingAudit(emb(s, dir))),
    // off-manifold vectors: bottom-k cosine to own coarse centroid
    // (same shuffle-free codebook assignment as knnIvf; one
    // TakeOrderedAndProject cut)
    "q_embed_outliers" -> ((s, dir) =>
      Similarity.embeddingOutliers(emb(s, dir))),
    // embedding-space decontamination: train vectors too close to the
    // (broadcast) eval set — the semantic twin of q_decontaminate
    "q_decontaminate_semantic" -> ((s, dir) =>
      Similarity.semanticContaminationById(emb(s, dir))),
    // contrastive training triplets: best LSH near-pair positive +
    // deterministic salted-bucket hash negative (broadcast min table)
    "q_contrastive_triplets" -> ((s, dir) =>
      Similarity.contrastiveTriplets(emb(s, dir))),
    // self-measuring index quality: recall@k of LSH/IVF vs exact
    // brute force, integer-exact division per method
    "q_ann_recall" -> ((s, dir) => Similarity.annRecall(emb(s, dir))),
    // at-rest IVF cell-distribution profile: (cid, n, integer ppm) —
    // the drift monitor's baseline AND the codebook health check
    "q_cell_baseline" -> ((s, dir) => Similarity.cellBaseline(emb(s, dir))),
    // batch drift report: reference vs current snapshot (deterministic
    // 2/3 subset) in the SAME reference-trained cell coordinates
    "q_cell_drift" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.cellDrift(e, e.filter(col("vec_id") % 3 =!= 0))
    }),
    // the injected-codebook IVF path: exercises knnIvf's `centroids`
    // hook (the production surface trainCentroids plugs into) with the
    // CLOSED-FORM seed book — `iters = 0` returns k-means init
    // untouched: the 16 lowest-vec_id unit vectors, cid = seed rank.
    // That book is DuckDB-replayable (OracleSql.knnIvfSeedTrained), so
    // this query is hash-exact; the plan is byte-identical to a
    // Lloyd's-trained run (the book is a driver-held literal either
    // way). TRUE Lloyd's train time stays measured by the bench-only
    // twin q_embed_knn_ivf_train_bench ([[benchQueries]]) — float-AVG
    // fold order across engines is why trained books can never be
    // hash-checked, per the r13/r14 verdicts.
    "q_embed_knn_ivf_trained" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnIvf(e, e.filter(col("vec_id") < 16), 5,
        centroids = Some(Similarity.trainCentroids(e, k = 16, iters = 0)))
    }),
    // IVF-PQ: coarse cells + product-quantized codes (m ints per
    // vector instead of dims floats), ADC candidate scan, exact
    // re-rank. `pqIters = 0` freezes the closed-form SEED books (the
    // same configuration the persisted-index twin graduated with in
    // r14), so the inline build is hash-exact against the SAME oracle
    // (OracleSql.knnIvfPqSeed) — the two twins differ only in where
    // the codes table lives (rebuilt inline vs read from parquet).
    // Lloyd's-trained timing lives in q_embed_knn_ivfpq_train_bench.
    "q_embed_knn_ivfpq" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnIvfPq(e, e.filter(col("vec_id") < 16), 5, nProbes = 8,
        pqIters = 0)
    }),
    // steady-state twin: the SAME search against a writePqIndex built
    // once per JVM+dir (Bench warmup / Verify first call), so the
    // timed passes measure probe cost — static cid partition pruning +
    // ADC scan + exact re-rank — separated from codebook training,
    // which the inline twin deliberately includes. The index is built
    // with pqIters = 0: the SEED books (first-ksub unit-vector slices,
    // exactly k-means init) are closed-form, so unlike the
    // Lloyd's-trained twins this query is DuckDB-replayable end to end
    // (OracleSql.knnIvfPqSeed) and hash-exact, not rows-only — the
    // probe-side plan (partition-pruned ADC scan + exact re-rank) is
    // byte-identical either way, so the steady-state timing it exists
    // to measure is unchanged.
    "q_embed_knn_ivfpq_indexed" -> ((s, dir) => {
      val e = emb(s, dir)
      val ix = ensureBuilt("pqidx", dir)(d =>
        Similarity.writePqIndex(e, d, pqIters = 0))
      Similarity.knnIvfPqIndexed(ix, e, e.filter(col("vec_id") < 16), 5,
        nProbes = 8)
    }),
    // corpus-curation ops: deterministic split / sampling /
    // decontamination / canonical selection / dataset accounting
    "q_split_stats" -> ((s, dir) => CorpusOps.splitStats(docs(s, dir))),
    "q_sample_stratified" -> ((s, dir) =>
      CorpusOps.stratifiedSampleStats(docs(s, dir))),
    "q_decontaminate" -> ((s, dir) => CorpusOps.decontaminateById(docs(s, dir))),
    // Bloom-prefiltered twin: eval shingles fold into one fixed-size
    // sketch, train postings filter through might_contain before any
    // join — exact output (the join removes false positives), same oracle
    "q_decontaminate_bloom" -> ((s, dir) =>
      CorpusOps.decontaminateBloomById(docs(s, dir))),
    "q_cluster_best" -> ((s, dir) => CorpusOps.bestOfCluster(docs(s, dir))),
    // dedup-aware split audit: near-dup clusters straddling
    // train/val/test — the contamination hash-splitting cannot see
    "q_split_leakage" -> ((s, dir) => CorpusOps.splitLeakage(docs(s, dir))),
    // the audit's fix: split re-derived from the near-dup cluster id,
    // so no cluster can straddle train/val/test by construction
    "q_repair_splits" -> ((s, dir) => CorpusOps.repairSplits(docs(s, dir))),
    // write-once/derive-many: the SAME audits over the persisted label
    // table (Dedup.writeDedupLabels, built once per JVM+dir by the
    // first caller — Bench's untimed warmup / Verify's single pass).
    // Each derived query is a parquet scan + cheap aggregate with ZERO
    // propagation rounds (PlanShapeSpec pins it); output is
    // hash-identical to the recomputing twins, so they share oracles.
    "q_split_leakage_indexed" -> ((s, dir) =>
      CorpusOps.splitLeakageFromLabels(
        Dedup.readDedupLabels(s, labelsDir(s, dir)))),
    "q_repair_splits_indexed" -> ((s, dir) =>
      CorpusOps.repairSplitsFromLabels(
        Dedup.readDedupLabels(s, labelsDir(s, dir)))),
    "q_cluster_best_indexed" -> ((s, dir) =>
      CorpusOps.bestOfClusterFromLabels(docs(s, dir),
        Dedup.readDedupLabels(s, labelsDir(s, dir)))),
    "q_quality_dup_profile_indexed" -> ((s, dir) =>
      Dedup.qualityDupProfileFromLabels(docs(s, dir),
        Dedup.readDedupLabels(s, labelsDir(s, dir)))),
    // token-budget selection (histogram two-pass; oracle is the global window)
    "q_token_budget" -> ((s, dir) =>
      CorpusOps.selectByTokenBudget(docs(s, dir))),
    "q_source_stats" -> ((s, dir) => CorpusOps.sourceStats(docs(s, dir))),
    // one-row corpus health dashboard: exact-dup volume, lang/quality
    // pass counts, contamination + split-leakage audits as broadcast
    // 1-row aggregates; every column an exact integer
    "q_corpus_health" -> ((s, dir) => CorpusOps.corpusHealth(docs(s, dir))),
    // the dashboard off the persisted label table: leak count is a
    // label scan + aggregate, zero propagation rounds; same oracle
    "q_corpus_health_indexed" -> ((s, dir) =>
      CorpusOps.corpusHealthFromLabels(docs(s, dir),
        Dedup.readDedupLabels(s, labelsDir(s, dir)))),
    // sketch-at-rest accounting: per-source HLL distinct-fingerprint
    // sketches + a union row (mergeable — the 100 TB bookkeeping
    // pattern), on graft's pinned HLL so the union row and every
    // estimate replay hash-exactly in the oracle; CorpusOpsSpec
    // still brackets estimates against exact distincts.
    "q_source_distinct_approx" -> ((s, dir) =>
      CorpusOps.sourceDistinctApprox(docs(s, dir))),
    // the write-once/derive-many twin: dashboard off the PERSISTED
    // sketch table (~sources rows), zero corpus scans — registers are
    // deterministic, so it shares the recompute's oracle hash-exactly
    "q_source_distinct_indexed" -> ((s, dir) => {
      val sk = ensureBuilt("distsk", dir)(d =>
        CorpusOps.writeDistinctSketches(docs(s, dir), d))
      CorpusOps.sourceDistinctFromSketches(
        CorpusOps.readDistinctSketches(s, sk))
    }),
    "q_source_overlap" -> ((s, dir) => CorpusOps.sourceOverlap(docs(s, dir))),
    // snapshot diff against a deterministic synthetic "next crawl"
    "q_corpus_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      CorpusOps.snapshotDiff(d, CorpusOps.syntheticNextSnapshot(d))
    }),
    // domain balancing: cap each source, keep highest-quality docs
    "q_source_quota" -> ((s, dir) => CorpusOps.sourceQuota(docs(s, dir))),
    // distributed-rank twin: radix-histogram prefix + bounded per-bin
    // windows — the mega-source-safe formulation, same oracle
    "q_source_quota_dist" -> ((s, dir) =>
      CorpusOps.sourceQuotaDistributed(docs(s, dir))),
    "q_pii_redact" -> ((s, dir) =>
      transformDigest(docs(s, dir),
        graft.functions.TextFunctions.redactPii(col("text")), "redacted")),
    "q_lang_confusion" -> ((s, dir) => CorpusOps.langConfusion(docs(s, dir))),
    // sequence packing (concat-then-chunk bins) + keyword extraction
    "q_pack_stats" -> ((s, dir) => CorpusOps.packStats(docs(s, dir))),
    // context-window prep: sliding token chunks with overlap
    "q_doc_chunks" -> ((s, dir) => CorpusOps.docChunks(docs(s, dir))),
    // length-bucketed batching + pad-to-longest waste accounting
    "q_batch_padding" -> ((s, dir) => CorpusOps.batchPadding(docs(s, dir))),
    // collator config sweep: padding waste per candidate bucket
    // granularity, one row per config, integer pad shares
    "q_padding_sweep" -> ((s, dir) => CorpusOps.paddingSweep(docs(s, dir))),
    // temperature-style (alpha = 1/2) source mixture weights
    "q_source_mixture" -> ((s, dir) => CorpusOps.sourceMixture(docs(s, dir))),
    // the dedup-corrected twin: mixture weights from CANONICAL tokens
    // only (persisted label table), so near-copy padding cannot buy
    // sampling weight
    "q_source_mixture_effective" -> ((s, dir) =>
      CorpusOps.sourceMixtureEffective(docs(s, dir),
        Dedup.readDedupLabels(s, labelsDir(s, dir)))),
    // the weights APPLIED: per-source ppm keep rates + before/after
    // accounting (sampled tokens come out proportional to sqrt(tokens))
    "q_mixture_sample" -> ((s, dir) =>
      CorpusOps.mixtureSampleStats(docs(s, dir))),
    "q_doc_keywords" -> ((s, dir) => CorpusOps.docKeywords(docs(s, dir))),
    // grouping-sets breadth (CUBE margins) + decontaminated output table
    "q_source_cube" -> ((s, dir) => CorpusOps.sourceCube(docs(s, dir))),
    "q_clean_corpus" -> ((s, dir) => CorpusOps.cleanCorpusById(docs(s, dir))),
    // end-to-end corpus filter: quality + language + canonical-of-cluster
    "q_corpus_filter" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val d = docs(s, dir)
      // canonical docs: a narrow filter directly on the checkpointed
      // label frame — filtering BEFORE the join keeps the join inputs
      // at (survivors × canonicals) instead of (survivors × corpus)
      val canon = Dedup.nearDupLabels(d)
        .filter(col("cluster") === col("doc_id"))
        .select(col("doc_id"))
      // materialize the fused stopword-hit array FIRST: subexpression
      // elimination never hoists expressions out of lazily-evaluated
      // CaseWhen branches, so composing quality+langId directly would
      // re-tokenize per language branch. With `hits` a real column,
      // every downstream reference is a cheap element_at (CollapseProject
      // keeps the boundary: non-cheap, multi-referenced).
      // the anchored barrier (functions.Barrier) keeps the gate above
      // the scoring projection — inlined gate predicates re-derive the
      // scoring trees inside the Filter, where no subexpression
      // elimination exists
      d.select(col("doc_id"), col("text"),
          TextFunctions.langHits(col("text")).as("hits"))
        .select(col("doc_id"),
          TextFunctions.qualityScoreFromHits(col("text"), col("hits")).as("quality"),
          TextFunctions.langIdFromHits(col("hits")).as("lang"),
          graft.functions.Barrier.column)
        .filter(graft.functions.Barrier.anchored(
          col("quality") >= 0.65 && col("lang") === "en"))
        .join(canon, Seq("doc_id"))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),
  )

  /** Bench-only queries: run by [[graft.Bench]] alongside [[queries]]
    * but EXCLUDED from the correctness registry on purpose. These are
    * the true Lloyd's-training measurement paths — distributed
    * float-AVG fold order is not stable across engines, so no foreign
    * oracle can ever hash-check a trained codebook (the r13/r14
    * verdicts' standing finding). Their correctness story lives
    * elsewhere and is stronger than a rows-only driver check:
    * SimilaritySpec pins recall-vs-brute-force gates on both trained
    * paths, and the hash-exact registry twins
    * (`q_embed_knn_ivf_trained`, `q_embed_knn_ivfpq`) execute the
    * byte-identical probe plan with seed books — training only changes
    * the driver-held literals. What remains worth measuring here is
    * exactly what the registry twins deliberately exclude: Lloyd's /
    * PQ train time at scale. Keeping these in the bench keeps that
    * number tracked round over round.
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // end-to-end IVF with a 3-iteration Lloyd's coarse book — the
    // pre-r15 q_embed_knn_ivf_trained configuration, verbatim
    "q_embed_knn_ivf_train_bench" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnIvf(e, e.filter(col("vec_id") < 16), 5,
        centroids = Some(Similarity.trainCentroids(e, k = 16, iters = 3)))
    }),
    // end-to-end IVF-PQ with 2 PQ-training iterations — the pre-r15
    // q_embed_knn_ivfpq configuration, verbatim
    "q_embed_knn_ivfpq_train_bench" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnIvfPq(e, e.filter(col("vec_id") < 16), 5, nProbes = 8)
    }),
  )

  /** (doc_id, <prefix>_md5, <prefix>_len) digest of a per-document text
    * transform. Transforms ONCE: the regex/scan chain is the expensive
    * part, and CollapseProject keeps the projection boundary (the
    * transformed column is non-cheap and referenced twice). */
  private def transformDigest(d: DataFrame, transformed: Column,
      prefix: String): DataFrame = {
    // q_text_clean's historical column names are clean_md5/clean_len,
    // not cleaned_*; keep the prefix verbatim
    d.select(col("doc_id"), transformed.as("t"))
      .select(col("doc_id"),
        md5(col("t").cast("binary")).as(s"${prefix}_md5"),
        length(col("t")).cast("long").as(s"${prefix}_len"))
      .orderBy(col("doc_id"))
  }

  /** Per-JVM build-once guard for persisted-artifact scratch dirs
    * (dedup label table, IVF-PQ index): the FIRST invocation per
    * (artifact, data dir) — Bench's untimed warmup, Verify's single
    * pass — builds the artifact; every later call probes it. Timed
    * bench passes therefore measure the steady-state query, not index
    * construction (the train/probe split a deployment actually has). A
    * fresh JVM always rebuilds, so staleness cannot cross runs; the
    * scratch path is keyed by the data dir so different SFs never
    * share an index.
    */
  private val builtOnce =
    scala.collection.mutable.Map.empty[String, String]
  // the PID-keyed scratch dirs are deleted on JVM exit — without this
  // every bench/verify JVM would leak its multi-table parquet
  // artifacts (dedup index, label table, PQ index) in tmpdir forever
  private val scratchReaper: Thread = {
    val t = new Thread(() =>
      builtOnce.synchronized {
        builtOnce.values.foreach { d =>
          try org.apache.commons.io.FileUtils
            .deleteDirectory(new java.io.File(d))
          catch { case _: java.io.IOException => () } // exit-time best effort
        }
      }, "graft-scratch-reaper")
    Runtime.getRuntime.addShutdownHook(t)
    t
  }
  /** The tags [[ensureBuilt]] is ever called with — the sweep refuses
    * anything else, so `graft-*` dirs belonging to other tools or
    * other graft flavors on a shared tmpdir are never ours to delete. */
  private val scratchTags =
    Set("labels", "dedupidx", "asgnlbl", "pqidx", "distsk", "ndbq")

  /** This JVM's process start instant (epoch millis, hex) — embedded
    * in scratch dir names so a sweeper can tell the OWNER apart from
    * an unrelated process that later recycled the same pid. Empty on
    * platforms that don't expose it (then the dir carries no token and
    * the sweep falls back to pid-liveness alone, the conservative
    * pre-token behavior). */
  private val startToken: String =
    ProcessHandle.current.info.startInstant
      .map[String](i => java.lang.Long.toHexString(i.toEpochMilli))
      .orElse("")

  /** The sweep decision for one dir, given the dir name's start token
    * (possibly empty/absent) and the live process's observed token
    * (None = pid dead, Some("") = alive but start unobservable):
    * orphan iff the pid is dead, or alive with a start instant that
    * CONTRADICTS the recorded token (recycled pid). Exposed for the
    * spec — the truth table IS the safety argument. */
  private[graft] def orphanedScratch(
      dirTok: String, liveTok: Option[String]): Boolean =
    liveTok match {
      case None => true
      case Some(live) => dirTok.nonEmpty && live.nonEmpty && live != dirTok
    }

  private def startTokenOf(pid: Long): Option[String] = {
    val oh = ProcessHandle.of(pid)
    if (!oh.isPresent) None
    else {
      val si = oh.get.info.startInstant
      if (si.isPresent) Some(java.lang.Long.toHexString(si.get.toEpochMilli))
      else Some("") // alive but unobservable start — claim nothing
    }
  }

  // the reaper cannot cover SIGKILL (timeouts, OOM kills): those JVMs
  // never run shutdown hooks, so their PID-keyed scratch dirs outlive
  // them as debris nothing reclaims. Sweep dirs ONCE per JVM, before
  // the first build. Ownership proof required on all three axes: the
  // tag is one of OURS, the dir's filesystem owner is the current OS
  // user, and the recorded pid is dead — or alive with a process start
  // instant that CONTRADICTS the dir's start token (a recycled pid: the
  // owner is gone, the squatter is not a builder). Alive-and-matching,
  // alive-with-no-verdict, and tokenless-alive all skip — conservative:
  // a leaked dir is cheap, deleting under a live builder is not.
  private lazy val orphanSweep: Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val tags = scratchTags.mkString("|")
    val pat = s"^graft-($tags)-[0-9a-f]+-p(\\d+)(?:t([0-9a-f]+))?$$".r
    val me = System.getProperty("user.name")
    def ownedByUs(f: java.io.File): Boolean =
      try java.nio.file.Files.getOwner(f.toPath).getName == me
      catch { case _: Exception => false }
    Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      f.getName match {
        case pat(_, pid, tok) if f.isDirectory && ownedByUs(f) &&
            orphanedScratch(if (tok == null) "" else tok,
              startTokenOf(pid.toLong)) =>
          try org.apache.commons.io.FileUtils.deleteDirectory(f)
          catch { case _: java.io.IOException => () } // best effort
        case _ => ()
      }
    }
  }

  private def ensureBuilt(tag: String, dir: String)(
      build: String => Unit): String =
    // synchronized: the side-effecting build must run at most once per
    // key even under concurrent query threads. The scratch path embeds
    // the PID so two JVMs (e.g. a bench and a verify run racing in CI)
    // never build-vs-read the same directory.
    builtOnce.synchronized {
      orphanSweep // once per JVM, before the first scratch build
      builtOnce.getOrElseUpdate(s"$tag|$dir", {
        require(scratchTags.contains(tag),
          s"scratch tag '$tag' not in the sweep allowlist $scratchTags")
        val tok = if (startToken.isEmpty) "" else s"t$startToken"
        val d = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
          s"graft-$tag-${Integer.toHexString(dir.hashCode)}-p${ProcessHandle.current.pid}$tok")
          .toString
        build(d)
        d
      })
    }

  private def labelsDir(s: SparkSession, dir: String): String =
    ensureBuilt("labels", dir)(d => Dedup.writeDedupLabels(docs(s, dir), d))

  private def docs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")

  private def emb(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "embeddings")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = {
    val cte = EventsAsRecords.oracleCte
    Map(
      "q_partition_stats" ->
        s"""$cte
           |SELECT "partition", start_offset, end_offset, total, alive,
           |       tombstones, dirty_ratio, key_null, key_non_null,
           |       p_bytes, key_bytes, value_bytes,
           |       CASE WHEN alive > 0 AND key_bytes > 0
           |            THEN CAST(key_bytes // alive AS BIGINT) ELSE 0 END AS avg_key_size,
           |       CASE WHEN alive > 0 AND value_bytes > 0
           |            THEN CAST(value_bytes // alive AS BIGINT) ELSE 0 END AS avg_value_size,
           |       CASE WHEN alive > 0 AND p_bytes > 0
           |            THEN CAST(p_bytes // alive AS BIGINT) ELSE 0 END AS avg_msg_size
           |FROM (
           |  SELECT "partition",
           |         MIN("offset") AS start_offset,
           |         MAX("offset") + 1 AS end_offset,
           |         COUNT(*) AS total,
           |         COUNT("value") AS alive,
           |         COUNT(*) - COUNT("value") AS tombstones,
           |         COUNT(*) - COUNT("key") AS key_null,
           |         COUNT("key") AS key_non_null,
           |         CAST(COALESCE(SUM(LENGTH("key")), 0) AS BIGINT) AS key_bytes,
           |         CAST(COALESCE(SUM(LENGTH("value")), 0) AS BIGINT) AS value_bytes,
           |         CAST(COALESCE(SUM(LENGTH("key")), 0) + COALESCE(SUM(LENGTH("value")), 0) AS BIGINT) AS p_bytes,
           |         CASE WHEN COUNT(*) > 0 AND COUNT(*) - COUNT("value") > 0
           |              THEN (COUNT(*) - COUNT("value")) * 100.0 / COUNT(*) ELSE 0.0 END AS dirty_ratio
           |  FROM records GROUP BY 1) ORDER BY "partition"""".stripMargin,
      "q_topic_summary" ->
        s"""$cte
           |SELECT COUNT(*) AS overall_count,
           |       CAST(COALESCE(SUM(COALESCE(LENGTH("key"), 0) + COALESCE(LENGTH("value"), 0)), 0) AS BIGINT) AS overall_bytes,
           |       COALESCE(MIN(CASE WHEN "value" IS NOT NULL
           |         THEN COALESCE(LENGTH("key"), 0) + LENGTH("value") END), 0) AS smallest_msg,
           |       COALESCE(MAX(CASE WHEN "value" IS NOT NULL
           |         THEN COALESCE(LENGTH("key"), 0) + LENGTH("value") END), 0) AS largest_msg,
           |       COALESCE(CAST(epoch_us(MIN("timestamp")) AS BIGINT), 0) AS earliest_us,
           |       COALESCE(CAST(epoch_us(MAX("timestamp")) AS BIGINT), 0) AS latest_us
           |FROM records""".stripMargin,
      "q_offsets" ->
        s"""$cte
           |SELECT "partition", MIN("offset") AS start_offset,
           |       MAX("offset") + 1 AS end_offset
           |FROM records GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_offset_gaps" ->
        s"""$cte,
           |g AS (SELECT "partition", "offset",
           |        "offset" - LAG("offset") OVER (
           |          PARTITION BY "partition" ORDER BY "offset") - 1 AS gap_before
           |      FROM records WHERE "offset" % 17 <> 0)
           |SELECT "partition", COUNT(*) AS n,
           |       MIN("offset") AS lo, MAX("offset") AS hi,
           |       MAX("offset") - MIN("offset") + 1 - COUNT(*) AS missing,
           |       CAST(SUM(CASE WHEN gap_before > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_gaps,
           |       COALESCE(MAX(CASE WHEN gap_before > 0 THEN gap_before END), 0)
           |         AS max_gap
           |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_partition_throughput" ->
        s"""$cte
           |SELECT "partition",
           |       (CAST(epoch_us("timestamp") AS BIGINT) // 86400000000) * 86400000000
           |         AS bucket_start_us,
           |       COUNT(*) AS n
           |FROM records GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      "q_key_cardinality" ->
        s"""$cte
           |SELECT "partition", COUNT(DISTINCT "key") AS n_keys,
           |       COUNT("key") AS n_keyed_records
           |FROM records GROUP BY 1 ORDER BY 1""".stripMargin,
      "q_key_cardinality_approx" -> OracleSql.keyCardinalityApprox(cte),
      "q_hot_keys" ->
        s"""$cte
           |SELECT "key" AS key_str, COUNT(*) AS n_writes,
           |       COUNT(*) FILTER (WHERE "value" IS NULL) AS n_tombstones,
           |       CAST(COUNT(DISTINCT "partition") AS INTEGER) AS n_partitions
           |FROM records WHERE "key" IS NOT NULL
           |GROUP BY 1 ORDER BY n_writes DESC, key_str LIMIT 20""".stripMargin,
      "q_rollup_stats" ->
        s"""$cte
           |SELECT "partition",
           |       COUNT(*) AS total,
           |       COUNT("value") AS alive,
           |       COUNT(*) - COUNT("value") AS tombstones,
           |       COUNT(*) - COUNT("key") AS key_null,
           |       COUNT("key") AS key_non_null,
           |       CAST(COALESCE(SUM(LENGTH("key")), 0) AS BIGINT) AS key_bytes,
           |       CAST(COALESCE(SUM(LENGTH("value")), 0) AS BIGINT) AS value_bytes
           |FROM records GROUP BY ROLLUP("partition")
           |ORDER BY "partition" NULLS FIRST""".stripMargin,
      "q_alive_keys" ->
        s"""$cte
           |SELECT COUNT(*) FILTER (WHERE NOT dead_at_end) AS alive_keys FROM (
           |  SELECT "key",
           |         ("value" IS NULL) AS dead_at_end,
           |         ROW_NUMBER() OVER (PARTITION BY "key"
           |           ORDER BY "partition" DESC, "offset" DESC) AS rn
           |  FROM records WHERE "key" IS NOT NULL) WHERE rn = 1""".stripMargin,
      "q_compaction_estimate" ->
        s"""$cte
           |, totals AS (
           |  SELECT "partition", COUNT(*) AS n_records,
           |         CAST(COALESCE(SUM(LENGTH("key")), 0)
           |            + COALESCE(SUM(LENGTH("value")), 0) AS BIGINT) AS total_bytes
           |  FROM records GROUP BY 1),
           |last_writes AS (
           |  SELECT "partition", "key", "value",
           |         ROW_NUMBER() OVER (PARTITION BY "partition", "key"
           |           ORDER BY "offset" DESC) AS rn
           |  FROM records WHERE "key" IS NOT NULL),
           |retained AS (
           |  SELECT "partition", COUNT(*) AS alive_keys,
           |         CAST(SUM(LENGTH("key") + LENGTH("value")) AS BIGINT)
           |           AS retained_bytes
           |  FROM last_writes WHERE rn = 1 AND "value" IS NOT NULL
           |  GROUP BY 1)
           |SELECT t."partition", t.n_records, t.total_bytes,
           |       COALESCE(r.alive_keys, 0) AS alive_keys,
           |       COALESCE(r.retained_bytes, 0) AS retained_bytes
           |FROM totals t LEFT JOIN retained r USING ("partition")
           |ORDER BY t."partition"""".stripMargin,
      "q_alive_keys_fnv32" -> OracleSql.aliveKeysFnv32(cte),
      "q_event_windows" -> OracleSql.eventWindows,
      "q_event_type_stats" -> OracleSql.eventTypeStats,
      "q_sessions" -> OracleSql.sessions(),
      "q_user_top_type" -> OracleSql.topEventTypePerUser,
      "q_event_transitions" -> OracleSql.typeTransitions,
      "q_value_percentiles" -> OracleSql.valuePercentiles(),
      "q_value_percentiles_dist" -> OracleSql.valuePercentiles(),
      "q_value_percentiles_approx" ->
        OracleSql.valuePercentilesHistogram(domain = Some((0.0, 1024.0))),
      "q_value_percentiles_adaptive" ->
        OracleSql.valuePercentilesHistogram(domain = None),
      "q_vocab_summary_approx" -> OracleSql.vocabularySummaryApprox,
      "q_source_distinct_approx" -> OracleSql.sourceDistinctApprox,
      "q_source_distinct_indexed" -> OracleSql.sourceDistinctApprox,
      "q_daily_spikes" -> OracleSql.dailySpikes(),
      "q_event_gaps" -> OracleSql.interEventGaps,
      "q_rolling_value" -> OracleSql.rollingValue(),
      "q_spend_deciles" -> OracleSql.userSpendDeciles(),
      "q_spend_deciles_dist" -> OracleSql.userSpendDeciles(),
      "q_asof_join" -> OracleSql.asOfLastPrior(),
      "q_audience_set_ops" -> OracleSql.audienceSetOps(),
      "q_incident_range_join" -> OracleSql.incidentRangeJoin(),
      "q_salted_enrich" -> OracleSql.saltedUserEnrichment,
      "q_event_pivot" -> OracleSql.eventTypePivot,
      "q_token_budget" -> OracleSql.selectByTokenBudget(),
      "q_event_unpivot" -> OracleSql.eventTypeLong,
      "q_props_stats" -> OracleSql.propsStats,
      "q_tpch_q1" -> OracleSql.tpchQ1(),
      "q_tpch_q3" -> OracleSql.tpchQ3(),
      "q_tpch_q5" -> OracleSql.tpchQ5(),
      "q_tpch_q14" -> OracleSql.tpchQ14(),
      "q_tpch_q4" -> OracleSql.tpchQ4(),
      "q_tpch_q22" -> OracleSql.tpchQ22(),
      "q_tpch_q6" -> OracleSql.tpchQ6(),
      "q_tpch_q10" -> OracleSql.tpchQ10(),
      "q_tpch_q18" -> OracleSql.tpchQ18(),
      "q_tpch_q2" -> OracleSql.tpchQ2(),
      "q_tpch_q7" -> OracleSql.tpchQ7(),
      "q_tpch_q8" -> OracleSql.tpchQ8(),
      "q_tpch_q9" -> OracleSql.tpchQ9(),
      "q_tpch_q11" -> OracleSql.tpchQ11(),
      "q_tpch_q12" -> OracleSql.tpchQ12(),
      "q_tpch_q13" -> OracleSql.tpchQ13(),
      "q_tpch_q15" -> OracleSql.tpchQ15(),
      "q_tpch_q16" -> OracleSql.tpchQ16(),
      "q_tpch_q17" -> OracleSql.tpchQ17(),
      "q_tpch_q19" -> OracleSql.tpchQ19(),
      "q_tpch_q20" -> OracleSql.tpchQ20(),
      "q_tpch_q21" -> OracleSql.tpchQ21(),
      "q_repetition" -> OracleSql.repetition(),
      "q_vocabulary" -> OracleSql.vocabulary(),
      "q_token_rarity" -> OracleSql.tokenRarity,
      "q_length_hist" -> OracleSql.lengthHistogram(),
      "q_text_clean" -> OracleSql.textClean,
      "q_text_stats" -> OracleSql.textStats,
      "q_lang_id" -> OracleSql.langId,
      "q_lang_confidence" -> OracleSql.langConfidence,
      "q_quality" -> OracleSql.quality,
      "q_fingerprint" -> OracleSql.fingerprints,
      "q_text_search" -> OracleSql.searchTopK(),
      "q_collocations" -> OracleSql.collocations(),
      "q_dedup_exact" -> OracleSql.dedupExact,
      "q_dedup_minhash" -> OracleSql.minhashPairs(),
      "q_dedup_clusters" -> OracleSql.nearDupClusters(),
      "q_dedup_clusters_bucketed" -> OracleSql.nearDupClusters(),
      "q_ngram_jaccard" -> OracleSql.ngramJaccardPairs(),
      "q_shared_spans" -> OracleSql.sharedSpans(),
      "q_quality_dup_profile" -> OracleSql.qualityDupProfile(),
      // encode under the PINNED merge table: the greedy merge fold
      // replayed as a boundary-safe replace chain (see OracleSql)
      "q_bpe_encode" -> OracleSql.bpeEncode(),
      // training unrolled: numMerges is a constant, so the iterative
      // argmax a recursive CTE cannot express becomes 20 chained
      // (count, argmax, merge) CTE rounds — hash-exact, not rows-only
      "q_bpe_merges" -> OracleSql.bpeMerges(),
      "q_tokenizer_fit" -> OracleSql.tokenizerFit(),
      "q_effective_tokens" -> OracleSql.effectiveTokens(),
      "q_source_mixture_effective" -> OracleSql.sourceMixtureEffective(),
      "q_dup_ngrams" -> OracleSql.duplicatedNgrams(),
      "q_source_dup_profile" -> OracleSql.sourceDupProfile(),
      "q_dedup_incremental" -> OracleSql.dedupIncremental(),
      "q_dedup_incremental_indexed" -> OracleSql.dedupIncremental(),
      // frozen-corpus incremental cluster assignment: corpus-only
      // recursive closure + batch closure over verified matches
      "q_assign_labels" -> OracleSql.assignLabels(),
      "q_simhash" -> OracleSql.simhash,
      "q_simhash_pairs" -> OracleSql.simhashPairs(),
      "q_multimodal_features" -> OracleSql.multimodalFeatures,
      "q_multimodal_sample" -> OracleSql.multimodalSample(),
      "q_multimodal_decode" -> OracleSql.multimodalDecode,
      "q_multimodal_audio" -> OracleSql.multimodalAudio,
      "q_embed_knn" -> OracleSql.knn(),
      "q_embed_knn_ivf" -> OracleSql.knnIvf(),
      // both IVF-PQ twins replay exactly because their books are the
      // closed-form SEEDS (pqIters = 0) — same oracle for the inline
      // rebuild and the persisted-index probe; Lloyd's-trained
      // configurations live in benchQueries, outside this registry
      "q_embed_knn_ivfpq" -> OracleSql.knnIvfPqSeed(),
      "q_embed_knn_ivfpq_indexed" -> OracleSql.knnIvfPqSeed(),
      // injected seed book (trainCentroids iters = 0): k-means init in
      // closed form — the centroid cids are seed RANKS (0..k-1 over
      // the k lowest vec_ids), not raw vec_ids as in the stand-in
      "q_embed_knn_ivf_trained" -> OracleSql.knnIvfSeedTrained(),
      "q_diverse_sample" -> OracleSql.diverseSample(),
      "q_embedding_audit" -> OracleSql.embeddingAudit(),
      "q_embed_outliers" -> OracleSql.embeddingOutliers(),
      "q_contrastive_triplets" -> OracleSql.contrastiveTriplets(),
      "q_ann_recall" -> OracleSql.annRecall(),
      "q_cell_baseline" -> OracleSql.cellBaseline(),
      "q_cell_drift" -> OracleSql.cellDrift(),
      "q_embed_knn_lsh_mp" -> OracleSql.knnLshMultiProbe(),
      "q_corpus_filter" -> OracleSql.corpusFilter(),
      "q_split_stats" -> OracleSql.splitStats(),
      "q_sample_stratified" -> OracleSql.stratifiedSampleStats(),
      "q_decontaminate" -> OracleSql.decontaminate(),
      "q_decontaminate_bloom" -> OracleSql.decontaminate(),
      "q_cluster_best" -> OracleSql.clusterBest(),
      "q_split_leakage" -> OracleSql.splitLeakage(),
      "q_repair_splits" -> OracleSql.repairSplits(),
      // the indexed twins are hash-identical to the recomputing
      // queries by construction, so they share the same oracles
      "q_cluster_best_indexed" -> OracleSql.clusterBest(),
      "q_split_leakage_indexed" -> OracleSql.splitLeakage(),
      "q_repair_splits_indexed" -> OracleSql.repairSplits(),
      "q_quality_dup_profile_indexed" -> OracleSql.qualityDupProfile(),
      "q_source_stats" -> OracleSql.sourceStats,
      "q_corpus_health" -> OracleSql.corpusHealth(),
      // identical semantics, leak audit read from the label table
      "q_corpus_health_indexed" -> OracleSql.corpusHealth(),
      "q_source_overlap" -> OracleSql.sourceOverlap(),
      "q_corpus_diff" -> OracleSql.corpusDiff,
      "q_source_quota" -> OracleSql.sourceQuota(),
      "q_source_quota_dist" -> OracleSql.sourceQuota(),
      "q_pii_redact" -> OracleSql.piiRedact,
      "q_lang_confusion" -> OracleSql.langConfusion,
      "q_pack_stats" -> OracleSql.packStats(),
      "q_doc_chunks" -> OracleSql.docChunks(),
      "q_batch_padding" -> OracleSql.batchPadding(),
      "q_padding_sweep" -> OracleSql.paddingSweep(),
      "q_source_mixture" -> OracleSql.sourceMixture,
      "q_mixture_sample" -> OracleSql.mixtureSampleStats,
      "q_doc_keywords" -> OracleSql.docKeywords(),
      "q_source_cube" -> OracleSql.sourceCube,
      "q_clean_corpus" -> OracleSql.cleanCorpus(),
      "q_embed_knn_lsh" -> OracleSql.knnLsh(),
      "q_embed_near_pairs" -> OracleSql.lshNearPairs(),
      "q_semantic_keep" -> OracleSql.semanticKeep(threshold = 0.4),
      "q_decontaminate_semantic" -> OracleSql.semanticContamination(),
    )
  }
}
