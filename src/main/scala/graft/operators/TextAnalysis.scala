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
    docs.select(col("doc_id") +:
      Langs.map(l => stopwordHits(col("text"), Stopwords(l))
        .cast("long").as(s"${l}_hits")) :+
      langId(col("text")).as("lang_pred"): _*)
      .orderBy(col("doc_id"))

  def quality(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      fingerprintMd5(col("text")).as("fp_md5"),
      rollingHash(col("text")).as("rolling_hash"))
      .orderBy(col("doc_id"))

  def simhashFrame(docs: DataFrame): DataFrame =
    Dedup.shingleHashFrame(docs)
      .select(col("doc_id"), Dedup.simhashFromHashes(col("xs")).as("simhash"))
      .orderBy(col("doc_id"))
}
