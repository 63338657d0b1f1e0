package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Alive-key counting (the reference's `-c` flag, SURVEY §2.F): the
  * number of keys whose LAST write (by partition, offset order) is not a
  * tombstone — i.e. the keys a log-compacted topic would retain.
  *
  * The reference's formulation (`src/metric.rs:262-305`) is an in-memory
  * bitset over a 32-bit hash, mutated in arrival order: approximate
  * (hash collisions merge keys, a colliding tombstone erases an innocent
  * key) and cross-partition-nondeterministic. The Spark-native
  * formulation below is EXACT and deterministic: reduce per key with
  * `max_by(value IS NULL, (partition, offset))` — last-write-wins by
  * total order — then count the keys whose last value is non-null.
  *
  * Scale: one shuffle hash-partitioned by key; `max_by` carries a
  * constant-size buffer per key, partial-aggregates map-side, and never
  * materializes the key set on any single node — the distributed
  * replacement for the reference's single-host 512 MiB bitset bound
  * (`src/fnv32.rs:74-82`). Null-key records are excluded up front
  * (`src/metric.rs:290-303`), so the filter prunes before the shuffle.
  */
object AliveKeys {

  /** Per-key last-write state: key, deadAtEnd flag. */
  def lastWritePerKey(records: DataFrame): DataFrame =
    records
      .filter(col("key").isNotNull)
      .groupBy(col("key"))
      .agg(max_by(col("value").isNull,
        struct(col("partition"), col("offset"))).as("dead_at_end"))

  /** Exact alive-key count, as a 1-row/1-column frame. */
  def exactFrame(records: DataFrame): DataFrame =
    lastWritePerKey(records)
      .agg(count_if(!col("dead_at_end")).as("alive_keys"))

  def exact(records: DataFrame): Long =
    exactFrame(records).collect()(0).getLong(0)

  /** Approximate variant for memory-bounded scans at extreme key
    * cardinality: identical last-write-wins reduction, but over a 64-bit
    * `xxhash64(key)` instead of the raw key bytes — the idiomatic
    * stand-in for the reference's 32-bit FNV-variant bitset index
    * (`src/fnv32.rs:74-102`; SURVEY §2.F1 says do NOT replicate that
    * hash bit-for-bit). Collision rate at 64 bits is ~n²/2⁶⁵ —
    * negligible up to billions of keys — while the shuffle rows shrink
    * from arbitrary key bytes to 8 bytes.
    */
  def approx(records: DataFrame): Long =
    records
      .filter(col("key").isNotNull)
      .select(xxhash64(col("key")).as("key"), col("partition"),
        col("offset"), col("value").isNull.as("tomb"))
      .groupBy(col("key"))
      .agg(max_by(col("tomb"), struct(col("partition"), col("offset")))
        .as("dead_at_end"))
      .agg(count_if(!col("dead_at_end")))
      .collect()(0).getLong(0)

  /** Per-partition post-compaction footprint estimate — the natural
    * "what would compaction buy me" companion to the dirty ratio
    * (`src/metric.rs:305-311` stops at the ratio; this prices it in
    * bytes). Kafka compaction operates PER PARTITION LOG, so the
    * last-write reduction groups by (partition, key) — the same key on
    * two partitions survives on both, exactly like a broker. Modeled
    * at the post-tombstone-purge steady state: a partition retains the
    * last record of each key whose last value is non-null (tombstones
    * themselves are eventually purged after delete.retention); null-key
    * records are invalid on compacted topics and count only toward the
    * pre-compaction totals.
    *
    * Scale: one (partition, key) shuffle with a constant-size `max_by`
    * buffer per key (the value rides in the buffer, bounded by record
    * size), re-reduced per partition; totals re-use the partition
    * grouping. Output is O(#partitions) rows of exact BIGINTs.
    */
  def compactionEstimate(records: DataFrame): DataFrame = {
    val totals = records.groupBy(col("partition")).agg(
      count(lit(1)).as("n_records"),
      (coalesce(sum(length(col("key"))), lit(0L)) +
        coalesce(sum(length(col("value"))), lit(0L))).as("total_bytes"))
    val retained = records.filter(col("key").isNotNull)
      .groupBy(col("partition"), col("key"))
      .agg(max_by(col("value"), col("offset")).as("last_value"))
      .filter(col("last_value").isNotNull)
      .groupBy(col("partition"))
      .agg(count(lit(1)).as("alive_keys"),
        sum(length(col("key")) + length(col("last_value")))
          .as("retained_bytes"))
    totals.join(retained, Seq("partition"), "left")
      .select(col("partition"), col("n_records"), col("total_bytes"),
        coalesce(col("alive_keys"), lit(0L)).as("alive_keys"),
        coalesce(col("retained_bytes"), lit(0L)).as("retained_bytes"))
      .orderBy(col("partition"))
  }

  /** Reference-fidelity approximate count: buckets keys by the
    * reference's own 32-bit FNV-variant hash (`src/fnv32.rs`), applies
    * last-write-wins PER BUCKET — reproducing the reference's bitset
    * semantics exactly (hash collisions merge keys; a colliding
    * tombstone erases the bucket), but deterministically ordered by
    * (partition, offset) instead of arrival order (SURVEY §7.4).
    */
  def approxFnv32Frame(records: DataFrame): DataFrame =
    records
      .filter(col("key").isNotNull)
      .select(graft.functions.Fnv32.fnv32(col("key")).as("bucket"),
        col("partition"), col("offset"), col("value").isNull.as("tomb"))
      .groupBy(col("bucket"))
      .agg(max_by(col("tomb"), struct(col("partition"), col("offset")))
        .as("dead_at_end"))
      .agg(count_if(!col("dead_at_end")).as("alive_keys_fnv32"))
}
