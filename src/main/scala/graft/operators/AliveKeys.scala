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
