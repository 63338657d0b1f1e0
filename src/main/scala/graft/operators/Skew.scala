package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew handling — the salting technique for joins whose
  * probe side concentrates on hot keys (a power-law user, an empty-
  * string fingerprint, a null-ish default). AQE's skew-join split is
  * the first line of defense and needs no code; salting is the
  * EXPLICIT variant for when the skew is known and the build side is
  * small enough to replicate — it trades `salts`× build-side rows for
  * spreading each hot probe key over `salts` independent reducers.
  */
object Skew {

  /** Salted equi-join: probe rows scatter over `salts` sub-keys via a
    * deterministic hash of `probeRowId` (a unique row id — NEVER a
    * partition-dependent id like monotonically_increasing_id, so the
    * scatter is byte-identical across cluster sizes); the build side
    * replicates each row `salts`× with one salt each. Joining on
    * (key, salt) then makes every reducer hold 1/`salts` of a hot
    * key's probe rows. Semantically identical to the plain equi-join
    * on `key` (spec-pinned); build-side cost is `salts`× its row
    * count, so size `salts` to the worst observed key concentration,
    * not higher.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      probeRowId: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(col(probeRowId)), lit(salts.toLong)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Events enriched with their user's total spend via a salted join
    * (user activity is the classic hot-key distribution), then
    * re-aggregated per event type. The salt changes the physical
    * shuffle layout only — the result hash-matches the plain-join
    * oracle exactly.
    */
  def saltedUserEnrichment(events: DataFrame, salts: Int = 8): DataFrame = {
    val totals = events.groupBy(col("user_id"))
      .agg(sum(Money.tryDec(col("value"))).as("user_total_dec"))
    saltedJoin(events, totals, "user_id", "event_id", salts)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("user_total_dec")).cast("double").as("sum_user_totals"))
      .orderBy(col("event_type"))
  }
}
