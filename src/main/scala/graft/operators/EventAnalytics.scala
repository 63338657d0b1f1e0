package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the raw `events` table — the windowed /
  * grouped aggregations a topic-metrics engine grows into once records
  * carry event time (SURVEY §2.H notes the reference has none; these
  * are the streaming-ready extensions). Both run unchanged as
  * Structured Streaming aggregations with a watermark on `ts`.
  */
object EventAnalytics {

  /** Tumbling 1-day event-time windows per event type. Uses the real
    * `window()` event-time operator (streaming-compatible), not a
    * date_trunc projection. Money-style sums go through DECIMAL(18,2)
    * so distributed summation order cannot perturb results.
    */
  def dailyWindows(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(Money.tryDec(col("value"))).cast("double").as("sum_value"))
      .select(to_date(col("w.start")).as("day"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("day"), col("event_type"))

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds `gapMinutes`. Classic two-window plan —
    * lag to flag session starts, running sum to number sessions, then
    * a grouped aggregate — one shuffle on user_id shared by both
    * windows and the final aggregation. Deterministic ordering via
    * (ts, event_id).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(w))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(Money.tryDec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Each user's most frequent event type (ties broken
    * lexicographically) — grouped count + one top-1 window. */
  def topEventTypePerUser(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("cnt").desc, col("event_type"))
    events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("top_type"), col("cnt"))
      .orderBy(col("user_id"))
  }

  /** Discrete (order-statistic) percentiles of `value` per event type:
    * the value at ordered position ceil(p·n) — `percentile_disc`
    * semantics spelled out as a window + positional pick, so every
    * engine computes the identical picked value (no interpolation
    * arithmetic to diverge on). Duplicate boundary values are safe:
    * any row of a tie run carries the same value.
    *
    * SCALE BOUND: the rank window sorts each event type's values on
    * ONE reducer — exact order statistics require a total order per
    * type. Fine for any realistic #event_types × per-type volume, but
    * a 100 TB corpus with one hot type pins that type's sort on a
    * single task: use [[valuePercentilesApprox]] there (mergeable
    * sketch, no global sort; this exact variant stays the oracle).
    */
  def valuePercentiles(events: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val w = Window
      .partitionBy(col("event_type")).orderBy(col("value"))
    val wAll = Window
      .partitionBy(col("event_type"))
    // null values are excluded outright: engines disagree on null sort
    // position (Spark NULLS FIRST vs others' NULLS LAST), and a
    // percentile of nulls is meaningless anyway
    val ranked = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
    val aggs = ps.map { p =>
      max(when(col("rn") === ceil(col("n") * p), col("value")))
        .as(s"p${(p * 100).toInt}")
    }
    ranked.groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("event_type"))
  }
  /** EXACT percentiles without a per-type global sort — distributed
    * MSD radix select over the order-preserving IEEE bit key
    * ([[graft.functions.DoubleBits]]). Identical output to
    * [[valuePercentiles]] (same `ceil(p·n)` order-statistic pick, same
    * actual values — no interpolation), but the scale shape is
    * different: instead of sorting each event type's values on one
    * reducer, each refinement level is ONE partial-aggregable
    * histogram pass — `groupBy(target, top-10-bits-of-suffix).count`,
    * a map-side-combining aggregate whose shuffle carries at most
    * targets × 1024 rows — and the driver walks O(1024) counts to pick
    * each target's next 10-bit prefix. Levels repeat until a target's
    * candidate population fits `windowMaxRows`, then one bounded
    * per-target window picks the exact value. Six levels resolve 60 of
    * the key's 64 bits, so candidates are ≤16 DISTINCT values even in
    * the worst case; only a mega-run of literally equal doubles can
    * keep the terminal window large (ties are unsplittable by any
    * method — the pick is then the shared value regardless of order).
    *
    * Driver state: O(#types × |ps|) targets + one O(targets × 1024)
    * histogram per level — counts, never rows (the bounded-collect
    * contract the rest of the engine follows).
    */
  def valuePercentilesDistributed(events: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      windowMaxRows: Long = 4096L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val vals = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .withColumn("u", graft.functions.DoubleBits.orderableBits(col("value")))
    // the refinement loop below runs one driver-collected histogram per
    // level, each a full pass over vals — LAZILY persist the narrow
    // (type, value, u) projection the moment a second pass is needed,
    // so levels past the first read the cache (MEMORY_AND_DISK: at
    // cluster scale a 3-column projection of the input is the standard
    // working set of any multi-pass selection) while the
    // resolves-at-level-0 case pays no cache materialization. Released
    // before the terminal pick, which recomputes vals once. Input-scan
    // accounting of the lazy trade: 2 full scans when level 0 resolves
    // everything (the common case; eager persist also paid 2 but added
    // the cache write), 3 when the loop runs (level-0 uncached +
    // cache-materializing first level + terminal) with every deeper
    // level a cache read — depth-bounded either way, same treatment as
    // [[userSpendDecilesDistributed]].
    var valsPersisted = false
    // ONE fused pass yields both the per-type counts AND the level-0
    // histogram: per-type n is just the sum of its level-0 bins, so a
    // separate counts aggregate would scan the input once more for
    // information the histogram already carries. Every target walks
    // its level-0 bins immediately — the level loop below always runs
    // prefixed (which also removes the shift-by-64 level-0 special
    // case: a Java shift by 64 is a shift by 0).
    def walkBins(bins: Seq[(Long, Long)], k0: Long): (Long, Long, Long) = {
      // (bin picked, rank within it, its population)
      var k = k0
      var picked = -1L
      var pickedCount = 0L
      for ((bin, c) <- bins if picked < 0)
        if (k > c) k -= c else { picked = bin; pickedCount = c }
      (picked, k, pickedCount)
    }
    val hist0 = vals.groupBy(col("event_type"),
        expr("shiftrightunsigned(u, 54)").as("bin"))
      .count().collect()
      .groupBy(r => Option(r.getString(0)))
      .map { case (typ, rows) =>
        typ -> rows.map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1).toSeq }
    final case class Target(id: Int, typ: Option[String], pi: Int,
        var k: Long, var prefix: Long, var level: Int, var done: Boolean)
    // rank targets: k-th smallest (1-based), k = ceil(p·n) — the same
    // double-multiply-then-ceil both the window variant and the oracle
    // compute, so tie/rounding behavior is identical
    val targets = (for {
      ((typ, bins), ti) <- hist0.toSeq.zipWithIndex
      (p, pi) <- ps.zipWithIndex
    } yield {
      val n = bins.map(_._2).sum
      val (bin, k, c) = walkBins(bins, math.ceil(n * p).toLong)
      Target(ti * ps.size + pi, typ, pi, k, bin, 1, c <= windowMaxRows)
    }).toArray
    var level = 1
    val MaxLevels = 6 // 60 bits resolved; ≤16 distinct values remain
    // try/finally, not straight-line release: a failed collect inside
    // the loop (task failure, cancellation) must not leak the persisted
    // projection for the session lifetime — the leaked:0 invariant
    // Bench asserts (review-caught; planSpendBins had the guard)
    try while (level < MaxLevels && targets.exists(!_.done)) {
      if (!valsPersisted) { vals.persist(); valsPersisted = true }
      val active = targets.filter(!_.done)
      val tdf = active.map(t => (t.id, t.typ.orNull, t.prefix))
        .toSeq.toDF("t_id", "t_type", "t_prefix")
      val prefShift = 64 - 10 * level   // bits already fixed
      val fineShift = 64 - 10 * (level + 1) // this level's 10-bit bin
      // null-safe type match: NULL is a legitimate group key (the
      // window variant and the oracle both emit a NULL-type row); a
      // plain === would strand the null target with an empty histogram
      val joinCond = (vals("event_type") <=> col("t_type")) &&
        expr(s"shiftrightunsigned(u, $prefShift)") === col("t_prefix")
      val hist = vals.join(broadcast(tdf), joinCond)
        .groupBy(col("t_id"),
          expr(s"shiftrightunsigned(u, $fineShift)")
            .bitwiseAND(lit(1023L)).as("bin"))
        .count()
        .collect()
        .groupBy(_.getInt(0))
        .map { case (id, rows) =>
          id -> rows.map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1).toSeq }
      for (t <- active) {
        val (bin, k, c) = walkBins(hist(t.id), t.k)
        t.k = k
        t.prefix = (t.prefix << 10) | bin
        t.level = level + 1
        if (c <= windowMaxRows) t.done = true
      }
      level += 1
    } finally if (valsPersisted) vals.unpersist(blocking = false)
    // terminal pick: candidates per target are its resolved-prefix rows
    // (bounded by windowMaxRows / 16 distinct values), one bounded
    // window each — partitioned per target, never per whole type
    val tf = broadcast(targets.map(t =>
        (t.id, t.typ.orNull, t.pi, t.k, t.prefix, 64 - 10 * t.level))
      .toSeq.toDF("t_id", "t_type", "t_pi", "t_k", "t_prefix", "t_shift"))
    // equi-join discipline (same fix as the decile bin assignment): a
    // key expression shiftrightunsigned(u, t_shift) with t_shift from
    // the target table has no extractable join keys and would plan a
    // BroadcastNestedLoopJoin evaluating every row against every
    // target. Each row instead explodes one probe per DISTINCT target
    // shift (≤6) and the join matches on the (shift, truncated-key)
    // pair plus the null-safe type — a broadcast hash join. A row may
    // legitimately match several targets (one per percentile whose
    // candidate window covers it); that multiplicity is identical to
    // the old predicate's.
    // empty-input guard: zero targets (no non-null values at all) would
    // make probeArr an array() of NullType and the probe.sh field
    // reference fail analysis — any valid shift keeps the degenerate
    // plan analyzable; it joins against an empty target table anyway
    val shifts = {
      val ss = targets.map(t => 64 - 10 * t.level).distinct.sorted.toSeq
      if (ss.isEmpty) Seq(4) else ss
    }
    val probeArr = array(shifts.map(s =>
      struct(lit(s).as("sh"),
        expr(s"shiftrightunsigned(u, $s)").as("k"))): _*)
    val probed = vals.withColumn("probe", explode(probeArr))
    val cond = (probed("event_type") <=> tf("t_type")) &&
      col("probe.sh") === col("t_shift") &&
      col("probe.k") === col("t_prefix")
    // order the terminal window by VALUE, never by the raw key: u is
    // unsigned-orderable, and a sign-spanning partition under SIGNED
    // long order would rank positives before negatives; value order
    // equals unsigned-u order by construction (NaN last, -0.0 before
    // 0.0 in both)
    val w = Window.partitionBy(col("t_id")).orderBy(col("value"))
    val picked = probed.join(tf, cond)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === col("t_k"))
    val aggs = ps.zipWithIndex.map { case (p, pi) =>
      max(when(col("t_pi") === pi, col("value")))
        .as(s"p${(p * 100).toInt}")
    }
    picked.groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("event_type"))
  }

  /** Approximate companion of [[valuePercentiles]] for skew-prone
    * corpora: `percentile_approx` is a mergeable sketch aggregate —
    * map-side partials then one shuffle of fixed-size sketches per
    * type, no per-type global sort — so a hot event type cannot pin a
    * single reducer. Rank error is bounded at n/`accuracy`. Same
    * output schema as the exact variant, which remains the oracle
    * query (sketch merge order makes approx results hash-unstable
    * across engines).
    */
  def valuePercentilesApprox(events: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000): DataFrame =
    valuePercentilesApproxCore(events, ps, accuracy)
      .orderBy(col("event_type"))

  /** The sketch aggregate without the presentation sort — shared with
    * [[graft.streaming.StreamingPercentiles]], where a global sort is
    * only legal in complete output mode (and pointless per
    * micro-batch). Every expression here is streaming-safe: one
    * stateful groupBy whose state is a fixed-size mergeable sketch per
    * event type.
    */
  private[graft] def valuePercentilesApproxCore(events: DataFrame,
      ps: Seq[Double], accuracy: Int): DataFrame = {
    val qs = percentile_approx(
      col("value"), typedLit(ps), lit(accuracy)).as("qs")
    events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(qs)
      .select(col("event_type") +: ps.zipWithIndex.map { case (p, i) =>
        element_at(col("qs"), i + 1).as(s"p${(p * 100).toInt}") }: _*)
  }

  /** Deterministic approximate percentiles via a FIXED-WIDTH
    * histogram — the oracle-checkable scale variant of
    * [[valuePercentiles]] (the `percentile_approx` sketch above stays
    * for streaming, where this two-pass shape is illegal; its
    * KLL-style merge order is engine-internal, whereas every number
    * here is pinned IEEE arithmetic the DuckDB oracle replays
    * hash-exactly):
    *
    *   pass 1  per-type `min/max/count` (exact);
    *   pass 2  bin counts over `bins` equal widths (integers);
    *   pick    the bin holding ordered position `ceil(p·n)` (same
    *           rank convention as the exact variant) via a cumulative
    *           sum over the BIN table, then linear interpolation
    *           inside it: `vmin + (bin + (t - cum_before)/cnt)·width`.
    *
    * Value error is bounded by one bin width `(max-min)/bins` —
    * unlike the sketch there is NO rank-error guarantee under heavy
    * in-bin skew, which is the price of determinism; widen `bins` to
    * tighten. SCALE: two scans, then state that is `bins × types`
    * rows REGARDLESS of input size — the cumulative window sorts
    * bins, not values, so a hot type costs one 1024-row task, never a
    * per-type value sort; both scans' aggregates are map-side-partial.
    * All arithmetic is division/multiply/add on doubles (each IEEE-
    * correctly-rounded, no transcendentals), so engines agree bitwise.
    *
    * With `domain = Some((lo, hi))` the min/max pre-scan disappears
    * entirely — ONE scan, one map-side-partial aggregate to
    * `bins × types` rows, with per-type totals recovered from the bin
    * counts themselves (a window over the BIN table, not the data).
    * This is the 100 TB mode: a caller who knows the metric's domain
    * (they usually do — it is their metric) pays a single pass.
    * Out-of-domain values CLAMP into the end bins, so hash-exactness
    * vs the oracle holds for any data; only accuracy degrades, and
    * only for the clamped tail (the estimate can never leave
    * `[lo, hi]`). Bin width is the fixed constant `(hi-lo)/bins`.
    */
  def valuePercentilesHistogram(events: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99), bins: Int = 1024,
      domain: Option[(Double, Double)] = None): DataFrame = {
    val vals = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    // (bin-table, vmin, width) — adaptive: exact min/max pre-scan;
    // domain: literals, totals folded back from the bin counts
    val (cum, vmin, width) = domain match {
      case None =>
        // adaptive mode must see only FINITE values: one NaN makes
        // vmax (and so width) NaN — Spark then bins every row of the
        // type at 0 and every percentile NaN, while the oracle's
        // CAST(floor(NaN)) CRASHES; one ±Inf does the same with Inf.
        // The domain branch below handles non-finite values by
        // comparison-clamping; here they carry no rank information
        // (an adaptive domain derived from them is meaningless), so
        // they are excluded from the ranked population. Mirrored in
        // the oracle (NOT isnan AND strict ±inf bounds).
        val finite = vals.filter(!isnan(col("value")) &&
          col("value") > lit(Double.NegativeInfinity) &&
          col("value") < lit(Double.PositiveInfinity))
        val stats = finite.groupBy(col("event_type"))
          .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"),
            count(lit(1)).as("n"))
          .withColumn("width",
            (col("vmax") - col("vmin")) / lit(bins.toDouble))
        // per-type scalars: broadcast both consumers (bin pass + pick)
        val statsB = broadcast(stats)
        val binned = finite.join(statsB, Seq("event_type"))
          .withColumn("bin",
            when(col("width") === 0.0, lit(0L))
              .otherwise(least(lit((bins - 1).toLong),
                floor((col("value") - col("vmin")) / col("width")))))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("cnt"))
        val wc = Window.partitionBy(col("event_type")).orderBy(col("bin"))
        val c = binned
          .withColumn("cum", sum(col("cnt")).over(wc))
          .withColumn("cumb", col("cum") - col("cnt"))
          .join(statsB, Seq("event_type"))
        (c, col("vmin"), col("width"))
      case Some((lo, hi)) =>
        require(hi > lo, s"degenerate histogram domain [$lo, $hi]")
        val w = (hi - lo) / bins // one double constant, spliced verbatim
        // end-bin clamp via COMPARISONS, never a cast of an extreme:
        // floor() on ±Inf/NaN/|x|≥2^63 is engine-defined (Spark's f2l
        // saturates, DuckDB's CAST throws — a crash, not a hash
        // mismatch), so every value reaching floor is already inside
        // (0, bins-1). NaN lands in the TOP bin on both engines: both
        // Spark SQL and DuckDB define NaN = NaN and NaN greater than
        // every other double in comparisons (documented semantics,
        // not IEEE), so `s >= bins-1` catches it identically.
        val s = (col("value") - lit(lo)) / lit(w)
        val binned = vals
          .withColumn("bin",
            when(s >= lit((bins - 1).toDouble), lit((bins - 1).toLong))
              .when(s > lit(0.0), floor(s))
              .otherwise(lit(0L)))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("cnt"))
        val wc = Window.partitionBy(col("event_type")).orderBy(col("bin"))
        val c = binned
          .withColumn("cum", sum(col("cnt")).over(wc))
          .withColumn("cumb", col("cum") - col("cnt"))
          .withColumn("n",
            sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
        (c, lit(lo), lit(w))
    }
    val frac = (col("t") - col("cumb")).cast("double") / col("cnt").cast("double")
    val hits = cum
      .withColumn("p", explode(typedLit(ps)))
      .withColumn("t", ceil(col("n") * col("p")))
      .filter(col("cumb") < col("t") && col("t") <= col("cum"))
      .withColumn("est",
        when(width === 0.0, vmin)
          .otherwise(vmin + ((col("bin").cast("double") + frac) * width)))
    val picks = ps.map { p =>
      max(when(col("p") === p, col("est"))).as(s"p${(p * 100).toInt}")
    }
    hits.groupBy(col("event_type"))
      .agg(picks.head, picks.tail: _*)
      .orderBy(col("event_type"))
  }

  /** Daily volume-spike detection per event type: a day is a spike
    * when its count exceeds `factor`× the mean of the trailing
    * `window` OBSERVED days (a ROWS frame over the per-day aggregate —
    * calendar gaps are NOT densified, so after a quiet period the
    * baseline is the last `window` ACTIVE days however old; densify
    * upstream if zero-days should decay the baseline). The flag is
    * computed in INTEGER cross-multiplied form
    * (`n · prev_cnt > factor · prev_sum`) rather than a float
    * mean/stddev — division-free, so both engines agree bit-for-bit
    * (a stddev z-score folds floats in engine-specific order and can
    * never be a hash oracle). Days with no trailing history flag
    * false. One shuffle on event_type shared by the daily aggregate
    * and the trailing frame; per-type window length is bounded by
    * calendar days.
    */
  def dailySpikes(events: DataFrame, factor: Int = 2,
      window: Int = 7): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-window, -1)
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_sum",
        coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("prev_cnt", count(col("n")).over(w))
      .withColumn("is_spike",
        col("prev_cnt") > 0 &&
          col("n") * col("prev_cnt") > lit(factor.toLong) * col("prev_sum"))
      .orderBy(col("event_type"), col("day"))
  }

  def typeStats(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      countDistinct(col("user_id")).as("n_users"),
      sum(Money.tryDec(col("value"))).cast("double").as("sum_value"),
      unix_micros(min(col("ts"))).as("first_us"),
      unix_micros(max(col("ts"))).as("last_us"))
      .orderBy(col("event_type"))

  /** Per-user inter-event gap statistics — the lag/lead analytic shape
    * reduced to a grouped summary. One shuffle on user_id shared by
    * the lag window and the aggregate; the average divides identical
    * exact BIGINT sums in both engines. Users with a single event
    * surface with n_gaps = 0 and NULL gap stats (engines agree: sum
    * and max of an empty set are NULL, as is NULL / 0).
    */
  def interEventGaps(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(col("gap_us")).as("n_gaps"),
        sum(col("gap_us")).as("sum_gap_us"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        (sum(col("gap_us")).cast("double") /
          count(col("gap_us")).cast("double")).as("avg_gap_us"))
      .orderBy(col("user_id"))
  }

  /** Rolling-frame aggregate: each event's sum/count of `value` over
    * the user's previous `frame` events and itself (ROWS BETWEEN
    * `frame` PRECEDING AND CURRENT ROW). Output is event-cardinality
    * and DELIBERATELY unsorted — a presentation orderBy on a 100 TB
    * result is a useless global range exchange; consumers that need
    * order sort their (smaller) downstream result. Frame sums stay in
    * exact decimal until the output cast.
    */
  def rollingValue(events: DataFrame, frame: Int = 3): DataFrame = {
    val w = Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-frame, Window.currentRow)
    events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"),
      sum(Money.tryDec(col("value"))).over(w).cast("double")
        .as("rolling_sum"),
      count(lit(1)).over(w).as("n_in_frame"))
  }

  /** Users ranked and bucketed by total spend — dense_rank + ntile
    * over the aggregated (≈ #users rows) frame. The global window IS
    * a single-reducer total order, which is fine precisely because it
    * runs AFTER the grouped aggregate collapsed event cardinality to
    * user cardinality; the same query ranking raw events would not
    * scale. Rank ties (equal totals) are broken by user_id so both
    * engines assign identical bucket boundaries.
    */
  def userSpendDeciles(events: DataFrame, buckets: Int = 10): DataFrame = {
    val w = Window
      .orderBy(col("total_dec").desc, col("user_id"))
    events.groupBy(col("user_id"))
      .agg(sum(Money.tryDec(col("value"))).as("total_dec"))
      .select(col("user_id"),
        col("total_dec").cast("double").as("total_value"),
        dense_rank().over(w).as("spend_rank"),
        ntile(buckets).over(w).as("decile"))
      .orderBy(col("user_id"))
  }

  /** [[userSpendDeciles]] without the global single-reducer window —
    * the distributed-rank formulation. The total order (spend DESC,
    * user_id ASC) is mapped to an ascending radix key (the DECIMAL's
    * unscaled cents, complemented — exact where double bits would
    * collide past 2^53 cents), and the global rank
    * decomposes into ONE 1024-bin histogram (a map-side-combining
    * aggregate; the driver holds 1024 row counts — counts, never rows)
    * plus per-BIN windows: global rank = bin-prefix rows + within-bin
    * row_number. The window variant's `dense_rank` orders by
    * (total DESC, user_id) — a UNIQUE key — so it equals the row
    * position and needs no separate distinct bookkeeping. `ntile` is
    * then pure arithmetic on the global rank — identical bucket
    * boundaries to the window variant, bucket sizes differing by at
    * most 1 with the first n mod k buckets larger.
    *
    * Scale bound: window parallelism is the number of OCCUPIED bins
    * and the single-reducer unit shrinks from all users to one bin's
    * users. Spend totals cluster in few exponents, so the top 10 key
    * bits may occupy few bins — which is why bins exceeding
    * `binMaxRows` RECURSE on the next 10 key bits exactly like
    * [[valuePercentilesDistributed]]'s level loop (one extra
    * map-side-combining histogram per level, driver state one O(1024)
    * count array per hot bin — counts, never rows) until every final
    * bin fits or 60 bits are resolved. Past 60 bits a bin holds ≤16
    * DISTINCT keys, and what keeps it large then is ties — equal
    * totals — which NO radix depth can split; its window cost is the
    * tie cardinality, the irreducible minimum.
    */
  /** The bin-refinement planner behind [[userSpendDecilesDistributed]],
    * exposed for its spec: returns the final disjoint prefix bins as
    * (prefix, level, rows), where a level-L bin covers the keys whose
    * top 10·L bits equal `prefix`. Every returned bin either fits
    * `binMaxRows` or sits at the 60-bit refinement floor.
    */
  private[graft] def planSpendBins(totals: DataFrame,
      binMaxRows: Long): Seq[(Long, Int, Long)] = {
    val MaxLevels = 6 // 60 bits; ≤16 distinct keys remain below a bin
    val spark = totals.sparkSession
    import spark.implicits._
    val l1 = totals
      .groupBy(expr("shiftrightunsigned(bkey, 54)").as("p"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), 1, r.getLong(1))).toSeq
    val done = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    var (hot, fit) = l1.partition(_._3 > binMaxRows)
    done ++= fit
    var level = 1
    // LAZY persist: the common no-skew case resolves at level 1 from
    // the single uncached histogram above and must not pay a cache
    // materialization; only when hot bins force a second pass does the
    // user-cardinality aggregate get persisted (levels ≥3 then read
    // the cache instead of re-aggregating raw events). Released before
    // returning; the caller's terminal plan recomputes totals once.
    // Scan accounting: 2 events aggregations when level 1 resolves
    // everything, 3 when the loop runs (level-1 uncached + cache-
    // materializing level-2 + terminal) — depth-bounded either way.
    var persisted = false
    try {
      while (hot.nonEmpty && level < MaxLevels) {
        if (!persisted) { totals.persist(); persisted = true }
        val parentShift = 64 - 10 * level
        val fineShift = 64 - 10 * (level + 1)
        val hdf = broadcast(hot.map(_._1).toDF("h_prefix"))
        val sub = totals.join(hdf,
            expr(s"shiftrightunsigned(bkey, $parentShift)") === col("h_prefix"))
          .groupBy(col("h_prefix"),
            expr(s"shiftrightunsigned(bkey, $fineShift)")
              .bitwiseAND(lit(1023L)).as("sub"))
          .agg(count(lit(1)).as("n")).collect()
          .map(r => ((r.getLong(0) << 10) | r.getLong(1), level + 1, r.getLong(2)))
          .toSeq
        level += 1
        if (level < MaxLevels) {
          val (h, f) = sub.partition(_._3 > binMaxRows)
          hot = h; done ++= f
        } else { hot = Nil; done ++= sub } // 60-bit floor: ties only below
      }
    } finally if (persisted) totals.unpersist(blocking = false)
    done.toSeq
  }

  /** Per-user spend totals with the exact radix rank key — the input
    * both [[planSpendBins]] and the rank join consume. */
  private[graft] def spendTotalsWithKey(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(sum(Money.tryDec(col("value"))).as("total_dec"))
      .withColumn("bkey",
        // EXACT radix key from the decimal's unscaled cents (≤18
        // digits fits a long losslessly — a double key would collide
        // totals differing only beyond 2^53 cents and mis-rank them
        // against the decimal-ordered window variant; totals past
        // 2^63 cents would overflow the cast and fail loudly under
        // ANSI — an explicit bound, not silent corruption). x ^ MAX_VALUE
        // is unsigned-ascending == total DESCENDING (x ^ MIN would be
        // ascending; the extra complement flips it). A NULL total
        // (all-null-value users only) takes the max key, matching
        // DESC NULLS LAST; it cannot collide (its preimage is an
        // unreachable 17-digit-overflow total).
        coalesce(
          (col("total_dec") * 100).cast("long")
            .bitwiseXOR(lit(Long.MaxValue)),
          lit(-1L)))

  def userSpendDecilesDistributed(events: DataFrame,
      buckets: Int = 10, binMaxRows: Long = 1000000L): DataFrame = {
    val totals = spendTotalsWithKey(events)
    // caching across refinement levels lives INSIDE planSpendBins and
    // is lazy — the no-skew case pays no cache materialization
    val bins = planSpendBins(totals, binMaxRows)
    // disjoint variable-depth bins order by their unsigned key-range
    // start (prefix left-aligned to 64 bits); driver prefix sums turn
    // counts into each bin's global row offset
    val ordered = bins.sortWith((a, b) =>
      java.lang.Long.compareUnsigned(
        a._1 << (64 - 10 * a._2), b._1 << (64 - 10 * b._2)) < 0)
    val nTotal = ordered.map(_._3).sum
    var rows = 0L
    val prefix = ordered.zipWithIndex.map { case ((p, lvl, n), i) =>
      val out = (i, lvl, p, rows); rows += n; out
    }
    val spark = events.sparkSession
    import spark.implicits._
    val pdf = broadcast(
      prefix.toDF("bin_id", "b_level", "b_prefix", "row_prefix"))
    // the bin-assignment join must stay an EQUI-join: a key expression
    // referencing both sides (shiftrightunsigned(bkey, b_shift) with
    // b_shift from the bin table) gives Catalyst no extractable join
    // keys and plans a BroadcastNestedLoopJoin — every totals row
    // against every bin (review-caught). Instead each totals row
    // explodes into one probe struct per OCCUPIED level (≤6, usually
    // 1–2), and the join matches on the (level, truncated-key) PAIR —
    // a broadcast hash join. Bin disjointness guarantees exactly one
    // probe survives per user, so the inner join is also the filter
    // that discards the other copies.
    val levels = {
      val ls = ordered.map(_._2).distinct.sorted
      if (ls.isEmpty) Seq(1) else ls // empty corpus: any valid probe shape
    }
    val probeArr = array(levels.map(l =>
      struct(lit(l).as("lvl"),
        expr(s"shiftrightunsigned(bkey, ${64 - 10 * l})").as("k"))): _*)
    // signed orderBy on bkey is safe HERE (unlike a sign-spanning
    // window): every bin fixes ≥10 top key bits, sign bit included,
    // so signed and unsigned order agree within every bin
    val w = Window.partitionBy(col("bin_id"))
      .orderBy(col("bkey"), col("user_id"))
    val base = nTotal / buckets
    val rem = nTotal % buckets
    val ranked = totals
      .withColumn("probe", explode(probeArr))
      .join(pdf, col("probe.lvl") === col("b_level") &&
        col("probe.k") === col("b_prefix"))
      .withColumn("r", col("row_prefix") + row_number().over(w))
    val decile =
      when(col("r") <= lit(rem * (base + 1)),
        (col("r") + base) / (base + 1))
        .otherwise(lit(rem) + (col("r") - rem * (base + 1) + base - 1) / base)
    ranked.select(col("user_id"),
        col("total_dec").cast("double").as("total_value"),
        col("r").cast("int").as("spend_rank"),
        decile.cast("int").as("decile"))
      .orderBy(col("user_id"))
  }

  /** As-of join (the operator Spark lacks natively): each probe event
    * is matched to the user's most recent build event at-or-before its
    * timestamp. Implemented as the union-merge: tag both sides, union,
    * one (user_id) shuffle + per-user sort, and `last(_, ignoreNulls)`
    * over an unbounded-preceding frame carries the latest build row
    * forward into each probe row. This is THE scalable as-of shape —
    * no per-row range probe, no broadcast requirement, no candidate
    * blowup; cost is one sort-merge pass and skew is bounded by
    * per-user volume. Ties: a build at exactly the probe's timestamp
    * matches (build sorts first via the side tag); among equal-ts
    * builds the highest event_id wins — deterministic in both engines.
    * Unmatched probes survive with NULL build columns (left as-of).
    */
  def asOfLastPrior(events: DataFrame, probeType: String = "click",
      buildType: String = "purchase"): DataFrame = {
    val builds = events.filter(col("event_type") === buildType)
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("side"), col("event_id").as("build_id"),
        unix_micros(col("ts")).as("build_ts_us"))
    val probes = events.filter(col("event_type") === probeType)
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("side"), lit(null).cast("long").as("build_id"),
        lit(null).cast("long").as("build_ts_us"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
    builds.unionAll(probes)
      .withColumn("asof_build_id", last(col("build_id"), true).over(w))
      .withColumn("asof_build_ts_us", last(col("build_ts_us"), true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id").as("probe_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("asof_build_id"), col("asof_build_ts_us"),
        (unix_micros(col("ts")) - col("asof_build_ts_us")).as("gap_us"))
  }

  /** Error-burst incidents — the gaps-and-islands shape: busy minutes
    * (≥ `minErrors` error events) merge into maximal intervals,
    * bridging gaps of up to `bridgeMinutes` quiet minutes. The island
    * assignment (lag + running sum) windows over the BUSY-MINUTE
    * frame, whose cardinality is bounded by wall-clock minutes — the
    * single-reducer global order is safe for the same post-aggregate
    * reason as [[userSpendDeciles]], and at 100 TB stays bounded by
    * the time range, not the event volume.
    */
  def errorIncidents(events: DataFrame, minErrors: Int = 2,
      bridgeMinutes: Int = 5): DataFrame = {
    val w = Window.orderBy(col("m_start"))
    val wRun = w.rowsBetween(
      Window.unboundedPreceding,
      Window.currentRow)
    events.filter(col("event_type") === "error")
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n_errors"))
      .filter(col("n_errors") >= minErrors)
      .select(col("w.start").as("m_start"), col("n_errors"))
      .withColumn("prev_start", lag(col("m_start"), 1).over(w))
      .withColumn("new_island",
        when(col("prev_start").isNull || col("m_start") >
          col("prev_start") + expr(s"INTERVAL ${bridgeMinutes + 1} MINUTES"),
          1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(wRun))
      .groupBy(col("island"))
      .agg(min(col("m_start")).as("i_start"),
        (max(col("m_start")) + expr("INTERVAL 1 MINUTE")).as("i_end"),
        count(lit(1)).as("n_busy_minutes"),
        sum(col("n_errors")).as("n_errors"))
      .select(col("i_start"), col("i_end"), col("n_busy_minutes"),
        col("n_errors"))
  }

  /** Banded range join: all events falling inside the (variable-
    * length) incident intervals. The scalable range-join shape: each
    * interval explodes into the minute buckets it covers, events
    * project their own minute bucket, and the join is a plain
    * EQUI-join on the bucket with the range predicate as a residual —
    * never an inequality-only join (which Spark can only execute as a
    * nested-loop against a broadcast side). Work is linear in
    * events + covered minutes; bucket skew is bounded by per-minute
    * event volume. For these minute-ALIGNED intervals the residual is
    * vacuously true — it stays in the join condition because the same
    * plan serves non-aligned intervals, and Catalyst evaluates it as
    * a cheap post-join filter.
    */
  def incidentEvents(events: DataFrame, incidents: DataFrame): DataFrame = {
    val buckets = incidents.withColumn("bucket",
      explode(sequence(col("i_start"),
        col("i_end") - expr("INTERVAL 1 MINUTE"), expr("INTERVAL 1 MINUTE"))))
    events
      .withColumn("bucket", date_trunc("minute", col("ts")))
      .join(buckets, Seq("bucket"))
      .filter(col("ts") >= col("i_start") && col("ts") < col("i_end"))
      .groupBy(col("i_start"), col("i_end"), col("n_busy_minutes"),
        col("n_errors"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("i_start")).as("incident_start_us"),
        unix_micros(col("i_end")).as("incident_end_us"),
        col("n_busy_minutes"), col("n_errors"), col("n_events"),
        col("n_users"))
      .orderBy(col("incident_start_us"))
  }

  /** Semi-structured property extraction: parse the JSON `props`
    * payload with an EXPLICIT schema (`from_json` + schema string —
    * never schema inference, which costs a discovery scan and makes
    * the plan data-dependent) and aggregate the typed field. The
    * parse is a codegen'd scan-bound projection; malformed or missing
    * JSON yields NULL, which COUNT(field)/SUM skip identically in
    * both engines.
    */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), "k BIGINT",
          Map.empty[String, String]).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Event-type counts pivoted to one column per type. The pivot
    * VALUES ARE EXPLICIT: an unlisted pivot runs an extra collect job
    * to discover the domain (a full scan before the real one) and
    * makes the output schema data-dependent — at scale, always pin
    * the column set. Empty cells fill 0 so both engines agree on the
    * no-events case.
    */
  val EventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  // unordered core shared by both public surfaces: EliminateSorts
  // cannot remove a sort below an Expand (unpivot) node, so baking the
  // presentation orderBy in here would make eventTypeLong pay a dead
  // range-exchange + sort under its own
  private def pivotUnordered(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes)

  def eventTypePivot(events: DataFrame): DataFrame =
    pivotUnordered(events).orderBy(col("user_id"))

  /** The pivot melted back to long form — `unpivot` keeps explicit
    * zero rows (one row per user × type), which is the point: the
    * wide↔long round trip is lossless, unlike the original sparse
    * groupBy. */
  def eventTypeLong(events: DataFrame): DataFrame =
    pivotUnordered(events)
      .unpivot(Array(col("user_id")), EventTypes.map(col).toArray,
        "event_type", "n")
      .orderBy(col("user_id"), col("event_type"))

  /** Event-type transition matrix — the Markov-chain summary of user
    * behavior sequences (the aggregate next-event-prediction training
    * data is mined from). One shuffle on user_id feeds the `lead`
    * window (ties within a timestamp broken by event_id, so both
    * engines see identical successor pairs); the transition aggregate
    * then collapses event cardinality to at most |types|² rows, which
    * is why the per-source-type probability window that follows is
    * safe — it ranges over a frame bounded by the type-vocabulary
    * size, never the corpus. `p_next` divides two exact BIGINTs (one
    * IEEE-correctly-rounded division per output row — the
    * [[CorpusOps.sourceMixture]] float rule), so the matrix
    * hash-matches across engines bit-for-bit.
    */
  def typeTransitions(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val perSource = Window.partitionBy(col("event_type"))
    events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n_trans"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("p_next",
        col("n_trans").cast("double") /
          sum(col("n_trans")).over(perSource).cast("double"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** Set operations over event-type audiences: users who did both /
    * only A / only B. INTERSECT and EXCEPT compile to distinct
    * semi/anti joins on the (already-distinct) user sets — one
    * user_id shuffle each, no row blowup.
    */
  def audienceSetOps(events: DataFrame, typeA: String = "click",
      typeB: String = "purchase"): DataFrame = {
    def users(t: String) =
      events.filter(col("event_type") === t).select(col("user_id")).distinct()
    val a = users(typeA)
    val b = users(typeB)
    def counted(df: DataFrame, label: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(label).as("op"), col("n_users"))
    counted(a.intersect(b), "a_and_b")
      .unionAll(counted(a.except(b), "a_only"))
      .unionAll(counted(b.except(a), "b_only"))
      .orderBy(col("op"))
  }
}
