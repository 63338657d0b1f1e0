package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-type transitions — the incremental twin of
  * [[graft.operators.EventAnalytics.typeTransitions]]: per user, each
  * arriving event pairs with the previous one into a (from, to)
  * transition row; a downstream aggregate (streaming or batch) turns
  * the pair stream into the Markov matrix.
  *
  * The mergeRuns discipline: the per-batch pairing is a PURE fold
  * ([[foldBatch]]) factored out of the state operator and property-
  * tested on its own; the `flatMapGroupsWithState` shell only loads /
  * stores the one-row-per-user state around it. Within a micro-batch,
  * rows fold in (ts, event_id) order — the batch operator's exact
  * lead tie-break — so any arrival order WITHIN a batch yields the
  * same pairs. Across batches the fold is replay-deterministic;
  * parity with the batch matrix is an identity whenever each user's
  * events arrive batch-ordered by (ts, event_id), the same in-order
  * contract the sessionization and as-of twins carry. A late
  * straggler (older than the user's stored last event) cannot be
  * retro-inserted without unbounded history, so it pairs in ARRIVAL
  * order — flagged by `out_of_order` on the emitted row rather than
  * silently miscounted.
  *
  * State: one (ts_us, event_id, event_type) triple per user — bounded
  * by user cardinality, the same budget the alive-key monitor carries
  * per key; [[transitionUpdatesWithTtl]] is the bounded-state variant
  * for an unbounded user space (the alive-key TTL pattern, same
  * eviction semantics).
  */
object StreamingTransitions {

  case class EventRow(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  case class LastEvent(tsUs: Long, eventId: Long, eventType: String)
  case class Transition(user_id: Long, event_type: String,
      next_type: String, out_of_order: Boolean)

  /** Pure per-batch fold: sort the batch by (ts_us, event_id), chain
    * from the carried last-event, return the emitted pairs and the
    * new state. `out_of_order` marks a pair whose successor arrived
    * with an event time at or before its predecessor's across a batch
    * boundary (within a batch the sort makes order exact; equal-ts
    * pairs inside a batch resolve by event_id, as in batch).
    */
  private[graft] def foldBatch(userId: Long, prev: Option[LastEvent],
      batch: Seq[EventRow]): (Seq[Transition], Option[LastEvent]) = {
    val sorted = batch.sortBy(e => (e.ts_us, e.event_id))
    var last = prev
    val out = Seq.newBuilder[Transition]
    sorted.foreach { e =>
      last.foreach { l =>
        val ooo = e.ts_us < l.tsUs ||
          (e.ts_us == l.tsUs && e.event_id < l.eventId)
        out += Transition(userId, l.eventType, e.event_type, ooo)
      }
      last = Some(LastEvent(e.ts_us, e.event_id, e.event_type))
    }
    (out.result(), last)
  }

  /** The stream of per-user transition pairs (Update mode). Accepts
    * the raw events frame in any of the fixture's ts encodings.
    *
    * A TIMESTAMP-LESS event (null ts — an in-contract dirty payload,
    * the degenerate gates null the whole column) is DROPPED: it has no
    * place on the user's event-time axis, and without the filter the
    * null would NPE the typed encoder's primitive ts_us field and kill
    * the WHOLE query on one corrupt row. The batch twin windows such
    * rows NULLS-FIRST — an arbitrary placement, not a contract worth
    * replicating; dropping follows the package's discipline for
    * unusable keys (the hot-key monitor drops null keys the same way).
    * Null user_id/event_id stay LOUD (ids are store corruption, the
    * documented policy).
    *
    * The drop is OBSERVABLE, not silent: an `observe` node named
    * `guardName` counts timestamp-less rows (`null_ts_events`) beside
    * the total (`events_seen`) — read from
    * `StreamingQueryProgress.observedMetrics`, the alive-key TTL
    * guard's pattern. A plan composing this operator twice must give
    * each instance its own `guardName` (observed-metric names are
    * query-unique). */
  def transitionUpdates(events: DataFrame,
      guardName: String = "transitions_ts_guard"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    graft.sources.EventsAsRecords.normalizeTs(events, "ts")
      .observe(guardName,
        count(when(col("ts").isNull, 1)).as("null_ts_events"),
        count(lit(1)).as("events_seen"))
      .filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[LastEvent]) =>
          val (pairs, next) = foldBatch(uid, state.getOption, rows.toSeq)
          next.foreach(state.update)
          pairs.iterator
      }
  }

  /** [[EventRow]] plus the raw event-time column: the TTL variant's
    * watermark attribute must survive into the typed stream (a
    * projection that drops it would fail the event-time-timeout
    * analysis check), so the row carries both the fold's `ts_us` and
    * the watermarked `ts` it was derived from. */
  case class EventRowT(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, ts: java.sql.Timestamp)

  /** [[transitionUpdates]] with bounded state for unbounded user
    * spaces — the alive-key TTL pattern
    * ([[StreamingTopicMetrics.aliveKeyUpdatesWithTtl]]): a user whose
    * last event's time falls `ttl` behind the watermark is evicted,
    * so state is bounded by users ACTIVE within the horizon, not by
    * all users ever seen. Eviction semantics: the forgotten user's
    * next event starts a fresh chain — it emits no transition (no
    * predecessor), exactly as if the user were new.
    *
    * CONTRACT — the price of bounded state, same as the alive-key
    * variant: events later than `watermarkDelay` behind the stream's
    * max event time are dropped BEFORE the fold, so a straggler past
    * that horizon neither pairs nor gets the `out_of_order` flag — it
    * is gone. Use [[transitionUpdates]] (unbounded state, every
    * arrival folds) when stragglers must be observed rather than
    * bounded away. Timestamp-less events are dropped in both variants
    * (no place on the event-time axis).
    */
  def transitionUpdatesWithTtl(events: DataFrame, ttl: java.time.Duration,
      watermarkDelay: String = "10 seconds",
      guardName: String = "transitions_ttl_ts_guard"): Dataset[Transition] = {
    require(!ttl.isNegative && !ttl.isZero,
      s"ttl must be positive, got $ttl (a zero timeout timestamp aborts " +
        "the streaming query inside the state function)")
    val spark = events.sparkSession
    import spark.implicits._
    graft.sources.EventsAsRecords.normalizeTs(events, "ts")
      .observe(guardName,
        count(when(col("ts").isNull, 1)).as("null_ts_events"),
        count(lit(1)).as("events_seen"))
      .filter(col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("ts"))
      .as[EventRowT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[EventRowT], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows
              .map(r => EventRow(r.user_id, r.ts_us, r.event_id, r.event_type))
              .toSeq
            val (pairs, next) = foldBatch(uid, state.getOption, batch)
            next.foreach(state.update)
            // the timeout must sit strictly beyond the current
            // watermark (and stay positive: saturate instead of
            // overflowing on effectively-infinite TTLs) — the
            // alive-key variant's exact arithmetic
            val maxEventMs =
              if (batch.isEmpty) 0L else batch.iterator.map(_.ts_us).max / 1000L
            val base = math.max(state.getCurrentWatermarkMs(), maxEventMs)
            val at = base + ttl.toMillis
            state.setTimeoutTimestamp(
              if (at <= base) Long.MaxValue else math.max(at, 1L))
            pairs.iterator
          }
      }
  }
}
