package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming operators over the event stream — the engine's
  * replacement for the reference's poll-every-2-minutes micro-batching
  * (/root/reference/sqs_sensor_dag.py:123-131): `Trigger.ProcessingTime`
  * gives the cadence, watermarks give bounded state, and all state lives
  * in the streaming checkpoint (never unbounded driver maps — SURVEY
  * §7.4). Every operator here is partition-parallel keyed state; at
  * 100 TB the state store shards with the shuffle partitioning.
  */
object EventStreams {

  /** One event row (mirrors the events table schema). */
  final case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

  /** Per-user running aggregate state for [[runningUserState]]. */
  final case class UserAgg(user_id: Long, n_events: Long, sum_value: Double, last_event_id: Long)

  /** Streaming twin of q18: tumbling 1-hour event-time windows with a
    * watermark bounding state; late rows beyond the delay are dropped,
    * finalized windows are emitted exactly once in append mode.
    */
  def hourlyWindowedCounts(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 2))).cast("double").as("sum_value"))
      .select(col("win.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming OHLC bars — the streaming twin of q127: per
    * (event_type, 1-hour tumbling window) the open/close value
    * (min_by/max_by over the same (ts, event_id) ordering struct as the
    * batch query — declarative aggregates, so they fold incrementally
    * in the state store), high/low, count, exact-decimal volume.
    * Watermark-bounded state, finalized bars emitted once in append
    * mode. Batch/stream parity is spec'd (same data ⇒ same bars as the
    * batch aggregation).
    */
  def ohlcBars(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("bar_open"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("bar_close"),
        max(col("value")).as("bar_high"),
        min(col("value")).as("bar_low"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(30, 2))).cast("double").as("volume"))
      .select(col("win.start").as("hour_start"), col("event_type"),
        col("bar_open"), col("bar_close"), col("bar_high"), col("bar_low"),
        col("n_events"), col("volume"))

  /** Event-time session windows (gap-based) per user — the streaming
    * twin of q49's batch sessionization, via the built-in session_window
    * (merging-window state, watermark-evicted).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes", watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))

  /** Custom keyed state via mapGroupsWithState: per-user running counter
    * + value sum + last event id, emitted on every update. The
    * `KeyValueGroupedDataset` state path for semantics the windowed aggs
    * can't express (SURVEY §2.6 streaming row).
    */
  def runningUserState(events: Dataset[EventRow]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(userId, 0L, 0.0, -1L))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserAgg(userId, acc.n_events + 1, acc.sum_value + e.value, math.max(acc.last_event_id, e.event_id))
          }
          state.update(next)
          next
      }
  }

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks within the preceding hour. Watermarks on BOTH sides
    * bound the buffered state; the interval condition lets Spark evict
    * clicks older than (purchase watermark - 1 hour). The streaming
    * counterpart of the batch as-of/range joins (q50/q51).
    */
  def purchaseClickJoin(
      purchases: DataFrame,
      clicks: DataFrame,
      watermarkDelay: String = "2 hours",
  ): DataFrame = {
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("p_ts"), col("click_id"), col("c_ts"))
  }

  /** Stream–static enrichment: left-join the unbounded stream against
    * a bounded dimension frame (the streaming twin of the pipeline's
    * broadcast enrichment step). Stateless on the stream side — every
    * micro-batch joins the CURRENT dim (re-read per batch if the dim
    * is a file source), unmatched keys keep null payloads instead of
    * dropping rows. The dim should be broadcast-sized; Spark plans a
    * broadcast hash join per micro-batch.
    */
  def enrichAgainstStatic(stream: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), "left")

  /** Buffered state for [[sessionPathsStream]]: the user's not-yet-
    * finalizable events (bounded by the watermark horizon — everything
    * older than watermark - gap has already been emitted and dropped).
    */
  final case class SessEvent(ts_us: Long, event_id: Long, event_type: String)
  final case class SessBuffer(buf: List[SessEvent])

  /** One closed session: q142's path semantics (first `pathLen` event
    * types in (ts, event_id) order, '>'-joined).
    */
  final case class ClosedSession(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, path: String)

  /** Streaming twin of q142's session-path mining, via
    * flatMapGroupsWithState + EventTimeTimeout — the state-API variant
    * the windowed aggs genuinely cannot express: session_window can
    * count, but a per-session ORDERED PAYLOAD (the journey path) needs
    * custom state. Per user, events buffer in keyed state; when the
    * watermark passes a session's last event + gap, NO arrival can
    * extend or merge it (any future event has ts >= watermark >= end +
    * gap, so it starts a later session) — the session is final and is
    * emitted EXACTLY ONCE with its path, then dropped from state. The
    * timeout re-fires the group at (last event + gap) even with no new
    * data, so quiet users still flush.
    *
    * Scale shape: state is partition-parallel keyed by user; per key it
    * holds the open-session tail, which the gap rule bounds for any
    * user who ever pauses. A key that NEVER pauses longer than the gap
    * (a bot heartbeating every minute) would otherwise grow its buffer
    * forever, so `maxSessionEvents` force-closes such a session at the
    * cap and starts fresh — the standard sessionizer trade (chopped
    * mega-sessions), deterministic under replay because the decision is
    * a pure function of the buffered state. Late events inside the
    * delay re-sort within the buffer (out-of-order arrivals can legally
    * merge two provisional gaps — which is exactly why closing must
    * wait for the watermark, not wall clock).
    *
    * Close condition is STRICT (`end + gap < watermark`): an event
    * carrying ts == watermark is not guaranteed dropped as late, and at
    * exactly end + gap the split rule (`> gap`) would still merge it —
    * `<=` could emit a session a legal arrival then extends (a
    * split-session / exactly-once violation at the boundary).
    */
  def sessionPathsStream(
      events: Dataset[EventRow],
      gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours",
      pathLen: Int = 8,
      maxSessionEvents: Int = 100000,
  ): Dataset[ClosedSession] = {
    require(maxSessionEvents >= 1, s"maxSessionEvents must be >= 1: $maxSessionEvents")
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    def splitByGap(sorted: List[SessEvent]): List[List[SessEvent]] =
      sorted.foldLeft(List.empty[List[SessEvent]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) =>
          if (e.ts_us - cur.head.ts_us > gapUs) List(e) :: cur :: done
          else (e :: cur) :: done
        // sessions and their events accumulate REVERSED (prepend)
      }.map(_.reverse).reverse
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessBuffer, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessBuffer]) =>
          val fresh = rows.map(e => SessEvent(
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L,
            e.event_id, e.event_type)).toList
          val buf = state.getOption.map(_.buf).getOrElse(Nil) ++ fresh
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val sessions = splitByGap(buf.sortBy(e => (e.ts_us, e.event_id)))
          val (matured, open0) = sessions.partition(_.last.ts_us + gapUs < wmUs)
          // cap: an open session at/over the cap force-closes NOW (its
          // later events would only be chopped again), keeping per-key
          // state bounded for never-pausing keys
          val (oversize, open) = open0.partition(_.length >= maxSessionEvents)
          val closed = matured ++ oversize
          if (open.isEmpty) state.remove()
          else {
            state.update(SessBuffer(open.flatten))
            // ceiling ms: flooring could fire the timeout <1 ms before
            // the strict micro-precision close condition holds, leaving
            // the session stranded until the next watermark advance
            val lastEndMs = (open.map(_.last.ts_us).max + gapUs + 999L) / 1000L
            state.setTimeoutTimestamp(math.max(lastEndMs, wmUs / 1000L + 1L))
          }
          closed.iterator.map { s =>
            ClosedSession(userId, s.head.ts_us, s.last.ts_us, s.length.toLong,
              s.take(pathLen).map(_.event_type).mkString(">"))
          }
      }
  }

  /** Streaming exact dedup on event_id with watermark-bounded state:
    * duplicates arriving within the delay are dropped, state for ids
    * older than the watermark is evicted (the streaming half of the
    * dedup surface — q25 is the batch half).
    */
  def dedupEvents(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Default output mode for the stateful queries above. */
  val UpdateMode: OutputMode = OutputMode.Update()
}
