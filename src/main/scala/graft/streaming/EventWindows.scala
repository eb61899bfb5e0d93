package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event-window operators
  * (SURVEY.md §2.B "streaming proper"): the same aggregations as
  * `graft.queries.Events`, expressed over any streaming or batch
  * DataFrame with an event-time `ts` column. Batch/stream equivalence
  * and watermark late-drop are asserted in EventsStreamingSpec.
  *
  * At scale these are the canonical shapes: watermarked windowed aggs
  * shuffle on (window, key) with partial aggregation, and state store
  * size is bounded by the watermark horizon — no unbounded state.
  */
object EventWindows {

  /** 1-hour tumbling counts/sums per event type, 1-hour watermark. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("total"))

  /** 1-hour windows sliding every 15 minutes. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("total"))

  /** Built-in session windows (30-minute gap) per user. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"), col("total"))

  /** Streaming exact dedup: drops events whose `event_id` was already
    * seen within the watermark horizon — state stays bounded by the
    * horizon instead of growing with the stream (the streaming form of
    * `q_dedup_exact`; duplicates arriving later than the horizon are
    * the documented trade-off of bounded state). */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join: each purchase matched to
    * the same user's clicks from the preceding 30 minutes. Both inputs
    * carry watermarks and the condition bounds event time on BOTH ends
    * (`click_ts ∈ [purchase_ts − 30 min, purchase_ts]`), which is what
    * lets Spark evict click state once the watermark passes
    * `click_ts + 30 min` — join state stays bounded by the horizon
    * instead of growing with the stream. Inner join in append mode
    * emits each match as soon as both rows exist. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    p.join(c,
      expr("c_user = p_user AND click_ts <= purchase_ts" +
        " AND click_ts >= purchase_ts - INTERVAL 30 MINUTES"))
      .select(col("p_user").as("user_id"), col("click_ts"),
        col("purchase_ts"), col("value"))
  }

  /** Left-outer form of [[clickAttribution]]: purchases with no click
    * in the window are KEPT, null-padded — attribution reporting must
    * see the unattributed revenue, not silently drop it. The null row
    * for an unmatched purchase can only be emitted once the watermark
    * proves no matching click can still arrive (watermark past the
    * purchase time, the join condition's upper bound for click_ts), so
    * unmatched results trail the event time by the watermark delay —
    * the price of correctness on unbounded input. Same bounded state
    * as the inner form. */
  def clickAttributionOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    p.join(c,
      expr("c_user = p_user AND click_ts <= purchase_ts" +
        " AND click_ts >= purchase_ts - INTERVAL 30 MINUTES"),
      "leftOuter")
      .select(col("p_user").as("user_id"), col("click_ts"),
        col("purchase_ts"), col("value"))
  }

  /** Full-outer form of [[clickAttribution]]: the bidirectional audit —
    * unmatched purchases (unattributed revenue) AND unmatched clicks
    * (spend that never converted) both survive, null-padded on the
    * missing side. Each unmatched row emits only once the watermark
    * proves its window can no longer fill: for a purchase, watermark
    * past the purchase time; for a click, past `click_ts + 30 min`
    * (the last purchase it could have attributed). State bounds are
    * identical to the inner form — the outer-ness changes emission,
    * not retention. */
  def clickAttributionFull(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    p.join(c,
      expr("c_user = p_user AND click_ts <= purchase_ts" +
        " AND click_ts >= purchase_ts - INTERVAL 30 MINUTES"),
      "fullOuter")
      .select(coalesce(col("p_user"), col("c_user")).as("user_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Watermarked 2-step funnel (view → click within 30 minutes): the
    * streaming twin of `q_funnel`'s first transition. Same bounded-state
    * interval-join shape as [[clickAttribution]], but FORWARD in time:
    * a click converts a view if it lands strictly after it and within
    * the 30-minute horizon, so view state evicts once the watermark
    * passes `view_ts + 30 min`. */
  def funnelSteps(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "1 hour")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    v.join(c,
      expr("v_user = c_user AND click_ts > view_ts" +
        " AND click_ts <= view_ts + INTERVAL 30 MINUTES"))
      .select(col("v_user").as("user_id"), col("view_ts"), col("click_ts"))
  }

  /** Funnel conversions rolled up per (user, hour): CHAINED stateful
    * stages — interval join, then a windowed aggregate on the join
    * output's event time (first conversion + pair count). Both stages'
    * state is watermark-bounded; the per-(user, window) key keeps the
    * aggregate bounded too (a global per-user min would grow with the
    * user population forever). Emission trails the watermark by design:
    * a (user, hour) row is final only when no late click can join.
    * `n_pairs` counts qualifying (view, click) PAIRS — a click inside
    * two views' horizons counts twice (streaming aggregates cannot
    * COUNT(DISTINCT), and collapsing to per-click rows would need a
    * third stateful stage); `first_conv` is pair-multiplicity-free.
    * The batch q_funnel's per-user first-transition semantics are the
    * min-aggregate form, not this rollup. */
  def funnelConversions(views: DataFrame, clicks: DataFrame): DataFrame =
    funnelSteps(views, clicks)
      .groupBy(col("user_id"), window(col("click_ts"), "1 hour").as("w"))
      .agg(min(col("click_ts")).as("first_conv"), count(lit(1)).as("n_pairs"))
      .select(col("user_id"), col("w.start").as("w_start"),
        col("first_conv"), col("n_pairs"))

  /** Stream–static enrichment join: streaming events against a static
    * (batch) dimension. No watermark and no join state needed — the
    * static side is re-planned per micro-batch (picking up dim updates
    * between batches); the planner broadcasts dims under the threshold
    * and shuffle-joins larger ones (no forced hint — a mandatory
    * broadcast of a large profile table would OOM every micro-batch).
    * The left join keeps un-enriched events (a missing dim row must
    * never drop data on the hot path). */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(dim, Seq("user_id"), "left")

  // ------------------------------------------------------------------
  // Custom state: sessionization via flatMapGroupsWithState — the
  // escape hatch for session semantics the built-in operator can't
  // express (here: emit a session row the moment it closes, carrying
  // its event count and value sum).

  final case class SessionEvent(ts: Timestamp, user_id: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class ClosedSession(user_id: Long, start: Timestamp, end: Timestamp,
                                 n_events: Long, total: Double)

  private val GapMs = 30L * 60 * 1000

  /** Event-time sessionizer: closes a user's session when a batch's
    * events jump past the 30-minute gap, or when the state times out
    * (watermark passed the gap horizon with no new events). */
  def sessionize(spark: SparkSession, events: Dataset[SessionEvent]): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            // Rebuild the user's timeline from the open session (if
            // any) plus this batch's events: sort spans by start, then
            // coalesce neighbors whose gap is <= GapMs. Every span
            // except the LAST is followed by a closing gap and emits
            // immediately (the eager "emit the moment it closes"
            // semantics this operator exists for); the last span stays
            // open in state. Cross-batch out-of-order events above the
            // watermark therefore extend the open session BACKWARD
            // (min start) when they fall inside its leading gap, and
            // pair up into their own closed sessions when they precede
            // it by more than the gap — the previous single-cursor
            // walk's `t - s.last <= GapMs` check was vacuously true
            // for any PAST t, silently folding arbitrarily-old
            // stragglers into the open session with an unchanged
            // start. A straggler arriving after its span already
            // emitted still produces an overlapping output row — the
            // documented price of eager emission; the
            // watermark-correct form is the built-in [[sessions]].
            val eventSpans =
              it.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1, e.value))
            val all = (state.getOption.iterator ++ eventSpans).toSeq
              .sortBy(s => (s.start, s.last))
            if (all.isEmpty) Iterator.empty
            else {
              val merged = all.tail.foldLeft(List(all.head)) {
                case (cur :: done, s) if s.start <= cur.last + GapMs =>
                  SessionState(cur.start, math.max(cur.last, s.last),
                    cur.n + s.n, cur.total + s.total) :: done
                case (acc, s) => s :: acc
              }.reverse
              // the final span holds the max event time (spans are
              // disjoint after coalescing), and this batch's events are
              // above the watermark, so last + gap > watermark — the
              // timeout timestamp is always legal
              val open = merged.last
              state.update(open)
              state.setTimeoutTimestamp(open.last + GapMs)
              merged.init.iterator.map(s =>
                ClosedSession(user, new Timestamp(s.start),
                  new Timestamp(s.last), s.n, s.total))
            }
          }
        })
  }
}
