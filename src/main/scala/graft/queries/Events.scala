package graft.queries

import graft.Tables.load
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing over `events` (SURVEY.md §2.B; the reference has
  * no streaming constructs — extension surface). Batch forms here are
  * oracled; the same aggregations run under Structured Streaming with
  * watermarks in `graft.streaming.EventWindows`, and EventsStreamingSpec
  * asserts stream == batch on the shared fixture.
  *
  * Window grids are epoch-aligned in both engines (Spark `window()` and
  * DuckDB `time_bucket`/`date_trunc`), so starts match exactly; value
  * sums go through exact decimal; timestamps leave as second-resolution
  * strings under the pinned UTC session timezone.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // 1-hour tumbling windows per event type.
    "q_evt_tumbling" -> ((s, d) =>
      load(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value"), 6).as("total"))
        .select(tstr(col("w.start")).as("w_start"), col("event_type"),
          col("cnt"), col("total"))
        .orderBy("w_start", "event_type")),

    // 1-hour windows sliding every 15 minutes (4 windows per event).
    "q_evt_sliding" -> ((s, d) =>
      load(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value"), 6).as("total"))
        .select(tstr(col("w.start")).as("w_start"), col("event_type"),
          col("cnt"), col("total"))
        .orderBy("w_start", "event_type")),

    // Session windows, 30-minute gap, per user. Spark merges events
    // whose gap is <= the duration (verified in EventsStreamingSpec: a
    // gap of exactly 30min stays one session) — the oracle's
    // gaps-and-islands break therefore uses strict `>`.
    "q_evt_session" -> ((s, d) =>
      load(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("total"),
          tstr(max(col("ts"))).as("last_ts"))
        .select(col("user_id"), tstr(col("w.start")).as("sess_start"),
          col("n_events"), col("total"), col("last_ts"))
        .orderBy("user_id", "sess_start"))
  )

  val oracles: Map[String, String] = Map(
    "q_evt_tumbling" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "q_evt_sliding" ->
      """SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM (SELECT TIME_BUCKET(INTERVAL '15 minutes', ts) - (j * INTERVAL '15 minutes') AS ws,
        |        event_type, value
        |      FROM events CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS j))
        |GROUP BY ws, event_type ORDER BY w_start, event_type""".stripMargin,
    "q_evt_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL '30 minutes' THEN 1
        |         WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
        |         ELSE 0 END AS brk
        |  FROM events),
        |islands AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged)
        |SELECT user_id,
        |  STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
        |  STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM islands GROUP BY user_id, island
        |ORDER BY user_id, sess_start""".stripMargin
  )
}
