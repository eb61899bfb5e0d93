package graft.queries

import graft.Tables.load
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
        .orderBy("user_id", "sess_start")),

    // Gaps-and-islands sessionization in pure window SQL — the batch
    // twin of session_window, and the formulation that generalizes to
    // any "new group when condition on previous row" break. One shuffle
    // on user_id; both windows and the final aggregate share it.
    "q_sessionize_sql" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      load(s, d, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        // strict > 30 min, matching the session_window oracle convention
        .withColumn("brk", when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000, 1L).otherwise(0L))
        .withColumn("sess_n", sum(col("brk")).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_n"))
        .agg(count(lit(1)).as("n_events"),
          tstr(min(col("ts"))).as("sess_start"), tstr(max(col("ts"))).as("sess_end"))
        .orderBy("user_id", "sess_n")
    }),

    // Cohort retention: users grouped by first-seen week, activity
    // counted per week offset. The 100 TB shape: dedup (user, week)
    // FIRST (map-side-combining distinct), derive each user's cohort
    // with a min-aggregate, then count plain rows — no COUNT(DISTINCT)
    // over the raw event stream. Week = integer days-since-epoch-base
    // div 7, identical arithmetic in both engines (no engine-specific
    // week-truncation semantics).
    "q_cohort_retention" -> ((s, d) => {
      val uw = load(s, d, "events")
        .select(col("user_id"),
          expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7").as("wk"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      uw.join(cohort, "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_wk", "wk_offset")
    }),

    // Ordered-step funnel (view → click → purchase): each step's FIRST
    // event strictly after the previous step's — the conversion staple.
    // Three min-aggregates chained by equi-joins, all keyed on user_id
    // so one partitioning serves every stage; left joins keep users who
    // stalled mid-funnel (the drop-off IS the signal).
    "q_funnel" -> ((s, d) => {
      val ev = load(s, d, "events")
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
        .select(col("user_id"), tstr(col("t1")).as("t_view"),
          tstr(col("t2")).as("t_click"), tstr(col("t3")).as("t_purchase"),
          (lit(1L) + col("t2").isNotNull.cast("long")
            + col("t3").isNotNull.cast("long")).as("stage"))
        .orderBy("user_id")
    }),

    // Windowed EXACT distinct users (the DAU/hourly-uniques staple):
    // count_distinct expands to the two-phase (window, user) dedup +
    // count — exact, with the map-side partial on the compound key. At
    // 100 TB the approximate sibling is q_agg_hll_merge's mergeable
    // sketch; this is the exact reference the sketch is audited against.
    "q_evt_uniques" -> ((s, d) =>
      load(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(countDistinct(col("user_id")).as("uniq_users"),
          count(lit(1)).as("n_events"))
        .select(tstr(col("w.start")).as("w_start"),
          col("uniq_users"), col("n_events"))
        .orderBy("w_start")),

    // Multi-touch attribution: each purchase's value splits LINEARLY
    // across the same user's clicks in the preceding 30 minutes, in
    // integer cents — equal share per click, the last touch (latest
    // click, event_id tie-break) absorbing the division remainder, so
    // the split sums exactly to the purchase and every row is
    // engine-portable integer math (values are positive, so trunc vs
    // floor division agree). Shapes: one user-keyed interval equi-join
    // + two purchase-keyed windows — the batch twin of the streaming
    // clickAttribution join.
    "q_attribution" -> ((s, d) => {
      val ev = load(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"),
          expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      val pairs = purch.join(clicks, Seq("user_id"))
        .filter(col("click_ts") <= col("p_ts") &&
          col("click_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      val w = Window.partitionBy(col("p_id"))
      val wOrd = Window.partitionBy(col("p_id"))
        .orderBy(col("click_ts").desc, col("click_id").desc)
      pairs
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(wOrd)) // rn = 1 → last touch
        .select(col("user_id"), col("p_id"), col("click_id"),
          expr("cents DIV n + IF(rn = 1, cents % n, 0)").as("attr_cents"),
          (col("rn") === 1).as("is_last_touch"))
        .orderBy("p_id", "click_id")
    }),

    // Rolling anomaly flag over each user's last-5-events window,
    // integer-exact: with cents = round(value·100), s1 = Σx, s2 = Σx²,
    // the 2σ test (x − μ)² > 4σ² multiplies out to
    // (n·x − s1)² > 4·(n·s2 − s1²) — pure BIGINT arithmetic, so Spark
    // and the oracle agree bit-for-bit with no sqrt/float drift, and
    // the window needs only two running sums (no second pass for μ).
    "q_rolling_zscore" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      load(s, d, "events")
        .withColumn("cents", expr("CAST(ROUND(value * 100) AS BIGINT)"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s1", sum(col("cents")).over(w))
        .withColumn("s2", sum(col("cents") * col("cents")).over(w))
        .select(col("event_id"), col("user_id"), col("cents"),
          col("n"), col("s1"), col("s2"),
          (col("n") === 5 &&
            (col("n") * col("cents") - col("s1")) * (col("n") * col("cents") - col("s1"))
              > lit(4L) * (col("n") * col("s2") - col("s1") * col("s1")))
            .as("is_outlier"))
        .orderBy("event_id")
    }),

    // Calendar resample: per-user daily rollup, gap-filled to a dense
    // day grid (sequence + explode, row-local) with the running total
    // forward-filled across silent days — the time-series staple that
    // turns an irregular event stream into a regular panel. The 100 TB
    // shape: the raw stream collapses to ≤|users|·|days| rows in the
    // FIRST aggregate (map-side combining), and everything after —
    // span, grid, join, fill window — runs on that reduced panel, all
    // partitioned by user_id. The grid never materializes
    // users × calendar for inactive users: each user's span is
    // [first active day, last active day].
    "q_gapfill" -> ((s, d) => {
      val daily = load(s, d, "events")
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("day_total"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("day_total"), ignoreNulls = true).over(w).as("filled_total"))
        .orderBy("user_id", "day")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_evt_uniques" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        |  COUNT(DISTINCT user_id) AS uniq_users, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin,
    "q_attribution" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS p_id, ts AS p_ts,
        |        CAST(ROUND(value * 100) AS BIGINT) AS cents
        |      FROM events WHERE event_type = 'purchase'),
        |pairs AS (SELECT p.user_id, p_id, click_id, click_ts, cents
        |          FROM p JOIN c ON p.user_id = c.user_id
        |            AND c.click_ts <= p.p_ts
        |            AND c.click_ts >= p.p_ts - INTERVAL 30 MINUTE),
        |x AS (SELECT *, COUNT(*) OVER (PARTITION BY p_id) AS n,
        |        ROW_NUMBER() OVER (PARTITION BY p_id
        |          ORDER BY click_ts DESC, click_id DESC) AS rn
        |      FROM pairs)
        |SELECT user_id, p_id, click_id,
        |  cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END AS attr_cents,
        |  rn = 1 AS is_last_touch
        |FROM x ORDER BY p_id, click_id""".stripMargin,
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
        |ORDER BY user_id, sess_start""".stripMargin,
    "q_sessionize_sql" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |islands AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_n
        |  FROM flagged)
        |SELECT user_id, sess_n, COUNT(*) AS n_events,
        |  STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS sess_end
        |FROM islands GROUP BY user_id, sess_n
        |ORDER BY user_id, sess_n""".stripMargin,
    "q_cohort_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS BIGINT) AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id)
        |SELECT c.cohort_wk, u.wk - c.cohort_wk AS wk_offset, COUNT(*) AS n_users
        |FROM uw u JOIN cohort c ON u.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
        |SELECT t1.user_id,
        |  STRFTIME(t1.t1, '%Y-%m-%d %H:%M:%S') AS t_view,
        |  STRFTIME(t2.t2, '%Y-%m-%d %H:%M:%S') AS t_click,
        |  STRFTIME(t3.t3, '%Y-%m-%d %H:%M:%S') AS t_purchase,
        |  1 + CAST(t2.t2 IS NOT NULL AS BIGINT)
        |    + CAST(t3.t3 IS NOT NULL AS BIGINT) AS stage
        |FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        |  LEFT JOIN t3 ON t1.user_id = t3.user_id
        |ORDER BY t1.user_id""".stripMargin,
    "q_rolling_zscore" ->
      """WITH c AS (SELECT event_id, user_id, ts,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
        |w AS (SELECT event_id, user_id, cents,
        |    COUNT(*) OVER win AS n,
        |    CAST(SUM(cents) OVER win AS BIGINT) AS s1,
        |    CAST(SUM(cents * cents) OVER win AS BIGINT) AS s2
        |  FROM c
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, cents, n, s1, s2,
        |  n = 5 AND (n * cents - s1) * (n * cents - s1) > 4 * (n * s2 - s1 * s1)
        |    AS is_outlier
        |FROM w ORDER BY event_id""".stripMargin,
    "q_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_total
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        |         FROM daily GROUP BY user_id),
        |grid AS (SELECT user_id,
        |           CAST(UNNEST(GENERATE_SERIES(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |         FROM span)
        |SELECT g.user_id, g.day,
        |  CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
        |  LAST_VALUE(d.day_total IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total
        |FROM grid g LEFT JOIN daily d
        |  ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, g.day""".stripMargin
  )
}
