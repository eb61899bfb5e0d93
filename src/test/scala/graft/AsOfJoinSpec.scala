package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

/** Native as-of join vs the composed join+window formulation
  * (q_join_asof): identical matches on tie-free event times, left rows
  * without a prior right row null-padded, and the physical plan is the
  * custom exec — no pair materialization, no window. */
class AsOfJoinSpec extends SparkTestBase {

  private def events = Tables.load(spark, sfDir, "events")

  test("matches the composed as-of formulation row for row") {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    val native = AsOfJoin.asof(p, c, "user_id", "c_uid", "p_ts", "c_ts")
      .select(col("p_id"), col("c_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val composed = graft.queries.Relational.queries("q_join_asof")(spark, sfDir)
      .select(col("p_id"), col("c_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native.size == composed.size)
    assert(native == composed)
  }

  test("NULL keys and times never match, left rows survive null-padded") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(100L), "l1"), (None, Some(100L), "l2"),
      (Some(1L), None, "l3"))
      .toDF("k", "t", "tag")
    val r = Seq((Some(1L), Some(50L), "r1"), (None, Some(40L), "r2"),
      (Some(1L), None, "r3"))
      .toDF("rk", "rt", "rtag")
    val res = AsOfJoin.asof(l, r, "k", "rk", "t", "rt")
      .select(col("tag"), col("rtag")).collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(res == Map(
      "l1" -> Some("r1"), // normal match
      "l2" -> None,       // NULL left key: no match (NOT r2's NULL key)
      "l3" -> None))      // NULL left time: no match (NOT r3's NULL time)
  }

  test("tolerance bounds the lookback: inclusive at the bound, null-pad past it") {
    import spark.implicits._
    // long time columns (micros) — k=1 has matches at distance 0, 10,
    // and 11 from the respective left rows
    val l = Seq((1L, 100L, "exact"), (1L, 110L, "at-bound"), (1L, 211L, "past"),
      (2L, 500L, "other-key"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 100L, "r100"), (1L, 200L, "r200"), (2L, 499L, "r499"))
      .toDF("rk", "rt", "rtag")
    val res = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", 10L)
      .select(col("tag"), col("rtag")).collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(res == Map(
      "exact" -> Some("r100"),    // distance 0
      "at-bound" -> Some("r100"), // distance 10 == tolerance: inclusive
      "past" -> None,             // latest candidate r200 at distance 11
      "other-key" -> Some("r499")))
    // unbounded keeps the r2 behavior
    val unb = AsOfJoin.asof(l, r, "k", "rk", "t", "rt")
      .select(col("tag"), col("rtag")).collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(unb("past") == Some("r200"))
  }

  test("forward direction: earliest right row at-or-after, tolerance bounds lookahead") {
    import spark.implicits._
    val l = Seq((1L, 100L, "exact"), (1L, 150L, "ahead"), (1L, 250L, "none-after"),
      (2L, 10L, "other-key"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 100L, "r100"), (1L, 200L, "r200"), (2L, 40L, "r40"))
      .toDF("rk", "rt", "rtag")
    val res = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", -1L, "forward")
      .select(col("tag"), col("rtag")).collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(res == Map(
      "exact" -> Some("r100"),      // time == left time matches (>=)
      "ahead" -> Some("r200"),      // earliest at-or-after 150
      "none-after" -> None,         // no right row at-or-after 250
      "other-key" -> Some("r40")))
    // tolerance: r200 is 50 past "ahead" — at bound 49 it null-pads
    val tol = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", 49L, "forward")
      .select(col("tag"), col("rtag")).collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(tol("ahead") == None)
    assert(tol("exact") == Some("r100"))
  }

  test("nearest direction: closer side wins, exact tie resolves backward") {
    import spark.implicits._
    val l = Seq((1L, 100L, "tie"),        // r90 dist 10, r110 dist 10 → backward
      (1L, 104L, "fwd-closer"),           // r90 dist 14, r110 dist 6 → forward
      (1L, 92L, "bwd-closer"),            // r90 dist 2, r110 dist 18 → backward
      (3L, 7L, "no-candidates"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 90L, "r90"), (1L, 110L, "r110"))
      .toDF("rk", "rt", "rtag")
    val res = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", -1L, "nearest")
      .select(col("tag"), col("rtag")).collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(res == Map(
      "tie" -> Some("r90"),
      "fwd-closer" -> Some("r110"),
      "bwd-closer" -> Some("r90"),
      "no-candidates" -> None))
    // tolerance applies per side: at 6, only candidates within 6 match
    val tol = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", 6L, "nearest")
      .select(col("tag"), col("rtag")).collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(tol == Map(
      "tie" -> None,               // distance 10 on both sides, > 6
      "fwd-closer" -> Some("r110"),
      "bwd-closer" -> Some("r90"),
      "no-candidates" -> None))
  }

  test("duplicate (key, time) right rows resolve deterministically with a tie-break") {
    import spark.implicits._
    // three right rows share (k=1, t=100) — without a declared tie-break
    // the merge would pick whichever the shuffle delivered last/first
    val l = Seq((1L, 150L, "bwd"), (1L, 50L, "fwd"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 100L, 7L), (1L, 100L, 3L), (1L, 100L, 5L))
      .toDF("rk", "rt", "rid")
    def run(dir: String) =
      AsOfJoin.asof(l, r, "k", "rk", "t", "rt", -1L, dir, Seq("rid"))
        .select(col("tag"), col("rid")).collect()
        .map(x => x.getString(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // backward: last in ascending tie order = greatest rid
    assert(run("backward")("bwd") == 7L)
    // forward: first in ascending tie order = least rid
    assert(run("forward")("fwd") == 3L)
    // nearest inherits the winning side's rule
    val near = run("nearest")
    assert(near("bwd") == 7L && near("fwd") == 3L)
  }

  test("a NULL-time right row never becomes the merge candidate (direct exec)") {
    import spark.implicits._
    // bypass the public API (which pre-filters null right times) and
    // build the plan directly — the exec's own guard must hold
    val l = Seq((1L, 100L, "l1")).toDF("k", "t", "tag")
    val r = Seq((Some(1L), None: Option[Long], "r-null"))
      .toDF("rk", "rt", "rtag")
    def attr(df: org.apache.spark.sql.DataFrame, n: String) =
      df.queryExecution.analyzed.output.find(_.name == n).get
    for (dir <- Seq("backward", "forward", "nearest")) {
      val plan = graft.plans.AsOfJoinPlan(
        l.queryExecution.analyzed, r.queryExecution.analyzed,
        attr(l, "k"), attr(r, "rk"), attr(l, "t"), attr(r, "rt"),
        -1L, dir)
      if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
      val res = graft.plans.Bridge.ofRows(spark, plan)
        .select(col("tag"), col("rtag")).collect()
      assert(res.length == 1 && res.head.isNullAt(1),
        s"direction=$dir matched a NULL-time right row: ${res.mkString}")
    }
  }

  test("mismatched key/time types are rejected at construction") {
    import spark.implicits._
    val l = Seq((1L, 100L)).toDF("k", "t")
    val rTsTime = Seq((1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("rk", "rt")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, rTsTime, "k", "rk", "t", "rt", 10L)
    }
    assert(e1.getMessage.contains("time types must match"))
    val rIntKey = Seq((1, 100L)).toDF("rk", "rt")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, rIntKey, "k", "rk", "t", "rt")
    }
    assert(e2.getMessage.contains("key types must match"))
  }

  test("physical plan is the custom exec, not a window over pairs") {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    val df = AsOfJoin.asof(p, c, "user_id", "c_uid", "p_ts", "c_ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan)
    assert(!plan.contains("Window"), plan)
    // exactly |left| output rows — the shape the composed form can't have
    assert(df.count() ==
      events.filter(col("event_type") === "purchase").count())
  }
}
