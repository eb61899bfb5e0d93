package graft.queries

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational core: scans, filters, projections, joins, sorts, set ops.
  *
  * Generalizes the reference's route-by-predicate
  * (`/root/reference/dbfy.py:129`), dictionary-lookup joins
  * (`/root/reference/dbfy.py:108-121`) and exact-limit semantics
  * (`/root/reference/dbfy.py:205-208`) into the declared surface of
  * SURVEY.md §2.B. Every oracled query ends in a total order so the
  * driver's hash-compare is deterministic; outer-join sort keys pin
  * NULLS FIRST on both engines (Spark's ASC default).
  *
  * Scale notes: joins keep their equi-keys visible to Catalyst so AQE can
  * pick broadcast/SMJ; the dimension sides (region/nation/bands) are
  * explicitly `broadcast()` hinted where we know they are tiny.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_scan_project" -> ((s, d) =>
      load(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")),

    "q_scan_pruned" -> ((s, d) =>
      load(s, d, "lineitem")
        .filter(col("l_quantity") > 45 &&
          col("l_shipdate") >= lit("1995-07-01 00:00:00").cast("timestamp"))
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),

    "q_filter_pred" -> ((s, d) =>
      load(s, d, "orders")
        .filter(((col("o_orderstatus") === "O" &&
          col("o_totalprice").between(50000, 150000)) ||
          (col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
            !(col("o_orderstatus") === "F"))) &&
          col("o_custkey").isNotNull)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
        .orderBy("o_orderkey")),

    "q_project_expr" -> ((s, d) =>
      // r21 (guide §1.2): the global orderBy's range exchange SAMPLES
      // its child with a full pass, so projecting before the sort
      // computed the decimal/string expressions twice. Sorting the raw
      // scan first and projecting ABOVE the Sort (Catalyst prunes
      // columns downward but never pushes projections below a Sort)
      // evaluates them once; row order and output are identical — the
      // sort keys are the same two scan columns.
      load(s, d, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          // exact decimal arithmetic end-to-end: the inputs are 2-decimal
          // money values, so decimal multiply+round is tie-free and
          // engine-portable (double round() breaks ties differently in
          // Spark vs DuckDB).
          round(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(3, 2))) *
            (lit(1).cast(DecimalType(3, 2)) + col("l_tax").cast(DecimalType(3, 2))), 2)
            .cast("double").as("charge"),
          when(col("l_quantity") > 30, "bulk")
            .when(col("l_quantity") > 10, "mid")
            .otherwise("small").as("bucket"),
          col("l_partkey").cast("string").as("pk_str"))),

    "q_filter_regex" -> ((s, d) =>
      load(s, d, "documents")
        .filter(col("text").rlike("scan (join|merge)"))
        .select(col("doc_id"),
          regexp_extract(col("text"), "scan (join|merge)", 1).as("m"))
        .orderBy("doc_id")),

    "q_join_inner" -> ((s, d) =>
      load(s, d, "orders")
        .join(load(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy("o_orderkey")),

    "q_join_broadcast" -> ((s, d) =>
      load(s, d, "nation")
        .join(broadcast(load(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name"), col("r_name"))
        .orderBy("n_name")),

    "q_join_left" -> ((s, d) =>
      load(s, d, "customer")
        .join(load(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)),

    "q_join_full" -> ((s, d) =>
      load(s, d, "customer").filter(col("c_acctbal") > 5000)
        .join(load(s, d, "orders").filter(col("o_totalprice") > 150000),
          col("c_custkey") === col("o_custkey"), "full")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)),

    "q_join_semi" -> ((s, d) =>
      load(s, d, "customer")
        .join(load(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    "q_join_anti" -> ((s, d) =>
      load(s, d, "customer")
        .join(load(s, d, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    "q_join_theta" -> ((s, d) => {
      val bands = s.createDataFrame(Seq(
        (0.0, 1000.0, "low"), (1000.0, 1500.0, "mid"), (1500.0, 1000000.0, "high")))
        .toDF("lo", "hi", "band")
      load(s, d, "part")
        .join(broadcast(bands),
          col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .select(col("p_partkey"), col("band"), col("p_retailprice"))
        .orderBy("p_partkey", "band")
    }),

    // Large×large RANGE join (|a.value − b.value| ≤ ε) rewritten as a
    // binned EQUI-join — the scale path Spark lacks natively: a pure
    // inequality join between two big relations falls back to
    // BroadcastNestedLoop/Cartesian (all-pairs). Binning quantizes the
    // range key into ε-covering buckets (width 2ε; each probe row
    // explodes to 3 adjacent bins, each build row keeps its own bin, so
    // every candidate pair meets exactly once), the join shuffles on
    // the bin key like any equi-join, and the exact predicate filters
    // the candidates. Bin width is double ε so floating-point bin
    // boundaries can never drop a true candidate. PlanSpec asserts the
    // physical plan is a hash/merge join — no nested-loop anywhere.
    // NOTE output cardinality: with a fixed ε over a fixed value range,
    // match density per probe grows linearly with corpus size, so the
    // RESULT (and its presentation-sort shuffle) is quadratic — measured
    // β=1.94 in SCALING.md while probe+build shuffles stay linear. At
    // scale, bound the output (top-k per probe / ε sized for bounded
    // density); the band-join mechanism itself is linear per candidate.
    "q_join_range" -> ((s, d) => {
      val eps = 0.5
      val width = 2 * eps
      val probe = load(s, d, "events")
        .filter(pmod(col("event_id"), lit(199)) === 0)
        .select(col("event_id").as("a_id"), col("value").as("va"))
        .withColumn("b0", floor(col("va") / width).cast("long"))
        .select(col("a_id"), col("va"),
          explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("bin"))
      val build = load(s, d, "events")
        .select(col("event_id").as("b_id"), col("value").as("vb"))
        .withColumn("bin", floor(col("vb") / width).cast("long"))
      probe.join(build, Seq("bin"))
        .filter(abs(col("va") - col("vb")) <= eps && col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"))
        .orderBy("a_id", "b_id")
    }),

    // The bounded companion of q_join_range — the at-scale form from
    // SCALING.md: keep only the top-3 nearest matches per probe
    // (row_number over |Δv|, b_id tiebreak for determinism), so the
    // OUTPUT is O(probes), not probes × match-density. The banded
    // candidate join is unchanged; the cap rides a per-probe window
    // over candidates only (each probe's candidate set is 3 bins wide,
    // so the window partition stays small at any corpus size).
    "q_join_range_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val eps = 0.5
      val width = 2 * eps
      val probe = load(s, d, "events")
        .filter(pmod(col("event_id"), lit(199)) === 0)
        .select(col("event_id").as("a_id"), col("value").as("va"))
        .withColumn("b0", floor(col("va") / width).cast("long"))
        .select(col("a_id"), col("va"),
          explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("bin"))
      val build = load(s, d, "events")
        .select(col("event_id").as("b_id"), col("value").as("vb"))
        .withColumn("bin", floor(col("vb") / width).cast("long"))
      val w = Window.partitionBy(col("a_id"))
        .orderBy(abs(col("va") - col("vb")), col("b_id"))
      probe.join(build, Seq("bin"))
        .filter(abs(col("va") - col("vb")) <= eps && col("a_id") =!= col("b_id"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("a_id"), col("b_id"), col("rnk"))
        .orderBy("a_id", "rnk")
    }),

    // Null-safe equality join: NULL keys MATCH each other (<=> /
    // IS NOT DISTINCT FROM) — the semantics a changelog join needs when
    // "no value" is itself a join key. Derived nullable keys on both
    // sides exercise the null-bucket path.
    "q_join_nullsafe" -> ((s, d) => {
      val a = load(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "P", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("ka"))
      val b = load(s, d, "orders").groupBy(
          when(col("o_orderstatus") === "P", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("kb"))
        .agg(count(lit(1)).as("n_side"))
      a.join(b, col("ka") <=> col("kb"))
        .select(col("o_orderkey"), col("ka"), col("n_side"))
        .orderBy(col("o_orderkey"), col("ka").asc_nulls_first)
    }),

    "q_join_cross" -> ((s, d) =>
      load(s, d, "region").crossJoin(load(s, d, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy("r_name", "n_name")),

    // As-of join (SURVEY.md §2.B q_join_asof): for each purchase event,
    // the latest click by the same user at-or-before it. Spark has no
    // native as-of join — composed as a range join + per-key window
    // top-1, the standard pattern; ties broken totally by event id.
    "q_join_asof" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = load(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      val w = Window.partitionBy(col("p_id"))
        .orderBy(col("c_ts").desc_nulls_last, col("c_id").desc_nulls_last)
      p.join(c, col("user_id") === col("c_uid") && col("c_ts") <= col("p_ts"), "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("p_id"), col("user_id"),
          graft.Det.tstr(col("p_ts")).as("p_ts"),
          col("c_id"), graft.Det.tstr(col("c_ts")).as("c_ts"))
        .orderBy("p_id")
    }),

    // The same as-of semantics through the NATIVE operator
    // (graft.plans.AsOfJoinPlan — custom LogicalPlan/Strategy/Exec):
    // one merge pass, O(1) state per key, |left| output rows, no pair
    // materialization. Shares q_join_asof's oracle (event times are
    // tie-free, so both tiebreak rules agree).
    "q_join_asof_native" -> ((s, d) => {
      val ev = load(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      graft.plans.AsOfJoin.asof(p, c, "user_id", "c_uid", "p_ts", "c_ts",
          -1L, "backward", Seq("c_id"))
        .select(col("p_id"), col("user_id"),
          graft.Det.tstr(col("p_ts")).as("p_ts"),
          col("c_id"), graft.Det.tstr(col("c_ts")).as("c_ts"))
        .orderBy("p_id")
    }),

    // Native as-of with a bounded lookback (pandas merge_asof
    // tolerance / QuestDB ASOF JOIN TOLERANCE): clicks older than 24 h
    // before the purchase null-pad instead of matching. Same one-pass
    // merge — the tolerance check is O(1) on the latest candidate.
    "q_join_asof_tol" -> ((s, d) => {
      val ev = load(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      graft.plans.AsOfJoin.asof(p, c, "user_id", "c_uid", "p_ts", "c_ts",
          24L * 3600 * 1000000, "backward", Seq("c_id"))
        .select(col("p_id"), col("user_id"),
          graft.Det.tstr(col("p_ts")).as("p_ts"),
          col("c_id"), graft.Det.tstr(col("c_ts")).as("c_ts"))
        .orderBy("p_id")
    }),

    // Native as-of, direction=forward (pandas merge_asof
    // direction='forward'): for each purchase, the EARLIEST click
    // at-or-after it. Same one-pass merge; the candidate is the
    // un-consumed head of the right cursor, so forward needs no
    // copied trailing state at all.
    "q_join_asof_fwd" -> ((s, d) => {
      val ev = load(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      graft.plans.AsOfJoin.asof(p, c, "user_id", "c_uid", "p_ts", "c_ts",
          -1L, "forward", Seq("c_id"))
        .select(col("p_id"), col("user_id"),
          graft.Det.tstr(col("p_ts")).as("p_ts"),
          col("c_id"), graft.Det.tstr(col("c_ts")).as("c_ts"))
        .orderBy("p_id")
    }),

    // Native as-of, direction=nearest: the click closest in time on
    // either side, distance ties resolving backward. Exercises both
    // candidates (trailing copy + cursor head) in one pass.
    "q_join_asof_near" -> ((s, d) => {
      val ev = load(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      graft.plans.AsOfJoin.asof(p, c, "user_id", "c_uid", "p_ts", "c_ts",
          -1L, "nearest", Seq("c_id"))
        .select(col("p_id"), col("user_id"),
          graft.Det.tstr(col("p_ts")).as("p_ts"),
          col("c_id"), graft.Det.tstr(col("c_ts")).as("c_ts"))
        .orderBy("p_id")
    }),

    // Per-brand 2-D skyline (Pareto frontier: minimize retail price,
    // maximize size). NOT the textbook NOT-EXISTS anti-join — that is
    // quadratic per brand. The sweep formulation: collapse to one row
    // per (brand, price) with the group's max size, running-max over
    // the price-ordered groups (window stratified by brand — no
    // SinglePartition), keep groups that strictly raise the max, join
    // back for the member rows. Duplicate (price, size) optima are
    // all kept — equal rows don't dominate each other.
    "q_skyline" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val parts = load(s, d, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("p_size"))
      val grp = parts.groupBy(col("p_brand"), col("p_retailprice"))
        .agg(max(col("p_size")).as("grp_max"))
      val wr = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val kept = grp.withColumn("run_max", max(col("grp_max")).over(wr))
        .filter(col("run_max").isNull || col("grp_max") > col("run_max"))
        .select(col("p_brand"), col("p_retailprice"), col("grp_max"))
      parts.join(kept, Seq("p_brand", "p_retailprice"))
        .filter(col("p_size") === col("grp_max"))
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("long").as("p_size"))
        .orderBy("p_brand", "p_partkey")
    }),

    // Correlated LATERAL subquery (SQL:1999 lateral derived table,
    // Spark 3.2+): top-2 nations per region by name — the per-row
    // dependent-subquery shape that decorrelates into a ranked join.
    "q_join_lateral" -> ((s, d) => {
      load(s, d, "region").createOrReplaceTempView("graft_lat_region")
      load(s, d, "nation").createOrReplaceTempView("graft_lat_nation")
      s.sql(
        """SELECT r.r_name, n.n_name
          |FROM graft_lat_region r,
          |  LATERAL (SELECT n_name FROM graft_lat_nation
          |           WHERE n_regionkey = r.r_regionkey
          |           ORDER BY n_name LIMIT 2) n
          |ORDER BY r_name, n_name""".stripMargin)
    }),

    "q_sort_multi" -> ((s, d) =>
      load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc_nulls_last,
          col("o_orderkey").asc)),

    "q_sort_limit" -> ((s, d) =>
      load(s, d, "lineitem")
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(50)),

    "q_union_all" -> ((s, d) =>
      load(s, d, "customer").select(col("c_nationkey").cast("long").as("nk"))
        .unionAll(load(s, d, "supplier").select(col("s_nationkey").cast("long")))
        .orderBy("nk")),

    "q_union_dist" -> ((s, d) =>
      load(s, d, "customer").select(col("c_nationkey").cast("long").as("nk"))
        .union(load(s, d, "supplier").select(col("s_nationkey").cast("long")))
        .distinct()
        .orderBy("nk")),

    "q_intersect" -> ((s, d) =>
      load(s, d, "customer").select(col("c_nationkey").cast("long").as("nk"))
        .intersect(load(s, d, "supplier").select(col("s_nationkey").cast("long")))
        .orderBy("nk")),

    // customers with no order before 1996 via EXCEPT. The subtrahend is
    // a RESTRICTED orders projection (o_orderdate < 1996-01-01), not all
    // orders: at the driver's SFs every customer has at least one order,
    // so the unrestricted form proved only that both engines produce
    // empty sets (VERDICT r16 #4 "vacuous oracle"). The date cut keeps
    // the difference non-empty at every SF (34 / 326 / 3305 rows at
    // sf0.001/0.01/0.1), so the subtraction semantics are actually
    // exercised by the hash check.
    "q_except" -> ((s, d) =>
      load(s, d, "customer").select(col("c_custkey").as("k"))
        .except(load(s, d, "orders")
          .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .select(col("o_custkey")))
        .orderBy("k")),

    // Skew-resistant salted join from operators/JoinStrategies — row-
    // identical to the plain join, so it shares a plain-join oracle.
    "q_join_salted" -> ((s, d) => {
      val li = load(s, d, "lineitem")
        .select(col("l_orderkey").as("k"),
          col("l_linenumber").cast("long").as("l_linenumber"), col("l_quantity"))
      val o = load(s, d, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice"))
      // r22 (guide §2.4 / VERDICT r21 #3): the global presentation sort
      // is a RANGE exchange whose bounds come from a sampling pass over
      // its child — and the child segment since the previous exchanges
      // is the whole salted-join merge (both sort-merge sorts included),
      // so the join ran TWICE per execution. Checkpointing the join
      // output materializes the merge once; the sampling pass and the
      // range shuffle then read cheap local blocks. Rows are identical —
      // the checkpoint is a lineage cut, not a transformation.
      graft.Checkpoints.ckpt(
        graft.operators.JoinStrategies.saltedJoin(li, o, "k", col("l_linenumber"), 8)
          .select(col("k"), col("l_linenumber"), col("l_quantity"), col("o_totalprice")))
        .orderBy("k", "l_linenumber")
    }),

    // The salted join under REAL skew (VERDICT r2 #5): half of
    // lineitem collapses onto one hot order key — the constant-column
    // case whose compressed MapStatus defeats AQE's skew estimate, so
    // static salting is the only fix. Row-identical to the plain join
    // of the same skewed input (oracled); JoinStrategiesSpec asserts
    // the max-task shuffle read actually shrinks.
    "q_join_salted_skew" -> ((s, d) => {
      val li = load(s, d, "lineitem")
        .select(expr("CASE WHEN l_orderkey % 2 = 0 THEN CAST(1 AS BIGINT) ELSE l_orderkey END").as("k"),
          col("l_linenumber").cast("long").as("l_linenumber"), col("l_quantity"))
      val o = load(s, d, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice"))
      // r22: same checkpoint-before-presentation-sort as q_join_salted
      // (the skewed variant pays the same double join evaluation under
      // the range-sampling pass)
      graft.Checkpoints.ckpt(
        graft.operators.JoinStrategies.saltedJoin(li, o, "k", col("l_linenumber"), 8)
          .select(col("k"), col("l_linenumber"), col("l_quantity"), col("o_totalprice")))
        .orderBy("k", "l_linenumber", "l_quantity", "o_totalprice")
    }),

    // Unpivot/melt: the pivot result folded back to long form.
    "q_unpivot" -> ((s, d) =>
      load(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .groupBy(col("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1))).na.fill(0L)
        .unpivot(Array(col("yr")), Array(col("F"), col("O"), col("P")),
          "status", "cnt")
        .orderBy("yr", "status")),

    // Pivot: order counts + exact-decimal totals per year × status.
    // Spark's relational pivot vs DuckDB FILTERed aggregates — identical
    // column names, so the hash compare sees the same shape.
    "q_pivot" -> ((s, d) =>
      load(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .groupBy(col("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("yr")),

    // TPC-H Q3 shape (VERDICT r3 #6): the first multi-join analytics
    // query — segment-filtered customers ⋈ orders ⋈ lineitem, revenue
    // per urgent order, top 10. All three filters sit on the scan side
    // (PushedFilters), the two joins share no key so AQE picks the
    // strategy per stage; revenue is exact decimal end-to-end and only
    // cast to double at presentation (the engine-portable money rule).
    "q_tpch_q3" -> ((s, d) => {
      val cust = load(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = load(s, d, "orders")
        .filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      val li = load(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(3, 2))))
          .as("rev_d"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"),
          round(col("rev_d"), 2).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: the 6-table join — customer ⋈ orders ⋈ lineitem
    // ⋈ supplier (supplier in the CUSTOMER's nation) ⋈ nation ⋈ region,
    // revenue per ASIA nation over two order years. The join-order /
    // broadcast decisions are the whole game here: region (1 row after
    // the filter) and nation (25 rows) are explicit broadcasts; the
    // c_nationkey = s_nationkey conjunct rides the l_suppkey equi-join
    // rather than forcing its own shuffle.
    "q_tpch_q5" -> ((s, d) => {
      val asia = broadcast(load(s, d, "region").filter(col("r_name") === "ASIA"))
      val nat = broadcast(load(s, d, "nation"))
      val ord = load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      load(s, d, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(load(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(load(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(asia, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(3, 2))))
          .as("rev_d"))
        .select(col("n_name"),
          round(col("rev_d"), 2).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",
    "q_scan_pruned" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1995-07-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_pred" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE ((o_orderstatus = 'O' AND o_totalprice BETWEEN 50000 AND 150000)
        |   OR (o_orderpriority IN ('1-URGENT','2-HIGH') AND NOT (o_orderstatus = 'F')))
        |  AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "q_project_expr" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2))), 2) AS DOUBLE) AS charge,
        |  CASE WHEN l_quantity > 30 THEN 'bulk' WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS bucket,
        |  CAST(l_partkey AS VARCHAR) AS pk_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_regex" ->
      """SELECT doc_id, regexp_extract(text, 'scan (join|merge)', 1) AS m
        |FROM documents WHERE regexp_matches(text, 'scan (join|merge)')
        |ORDER BY doc_id""".stripMargin,
    "q_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT c_custkey, o_orderkey
        |FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
        |FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_theta" ->
      """SELECT p_partkey, band, p_retailprice
        |FROM part JOIN (VALUES (0.0, 1000.0, 'low'), (1000.0, 1500.0, 'mid'),
        |                       (1500.0, 1000000.0, 'high')) b(lo, hi, band)
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |ORDER BY p_partkey, band""".stripMargin,
    "q_join_range" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM events a JOIN events b
        |  ON a.event_id % 199 = 0 AND b.event_id <> a.event_id
        | AND ABS(a.value - b.value) <= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "q_join_range_topk" ->
      """SELECT a_id, b_id, rnk FROM (
        |  SELECT a.event_id AS a_id, b.event_id AS b_id,
        |         ROW_NUMBER() OVER (PARTITION BY a.event_id
        |           ORDER BY ABS(a.value - b.value), b.event_id) AS rnk
        |  FROM events a JOIN events b
        |    ON a.event_id % 199 = 0 AND b.event_id <> a.event_id
        |   AND ABS(a.value - b.value) <= 0.5
        |) WHERE rnk <= 3 ORDER BY a_id, rnk""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_asof_native" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id AS c_uid, ts AS c_ts, event_id AS c_id
        |           FROM events WHERE event_type = 'click'),
        |     j AS (SELECT p.p_id, p.user_id, p.p_ts, c.c_id, c.c_ts,
        |             ROW_NUMBER() OVER (PARTITION BY p.p_id
        |               ORDER BY c.c_ts DESC NULLS LAST, c.c_id DESC NULLS LAST) AS rn
        |           FROM p LEFT JOIN c ON p.user_id = c.c_uid AND c.c_ts <= p.p_ts)
        |SELECT p_id, user_id, STRFTIME(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
        |  c_id, STRFTIME(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
        |FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin,
    "q_join_asof_tol" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id AS c_uid, ts AS c_ts, event_id AS c_id
        |           FROM events WHERE event_type = 'click'),
        |     j AS (SELECT p.p_id, p.user_id, p.p_ts, c.c_id, c.c_ts,
        |             ROW_NUMBER() OVER (PARTITION BY p.p_id
        |               ORDER BY c.c_ts DESC NULLS LAST, c.c_id DESC NULLS LAST) AS rn
        |           FROM p LEFT JOIN c ON p.user_id = c.c_uid AND c.c_ts <= p.p_ts
        |             AND c.c_ts >= p.p_ts - INTERVAL 24 HOUR)
        |SELECT p_id, user_id, STRFTIME(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
        |  c_id, STRFTIME(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
        |FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin,
    "q_join_asof_fwd" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id AS c_uid, ts AS c_ts, event_id AS c_id
        |           FROM events WHERE event_type = 'click'),
        |     j AS (SELECT p.p_id, p.user_id, p.p_ts, c.c_id, c.c_ts,
        |             ROW_NUMBER() OVER (PARTITION BY p.p_id
        |               ORDER BY c.c_ts ASC NULLS LAST, c.c_id ASC NULLS LAST) AS rn
        |           FROM p LEFT JOIN c ON p.user_id = c.c_uid AND c.c_ts >= p.p_ts)
        |SELECT p_id, user_id, STRFTIME(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
        |  c_id, STRFTIME(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
        |FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin,
    "q_join_asof_near" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id AS c_uid, ts AS c_ts, event_id AS c_id
        |           FROM events WHERE event_type = 'click'),
        |     j AS (SELECT p.p_id, p.user_id, p.p_ts, c.c_id, c.c_ts,
        |             ROW_NUMBER() OVER (PARTITION BY p.p_id
        |               ORDER BY ABS(EPOCH_US(c.c_ts) - EPOCH_US(p.p_ts)) ASC NULLS LAST,
        |                 CASE WHEN c.c_ts <= p.p_ts THEN 0 ELSE 1 END ASC,
        |                 CASE WHEN c.c_ts <= p.p_ts THEN -c.c_id ELSE c.c_id END ASC NULLS LAST) AS rn
        |           FROM p LEFT JOIN c ON p.user_id = c.c_uid)
        |SELECT p_id, user_id, STRFTIME(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
        |  c_id, STRFTIME(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
        |FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin,
    "q_join_asof" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id AS c_uid, ts AS c_ts, event_id AS c_id
        |           FROM events WHERE event_type = 'click'),
        |     j AS (SELECT p.p_id, p.user_id, p.p_ts, c.c_id, c.c_ts,
        |             ROW_NUMBER() OVER (PARTITION BY p.p_id
        |               ORDER BY c.c_ts DESC NULLS LAST, c.c_id DESC NULLS LAST) AS rn
        |           FROM p LEFT JOIN c ON p.user_id = c.c_uid AND c.c_ts <= p.p_ts)
        |SELECT p_id, user_id, STRFTIME(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
        |  c_id, STRFTIME(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
        |FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin,
    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey ASC""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 50""".stripMargin,
    "q_union_all" ->
      """SELECT nk FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |  UNION ALL SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        |ORDER BY nk""".stripMargin,
    "q_union_dist" ->
      """SELECT nk FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |  UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        |ORDER BY nk""".stripMargin,
    "q_intersect" ->
      """SELECT nk FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |  INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        |ORDER BY nk""".stripMargin,
    "q_except" ->
      """SELECT k FROM (
        |  SELECT c_custkey AS k FROM customer
        |  EXCEPT SELECT o_custkey FROM orders
        |    WHERE o_orderdate < TIMESTAMP '1996-01-01')
        |ORDER BY k""".stripMargin,
    "q_join_salted" ->
      """SELECT l_orderkey AS k, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY k, l_linenumber""".stripMargin,
    "q_join_nullsafe" ->
      """WITH a AS (SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS ka
        |  FROM orders),
        |b AS (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
        |        ELSE o_orderstatus END AS kb, COUNT(*) AS n_side
        |  FROM orders GROUP BY 1)
        |SELECT o_orderkey, ka, n_side FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
        |ORDER BY o_orderkey, ka NULLS FIRST""".stripMargin,
    "q_skyline" ->
      """WITH grp AS (
        |  SELECT p_brand, p_retailprice, MAX(p_size) AS grp_max
        |  FROM part GROUP BY p_brand, p_retailprice),
        |kept AS (
        |  SELECT p_brand, p_retailprice, grp_max,
        |    MAX(grp_max) OVER (PARTITION BY p_brand ORDER BY p_retailprice ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
        |  FROM grp)
        |SELECT p.p_brand, p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
        |FROM part p JOIN kept k
        |  ON p.p_brand = k.p_brand AND p.p_retailprice = k.p_retailprice
        |WHERE (k.run_max IS NULL OR k.grp_max > k.run_max) AND p.p_size = k.grp_max
        |ORDER BY p.p_brand, p.p_partkey""".stripMargin,
    "q_join_lateral" ->
      """SELECT r.r_name, n.n_name
        |FROM region r,
        |  LATERAL (SELECT n_name FROM nation
        |           WHERE n_regionkey = r.r_regionkey
        |           ORDER BY n_name LIMIT 2) n
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_salted_skew" ->
      """WITH li AS (SELECT CASE WHEN l_orderkey % 2 = 0 THEN CAST(1 AS BIGINT)
        |    ELSE l_orderkey END AS k,
        |    CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
        |  FROM lineitem)
        |SELECT li.k, l_linenumber, l_quantity, o_totalprice
        |FROM li JOIN orders ON li.k = o_orderkey
        |ORDER BY k, l_linenumber, l_quantity, o_totalprice""".stripMargin,
    "q_unpivot" ->
      """SELECT yr, status, cnt FROM (
        |  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr, 'F' AS status,
        |    COUNT(*) FILTER (o_orderstatus = 'F') AS cnt FROM orders GROUP BY 1
        |  UNION ALL
        |  SELECT CAST(YEAR(o_orderdate) AS BIGINT), 'O',
        |    COUNT(*) FILTER (o_orderstatus = 'O') FROM orders GROUP BY 1
        |  UNION ALL
        |  SELECT CAST(YEAR(o_orderdate) AS BIGINT), 'P',
        |    COUNT(*) FILTER (o_orderstatus = 'P') FROM orders GROUP BY 1)
        |ORDER BY yr, status""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2)
        |    AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2)
        |    AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin
  )
}
