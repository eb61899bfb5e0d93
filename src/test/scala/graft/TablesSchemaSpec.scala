package graft

import org.apache.spark.sql.types._

/** Testdata schema-drift guard (VERDICT r12 #2). The driver owns
  * /root/testdata and regenerated it between rounds 11 and 12, silently
  * changing events.ts from parquet TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) — which surfaced as 21
  * scattered analysis exceptions at check time. This spec pins the
  * *logical* schema every query sees after Tables.load, at all three
  * scale factors, tolerant of physical-encoding churn (Tables.loadEvents
  * normalizes), so the next regeneration fails as one readable assert.
  */
class TablesSchemaSpec extends SparkTestBase {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** name -> (column, type) in expected order; nullability ignored
    * (physical writers differ on required vs optional). Pinned from the
    * r12-regenerated testdata as loaded through Tables.load: NTZ date
    * columns stay NTZ (queries were written against that), events.ts is
    * normalized to session-UTC TimestampType by loadEvents.
    */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  for (dir <- sfDirs; (table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table logical schema stable at $dir") {
      val got = Tables.load(spark, dir, table).schema
        .map(f => f.name -> f.dataType)
      assert(got == cols,
        s"\nTESTDATA SCHEMA DRIFT for '$table' at $dir:\n  expected: " +
        cols.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ") +
        s"\n  actual:   " +
        got.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ") +
        "\nThe driver regenerated /root/testdata with a new encoding; " +
        "adapt graft.Tables.load so the logical schema stays stable " +
        "(see Tables.loadEvents for the events precedent).")
    }
  }

  test("ts range predicates push through the NTZ-normalizing cast to the scan") {
    // loadEvents puts cast(ts_ntz as timestamp) between the scan and
    // every downstream predicate; at 100 TB the whole events design
    // collapses if that cast blocks parquet filter pushdown. Catalyst
    // unwraps the order-preserving cast (session tz is UTC) — pin that.
    val plan = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(org.apache.spark.sql.functions.col("ts") >=
        org.apache.spark.sql.functions.lit("2024-06-01 00:00:00").cast("timestamp"))
      .select("event_id", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,"),
      s"ts range filter did not reach PushedFilters:\n$plan")
  }

  test("events.ts normalizes to a plausible microsecond UTC instant") {
    // DuckDB reads TIMESTAMP micros (naive) directly; the old nanos path
    // truncated to micros. Either way the first event must decode to a
    // sane wall-clock year so a units-off-by-1000 bug (ms vs us vs ns)
    // can't pass silently.
    val first = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .orderBy("event_id").limit(1)
      .selectExpr("cast(ts as string) as ts_str").collect()(0).getString(0)
    assert(first.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?"""),
      s"unexpected ts rendering: $first")
    val year = first.take(4).toInt
    assert(year >= 2000 && year <= 2035,
      s"events.ts decoded to an implausible instant ($first) — " +
      "likely a units mismatch (ms/us/ns) in Tables.loadEvents")
  }
}
