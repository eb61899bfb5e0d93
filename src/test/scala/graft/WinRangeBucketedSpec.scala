package graft

import graft.queries.Aggregates
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q_win_range — two-pass bucketed range frame (Aggregates.bucketedRangeSum).
  *
  * The DuckDB oracle checks the sf0.01 values; these specs assert what the
  * oracle can't see: that the rewrite equals the naive single-partition
  * window on data straddling MANY bucket boundaries (including keys exactly
  * at boundary, boundary-1, and boundary-range), and that the executed plan
  * windows over the fine-grained (partKey, bucket) spec rather than the
  * 3-value key alone. */
class WinRangeBucketedSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed range sum equals naive window across many bucket boundaries") {
    // bucketWidth=256, range=100: 40 buckets, dense + gappy keys. Key gaps
    // matter: RANGE frames reach by value, not position, so a ghost row may
    // be the ONLY in-range predecessor of a bucket's first real row.
    val rows = (0 until 10000).map { i =>
      val key = i.toLong * 7 % 10240          // gappy, covers boundaries
      val part = Seq("A", "B", "C")(i % 3)
      (part, key, (i % 997).toLong)
    }.distinct
    val df = rows.toDF("p", "k", "v")
      .groupBy("p", "k").agg(max("v").as("v")) // unique (p,k) like o_orderkey

    val naive = df.withColumn("s",
      sum(col("v")).over(Window.partitionBy(col("p"))
        .orderBy(col("k").asc).rangeBetween(-100, Window.currentRow)))
    val bucketed = Aggregates.bucketedRangeSum(
      df, "p", "k", col("v"), range = 100L, bucketWidth = 256L, out = "s")

    val a = naive.orderBy("p", "k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val b = bucketed.orderBy("p", "k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(a.length === b.length)
    assert(a.sameElements(b))
  }

  test("q_win_range plan windows over (status, bucket), not status alone") {
    val plan = Aggregates.queries("q_win_range")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val winSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winSpecs.nonEmpty, "expected a Window node in the plan")
    assert(winSpecs.forall(_.contains("__bkt")),
      s"every window spec must partition by the bucket column:\n${winSpecs.mkString("\n")}")
  }

  test("q_win_range matches the naive plan on real orders data") {
    val o = graft.Tables.load(spark, sfDir, "orders")
    val naive = o.select(col("o_orderstatus"), col("o_orderkey"),
      sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .over(Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_orderkey").asc).rangeBetween(-100, Window.currentRow))
        .cast("double").as("wsum"))
      .orderBy("o_orderstatus", "o_orderkey").collect()
    val got = Aggregates.queries("q_win_range")(spark, sfDir).collect()
    assert(got.length === naive.length)
    got.zip(naive).foreach { case (g, n) => assert(g === n) }
  }
}
