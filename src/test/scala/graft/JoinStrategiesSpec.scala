package graft

import graft.operators.JoinStrategies
import org.apache.spark.sql.functions._

/** Bucketed co-location and skew salting: correctness (identical rows
  * to the plain join) AND the plan property that makes them matter at
  * scale (no shuffle exchange between bucketed tables). */
class JoinStrategiesSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    JoinStrategies.writeBucketed(
      Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 4)
    JoinStrategies.writeBucketed(
      Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 4)
    // disable auto-broadcast: at real scale neither side broadcasts —
    // the point of bucketing is the shuffle-free sort-merge join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = JoinStrategies.bucketedJoin(spark, "b_orders", "b_lineitem", "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() ==
        Tables.load(spark, sfDir, "lineitem").count()) // FK: every line has an order
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE b_orders"); spark.sql("DROP TABLE b_lineitem")
    }
  }

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber"), col("l_quantity"))
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = li.join(o, "k")
    val salted = JoinStrategies.saltedJoin(li, o, "k", col("l_linenumber"), 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
