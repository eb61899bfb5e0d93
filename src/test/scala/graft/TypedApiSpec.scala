package graft

import org.apache.spark.sql.functions._

/** Typed Dataset API surface (the imperative escape hatch): groupByKey /
  * mapGroups / cogroup produce the same answers as the declarative
  * forms. The engine's position (SURVEY §2 design rules) is that the
  * declarative plan is strictly better — Catalyst sees through it,
  * partial aggregation applies, and codegen stays on — so these exist
  * as equivalence proofs for the API, not as recommended shapes. */
class TypedApiSpec extends SparkTestBase {
  import spark.implicits._

  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("typed cogroup (customer x orders) == declarative join+agg") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_name")).as[(Long, String)]
    val ords = orders
      .select(col("o_custkey").cast("long"), col("o_totalprice")).as[(Long, Double)]
    // typed: per customer, count orders + exact cents total
    val typed = cust.groupByKey(_._1).cogroup(ords.groupByKey(_._1)) {
      (key, cs, os) =>
        val names = cs.map(_._2).toList
        if (names.isEmpty) Iterator.empty
        else {
          val prices = os.map(_._2).toList
          Iterator((key, names.head, prices.length.toLong,
            prices.map(p => math.round(p * 100)).sum))
        }
    }.collect().map(t => (t._1, t._2, t._3, t._4)).toSet

    val declarative = spark.read.parquet(s"$sfDir/customer.parquet")
      .join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey").cast("long").as("k"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n"),
        coalesce(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")), lit(0L)).as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    assert(typed === declarative)
  }

  test("typed mapGroups top order per customer == window row_number form") {
    val ords = orders
      .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"),
        col("o_totalprice")).as[(Long, Long, Double)]
    val typed = ords.groupByKey(_._1).mapGroups { (k, it) =>
      val best = it.minBy(t => (-t._3, t._2)) // max price, min key tiebreak
      (k, best._2)
    }.collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val decl = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(typed === decl)
  }
}
