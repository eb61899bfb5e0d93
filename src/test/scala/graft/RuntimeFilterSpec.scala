package graft

import org.apache.spark.sql.functions._

/** Runtime scan-reduction features that matter at 100 TB and cost
  * nothing to enable: dynamic partition pruning (a selective dim filter
  * prunes the partitioned fact scan at runtime through the join) and
  * runtime bloom-filter injection (the dim side's join keys become a
  * bloom filter applied at the fact scan). Both are plan-level
  * properties — asserted here so a regression in our session confs or
  * query shapes can't silently drop them. */
class RuntimeFilterSpec extends SparkTestBase {

  test("dynamic partition pruning fires through a selective dim join") {
    val dir = s"/tmp/graft-dpp-${System.nanoTime()}"
    Tables.load(spark, sfDir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim filtered on a NON-join column: a filter on the join column
    // itself would be statically propagated through the join by
    // constraint inference (no DPP needed — verified: the fact scan
    // gets a literal PartitionFilter). The surviving yr values are only
    // known at runtime, which is exactly what DPP exists for. The dim
    // must be a real scan (a local relation folds the filter away).
    import spark.implicits._
    val dimDir = s"$dir-dim"
    (1992 to 1998).map(y => (y, if (y == 1995) "target" else "other"))
      .toDF("d_yr", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "target")
    val joined = fact.join(dim, col("yr") === col("d_yr"))
      .select(col("o_orderkey"), col("yr"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning in:\n$p")
    assert(joined.count() > 0)
  }

  test("ANALYZE TABLE statistics feed the cost-based optimizer") {
    // table + column stats are what CBO's join reorder and broadcast
    // decisions run on at 100 TB (file sizes alone mis-estimate
    // filtered/derived relations)
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.saveAsTable("cbo_orders")
    try {
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_orderstatus")
      val prev = spark.conf.getOption("spark.sql.cbo.enabled")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val stats = spark.table("cbo_orders").queryExecution.optimizedPlan.stats
        val expected = spark.table("cbo_orders").count()
        assert(stats.rowCount.contains(BigInt(expected)),
          s"CBO row count ${stats.rowCount} != $expected")
        assert(stats.attributeStats.nonEmpty, "column stats missing")
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None    => spark.conf.unset("spark.sql.cbo.enabled")
      }
    } finally spark.sql("DROP TABLE cbo_orders")
  }

  test("runtime bloom filter from a selective dim lands on the fact scan") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test-scale thresholds: the default 10MB/10GB gates are sized
      // for real clusters
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = Tables.load(spark, sfDir, "orders")
        .filter(col("o_totalprice") > 400000) // selective: few surviving keys
        .select(col("o_orderkey"), col("o_orderpriority"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter injected in:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
