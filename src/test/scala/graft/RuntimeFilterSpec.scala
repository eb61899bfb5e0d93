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

  test("CBO column stats flip a filtered-dim join from sort-merge to broadcast") {
    // The decision CBO exists for: a dim whose FILES are too big to
    // broadcast but whose FILTERED row count is tiny. Size-only stats
    // pass the full file size through the filter (no selectivity
    // model), so the planner picks sort-merge; with ANALYZE column
    // stats, FilterEstimation turns `key = const` into ~rows/ndv rows
    // and the filtered dim drops under the broadcast threshold.
    spark.sql("DROP TABLE IF EXISTS cbo_flip_dim")
    import spark.implicits._
    // low-compressibility payload so the parquet footprint stays well
    // above the broadcast threshold set below
    // filter column ≠ join column: an equality on the join key would be
    // propagated onto the fact side by constraint inference and shrink
    // BOTH sides (see the DPP test above) — the flip must come from the
    // dim's own selectivity estimate alone
    spark.range(0, 200000)
      .select((col("id") % 1000).as("d_key"), col("id").as("d_sel"),
        md5(concat(col("id").cast("string"), lit("pad"))).as("d_pad"))
      .write.saveAsTable("cbo_flip_dim")
    // threshold below BOTH raw file sizes (sf0.001 lineitem is ~112 KB)
    // so nothing broadcasts on size alone; only the stats-estimated
    // filtered dim drops under it
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString,
      "spark.sql.cbo.enabled" -> "true")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // full-width fact: column pruning scales the scan's size estimate
      // by schema ratio, and a 2-of-16-column projection would drop the
      // fact itself under the threshold
      val fact = Tables.load(spark, sfDir, "lineitem")
      def planFor(): String = {
        val dim = spark.table("cbo_flip_dim").filter(col("d_sel") === 12345L)
        fact.join(dim, col("l_orderkey") === col("d_key"))
          .queryExecution.sparkPlan.toString
      }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // sanity: the dim's on-disk size really is above the threshold,
      // else the flip would happen without stats too
      val dimBytes = spark.table("cbo_flip_dim")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      assert(dimBytes > BigInt(64 * 1024),
        s"fixture too small to prove the flip: $dimBytes bytes")
      val withoutStats = planFor()
      assert(withoutStats.contains("SortMergeJoin") &&
        !withoutStats.contains("BroadcastHashJoin"),
        s"without column stats the filtered dim must NOT broadcast:\n$withoutStats")
      spark.sql("ANALYZE TABLE cbo_flip_dim COMPUTE STATISTICS FOR COLUMNS d_key, d_sel")
      val withStats = planFor()
      assert(withStats.contains("BroadcastHashJoin"),
        s"with column stats the filtered dim must broadcast:\n$withStats")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE cbo_flip_dim")
    }
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
