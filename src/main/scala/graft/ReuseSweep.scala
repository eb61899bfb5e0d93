package graft

import org.apache.spark.sql.SparkSession

/** Measurement main for shared-artifact reuse (VERDICT r17 #8): times
  * the two fixpoint-carrying QA queries cold (recompute, the bench
  * default) and warm (reuse on, upstream query ran first in the same
  * session) at `SPARK_GRAFT_SF_DIR`. One JSON line per row. */
object ReuseSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-reuse-sweep")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup (JIT) on unrelated light queries
    time("q_scan_project"); time("q_agg_hash")

    val pairs = Seq(
      ("q_bpe_apply", "q_tok_fertility"),
      ("q_dedup_cluster", "q_dedup_survivor"))
    pairs.foreach { case (upstream, consumer) =>
      ArtifactCache.clear()
      spark.conf.unset(ArtifactCache.ConfKey)
      val cold = time(consumer)
      ArtifactCache.clear()
      spark.conf.set(ArtifactCache.ConfKey, "true")
      val up = time(upstream)
      val warm = time(consumer)
      spark.conf.unset(ArtifactCache.ConfKey)
      println(f"""{"consumer":"$consumer","upstream":"$upstream",""" +
        f""""cold_s":$cold%.2f,"upstream_s":$up%.2f,"warm_s":$warm%.2f}""")
    }
    spark.stop()
  }
}
