package graft

import org.apache.spark.sql.SparkSession

/** Measurement main for the BPE trainer's rounds-vs-wall-time curve
  * (VERDICT r17 #1): trains at a sweep of (merge budget, batchK) points
  * on `SPARK_GRAFT_SF_DIR` and prints one JSON line per point —
  * {budget, batchK, merges_done, rounds (= corpus passes), wall_s}.
  * The claim under test: wall time scales with ROUNDS (corpus passes),
  * not merges, so batching buys ~batchK× at a fixed budget and makes a
  * 32k-merge production vocabulary a ~2k-pass job instead of 32k.
  * Results land as a SCALING.md row. Dev tool — not on any query path.
  */
object BpeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bpe-sweep")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val points = Seq((8, 1), (64, 1), (8, 16), (64, 16), (256, 16), (1024, 32))
    points.foreach { case (budget, k) =>
      val t0 = System.nanoTime()
      val (merges, enc, sizes) = queries.Text.bpeLoopBatched(spark, sfDir, budget, k)
      // force the final corpus like a downstream apply/fertility pass would
      val nDocs = enc.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"""{"budget":$budget,"batchK":$k,"merges_done":${merges.length},""" +
        f""""rounds":${sizes.length},"docs":$nDocs,"wall_s":$wall%.2f}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
