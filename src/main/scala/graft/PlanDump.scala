package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Per-query `.explain("formatted")` dump for the optimization-round
  * evidence files (`plans/r21/<query>_{before,after}.txt`):
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>"
  *
  * writes one `<outDir>/<query>_<suffix>.txt` per query. Driver-loop
  * queries (BPE training, CC fixpoints) execute their loop to build the
  * final frame — the dump shows the plan of the frame the bench times. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qlist) = args.take(4)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // SPARK_GRAFT_PLAN_EXEC=1 (r22): execute the frame (noop sink)
    // BEFORE dumping, so the dump shows the AQE FINAL plan —
    // `isFinalPlan=true`, with runtime join selections and
    // ReusedExchange / reused-stage nodes. Required to evidence
    // optimizations that exist only at runtime (AQE stage reuse across
    // an unrolled iterative plan, e.g. q_pagerank_multi's shared emit
    // subtree); the default pre-execution dump cannot show them.
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    qlist.split(',').filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // executing THIS QueryExecution's physical plan (a noop write
      // would spawn a separate one and leave df's adaptive plan
      // unfinalized — the first r22 attempt dumped isFinalPlan=false)
      if (exec) df.queryExecution.executedPlan.execute().count(): Unit
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $name")
    }
    spark.stop()
  }
}
