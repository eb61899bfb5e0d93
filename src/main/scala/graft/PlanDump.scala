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
    qlist.split(',').filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $name")
    }
    spark.stop()
  }
}
