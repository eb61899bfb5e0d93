package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected-components,
  * transitive redirect resolution, shared-scan decontamination).
  *
  * Default is `localCheckpoint()`: eager, no HDFS round-trip — right for
  * the single-JVM sandbox. But localCheckpoint stores blocks on executor
  * local store; on a real cluster one lost executor kills the job
  * NON-recoverably because lineage was truncated. At 100 TB, set
  * `spark.graft.checkpointDir` to a reliable (HDFS/S3) path and every
  * iterative operator switches to `checkpoint()` — blocks survive
  * executor loss and the job recomputes nothing on failure.
  *
  * Retention: each hop writes a full dataset copy under the dir, and
  * Spark does NOT delete superseded checkpoints by default. Set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
  * SparkConf, at session build) so the ContextCleaner removes a hop's
  * files once its RDD is unreferenced, or point the dir at
  * lifecycle-managed storage — otherwise a long-running workload grows
  * the dir without bound.
  */
object Checkpoints {
  val ConfKey = "spark.graft.checkpointDir"

  def ckpt(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir mints a fresh subdirectory per call — set once.
        if (!sc.getCheckpointDir.exists(_.contains(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
