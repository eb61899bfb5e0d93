package graft

import java.nio.file.Files

/** Reliable-checkpoint path (VERDICT r2 "what's missing" #3): when
  * `spark.graft.checkpointDir` is set, the iterative operators truncate
  * lineage via HDFS-style `checkpoint()` instead of executor-local
  * blocks, so a 100 TB run survives executor loss. The spec runs the
  * heaviest iterative query both ways and requires identical results.
  */
class CheckpointsSpec extends SparkTestBase {

  test("q_dedup_cluster is identical under reliable checkpointing, and " +
    "checkpoint files actually land in spark.graft.checkpointDir") {
    val q = SparkEntry.queries("q_dedup_cluster")
    val baseline = q(spark, sfDir).collect().toSeq

    val dir = Files.createTempDirectory("graft-ckpt").toFile
    spark.conf.set(Checkpoints.ConfKey, dir.getAbsolutePath)
    try {
      val reliable = q(spark, sfDir).collect().toSeq
      assert(reliable == baseline)
      // checkpoint() must have written RDD block files under the dir
      def countFiles(f: java.io.File): Int =
        if (f.isFile) 1 else Option(f.listFiles()).map(_.map(countFiles).sum).getOrElse(0)
      assert(countFiles(dir) > 0, s"no checkpoint files under $dir")
    } finally {
      spark.conf.unset(Checkpoints.ConfKey)
    }
  }

  test("redirect resolution works under reliable checkpointing") {
    import spark.implicits._
    val redirects = Seq(("A", "B"), ("B", "C"), ("L1", "L2"), ("L2", "L1"))
      .toDF("src", "dst")
    val content = Seq(("C", 7L)).toDF("title", "bid")
    val dir = Files.createTempDirectory("graft-ckpt2").toFile
    spark.conf.set(Checkpoints.ConfKey, dir.getAbsolutePath)
    try {
      val out = etl.Redirects.resolveTransitive(redirects, content)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(out == Set("A" -> 7L, "B" -> 7L))
    } finally {
      spark.conf.unset(Checkpoints.ConfKey)
    }
  }
}
