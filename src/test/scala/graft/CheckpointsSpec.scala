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

  test("chaos: lost cached blocks kill localCheckpoint, reliable checkpoint recovers") {
    // the 100 TB failure mode this conf exists for: localCheckpoint
    // truncates lineage AND stores blocks only on executor local store,
    // so losing an executor makes the data non-recomputable. Simulate
    // the loss by unpersisting the checkpointed blocks (the local-mode
    // equivalent of the executor dying) and require the documented
    // behaviors on both paths.
    val df = spark.range(0, 10000, 1, 8).toDF("id")

    val lc = df.localCheckpoint()
    assert(lc.count() == 10000L)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val e = intercept[org.apache.spark.SparkException] { lc.count() }
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(chain.contains("Checkpoint block") || chain.contains("not found"),
      s"expected the designed non-recoverable localCheckpoint failure, got:\n$chain")

    // reliable path: blocks gone → recompute reads the checkpoint FILES
    val dir = Files.createTempDirectory("graft-ckpt-chaos").toFile
    spark.conf.set(Checkpoints.ConfKey, dir.getAbsolutePath)
    try {
      val rc = Checkpoints.ckpt(df)
      assert(rc.count() == 10000L)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      assert(rc.count() == 10000L,
        "reliable checkpoint must survive losing every cached block")
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("chaos: the CC loop's result survives block loss mid-iteration on the reliable path") {
    // same failure injected INSIDE an iterative operator: run
    // q_dedup_cluster with reliable checkpointing while a background
    // thread repeatedly drops every cached block — per-hop checkpoint
    // files must keep every hop recomputable and the result identical.
    val q = SparkEntry.queries("q_dedup_cluster")
    val baseline = q(spark, sfDir).collect().toSeq
    val dir = Files.createTempDirectory("graft-ckpt-chaos-cc").toFile
    spark.conf.set(Checkpoints.ConfKey, dir.getAbsolutePath)
    @volatile var stop = false
    val chaos = new Thread(() => {
      while (!stop) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(r => try r.unpersist(blocking = false) catch { case _: Exception => () })
        Thread.sleep(50)
      }
    })
    chaos.setDaemon(true)
    try {
      chaos.start()
      val chaosed = q(spark, sfDir).collect().toSeq
      assert(chaosed == baseline,
        "CC result must be identical under continuous cached-block loss")
    } finally {
      stop = true
      chaos.join()
      spark.conf.unset(Checkpoints.ConfKey)
    }
  }

  test("ckptLazy: lazy persistence with a named sole consumer; raw lazy " +
    "call sites are confined to Checkpoints (VERDICT r21 #7 tripwire)") {
    // semantics: identical frame, blocks persisted by the FIRST action
    // rather than a dedicated job (storage level registered at call time)
    val df = spark.range(0, 1000, 1, 4).toDF("id")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val lazyDf = Checkpoints.ckptLazy(df, soleConsumer = "the count below")
    val newIds = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(newIds.nonEmpty, "lazy ckpt must register its RDD at call time")
    assert(lazyDf.count() == 1000L)
    newIds.foreach(id =>
      spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
    intercept[IllegalArgumentException] { Checkpoints.ckptLazy(df, "") }

    // tripwire: the single-dependency-branch contract of lazy
    // checkpointing is enforced by routing every lazy site through
    // ckptLazy (which names the sole consumer). A refactor that calls
    // ckpt(..., eager = false) directly bypasses the contract — fail it
    // here at the source level.
    import scala.jdk.CollectionConverters._
    val offenders = Files.walk(java.nio.file.Paths.get("src/main/scala"))
      .iterator().asScala
      .filter(p => p.toString.endsWith(".scala") &&
        !p.toString.endsWith("Checkpoints.scala"))
      .filter(p => Files.readString(p).matches(
        "(?s).*ckpt\\([^)]*eager\\s*=\\s*false.*"))
      .toList
    assert(offenders.isEmpty,
      s"raw lazy ckpt call sites outside Checkpoints.ckptLazy: $offenders")
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
