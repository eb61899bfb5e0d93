package graft

import java.nio.file.{Files, Paths}

/** Operational posture for damaged inputs — at 100 TB some file WILL be
  * truncated or corrupt. Default must FAIL LOUDLY (silently dropping a
  * shard corrupts every downstream count); with
  * `spark.sql.files.ignoreCorruptFiles=true` the scan must skip the bad
  * file and read everything else. */
class CorruptFilesSpec extends SparkTestBase {

  test("corrupt parquet shard: loud failure by default, skip-and-continue when opted in") {
    val dir = Files.createTempDirectory("graft-corrupt").toString
    spark.range(0, 10).toDF("id").coalesce(1).write.mode("append").parquet(dir)
    spark.range(10, 20).toDF("id").coalesce(1).write.mode("append").parquet(dir)
    // a "shard" that is not parquet at all
    Files.write(Paths.get(dir, "part-corrupt.parquet"),
      "this is not a parquet file".getBytes("UTF-8"))

    val key = "spark.sql.files.ignoreCorruptFiles"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      val loud = intercept[Exception] {
        spark.read.parquet(dir).count()
      }
      assert(loud.getMessage != null)

      spark.conf.set(key, "true")
      val ids = spark.read.parquet(dir).collect().map(_.getLong(0)).toSet
      assert(ids === (0L until 20L).toSet, s"good shards must survive: $ids")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
