package graft

import graft.operators.Compaction
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Compaction + schema-evolution reads: the maintenance pair for
  * incrementally-ingested parquet directories. */
class CompactionSpec extends SparkTestBase {

  test("compaction shrinks the file count and preserves every row") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    // 12 tiny appends — the incremental-ingest debris shape
    (0 until 12).foreach { i =>
      spark.range(i * 100, (i + 1) * 100).toDF("id")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val beforeRows = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("id"))).head()
    val (nBefore, nAfter) = Compaction.compact(spark, dir, targetBytes = 10L * 1024 * 1024)
    assert(nBefore == 12, s"expected 12 input part files, saw $nBefore")
    assert(nAfter < nBefore, s"compaction must shrink: $nBefore -> $nAfter")
    val afterRows = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("id"))).head()
    assert(afterRows == beforeRows, s"rows changed: $beforeRows -> $afterRows")
  }

  test("compaction refuses a partitionBy'd directory rather than flatten it") {
    val dir = Files.createTempDirectory("graft-compact-part").toString + "/t"
    spark.range(0, 100).toDF("id")
      .withColumn("day", (col("id") % 4).cast("string"))
      .write.partitionBy("day").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, dir)
    }
    assert(e.getMessage.contains("partition subdirectories"))
    // and the table is untouched
    assert(spark.read.parquet(dir).count() == 100L)
  }

  test("compaction lock file blocks a second concurrent compaction") {
    val dir = Files.createTempDirectory("graft-compact-lock").toString + "/t"
    spark.range(0, 10).toDF("id").coalesce(1).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(dir, Compaction.LockFile)
    fs.create(lock, false).close() // simulate a compaction in flight
    try {
      val e = intercept[java.io.IOException] { Compaction.compact(spark, dir) }
      assert(e.getMessage.contains("locked by another compaction"))
    } finally fs.delete(lock, false)
    // lock released → compaction proceeds
    val (b, a) = Compaction.compact(spark, dir)
    assert(b == 1 && a == 1)
    assert(!fs.exists(lock), "lock must not leak into the compacted table")
  }

  test("a stale lock from a crashed compaction is broken; a fresh one is not") {
    val dir = Files.createTempDirectory("graft-compact-stale").toString + "/t"
    spark.range(0, 10).toDF("id").coalesce(1).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(dir, Compaction.LockFile)
    // a crashed holder: lock exists, nobody will ever delete it
    fs.create(lock, false).close()
    fs.setTimes(lock, System.currentTimeMillis() - 3600 * 1000, -1) // 1h old
    // default max-age 30min → broken and the compaction proceeds
    val (b, a) = Compaction.compact(spark, dir)
    assert(b == 1 && a == 1)
    assert(!fs.exists(lock), "broken stale lock must not survive compaction")
    // a FRESH lock (age < max-age) still blocks, and the error names the holder
    fs.create(lock, false).close()
    try {
      val e = intercept[java.io.IOException] { Compaction.compact(spark, dir) }
      assert(e.getMessage.contains("locked by another compaction"))
      assert(e.getMessage.contains("broken automatically"),
        "error must tell the operator about the staleness policy")
    } finally fs.delete(lock, false)
  }

  test("concurrent compactions: at most one wins, rows survive, no lock leaks") {
    val dir = Files.createTempDirectory("graft-compact-race").toString + "/t"
    (0 until 8).foreach { i =>
      spark.range(i * 50, (i + 1) * 50).toDF("id")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val expected = spark.read.parquet(dir)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(col("id"))).head()
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, (Int, Int)]]()
    val threads = (1 to 2).map { _ =>
      new Thread(() =>
        results.add(
          try Right(Compaction.compact(spark, dir, targetBytes = 10L * 1024 * 1024))
          catch { case e: Throwable => Left(e) }))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val outcomes = results.asScala.toList
    // on the LOCAL fs create-no-overwrite is check-then-create, so both
    // threads may enter and the loser can fail anywhere in its swap —
    // the contract under race is not a clean error message, it is that
    // the TABLE survives intact and the lock never leaks (below).
    // Successes: 0, 1, or 2 are all legal orderings.
    assert(outcomes.size == 2)
    // the table must be byte-for-byte intact whatever happened
    val after = spark.read.parquet(dir)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(col("id"))).head()
    assert(after == expected, s"rows changed under concurrent compaction: $expected -> $after")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, Compaction.LockFile)),
      "advisory lock must not leak after the dust settles")
  }

  test("age sweep GCs orphaned tmp/stale-claim artifacts, keeps fresh ones and the recovery copy") {
    val base = Files.createTempDirectory("graft-compact-gc")
    val dir = base.toString + "/t"
    spark.range(0, 10).toDF("id").coalesce(1).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldTs = System.currentTimeMillis() - 3600 * 1000 // 1h, > 30min cutoff
    // crash debris: an aged orphan tmp dir, an aged stale-claim file,
    // an aged recovery (old) copy — plus a FRESH tmp (a live racer's)
    val agedTmp = new org.apache.hadoop.fs.Path(base.toString, ".t_compact_tmp_1-1")
    val freshTmp = new org.apache.hadoop.fs.Path(base.toString, ".t_compact_tmp_2-2")
    val recovery = new org.apache.hadoop.fs.Path(base.toString, ".t_compact_old_3-3")
    val claim = new org.apache.hadoop.fs.Path(dir, s".${Compaction.LockFile}.stale-4-4")
    Seq(agedTmp, freshTmp, recovery).foreach(fs.mkdirs(_))
    fs.create(claim, false).close()
    Seq(agedTmp, recovery).foreach(fs.setTimes(_, oldTs, -1))
    fs.setTimes(claim, oldTs, -1)
    val (b, a) = Compaction.compact(spark, dir, targetBytes = 10L * 1024 * 1024)
    assert(b == 1 && a == 1)
    assert(!fs.exists(agedTmp), "aged orphan tmp must be swept")
    assert(!fs.exists(claim), "aged stale-claim file must be swept")
    assert(fs.exists(freshTmp), "a fresh tmp (possible live racer) must survive")
    assert(fs.exists(recovery), "the _compact_old_ recovery copy is never GC'd")
  }

  test("an abort inside compaction releases its OWN lock (ownership-checked)") {
    // corrupt part file → the rewrite fails inside the locked section;
    // the finally must release the lock this attempt wrote (metadata
    // carries the attempt id) so the next compaction isn't blocked
    val dir = Files.createTempDirectory("graft-compact-abort").toString + "/t"
    spark.range(0, 10).toDF("id").coalesce(1).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val junk = new org.apache.hadoop.fs.Path(dir, "part-junk.parquet")
    val out = fs.create(junk, false)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    intercept[Exception] { Compaction.compact(spark, dir) }
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, Compaction.LockFile)),
      "failed compaction must release its own lock")
    // and a stale FOREIGN lock (different attempt id) broken + retaken
    // still ends released after a successful run
    val lock = new org.apache.hadoop.fs.Path(dir, Compaction.LockFile)
    val lout = fs.create(lock, false)
    lout.write("pid=1 host=ghost attempt=ghost-1 taken=1970".getBytes("UTF-8"))
    lout.close()
    fs.setTimes(lock, System.currentTimeMillis() - 3600 * 1000, -1)
    fs.delete(junk, false)
    val (b, a) = Compaction.compact(spark, dir)
    assert(b == 1 && a == 1)
    assert(!fs.exists(lock))
  }

  test("dynamic partition overwrite rewrites only the partitions in the batch") {
    // re-materializing one day of a partitioned corpus must not touch
    // the other days — static overwrite mode would drop them all
    val dir = Files.createTempDirectory("graft-dynpart").toString + "/t"
    spark.range(0, 100).toDF("id")
      .withColumn("day", (col("id") % 4).cast("string"))
      .write.partitionBy("day").parquet(dir)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // rewrite ONLY day=1 with corrected rows
      spark.range(1000, 1025).toDF("id").withColumn("day", lit("1"))
        .write.mode("overwrite").partitionBy("day").parquet(dir)
      // partition-column type inference reads "day" back as int —
      // stringify for the assertion
      val byDay = spark.read.parquet(dir).groupBy("day").count()
        .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
      assert(byDay == Map("0" -> 25L, "1" -> 25L, "2" -> 25L, "3" -> 25L))
      val day1 = spark.read.parquet(dir).filter(col("day") === "1")
        .select(min(col("id"))).head().getLong(0)
      assert(day1 == 1000L, "day=1 must hold the rewritten rows")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("observe() collects pipeline metrics in the same pass as the write") {
    // operational counters (rows kept, null rate, byte volume) without
    // a second scan — the audit a production ETL attaches to every stage
    import org.apache.spark.sql.Observation
    val obs = Observation("etl-audit")
    val df = Tables.load(spark, sfDir, "documents")
      .observe(obs, count(lit(1)).as("n_rows"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        count_if(col("lang").isNull).as("null_lang"))
      .filter(col("doc_id") >= 0)
    df.write.mode("overwrite").format("noop").save()
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] ==
      Tables.load(spark, sfDir, "documents").count())
    assert(m("n_chars").asInstanceOf[Long] > 0L)
    assert(m("null_lang").asInstanceOf[Long] == 0L)
  }

  test("mergeSchema reads across schema evolution; old files null the new column") {
    val dir = Files.createTempDirectory("graft-evolve").toString + "/t"
    spark.range(0, 5).toDF("id")
      .write.mode("append").parquet(dir)
    spark.range(5, 10).toDF("id").withColumn("lang", lit("en"))
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "lang"))
    val byLang = merged.groupBy(col("lang")).count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byLang == Map(None -> 5L, Some("en") -> 5L))
  }
}
