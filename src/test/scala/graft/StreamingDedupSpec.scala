package graft

import java.nio.file.Files
import graft.operators.IncrementalDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.BatchId

/** The complete continuous-crawl pipeline: file-source streaming ingest
  * (checkpointed offsets, exactly-once) composed with the persisted
  * fingerprint store (IncrementalDedup) via foreachBatch — each
  * micro-batch dedups against EVERYTHING ingested before it, across
  * restarts, without ever re-reading the corpus. This is the
  * IncrementalIngestSpec + IncrementalDedupSpec machinery joined into
  * the shape a recurring crawl actually runs. */
class StreamingDedupSpec extends SparkTestBase {

  test("streaming ingest + store dedup: cross-batch dupes drop across restarts") {
    val src = Files.createTempDirectory("graft-sdedup-src").toString
    val ckpt = Files.createTempDirectory("graft-sdedup-ckpt").toString
    val store = Files.createTempDirectory("graft-sdedup-store")
      .resolve("store").toString
    val out = Files.createTempDirectory("graft-sdedup-out").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    import spark.implicits._

    def addFile(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          // the batchId keys the store append, so a replayed batch
          // returns its recorded survivors instead of anti-joining
          // itself to zero
          IncrementalDedup.dedupDelta(spark, df, store,
              batchId = BatchId(id.toString))
            .write.mode("append").parquet(out)
        }
        .start()
      q.awaitTermination()
    }

    addFile(1L -> "alpha body", 2L -> "beta body")
    runOnce()
    // second crawl: 3 duplicates 1's body, 4 is novel
    addFile(3L -> "alpha body", 4L -> "gamma body")
    runOnce()
    // third crawl after a "restart": 5 duplicates 4, 6 is novel; the
    // checkpoint must skip files 1-2, the store must remember batch 2
    addFile(5L -> "gamma body", 6L -> "delta body")
    runOnce()

    val kept = spark.read.parquet(out)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(kept === Set(1L, 2L, 4L, 6L),
      s"exactly one survivor per distinct body, earliest wins: $kept")

    // replaying with a fresh query but the SAME checkpoint+store emits
    // nothing new (no files, no fps)
    runOnce()
    assert(spark.read.parquet(out).count() === 4)
  }

  test("a batch replayed after a crash-before-downstream-commit returns its recorded survivors") {
    val store = Files.createTempDirectory("graft-replay-store")
      .resolve("store").toString
    import spark.implicits._
    val batch = Seq(1L -> "one body", 2L -> "two body", 3L -> "one body")
      .toDF("doc_id", "text")
    def run() = IncrementalDedup
      .dedupDelta(spark, batch, store, batchId = BatchId("42"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val first = run()
    assert(first.map(_._2) === Set(1L, 2L)) // 3 is a within-batch dup
    // the caller "crashed" before committing survivors downstream; the
    // retry must return the SAME survivors, not anti-join itself to zero
    val retried = run()
    assert(retried === first)
    // and the store holds exactly one batch record for id 42
    val dirs = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch-"))
    assert(dirs.map(_.getName).toSeq === Seq("batch-42"), dirs.mkString(","))
    // near-dup variant: same contract
    val nstore = Files.createTempDirectory("graft-replay-nstore")
      .resolve("store").toString
    val longDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val nbatch = Seq(10L -> longDoc, 11L -> longDoc).toDF("doc_id", "text")
    def nrun() = IncrementalDedup
      .dedupDeltaNear(spark, nbatch, nstore, batchId = BatchId("7"))
      .collect().map(_.getLong(0)).toSet
    val nfirst = nrun()
    assert(nfirst === Set(10L))
    assert(nrun() === nfirst)
  }
}
