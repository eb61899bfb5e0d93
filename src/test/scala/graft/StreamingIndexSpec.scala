package graft

import java.nio.file.{Files, Paths}
import graft.operators.InvertedIndexStore
import graft.streaming.StreamingIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Continuous inverted-index maintenance (streaming/StreamingIndex):
  * a stream-fed store must equal the one-shot batch build bit-exactly
  * (df/tf and the bm25 probe), survive restarts without re-ingesting,
  * and turn an ENGINE-FORCED micro-batch replay (deleted checkpoint
  * commit record) into a store-level no-op. */
class StreamingIndexSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docs = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  private def stats(store: String) =
    InvertedIndexStore.termStats(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def probe(store: String) =
    InvertedIndexStore.bm25Probe(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("stream-built index == one-shot batch build; engine-forced replay " +
    "is a store no-op") {
    val root = Files.createTempDirectory("graft-sindex").toString
    val src = s"$root/src"
    val ckpt = s"$root/ckpt"
    val store = s"$root/store"
    Files.createDirectories(Paths.get(src))

    def addFile(half: Int): Unit =
      docs.filter(col("doc_id") % 2 === half).coalesce(1)
        .write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val q = StreamingIndex.indexPipeline(
        spark.readStream.schema(schema).parquet(src), store, ckpt)
      q.awaitTermination()
    }

    addFile(0)
    runOnce()
    addFile(1)
    runOnce()

    val oneShot = s"$root/oneshot"
    InvertedIndexStore.appendBatch(spark, docs, oneShot, "full")
    assert(stats(store) == stats(oneShot) && stats(store).nonEmpty)
    assert(probe(store) == probe(oneShot))
    assert(InvertedIndexStore.readDocLens(spark, store).count() == docs.count())

    // restart with no new files: nothing re-ingests
    runOnce()
    assert(stats(store) == stats(oneShot))

    // ENGINE-FORCED replay: delete the newest checkpoint commit record
    // — the on-disk state of a crash after the store append but before
    // the engine recorded the batch. The restarted query MUST re-run
    // that batch id, and the store's replay rule must make it a read.
    val commits = Paths.get(s"$ckpt/commits")
    val files = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    Files.list(commits).forEach(p =>
      if (!p.getFileName.toString.startsWith(".")) files += p)
    val last = files.maxBy(_.getFileName.toString.filter(_.isDigit).toLong)
    Files.delete(last)
    Files.deleteIfExists(last.resolveSibling("." + last.getFileName + ".crc"))
    runOnce()
    assert(stats(store) == stats(oneShot), "replayed batch double-counted")
    assert(probe(store) == probe(oneShot))

    // and compaction over the stream-built store preserves everything
    InvertedIndexStore.compact(spark, store)
    assert(stats(store) == stats(oneShot))
    assert(probe(store) == probe(oneShot))
  }

  test("a DIFFERENT checkpoint against the same store fails loudly " +
    "(stream identity pin) — counted stats can never double-ingest") {
    val root = Files.createTempDirectory("graft-sindex-pin").toString
    val src = s"$root/src"
    Files.createDirectories(Paths.get(src))
    docs.coalesce(1).write.mode("append").parquet(src)
    val store = s"$root/store"
    val q1 = StreamingIndex.indexPipeline(
      spark.readStream.schema(schema).parquet(src), store, s"$root/ckptA")
    q1.awaitTermination()
    val before = stats(store)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2 = StreamingIndex.indexPipeline(
        spark.readStream.schema(schema).parquet(src), store, s"$root/ckptB")
      q2.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maintained by streaming checkpoint")),
      s"expected the identity-pin error, got: ${messages(e).mkString(" | ")}")
    assert(stats(store) == before, "df/tf must be untouched by the intruder")
  }
}
