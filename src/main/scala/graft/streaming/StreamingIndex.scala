package graft.streaming

import graft.operators.InvertedIndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** CONTINUOUS inverted-index maintenance (r19): a corpus stream feeds
  * the persisted [[InvertedIndexStore]] one micro-batch at a time, so
  * retrieval (`bm25Probe`, `termStats`) always reads an index that is
  * current to the last committed batch — the streaming twin of the
  * `q_bm25_probe` ingest, and the shape a crawl-fed search stack runs:
  * ingest is incremental (one delta tokenize + bucket-partitioned
  * append per batch, never a corpus re-read), probes are term-bucket
  * pruned, and [[InvertedIndexStore.compact]] runs out-of-band as
  * maintenance (safe against concurrent ingest by the manifest rules).
  *
  * Exactly-once WITHOUT a transactional sink: the Structured Streaming
  * batch id IS the store batch id, so the two failure windows close:
  *  - crash after the store append but before the engine commits the
  *    batch → the engine replays the id → `appendBatch` finds the
  *    committed `batch-stream-<id>` dir and returns its recorded
  *    postings (a read, not a re-append) — no double counting;
  *  - crash before the append completes → the atomic rename never
  *    landed (or only the doclen side landed, which the postings
  *    commit-marker rules absorb on retry) → the replay ingests
  *    cleanly.
  * StreamingIndexSpec proves stream-built == one-shot batch-built
  * (df/tf/probe bit-equal) and drives the engine-forced replay
  * (deleted checkpoint commit record — the StreamingJdbcSpec
  * technique).
  */
object StreamingIndex {

  /** The `foreachBatch` body, exposed for direct invocation so specs
    * can drive replay without a running query. */
  def ingestBatch(batch: DataFrame, storePath: String, id: Long): Unit = {
    InvertedIndexStore.appendBatch(
      batch.sparkSession, batch, storePath, s"stream-$id")
    ()
  }

  /** Stream (doc_id, text) into the store at `storePath`. The store
    * pins this pipeline's checkpoint identity ([[StreamIdentity]]):
    * "batch id == store batch id" is only exactly-once within ONE
    * checkpoint lineage, so a different checkpoint against the same
    * store fails loudly instead of silently colliding epoch ids. */
  def indexPipeline(docs: DataFrame, storePath: String, checkpoint: String,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        StreamIdentity.requireSameStream(batch.sparkSession, storePath,
          StreamIdentity.checkpointToken(batch.sparkSession, checkpoint))
        ingestBatch(batch, storePath, id)
      }
      .start()
}
