package graft.streaming

import graft.operators.AnnIndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** CONTINUOUS ANN-index maintenance (r20, VERDICT r19 #2): an
  * embedding stream feeds the persisted [[AnnIndexStore]] one
  * micro-batch at a time, so similarity probes always read an index
  * current to the last committed batch — the [[StreamingIndex]]
  * treatment applied to the ANN store, and the shape a continuous
  * embedding-ingest pipeline runs: each batch is one broadcast-codebook
  * assignment pass over the delta (never a corpus re-read), probes are
  * cell-pruned, and [[AnnIndexStore.compact]] runs out-of-band as
  * maintenance (safe against concurrent ingest by the manifest rules).
  *
  * Exactly-once WITHOUT a transactional sink: the Structured Streaming
  * batch id IS the store batch id ([[AnnIndexStore.appendBatch]] is
  * replay-idempotent on it), so the two failure windows close:
  *  - crash after the store append but before the engine commits the
  *    batch → the engine replays the id → `appendBatch` finds the
  *    committed `batch-stream-<id>` dir (or, post-compaction, its
  *    manifest replay record) and appends nothing;
  *  - crash before the append's atomic rename landed → the replay
  *    ingests cleanly.
  *
  * Codebook bootstrap: the coarse codebook is a STORE property written
  * once; if the store has none, the FIRST non-empty batch seeds it
  * (`ensureCodebook` is atomic-rename idempotent, so a crash between
  * the codebook write and the batch append replays fine). A production
  * deployment that wants a corpus-representative codebook creates it
  * up front from a sample and starts the stream against the prepared
  * store — the spec does exactly that for its bit-equality proof.
  *
  * A re-ingested CHANGED vector fails the ingest gate loudly
  * ([[AnnIndexStore.appendBatch]]'s r20 conflict check) and stops the
  * stream: a silently mixed index would answer probes
  * partition-dependently, so surfacing the rebuild is the only honest
  * behavior. Empty batches (idle ticks) are skipped — they carry no
  * vectors and, before the codebook exists, would otherwise seed a
  * zero-cell codebook.
  */
object StreamingAnn {

  /** The `foreachBatch` body, exposed for direct invocation so specs
    * can drive replay without a running query. `batch` is
    * (vec_id, qv, nq) quantized vectors. */
  def ingestBatch(batch: DataFrame, storePath: String, id: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    AnnIndexStore.ensureCodebook(spark, batch, storePath)
    AnnIndexStore.appendBatch(spark, batch, storePath, s"stream-$id")
    ()
  }

  /** Stream (vec_id, qv, nq) vectors into the store at `storePath`.
    * The store pins this pipeline's checkpoint identity
    * ([[StreamIdentity]]): "batch id == store batch id" is only
    * exactly-once within ONE checkpoint lineage, so a different
    * checkpoint against the same store fails loudly instead of
    * silently colliding epoch ids. */
  def indexPipeline(vectors: DataFrame, storePath: String, checkpoint: String,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vectors.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        StreamIdentity.requireSameStream(batch.sparkSession, storePath,
          StreamIdentity.checkpointToken(batch.sparkSession, checkpoint))
        ingestBatch(batch, storePath, id)
      }
      .start()
}
