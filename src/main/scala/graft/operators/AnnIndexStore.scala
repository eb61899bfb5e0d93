package graft.operators

import graft.Checkpoints
import graft.queries.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted incremental ANN (IVF) index: the codebook and the
  * per-vector cell assignments live in a parquet store, so repeated
  * probes over a growing corpus read the index instead of recomputing
  * it, and each ingest batch extends the index by assigning ONLY the
  * delta (broadcast codebook — one narrow map over |delta| rows, no
  * shuffle). This is the fingerprint-store pattern
  * ([[IncrementalDedup]]) applied to `q_ann_ivf`'s pipeline, which
  * recomputed codebook + assignments on every probe.
  *
  * Store layout under `storePath`:
  *  - `codebook/`  — (c_id, qc, nc), written once, atomic rename
  *  - `assign/batch-<id>/` — (vec_id, cell, qv, nq) per ingest batch,
  *    atomic rename per batch, replay-idempotent via `batchId`
  *    (a replayed committed batch returns its recorded assignments
  *    instead of double-appending — same discipline as
  *    [[IncrementalDedup.dedupDelta]]).
  *
  * Scale shape: assignment is |delta| × |codebook| with the codebook
  * broadcast (a codebook is small by construction — k centroids);
  * probes rank cells against the broadcast codebook, then equi-join
  * the top-`nprobe` cells against the assignment store on the cell id
  * — a bucket join over |store| / k rows per probed cell, never a
  * brute-force scan. Periodic codebook refresh (`q_kmeans_step`) plus
  * re-assignment is a full-batch rebuild: write a new store and swap.
  *
  * Determinism: all ranking uses the engine's quantized-integer dot
  * products ([[Similarity.dotQ]]) and the shared 4-decimal cosine
  * convention ([[Similarity.cosine]]) with (score desc, id asc)
  * tie-breaks, so probe-over-store output is bit-identical to the
  * recompute-from-scratch pipeline — asserted by AnnIndexStoreSpec
  * and hash-oracled end-to-end via `q_ann_index_probe`.
  */
object AnnIndexStore {
  import IncrementalDedup.{appendAtomic, batchDir, committed, freshBatchName, storeExists}

  private def codebookPath(storePath: String): String = storePath + "/codebook"
  private def assignPath(storePath: String): String = storePath + "/assign"

  private def ldot(a: String, b: String): Column = Similarity.dotQ(a, b)

  /** Write the codebook (c_id, qc, nc) once — atomic rename, no-op if
    * one is already committed (concurrent builders race safely: the
    * loser's rename fails against the existing target and is treated
    * as success). */
  def ensureCodebook(spark: SparkSession, centroids: DataFrame,
                     storePath: String): Unit =
    if (!storeExists(spark, codebookPath(storePath)))
      appendAtomic(spark, centroids, storePath, "codebook")

  def readCodebook(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(codebookPath(storePath))

  /** Nearest-centroid assignment of (vec_id, qv, nq) vectors against a
    * broadcast codebook: (vec_id, cell, qv, nq). Mirrors `q_ann_ivf`'s
    * assignment stage exactly (cosine desc, c_id asc tie-break). */
  def assign(vectors: DataFrame, codebook: DataFrame): DataFrame = {
    val ranked = vectors.crossJoin(broadcast(
        codebook.select(col("c_id"), col("qc"), col("nc"))))
      .select(col("vec_id"), col("c_id"), col("qv"), col("nq"),
        Similarity.cosine(ldot("qv", "qc"), col("nq"), col("nc")).as("ccos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("c_id").asc)
    ranked.withColumn("crn", row_number().over(w)).filter(col("crn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"), col("qv"), col("nq"))
  }

  /** Assign a delta batch against the stored codebook and append the
    * assignments atomically. Replay-idempotent with a stable `batchId`:
    * an already-committed batch returns its recorded assignments. The
    * checkpoint before the append mirrors [[IncrementalDedup]]'s
    * ordering discipline (materialize what you return BEFORE mutating
    * the store it was computed against). */
  def appendBatch(spark: SparkSession, vectors: DataFrame, storePath: String,
                  batchId: Option[String] = None): DataFrame = {
    val ap = assignPath(storePath)
    committed(spark, ap, batchId) match {
      case Some(name) =>
        return spark.read.parquet(batchDir(ap, name).toString)
      case None => ()
    }
    val assigned = Checkpoints.ckpt(
      assign(vectors, readCodebook(spark, storePath)))
    appendAtomic(spark, assigned, ap, freshBatchName(batchId))
    assigned
  }

  def readAssignments(spark: SparkSession, storePath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(assignPath(storePath))

  /** Top-`k` neighbors for each query vector (a_id, qa, na): rank
    * cells against the broadcast codebook, take the top `nprobe`,
    * equi-join against the stored assignments on the cell id, exact
    * re-rank. Identical plan shape — and identical output — to
    * `q_ann_ivf`'s probe stage, but reading the persisted index. */
  def probe(spark: SparkSession, queries: DataFrame, storePath: String,
            nprobe: Int = 2, k: Int = 3): DataFrame = {
    val cb = readCodebook(spark, storePath)
    val rankedCells = queries.crossJoin(broadcast(
        cb.select(col("c_id"), col("qc"), col("nc"))))
      .select(col("a_id"), col("c_id"), col("qa"), col("na"),
        Similarity.cosine(ldot("qa", "qc"), col("na"), col("nc")).as("ccos"))
    val wc = Window.partitionBy(col("a_id"))
      .orderBy(col("ccos").desc, col("c_id").asc)
    val probes = rankedCells.withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= nprobe)
      .select(col("a_id"), col("c_id").as("pcell"), col("qa"), col("na"))
    val asg = readAssignments(spark, storePath)
      .select(col("vec_id").as("b_id"), col("cell"),
        col("qv").as("qb"), col("nq").as("nb"))
    val wTop = Window.partitionBy(col("a_id"))
      .orderBy(col("cosine").desc, col("b_id").asc)
    probes.join(asg, col("pcell") === col("cell") && col("a_id") =!= col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        Similarity.cosine(ldot("qa", "qb"), col("na"), col("nb")).as("cosine"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("a_id"), col("b_id"), col("cosine"),
        col("rn").cast("long").as("rn"))
  }
}
