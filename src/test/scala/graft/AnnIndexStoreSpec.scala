package graft

import graft.operators.AnnIndexStore
import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** Persisted incremental ANN index: probe-over-store must equal the
  * recompute-from-scratch IVF pipeline exactly, batches must extend
  * the index incrementally, and a replayed batch append must be
  * idempotent (same discipline as IncrementalDedupSpec). */
class AnnIndexStoreSpec extends SparkTestBase {

  private def freshStore(): String =
    java.nio.file.Files.createTempDirectory("graft-ann-store").toString + "/store"

  private def quantizedVectors() = Similarity.quantized(spark, sfDir)

  private def buildTwoBatches(store: String): Unit = {
    val q = quantizedVectors()
    AnnIndexStore.ensureCodebook(spark,
      q.select(col("vec_id"), col("qv"), col("nq")), store)
    AnnIndexStore.appendBatch(spark,
      q.filter(col("vec_id") % 2 === 0).select(col("vec_id"), col("qv"), col("nq")),
      store, "even")
    AnnIndexStore.appendBatch(spark,
      q.filter(col("vec_id") % 2 === 1).select(col("vec_id"), col("qv"), col("nq")),
      store, "odd")
  }

  private def probeAll(store: String) =
    AnnIndexStore.probe(spark,
      quantizedVectors().filter(col("vec_id") >= 50 && col("vec_id") < 60)
        .select(col("vec_id").as("a_id"), col("qv").as("qa"), col("nq").as("na")),
      store)
      .orderBy("a_id", "rn").collect().toSeq

  test("probe over a two-batch store equals recompute-from-scratch IVF") {
    val store = freshStore()
    buildTwoBatches(store)
    val fromStore = probeAll(store)
    val recompute = SparkEntry.queries("q_ann_ivf")(spark, sfDir).collect().toSeq
    assert(fromStore == recompute)
    assert(fromStore.nonEmpty)
  }

  test("replayed batch append is idempotent: store and probes unchanged") {
    val store = freshStore()
    buildTwoBatches(store)
    val before = probeAll(store)
    val nAssign = AnnIndexStore.readAssignments(spark, store).count()
    // replay a committed batch (crash-after-append retry): the recorded
    // assignments come back, nothing is double-appended
    val replayed = AnnIndexStore.appendBatch(spark,
      quantizedVectors().filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("qv"), col("nq")),
      store, "even")
    assert(replayed.count() > 0)
    assert(AnnIndexStore.readAssignments(spark, store).count() == nAssign)
    assert(probeAll(store) == before)
  }

  test("assignments cover every ingested vector exactly once") {
    val store = freshStore()
    buildTwoBatches(store)
    val n = quantizedVectors().count()
    val asg = AnnIndexStore.readAssignments(spark, store)
    assert(asg.count() == n)
    assert(asg.select("vec_id").distinct().count() == n)
  }

  test("duplicate identical assignments collapse; a conflicting duplicate " +
    "fails loudly, never partition-dependent") {
    val store = freshStore()
    buildTwoBatches(store)
    val clean = probeAll(store)
    // the same vectors under a DIFFERENT batch id: identical duplicate
    // rows — probe output must not change
    AnnIndexStore.appendBatch(spark,
      quantizedVectors().filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("qv"), col("nq")), store, "even-dup")
    assert(AnnIndexStore.readAssignments(spark, store).count() >
      quantizedVectors().count())
    assert(probeAll(store) == clean)
    // a CHANGED vector under yet another id: loud error, no silent
    // arbitrary survivor
    AnnIndexStore.appendBatch(spark,
      quantizedVectors().filter(col("vec_id") % 2 === 1)
        .select(col("vec_id"), expr("reverse(qv)").as("qv"),
          (col("nq") + 1).as("nq")), store, "odd-conflict")
    val e = intercept[Exception] { probeAll(store) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("conflicting duplicate assignments")),
      s"expected the conflict error, got: ${messages(e).mkString(" | ")}")
  }

  test("cell count is a STORE property: pinned at creation from the conf, " +
    "later ingests assign against the recorded codebook, not the session's") {
    val store = freshStore()
    val q = quantizedVectors()
    try {
      spark.conf.set(AnnIndexStore.CellsConf, "8")
      AnnIndexStore.ensureCodebook(spark,
        q.select(col("vec_id"), col("qv"), col("nq")), store)
    } finally spark.conf.unset(AnnIndexStore.CellsConf)
    assert(AnnIndexStore.cellCount(spark, store) == 8)
    assert(AnnIndexStore.readCodebook(spark, store).count() == 8)
    // ingest under a DIFFERENT session conf: assignment can only rank
    // against the store's 8 recorded centroids
    try {
      spark.conf.set(AnnIndexStore.CellsConf, "128")
      AnnIndexStore.appendBatch(spark,
        q.select(col("vec_id"), col("qv"), col("nq")), store, "full")
    } finally spark.conf.unset(AnnIndexStore.CellsConf)
    val cells = AnnIndexStore.readAssignments(spark, store)
      .select("cell").distinct().collect().map(_.getLong(0))
    assert(cells.nonEmpty && cells.forall(c => c >= 0 && c < 8),
      s"assignments outside the store's 8 cells: ${cells.sorted.mkString(",")}")
    // probe (conf unset) works against the recorded shape
    val p = AnnIndexStore.probe(spark,
      q.filter(col("vec_id") >= 50 && col("vec_id") < 60)
        .select(col("vec_id").as("a_id"), col("qv").as("qa"),
          col("nq").as("na")), store)
    assert(p.count() > 0)
  }
}
