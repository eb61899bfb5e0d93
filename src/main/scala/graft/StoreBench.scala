package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Store-probe cost vs LIVE batch-dir count (r20, VERDICT r19 #7): the
  * manifest cache fixed the per-probe constant, but nothing measured
  * how probe cost grows with the number of live batch dirs BEFORE a
  * compaction runs — the "100-ingest crawl day" a production
  * deployment must pick a compaction cadence for.
  *
  * For each N in {1, 16, 64}: build a FRESH inverted-index store and a
  * fresh ANN store from the same corpus split into N ingest batches,
  * time the probe (median of `reps` runs after one warmup), compact,
  * re-time. Prints one JSON line per (store, N, phase) with the wall
  * seconds and the live-dir count the probe actually resolved —
  * recorded in SCALING.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.StoreBench
  */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_STOREBENCH_REPS").map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def medianSec(f: () => Unit): Double = {
      f() // warmup (fills the manifest/JVM caches a serving probe enjoys)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      times(times.length / 2)
    }

    def row(store: String, n: Int, phase: String, liveDirs: Int,
            sec: Double): Unit =
      println(f"""{"bench":"store_probe","store":"$store","batches":$n,""" +
        f""""phase":"$phase","live_dirs":$liveDirs,"median_sec":$sec%.3f}""")

    def liveCount(path: String): Int = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(st => st.isDirectory &&
        (st.getPath.getName.startsWith("batch-") ||
          st.getPath.getName.startsWith("compact-")))
    }

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val q = graft.queries.Similarity.quantized(spark, sfDir)
    val vecs = q.select(col("vec_id"), col("qv"), col("nq"))
    val probes = q.filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .select(col("vec_id").as("a_id"), col("qv").as("qa"), col("nq").as("na"))

    Seq(1, 16, 64).foreach { n =>
      // ---- inverted index ------------------------------------------
      val inv = java.nio.file.Files
        .createTempDirectory(s"graft-storebench-inv-$n").toString + "/store"
      (0 until n).foreach { i =>
        graft.operators.InvertedIndexStore.appendBatch(spark,
          docs.filter(pmod(col("doc_id"), lit(n.toLong)) === i), inv, s"b$i")
      }
      def bm25() = { graft.operators.InvertedIndexStore
        .bm25Probe(spark, inv).collect(); () }
      row("inverted", n, "live", liveCount(s"$inv/postings"), medianSec(bm25 _))
      graft.operators.InvertedIndexStore.compact(spark, inv)
      row("inverted", n, "compacted", liveCount(s"$inv/postings"),
        medianSec(bm25 _))

      // ---- ANN (raw IVF) -------------------------------------------
      val ann = java.nio.file.Files
        .createTempDirectory(s"graft-storebench-ann-$n").toString + "/store"
      graft.operators.AnnIndexStore.ensureCodebook(spark,
        q.filter(col("vec_id") < 16).select(col("vec_id"), col("qv"), col("nq")),
        ann)
      (0 until n).foreach { i =>
        graft.operators.AnnIndexStore.appendBatch(spark,
          vecs.filter(pmod(col("vec_id"), lit(n.toLong)) === i), ann, s"b$i")
      }
      def annProbe() = { graft.operators.AnnIndexStore
        .probe(spark, probes, ann).collect(); () }
      row("ann", n, "live", liveCount(s"$ann/assign"), medianSec(annProbe _))
      graft.operators.AnnIndexStore.compact(spark, ann)
      row("ann", n, "compacted", liveCount(s"$ann/assign"),
        medianSec(annProbe _))
    }
    spark.stop()
  }
}
