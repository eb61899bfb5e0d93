package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for the BPE vocab-store SERVING path (r19, VERDICT r18
  * #1's measurement leg): wall time of `BpeVocabStore.applyMerges`
  * over the real corpus as the merge table grows 8 → 32768 entries.
  *
  * Table construction: the real trained 8-merge prefix (so the firing
  * work is the registered query's own) padded with synthetic
  * never-matching pairs to the target size — each padded entry costs
  * exactly what a production vocab's non-firing merge costs on a given
  * row: one adjacency-set probe. The claim under test is that the
  * serving pass is O(|merges|) cheap hash probes + O(fired · len)
  * array work per row, i.e. wall time is FLAT in vocabulary size —
  * where the r18 one-expression chained-replace fold was O(|merges|)
  * full-string passes per row and structurally capped (Janino 64KB /
  * analyzer depth) far below 32k.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.BpeApplyBench
  * Prints one JSON line with per-size min-of-3 seconds.
  */
object BpeApplyBench {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (m8, _, _) = graft.queries.Text.bpeLoopBatched(spark, sf, 8, 1)
    val enc = graft.queries.Text.bpeEncode(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    enc.count()

    val sizes = Seq(8, 1024, 32768)
    val timed = sizes.map { n =>
      val merges = m8 ++ (m8.size + 1 to n).map(i =>
        (i, s"qpad${i}l", s"qpad${i}r", s"qpad${i}lqpad${i}r", 1L))
      val store = java.nio.file.Files
        .createTempDirectory(s"graft-bpeapply-$n").toString + "/store"
      graft.operators.BpeVocabStore.ensureVocab(spark, merges, store)
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.BpeVocabStore.applyMerges(spark, enc, store)
          .agg(sum(length(col("enc")))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      n -> secs.min
    }
    val fields = timed.map { case (n, s) => f""""m$n":$s%.3f""" }.mkString(",")
    println(s"""{"metric":"bpe_apply_secs_by_vocab",$fields,"sf":"$sf"}""")
    spark.stop()
  }
}
