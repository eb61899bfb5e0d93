package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BPE VOCABULARY (r18 — the third persisted-artifact store
  * after [[AnnIndexStore]] and [[InvertedIndexStore]]): a production
  * tokenizer trains once and ships its merge table; the apply side must
  * read the vocabulary, never retrain. The merge table
  * (step, l_tok, r_tok, merged, cnt) lands in parquet write-once
  * (atomic rename, concurrent-trainer safe), and [[applyMerges]]
  * re-tokenizes any corpus under it as ONE chained-replace narrow map —
  * the training loop's replace composition collapsed into a single
  * corpus pass, since replace_n ∘ … ∘ replace_1 is exactly what the
  * per-round loop computes between counting passes.
  *
  * Bit-equality: the stored table IS the trainer's output, and the
  * fold applies merges in step order with the same left-to-right
  * non-overlapping `replace`, so apply-from-store output is identical
  * to the training loop's final corpus (BpeVocabStoreSpec asserts it;
  * `q_bpe_apply_probe` shares `q_bpe_apply`'s oracle).
  */
object BpeVocabStore {
  import IncrementalDedup.{appendAtomic, storeExists}

  private def vocabPath(p: String) = p + "/vocab"

  /** Write the merge table once — no-op when one is committed. */
  def ensureVocab(spark: SparkSession,
                  merges: Seq[(Int, String, String, String, Long)],
                  storePath: String): Unit =
    if (!storeExists(spark, vocabPath(storePath))) {
      val df = spark.createDataFrame(merges)
        .toDF("step", "l_tok", "r_tok", "merged", "cnt")
      appendAtomic(spark, df, storePath, "vocab")
    }

  def readVocab(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(vocabPath(storePath))

  def exists(spark: SparkSession, storePath: String): Boolean =
    storeExists(spark, vocabPath(storePath))

  /** Apply the stored merge table to a paren-encoded corpus
    * (doc_id, enc): one narrow map, merges folded in step order. The
    * merge table is vocabulary-sized (a driver-side read of ≤ a few
    * 10⁴ rows is the contract — it IS the tokenizer artifact), so this
    * is a metadata read, not a data collect. */
  def applyMerges(spark: SparkSession, encoded: DataFrame,
                  storePath: String): DataFrame = {
    val merges = readVocab(spark, storePath)
      .orderBy("step")
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
    val applied = merges.foldLeft("enc") { case (acc, (l, r)) =>
      s"replace($acc, '($l)($r)', '(${l + r})')"
    }
    encoded.select(col("doc_id"), expr(applied).as("enc"))
  }
}
