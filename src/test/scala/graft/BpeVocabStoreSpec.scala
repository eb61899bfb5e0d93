package graft

import graft.operators.BpeVocabStore
import graft.queries.Text
import org.apache.spark.sql.functions._

/** Persisted BPE vocabulary (r18): the stored merge table round-trips
  * exactly, apply-from-store is bit-equal to the training loop's final
  * corpus AND to the registered q_bpe_apply output, and the write-once
  * store ignores a second trainer's table. */
class BpeVocabStoreSpec extends SparkTestBase {

  private def freshStore(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-bpev-$tag").toString + "/store"

  test("vocab round-trip + apply-from-store == training loop final corpus") {
    val (merges, finalEnc, _) = Text.bpeLoopBatched(spark, sfDir, 8, 1)
    val store = freshStore("rt")
    BpeVocabStore.ensureVocab(spark, merges, store)
    val got = BpeVocabStore.readVocab(spark, store).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == merges)
    val applied = BpeVocabStore
      .applyMerges(spark, Text.bpeEncode(spark, sfDir), store)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val loop = finalEnc.select(col("doc_id"), col("enc"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(applied == loop)
  }

  test("write-once: a second trainer's differing table does not overwrite") {
    val store = freshStore("once")
    BpeVocabStore.ensureVocab(spark, Seq((1, "a", "b", "ab", 5L)), store)
    BpeVocabStore.ensureVocab(spark, Seq((1, "x", "y", "xy", 9L)), store)
    val got = BpeVocabStore.readVocab(spark, store).collect()
    assert(got.length == 1 && got.head.getString(1) == "a")
  }

  test("registered q_bpe_apply_probe == q_bpe_apply (shared oracle backing)") {
    val probe = Text.queries("q_bpe_apply_probe")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val recompute = Text.queries("q_bpe_apply")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(probe == recompute && probe.nonEmpty)
  }
}
