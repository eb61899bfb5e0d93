package graft

import graft.queries.{Similarity, Text}
import org.apache.spark.sql.DataFrame

/** Shared-artifact reuse (VERDICT r17 #8): with
  * `spark.graft.reuse.checkpoints=true`, the BPE corpus and the dedup
  * labels compute once per session and every consumer's output stays
  * BIT-EQUAL to the recompute-from-scratch path. */
class ArtifactReuseSpec extends SparkTestBase {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case null => null
      case x => x
    }).toSeq

  private def withReuse[T](f: => T): T =
    try {
      ArtifactCache.clear()
      spark.conf.set(ArtifactCache.ConfKey, "true")
      f
    } finally {
      spark.conf.unset(ArtifactCache.ConfKey)
      ArtifactCache.clear()
    }

  test("q_tok_fertility and q_bpe_apply: reuse path bit-equal to recompute; " +
    "the fixpoint runs once") {
    val offFert = rows(Text.queries("q_tok_fertility")(spark, sfDir))
    val offApply = rows(Text.queries("q_bpe_apply")(spark, sfDir))
    withReuse {
      // first consumer pays the fixpoint, second reads the cached frame
      val onApply = rows(Text.queries("q_bpe_apply")(spark, sfDir))
      val t0 = System.nanoTime()
      val onFert = rows(Text.queries("q_tok_fertility")(spark, sfDir))
      val fertMs = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime()
      val onApply2 = rows(Text.queries("q_bpe_apply")(spark, sfDir))
      val applyMs = (System.nanoTime() - t1) / 1e6
      assert(onApply == offApply)
      assert(onApply2 == offApply)
      assert(onFert == offFert)
      // the reused consumers skip the 8-round loop: an order of
      // magnitude under the cold path even at sf0.001 (~3 s there)
      assert(fertMs < 2500 && applyMs < 2500,
        s"reuse did not skip the fixpoint: fert=${fertMs}ms apply=${applyMs}ms")
    }
  }

  test("q_dedup_survivor and q_dedup_cluster: reuse path bit-equal; " +
    "labels computed once") {
    val offSurv = rows(Similarity.queries("q_dedup_survivor")(spark, sfDir))
    val offClus = rows(Similarity.queries("q_dedup_cluster")(spark, sfDir))
    withReuse {
      val onClus = rows(Similarity.queries("q_dedup_cluster")(spark, sfDir))
      val t0 = System.nanoTime()
      val onSurv = rows(Similarity.queries("q_dedup_survivor")(spark, sfDir))
      val survMs = (System.nanoTime() - t0) / 1e6
      assert(onClus == offClus)
      assert(onSurv == offSurv)
      assert(survMs < 2500,
        s"reuse did not skip the clustering loop: surv=${survMs}ms")
    }
  }

  test("reuse is off by default and key-scoped: no cross-contamination") {
    assert(!ArtifactCache.enabled(spark))
    // off: nothing lands in the cache
    Text.queries("q_bpe_apply")(spark, sfDir)
    withReuse {
      val a = ArtifactCache.getOrCompute(spark, "k1")(java.lang.Long.valueOf(1L))
      val b = ArtifactCache.getOrCompute(spark, "k1")(java.lang.Long.valueOf(2L))
      val c = ArtifactCache.getOrCompute(spark, "k2")(java.lang.Long.valueOf(3L))
      assert(a == 1L && b == 1L && c == 3L)
    }
  }
}
