package graft

import graft.queries.Text
import org.apache.spark.sql.functions._

/** Batched BPE merges (spark.graft.bpe.batchK): pairwise-disjoint
  * merges applied in one corpus pass must equal one-at-a-time
  * application of the same set (in any order), every round's batch must
  * be token-disjoint, the batch head must agree with the strict greedy
  * argmax, and batching must actually cut the number of corpus passes. */
class BatchedBpeSpec extends SparkTestBase {

  private lazy val batched = Text.bpeLoopBatched(spark, sfDir, 8, 4)

  private def roundsOf(merges: Seq[(Int, String, String, String, Long)],
                       sizes: Seq[Int]) = {
    var rest = merges
    sizes.map { n => val (h, t) = rest.splitAt(n); rest = t; h }
  }

  test("one-pass chained application of a disjoint batch == one-at-a-time") {
    val (merges, _, sizes) = batched
    val round1 = roundsOf(merges, sizes).head.map(m => (m._2, m._3))
    assert(round1.length > 1, "batch must contain multiple merges to test")
    val enc0 = Text.bpeEncode(spark, sfDir)
    val onePassExpr = round1.foldLeft("enc") { case (acc, (l, r)) =>
      s"replace($acc, '($l)($r)', '(${l + r})')"
    }
    val onePass = enc0.select(col("doc_id"), expr(onePassExpr).as("enc"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // one at a time, and in REVERSE order — disjoint merges commute, so
    // application order must not matter either
    var step = enc0
    round1.reverse.foreach { case (l, r) =>
      step = step.select(col("doc_id"),
        expr(s"replace(enc, '($l)($r)', '(${l + r})')").as("enc"))
    }
    val oneAtATime = step.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(onePass == oneAtATime)
  }

  test("every round's batch is pairwise token-disjoint") {
    val (merges, _, sizes) = batched
    roundsOf(merges, sizes).foreach { round =>
      val tokenSets = round.map(m => Set(m._2, m._3, m._4))
      for (i <- tokenSets.indices; j <- tokenSets.indices if i < j)
        assert(tokenSets(i).intersect(tokenSets(j)).isEmpty,
          s"round batch shares tokens: ${round(i)} vs ${round(j)}")
    }
  }

  test("batch head equals the strict greedy argmax; rounds are reduced") {
    val (seq1, _, sizes1) = Text.bpeLoopBatched(spark, sfDir, 4, 1)
    val (seq4, _, sizes4) = Text.bpeLoopBatched(spark, sfDir, 4, 4)
    assert(seq1.nonEmpty && seq4.nonEmpty)
    // same count snapshot → identical first pick (argmax, same ties)
    assert(seq1.head._2 == seq4.head._2 && seq1.head._3 == seq4.head._3)
    // measured round-count reduction: 4 merges in far fewer passes
    assert(sizes1.length == 4)
    assert(sizes4.length < sizes1.length,
      s"expected fewer rounds, got ${sizes4.length} vs ${sizes1.length}")
  }

  test("strict greedy (batchK=1) drives the oracled queries: table shape sane") {
    val df = SparkEntry.queries("q_bpe_train")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length <= 8 && rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("step")).toSeq == (1 to rows.length))
  }
}
