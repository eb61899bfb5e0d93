package graft

import graft.queries.Pipeline
import org.apache.spark.sql.catalyst.plans.logical.Aggregate

/** Segment-chunked reassembly coverage for `q_substring_strip`
  * (queries/Pipeline.scala): the ordered per-doc reassembly must hold at
  * most one 64 Ki-token SEGMENT per aggregation buffer, never the whole
  * document, and the segmented output must be byte-identical to the flat
  * semantics. Verified against an independent JVM oracle (plain Scala
  * sliding-window shingles + gaps-and-islands, no Spark expressions
  * shared with the implementation) on documents that provably span ≥3
  * segments, with a shared boilerplate run STRADDLING the segment
  * boundary — the case a per-segment rewrite would corrupt if segment
  * joins dropped or reordered boundary tokens. */
class SubstringStripSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent semantics: positioned 4-gram shingles, shared = gram in
    * ≥2 distinct docs, runs of ≥4 consecutive shared positions cover
    * s..s+L+2, survivors rejoin with " ". */
  private def oracle(docs: Map[Long, IndexedSeq[String]])
      : Map[Long, (Long, Long, String)] = {
    val grams = docs.toSeq.flatMap { case (id, toks) =>
      if (toks.size < 4) Seq.empty
      else toks.sliding(4).zipWithIndex.toSeq
        .map { case (g, p) => (id, p.toLong, g.mkString(" ")) }
    }
    val shared = grams.groupBy(_._3)
      .filter { case (_, occ) => occ.map(_._1).distinct.size >= 2 }.keySet
    val covered: Map[Long, Set[Long]] =
      grams.filter(g => shared(g._3)).groupBy(_._1).map { case (id, gs) =>
        val ps = gs.map(_._2).sorted
        val runs = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
        var start = -10L; var prev = -10L; var len = 0L
        for (p <- ps) {
          if (p == prev + 1) len += 1
          else { if (len > 0) runs += ((start, len)); start = p; len = 1 }
          prev = p
        }
        if (len > 0) runs += ((start, len))
        id -> runs.filter(_._2 >= 4)
          .flatMap { case (s0, l) => s0 to (s0 + l + 2) }.toSet
      }
    docs.map { case (id, toks) =>
      val cov = covered.getOrElse(id, Set.empty[Long])
      val kept = toks.zipWithIndex
        .collect { case (t, p) if !cov(p.toLong) => t }
      id -> ((toks.size.toLong, kept.size.toLong, md5hex(kept.mkString(" "))))
    }
  }

  test("min-run threshold: conf override == dedicated 50-token row; " +
    "long runs are a subset of short; n_tokens >= 50 at the published bound") {
    val short = Pipeline.queries("q_substring_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val long50 = Pipeline.queries("q_substring_dedup50")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // conf path produces the same rows as the dedicated query
    try {
      spark.conf.set("spark.graft.substrdedup.minrun", "47")
      val viaConf = Pipeline.queries("q_substring_dedup")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(viaConf.toSeq == long50.toSeq)
    } finally spark.conf.unset("spark.graft.substrdedup.minrun")
    // the published bound keeps only >= 50-token runs, each of which is
    // a (possibly shorter-start-contained) run of the >= 7-token pass:
    // same (doc, start, length) triple must appear verbatim
    val shortSet = short.toSet
    assert(long50.forall(shortSet.contains))
    assert(long50.forall(_._4 >= 50))
    // the FP-rate trade is real on this corpus: the short threshold
    // admits strictly more runs (coincidental 7-token collisions)
    assert(short.length > long50.length,
      s"expected threshold separation, got ${short.length} vs ${long50.length}")
  }

  test("segmented reassembly matches flat semantics across segment boundaries") {
    val seg = Pipeline.StripSegTokens.toInt
    // doc 0 spans >2 segments; boilerplate (10 tokens → a 7-shingle run
    // covering exactly those 10 positions) appears mid-segment-0, dead on
    // the seg0/seg1 boundary, and deep in segment 2. doc 1 is small and
    // carries the same run (making it cross-document shared).
    val boiler = (0 until 10).map(i => s"bp$i")
    val n0 = 2 * seg + 1000
    val base0 = Array.tabulate(n0)(i => s"a$i")
    def splice(at: Int): Unit =
      boiler.zipWithIndex.foreach { case (t, i) => base0(at + i) = t }
    splice(100)
    splice(seg - 5)      // straddles the segment boundary: 5 tokens each side
    splice(2 * seg + 500)
    val doc0 = base0.toIndexedSeq
    val doc1 = ((0 until 40).map(i => s"b$i") ++ boiler ++
      (40 until 80).map(i => s"b$i")).toIndexedSeq
    val docs = Map(0L -> doc0, 1L -> doc1)

    val dir = java.nio.file.Files.createTempDirectory("strip-seg").toString
    val s = spark
    import s.implicits._
    docs.toSeq.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val df = Pipeline.queries("q_substring_strip")(spark, dir)
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val want = oracle(docs)
    assert(got.keySet == want.keySet)
    for (id <- want.keySet) assert(got(id) == want(id), s"doc $id")
    // the scenario is non-degenerate: the big doc really spans ≥3
    // segments and really lost its three boilerplate splices
    assert(want(0L)._1 > 2L * seg)
    assert(want(0L)._2 == want(0L)._1 - 30, "three 10-token runs stripped")
    assert(want(1L)._2 == want(1L)._1 - 10, "one 10-token run stripped")

    // the plan is the segmented shape: the reassembly aggregate groups by
    // (doc_id, pos DIV seg) — per-buffer memory is bounded by the
    // segment, not the document
    // (Catalyst extracts the complex grouping expr into a pre-projection
    // aliased _groupingexpression, so check the two-column grouping AND
    // that the extracted expression is the integer-division segmenter.)
    val groupings = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a.groupingExpressions.map(_.sql.toLowerCase).mkString(",")
    }
    assert(groupings.exists(g => g.contains("doc_id") && g.contains("_groupingexpression")),
      s"expected a (doc_id, pos DIV n) reassembly aggregate; got $groupings")
    val planStr = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(planStr.contains("div") && planStr.contains(seg.toString),
      "expected the pos DIV segment-width extraction in the optimized plan")
  }
}
