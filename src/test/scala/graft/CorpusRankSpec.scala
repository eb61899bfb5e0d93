package graft

import graft.queries.Pipeline

/** Semantic specs for the bloom-prefiltered decontamination and the
  * integer-rational ranking operators (BM25, PMI lift), independent of
  * the DuckDB oracle: rankings are recomputed per-doc with plain JVM
  * arithmetic (no Spark expressions shared with the implementation),
  * and the bloom variant is pinned to the exact variant's output —
  * including under a deliberately saturated 64-bit bitmap, where the
  * prefilter passes everything and correctness must come entirely from
  * the verify join. */
class CorpusRankSpec extends SparkTestBase {

  /** Unsigned byte-wise UTF-8 comparison — Spark's string ordering, so
    * the recomputation can't drift on non-ASCII tie-breaks. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def docToks(): Map[Long, Array[String]] =
    Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .toMap

  test("bloom decontamination equals the exact-join decontamination") {
    val exact = Pipeline.queries("q_decontaminate")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloom = Pipeline.queries("q_bloom_decontaminate")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact.nonEmpty, "degenerate fixture: no contaminated docs")
    assert(bloom == exact)
  }

  test("saturated 64-bit bloom bitmap still yields the exact result") {
    // m = 64 with ~1000 eval grams saturates every bit: the prefilter
    // keeps all rows and the verify join alone must produce exactness
    // (the false-positive path, maximally exercised).
    spark.conf.set("spark.graft.bloom.bits", "64")
    try {
      val exact = Pipeline.queries("q_decontaminate")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val bloom = Pipeline.queries("q_bloom_decontaminate")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(bloom == exact)
    } finally spark.conf.unset("spark.graft.bloom.bits")
  }

  test("bloom.bits conf rejects invalid sizes descriptively") {
    for (bad <- Seq("abc", "0", "-64", "100", "32")) {
      spark.conf.set("spark.graft.bloom.bits", bad)
      try {
        val e = intercept[IllegalArgumentException] {
          Pipeline.queries("q_bloom_decontaminate")(spark, sfDir).collect()
        }
        assert(e.getMessage.contains("spark.graft.bloom.bits"), s"for '$bad'")
      } finally spark.conf.unset("spark.graft.bloom.bits")
    }
  }

  test("bm25 matches an independent JVM recomputation") {
    val toks = docToks()
    val n = toks.size.toLong
    val t = toks.valuesIterator.map(_.length.toLong).sum
    val df = toks.valuesIterator.flatMap(_.distinct).toSeq
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val qterms = df.toSeq
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && utf8Lt(a._1, b._1)))
      .take(3)
    val want = toks.toSeq.flatMap { case (id, ts) =>
      val dl = ts.length.toLong
      val contribs = qterms.flatMap { case (w, dfw) =>
        val tf = ts.count(_ == w).toLong
        if (tf == 0) None
        else {
          // all operands positive: Long / == Spark DIV == DuckDB //
          val tfBp = (44 * t * tf * 10000) / (20 * t * tf + 6 * t + 18 * dl * n)
          val idfBp = ((2 * n - 2 * dfw + 1) * 10000) / (2 * dfw + 1)
          Some(tfBp * idfBp / 10000)
        }
      }
      if (contribs.isEmpty) None else Some(id -> contribs.sum)
    }.sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      .take(10)
    val got = Pipeline.queries("q_bm25")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == want)
    assert(got.size == 10, "fixture too small for a full top-10")
  }

  test("dsir selection scores match an independent JVM recomputation") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = docToks()
    val isEval = toks.keySet.map(id => id -> (md5hex(s"$id|eval").head < '1')).toMap
    val tf: Map[(Long, String), Long] = toks.toSeq
      .flatMap { case (id, ts) => ts.map(w => (id, w)) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val raw = tf.toSeq.groupBy(_._1._2).map { case (w, g) => w -> g.map(_._2).sum }
    val tgt = tf.toSeq.filter(p => isEval(p._1._1))
      .groupBy(_._1._2).map { case (w, g) => w -> g.map(_._2).sum }
    val tR = raw.valuesIterator.sum
    val v = raw.size.toLong
    val tT = tgt.valuesIterator.sum
    val want = tf.toSeq.filter(p => !isEval(p._1._1))
      .groupBy(_._1._1).toSeq.map { case (id, g) =>
        val lifts = g.map { case ((_, w), f) =>
          val lift = (((tgt.getOrElse(w, 0L) + 1) * tR) / raw(w)) * 10000 / (tT + v)
          (f, lift)
        }
        val nToks = lifts.map(_._1).sum
        (id, lifts.map(p => p._1 * p._2).sum / nToks, nToks)
      }.sortBy(_._1)
    val got = Pipeline.queries("q_dsir")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // the target sample must actually separate: scores must not be
    // constant across docs (a broken join would yield uniform smoothing)
    assert(got.map(_._2).distinct.size > 1, "degenerate dsir scores")
  }

  test("pmi collocations match an independent JVM recomputation") {
    val toks = docToks()
    val uni = toks.valuesIterator.flatten.toSeq
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val bgAll = toks.valuesIterator
      .flatMap(ts => ts.iterator.zip(ts.iterator.drop(1))).toSeq
    val tu = uni.valuesIterator.sum
    val tb = bgAll.size.toLong
    val want = bgAll.groupBy(identity)
      .map { case (p, g) => p -> g.size.toLong }
      .filter(_._2 >= 5L)
      .map { case ((x, y), cxy) =>
        (x, y, cxy, (((cxy * tu) / uni(x)) * 10000 / tb) * tu / uni(y))
      }.toSeq
      .sortWith { (a, b) =>
        a._4 > b._4 || (a._4 == b._4 && (utf8Lt(a._1, b._1) ||
          (a._1 == b._1 && utf8Lt(a._2, b._2))))
      }.take(20)
    val got = Pipeline.queries("q_pmi_colloc")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    assert(got.nonEmpty, "degenerate fixture: no collocation reached support 5")
  }
}
