package graft

import graft.queries.Pipeline

/** Semantic specs for the round-11 corpus operators, independent of the
  * DuckDB oracle: the classifier score is recomputed per-doc with plain
  * JVM MessageDigest/arithmetic (no Spark expressions shared with the
  * implementation), and the URL canonicalizer's output is checked
  * against the properties a crawl-dedup step actually needs (variants
  * unify, tracking junk gone, every doc accounted for exactly once). */
class CorpusOpsSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("classifier score matches an independent JVM recomputation") {
    val hex = "0123456789abcdef"
    def weight(word: String): Long = {
      val h = md5hex(word)
      ((hex.indexOf(h(0)) * 16 + hex.indexOf(h(1))) * 37L) % 21L
    }
    val got = Pipeline.queries("q_classifier_score")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == docs.keySet, "one score row per doc")
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val raw = toks.map(weight).sum
      val score = raw * 100 / toks.length // all values positive: DIV == /
      val (nToks, scoreCw, keep) = got(id)
      assert(nToks == toks.length.toLong, s"doc $id n_toks")
      assert(scoreCw == score, s"doc $id score: got $scoreCw want $score")
      assert(keep == (score >= 1000), s"doc $id keep flag")
    }
    // hashed weights 0..20 ⇒ the mean sits near 1000 centi-units; the
    // gate must actually separate (not keep-all / drop-all)
    val keeps = got.values.count(_._3)
    assert(keeps > 0 && keeps < got.size, s"degenerate gate: $keeps/${got.size}")
  }

  test("url canonicalization unifies variants and strips tracking state") {
    val rows = Pipeline.queries("q_url_canon")(spark, sfDir).collect()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    // exactly-once accounting: every doc lands under one canonical URL
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      val u = r.getString(0)
      assert(u.matches("https://[a-z0-9.]+/d/[0-9]+(\\?id=[0-9]+)?"),
        s"non-canonical survivor: $u")
      assert(!u.contains("utm") && !u.contains("#") && !u.contains(":443")
        && !u.contains("www.") && !u.exists(_.isUpper), s"junk survived: $u")
      // keep_doc must be one of the docs counted under this URL
      assert(r.getLong(3) >= 0 && r.getLong(2) >= 1)
    }
    // the synthetic URLs vary case/port/params per doc parity — real
    // unification must be observed (some canon URL covers >=2 raw forms)
    assert(rows.exists(_.getLong(2) >= 2), "no variant ever unified")
    // and the dedup axis is real: fewer canonical URLs than docs
    assert(rows.length < nDocs, "no URL-level duplication found")
  }

  test("bigram repetition stats match an independent JVM recomputation") {
    val got = Pipeline.queries("q_rep_bigram")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var separated = 0
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.length >= 2) {
        val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
        val byGram = grams.groupBy(identity).view.mapValues(_.size)
        val dupSlots = byGram.values.filter(_ > 1).sum.toLong
        val dupBp = dupSlots * 10000 / grams.size
        val (n, nd, bp, keep) = got(id)
        assert(n == grams.size.toLong, s"doc $id n_grams")
        assert(nd == byGram.size.toLong, s"doc $id n_distinct")
        assert(bp == dupBp, s"doc $id dup_bp: got $bp want $dupBp")
        assert(keep == (dupBp <= 900), s"doc $id keep")
        if (!keep) separated += 1
      } else assert(!got.contains(id), s"doc $id under 2 tokens must be absent")
    }
    assert(separated > 0 && separated < got.size,
      s"degenerate repetition gate: $separated/${got.size} dropped")
  }

  test("temperature mixture flattens skew toward uniform but keeps order") {
    val rows = Pipeline.queries("q_mix_temperature")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nTotal = rows.map(_._2).sum
    val sumW = rows.map(_._3).sum
    rows.foreach { case (lang, n, w, rateBp, target) =>
      assert(w == math.floor(math.sqrt(n.toDouble)).toLong, s"$lang w")
      assert(rateBp == w * 10000 / sumW, s"$lang rate")
      assert(target == nTotal * rateBp / 10000, s"$lang target")
      // THE temperature property: every stratum's sampled share sits
      // BETWEEN its raw share and the uniform share (flattening, never
      // inversion), modulo 1 bp of integer truncation
      val rawBp = n * 10000 / nTotal
      val uniBp = 10000L / rows.length
      val lo = math.min(rawBp, uniBp) - 1
      val hi = math.max(rawBp, uniBp) + 1
      assert(rateBp >= lo && rateBp <= hi,
        s"$lang rate $rateBp outside [$lo,$hi] (raw $rawBp uni $uniBp)")
    }
    // order preserved: bigger strata never get a smaller rate
    rows.sortBy(_._2).map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "rate order inverted")
      case _           =>
    }
  }

  test("vocab coverage matches a brute-force rank walk and is monotone") {
    val got = Pipeline.queries("q_vocab_coverage")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = Tables.load(spark, sfDir, "documents")
      .select("text").collect().iterator
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .foldLeft(Map.empty[String, Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1) }
    val total = counts.values.sum
    val ranked = counts.values.toSeq.sorted(Ordering[Long].reverse)
    def smallestVocab(targetBp: Long): Long = {
      var cum = 0L; var k = 0L
      for (c <- ranked if cum * 10000 / total < targetBp) { cum += c; k += 1 }
      k
    }
    for (t <- Seq(5000L, 7500L, 9000L, 9900L))
      assert(got(t) == smallestVocab(t), s"target $t: got ${got(t)} want ${smallestVocab(t)}")
    val sizes = Seq(5000L, 7500L, 9000L, 9900L).map(got)
    assert(sizes == sizes.sorted, "coverage curve must be monotone")
    assert(sizes.last <= counts.size, "vocab cannot exceed distinct words")
  }
}
