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
}
