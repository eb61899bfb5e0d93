package graft

import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** q_editsim skew hardening (VERDICT r16 #5): a boilerplate-heavy
  * corpus puts every doc behind one hot 8-char prefix, and prefix-only
  * blocking then goes block-quadratic. The width-13 length band is the
  * exactness-preserving secondary key — lev >= |Δlen|, so dist <= 12
  * forces adjacent bands — and this spec pins both halves of that
  * claim on a planted hot-prefix corpus:
  *   (a) candidates reaching the levenshtein verify are SUB-QUADRATIC
  *       in the hot block (the band join prunes cross-length pairs),
  *   (b) the result still equals an independent all-pairs Scala
  *       recomputation (no true near pair was pruned).
  * Also pins the ADVICE r16 oracle assumption: Spark's levenshtein
  * counts code points, DuckDB's counts bytes — equivalent only while
  * the 32-char prefixes are pure ASCII, asserted here against the
  * real corpus.
  */
class EditSimSkewSpec extends SparkTestBase {

  /** Classic Levenshtein DP — the independent reference. */
  private def lev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  // Planted corpus: EVERY doc shares the hot 8-char prefix "HOTPREF!".
  // Two length clusters — "short" docs are the bare prefix (len 8),
  // "long" docs carry a 24-char suffix (len 32) with id-dependent
  // variation so some long-long pairs are near and some are not.
  // |Δlen| across clusters = 24 > 12, so every cross pair is excluded
  // by the length bound — and the band key (8 -> band 0, 32 -> band 2,
  // never adjacent) prunes them at the JOIN, before levenshtein.
  private val hot = "HOTPREF!"
  private def plantedText(id: Long): String =
    if (id % 2 == 1) hot
    else hot + ("abcdefgh" * 3).updated((id % 24).toInt, ('A' + (id % 7).toInt).toChar)

  private lazy val plantedDir: String = {
    import spark.implicits._
    val dir = s"/tmp/graft-editsim-skew-${System.nanoTime()}"
    (1L to 60L).map(id => (id, plantedText(id), "en", "planted",
        plantedText(id).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted hot prefix: candidates reaching the verify are sub-quadratic") {
    // reconstruct the candidate stage (same keys as the query): prefix
    // block + width-13 length band, |Δlen| <= 12 filter, BEFORE the
    // levenshtein verify
    val t = Tables.load(spark, plantedDir, "documents")
      .select(col("doc_id"), expr("substring(text, 1, 32)").as("sx"),
        expr("substring(text, 1, 8)").as("blk"),
        expr("CAST(length(substring(text, 1, 32)) AS INT)").as("ln"))
    val probe = t.select(col("doc_id").as("a_id"), col("ln").as("la"), col("blk"),
      explode(expr("array(ln DIV 13 - 1, ln DIV 13, ln DIV 13 + 1)")).as("band"))
    val anchor = t.select(col("doc_id").as("b_id"), col("ln").as("lb"),
      col("blk"), (col("ln") / 13).cast("int").as("band"))
    val nCand = probe.join(anchor, Seq("blk", "band"))
      .filter(col("a_id") < col("b_id") && abs(col("la") - col("lb")) <= 12)
      .count()
    val n = 60L
    val quad = n * (n - 1) / 2                     // prefix-only blocking
    val withinClusters = 2 * (30L * 29 / 2)        // the true candidate floor
    assert(nCand == withinClusters,
      s"expected only within-cluster candidates ($withinClusters), got $nCand")
    assert(nCand * 2 <= quad, s"candidates not sub-quadratic: $nCand vs $quad")
  }

  test("planted hot prefix: result equals the all-pairs Scala recomputation") {
    val got = Similarity.queries("q_editsim")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val docs = (1L to 60L).map(id => id -> plantedText(id).take(32))
    val want = (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia < ib && sa.take(8) == sb.take(8)
      d = lev(sa, sb) if d <= 12
    } yield (ia, ib, d.toLong)).toSet
    assert(want.nonEmpty && want.exists(_._3 > 0), "planted corpus degenerate")
    assert(got == want,
      s"editsim mismatch: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("oracle assumption: corpus 32-char prefixes are pure ASCII (byte == code point)") {
    // DuckDB's levenshtein is byte-based, Spark's code-point-based; the
    // oracle equivalence needs every compared prefix to be ASCII.
    val nonAscii = Tables.load(spark, sfDir, "documents")
      .filter(expr("substring(text, 1, 32) RLIKE '[^\\\\x00-\\\\x7F]'"))
      .count()
    assert(nonAscii == 0, s"$nonAscii non-ASCII prefixes break the levenshtein oracle")
  }
}
