package graft

import org.apache.spark.sql.functions.{col, expr}

/** graft_rollminhash must be bit-identical to the higher-order form it
  * replaced (`array_min(transform(sequence(1, len-w+1), i ->
  * md5(CAST(substring(text, i, w) AS BINARY))))`) — including on
  * supplementary-plane input, where Spark's substring counts CODE
  * POINTS (a UTF-16 implementation would split surrogate pairs). */
class TextExprsSpec extends SparkTestBase {

  test("rolling minhash == HOF form on ASCII, non-ASCII, and astral input") {
    graft.functions.TextExprs.register(spark)
    import spark.implicits._
    val fixtures = Seq(
      "the quick brown fox jumps",
      "héllo wörld with ünïcode",
      "emoji 😀 inside 🚀 the text",   // astral: surrogate pairs
      "𝕊𝕦𝕡𝕡𝕝𝕖𝕞𝕖𝕟𝕥𝕒𝕣𝕪 𝕡𝕝𝕒𝕟𝕖",       // all-astral
      "exactly8!", "short", "12345678")
    val df = fixtures.toDF("t").repartition(2)
      .select(col("t"),
        expr("graft_rollminhash(t, 8)").as("fast"),
        expr("array_min(transform(sequence(1, length(t) - 7)," +
          " i -> md5(CAST(substring(t, i, 8) AS BINARY))))").as("ref"))
    df.collect().foreach { r =>
      val (t, fast, ref) = (r.getString(0), r.getString(1), r.getString(2))
      if (t.codePointCount(0, t.length) < 8) assert(fast == null, t)
      else assert(fast == ref, s"mismatch on '$t': $fast vs $ref")
    }
  }
}
