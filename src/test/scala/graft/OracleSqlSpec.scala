package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Signed-zero convention guard (VERDICT r15 #1/#4). In r15 the driver's
  * value-hash failed q_knn_graph on ONE bit: DuckDB's IEEE-native
  * `ROUND(tiny_negative, 4)` emits `-0.0` while Spark's BigDecimal round
  * emits `+0.0` — numerically equal, hash-distinct. The repo convention
  * since then: every ORACLE output column produced by rounding a DOUBLE
  * carries a trailing `+ 0` (IEEE: `-0.0 + 0 = +0.0`; every other value,
  * NULL included, is unchanged), so both engines emit positive zero.
  * This spec pins the convention at the SOURCE level — flipping the
  * normalization off anywhere fails here without needing a lucky
  * near-orthogonal data draw — and pins the Spark side behaviorally.
  *
  * Exemptions, by construction incapable of signed zero:
  *  - ROUND over DECIMAL operands (the money convention): SQL DECIMAL
  *    has no signed zero, so `CAST(ROUND(decimal…) AS DOUBLE)` is safe;
  *  - `CAST(ROUND(…) AS BIGINT/INT)` integer staging;
  *  - ROUND as a sub-expression of a larger arithmetic term (those are
  *    integer-staged or re-rounded before output in this repo).
  */
class OracleSqlSpec extends SparkTestBase {

  /** All balanced-paren argument spans of `ROUND(` in `sql`, with the
    * text that follows the closing paren. */
  private def roundSites(sql: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = sql.indexOf("ROUND(")
    while (i >= 0) {
      var j = i + "ROUND(".length
      var depth = 1
      while (j < sql.length && depth > 0) {
        sql(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _   =>
        }
        j += 1
      }
      out += ((sql.substring(i + "ROUND(".length, j - 1),
        sql.substring(j).dropWhile(c => c == ' ' || c == '\n' || c == '|')))
      i = sql.indexOf("ROUND(", j)
    }
    out.result()
  }

  test("every rounded-double oracle output column is signed-zero normalized (+ 0)") {
    // A ROUND(...) span is a DIRECT (unnormalized) output column when
    // its trailing text starts with an alias (`AS x`) — or, ADVICE r16,
    // when it is UNALIASED: followed by the next select item (`,`), the
    // end of the select list (`FROM` / `ORDER`), or end-of-string. A
    // span followed by an operator (`+ 0` normalization, arithmetic) or
    // a closing paren (function-argument position) is not an output
    // column itself.
    def directOutput(trailing: String): Boolean =
      trailing.startsWith("AS ") || trailing.isEmpty ||
        trailing.startsWith(",") || trailing.startsWith("FROM") ||
        trailing.startsWith("ORDER")
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      (args, trailing) <- roundSites(sql.toUpperCase)
      if !args.contains("DECIMAL")               // decimal money staging
      if !trailing.startsWith("AS BIGINT")       // integer staging CAST
      if !trailing.startsWith("AS INT")
      if directOutput(trailing)
    } yield s"$name: ROUND(...) ${trailing.takeWhile(_ != '\n').take(40)}"
    assert(offenders.isEmpty,
      "unnormalized ROUND-double output (add `+ 0` before the alias; " +
        "see the r15 q_knn_graph -0.0 incident):\n" + offenders.mkString("\n"))
  }

  test("store-probe queries (operators/ read paths) emit no negative-zero " +
    "double bits") {
    // VERDICT r18 #8: the oracle-walk above covers every oracleSql
    // entry, but the PROBE queries' double outputs are produced by code
    // in operators/ (AnnIndexStore.probe etc.), not queries/ — guard
    // the convention behaviorally on the store-read paths themselves.
    val probes = Seq("q_ann_index_probe", "q_bm25_probe",
      "q_inverted_index_probe", "q_bpe_apply_probe")
    val negZero = java.lang.Double.doubleToRawLongBits(-0.0)
    probes.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val dcols = df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.DoubleType)
        .map(_.name).toSeq
      if (dcols.nonEmpty) {
        df.select(dcols.map(col): _*).collect().foreach { r =>
          (0 until r.length).foreach { i =>
            if (!r.isNullAt(i))
              assert(java.lang.Double.doubleToRawLongBits(r.getDouble(i)) != negZero,
                s"$name column ${dcols(i)} emitted -0.0 — hash-distinct " +
                  "from the oracle's +0.0")
          }
        }
      }
    }
  }

  test("negative-zero canary: a tiny negative cosine emits POSITIVE zero bits") {
    import spark.implicits._
    // dq = -1 over huge norms → quotient ≈ -2.5e-13 → rounds to zero;
    // the output must be +0.0 at the BIT level (the driver hashes bits).
    val row = Seq((-1L, 4000000000000L, 4000000000000L)).toDF("dq", "na", "nb")
      .select(graft.queries.Similarity.cosine(col("dq"), col("na"), col("nb")).as("cosine"))
      .head()
    val bits = java.lang.Double.doubleToRawLongBits(row.getDouble(0))
    assert(bits == 0L,
      f"cosine of a tiny negative must be +0.0 (bits 0), got bits 0x$bits%016x")
  }

  test("negative-zero canary: the raw helper input really was negative pre-round") {
    import spark.implicits._
    val raw = Seq((-1L, 4000000000000L, 4000000000000L)).toDF("dq", "na", "nb")
      .select((col("dq").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))).as("q"))
      .head().getDouble(0)
    assert(raw < 0.0, s"fixture lost its tiny-negative property: $raw")
  }
}
