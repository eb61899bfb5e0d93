package graft.queries

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed aggregate (SURVEY.md §2.B q_udaf_geomean): geometric
  * mean as an `Aggregator` registered through `functions.udaf` — the
  * idiomatic Spark extension point for aggregates (partial + merge run
  * map-side, so it combines like any built-in agg at scale).
  *
  * Determinism: the buffer holds the sum of `ln(x)` values rounded to 8
  * decimals as exact BigDecimal — addition is associative/commutative,
  * so partial-aggregation order (and a 1000-executor shuffle) cannot
  * perturb the result; the DuckDB oracle sums the identically-rounded
  * `CAST(LN(x) AS DECIMAL(18,8))`.
  */
object Udaf {
  type Q = (SparkSession, String) => DataFrame

  case class GeoBuf(var sumLn: BigDecimal, var n: Long)

  object GeoMean extends Aggregator[Double, GeoBuf, Double] {
    override def zero: GeoBuf = GeoBuf(BigDecimal(0).setScale(8), 0L)
    override def reduce(b: GeoBuf, x: Double): GeoBuf =
      GeoBuf(b.sumLn + BigDecimal(math.log(x)).setScale(8, BigDecimal.RoundingMode.HALF_UP), b.n + 1)
    override def merge(a: GeoBuf, b: GeoBuf): GeoBuf =
      GeoBuf(a.sumLn + b.sumLn, a.n + b.n)
    override def finish(b: GeoBuf): Double =
      if (b.n == 0) Double.NaN
      else BigDecimal(math.exp(b.sumLn.toDouble / b.n))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    override def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, Q] = Map(
    "q_udaf_geomean" -> ((s, d) => {
      val geomean = udaf(GeoMean)
      load(s, d, "part")
        .groupBy(col("p_brand"))
        .agg(geomean(col("p_retailprice")).as("gm_price"),
          count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_udaf_geomean" ->
      """SELECT p_brand,
        |  ROUND(EXP(CAST(SUM(CAST(LN(p_retailprice) AS DECIMAL(18,8))) AS DOUBLE)
        |            / COUNT(*)), 4) + 0 AS gm_price,
        |  COUNT(*) AS cnt
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin
  )
}
