package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-layout strategies for scale (SURVEY.md §4, driver mandate
  * "co-locate joins via bucketing, salting for skew"):
  *
  * - **Bucketed co-location**: both fact tables written bucketed+sorted
  *   on the join key join with NO exchange — at 100 TB the shuffle is
  *   the bottleneck, and bucketing moves it to write time, amortized
  *   across every downstream join. Verified shuffle-free in
  *   JoinStrategiesSpec.
  * - **Salting**: for a skewed key distribution, spreading the hot keys
  *   over `buckets` sub-keys and replicating the other side bounds the
  *   largest task at 1/buckets of the hot key's rows. (AQE skew-join
  *   handles moderate skew automatically; salting is the explicit tool
  *   for pathological keys.)
  */
object JoinStrategies {

  /** Write `df` bucketed+sorted by `key` as a managed table (parquet).
    * Joins between tables bucketed the same way on the same key need no
    * exchange and no sort. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two bucketed tables on `key` — shuffle-free when both
    * were written with `writeBucketed(..., key, n)` for the same n. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Skew-resistant equi-join: each left row gets a salt in
    * [0, buckets) derived from `saltBy` — a ROW-level expression (not
    * the join key: a key-derived salt would send every hot-key row to
    * the same bucket). The right side is replicated `buckets` ways and
    * the join key becomes (key, salt). Result is row-identical to
    * `left.join(right, key)`; the largest task shrinks to
    * ~1/buckets of the hottest key. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBy: org.apache.spark.sql.Column, buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
