package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * Plain parquet scans: Catalyst pushes filters/column pruning into the
  * scan, so callers should select/filter as early as possible and let the
  * optimizer do the rest.
  */
object Tables {
  def load(s: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects
      // ([PARQUET_TYPE_ILLEGAL]); read nanos as long and truncate to
      // microseconds — the same truncation DuckDB applies on read, so
      // both engines see identical microsecond timestamps.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else s.read.parquet(s"$sfDir/$name.parquet")
}

/** Determinism helpers for the DuckDB differential oracle (SURVEY.md §2.B
  * legend): floating aggregates must not depend on partial-aggregation
  * order, so money-like doubles are summed in decimal (exact) and cast
  * back to double, mirroring
  * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)` on the oracle side.
  */
object Det {
  /** Exact, engine-portable sum of a double column. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact-sum average, rounded: identical double division on both engines. */
  def davg(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(DecimalType(18, scale))).cast("double") / count(c), 4)

  /** Timestamp → second-resolution string, matching DuckDB
    * `strftime(ts, '%Y-%m-%d %H:%M:%S')` under the UTC session timezone. */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
