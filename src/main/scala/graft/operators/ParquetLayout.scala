package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout for scan pruning — the two parquet-level
  * techniques that cut 100 TB scans before a single row is read:
  *
  *  - **Bloom filters** (point lookups): a per-column bloom filter in
  *    each row group's metadata lets the reader skip row groups that
  *    cannot contain an equality-probe value, on columns too
  *    high-cardinality for dictionary pruning (content hashes, doc
  *    ids). Spark's vectorized parquet reader consults them
  *    automatically for pushed-down equality filters — zero read-side
  *    code. Cost: ~1 MB per column per row group at the default FPP.
  *
  *  - **Range-sorted layout** (range scans): `repartitionByRange` +
  *    `sortWithinPartitions` gives every output file a disjoint key
  *    range, so the min/max statistics ("zone maps") parquet already
  *    keeps per row group become maximally selective — a range
  *    predicate touches only the files whose range overlaps it,
  *    instead of every file containing a random slice of the keyspace.
  *
  * Both are write-time choices, amortized over every later scan —
  * the same economics as bucketing (operators/JoinStrategies).
  * ParquetLayoutSpec verifies the footers really carry the bloom
  * filters (and probes them) and that sorted files are disjoint.
  */
object ParquetLayout {

  /** Write `df` as parquet with bloom filters on `bloomCols`.
    * `expectedNdv` sizes each filter (overshooting wastes footer
    * bytes; undershooting inflates the false-positive rate). */
  def writeWithBloom(df: DataFrame, path: String,
                     bloomCols: Seq[String], expectedNdv: Long): Unit =
    bloomCols.foldLeft(df.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }.parquet(path)

  /** Write `df` range-partitioned into `nFiles` files, each sorted and
    * covering a disjoint range of `col` — the zone-map-friendly layout
    * for tables that are predominantly range-scanned on `col`. */
  def writeSorted(df: DataFrame, path: String, col: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, df(col))
      .sortWithinPartitions(col)
      .write.mode("overwrite").parquet(path)

  /** Write `df` Z-order-clustered on TWO numeric columns — the
    * multi-column layout (the Delta/Iceberg OPTIMIZE ZORDER story):
    * range-sorting covers one predicate column; interleaving the two
    * columns' bits and range-sorting on the interleaved value keeps
    * both columns' per-file min/max windows ~√-of-the-file-count
    * narrow, so zone maps prune scans filtered on EITHER column (or
    * both), at the cost of neither being perfectly sorted.
    *
    * Each column is linearly min/max-scaled to 16 bits at write time
    * (two scalars from one aggregate — the only driver-side step); bit
    * i of `colA` lands at position 2i+1 and of `colB` at 2i, built as a
    * fold of codegen'd bitwise ops, no UDF. Linear scaling assumes a
    * roughly uniform value distribution — heavily skewed columns would
    * want rank/quantile binning before the interleave (the same caveat
    * as Delta OSS's implementation).
    */
  def writeZOrdered(df: DataFrame, path: String,
                    colA: String, colB: String, nFiles: Int): Unit = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    def scale16(c: String, lo: Double, hi: Double): Column =
      if (hi == lo) lit(0L)
      else least(lit(65535L), greatest(lit(0L),
        ((col(c).cast("double") - lit(lo)) * (65536.0 / (hi - lo))).cast("long")))
    val a16 = scale16(colA, r.getDouble(0), r.getDouble(1))
    val b16 = scale16(colB, r.getDouble(2), r.getDouble(3))
    val z = (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(a16.bitwiseAND(lit(1L << i)), i + 1))
        .bitwiseOR(shiftleft(b16.bitwiseAND(lit(1L << i)), i))
    }
    df.withColumn("_graft_z", z)
      .repartitionByRange(nFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode("overwrite").parquet(path)
  }
}
