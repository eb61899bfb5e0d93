package graft.operators

import org.apache.spark.sql.DataFrame

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
}
