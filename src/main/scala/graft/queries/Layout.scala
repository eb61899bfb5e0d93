package graft.queries

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: the file-organization side of a 100 TB lake
  * that the scan operators (q_scan_pruned, q_source_*) consume.
  *
  * Two first-class concerns at scale:
  *
  *  1. **Clustering** (`q_zorder`): multi-dimensional data-skipping.
  *     A table range-partitioned on ONE column prunes predicates on
  *     that column only; interleaving the bits of two bucketized
  *     columns into a Z-value (Morton order) clusters BOTH, so
  *     file-level min/max stats prune range predicates on either.
  *     The query computes, for the same rows laid out two ways
  *     (z-order vs insertion order), how many of 32 files a mid-range
  *     predicate on each dimension must scan. No global sort is
  *     needed: file boundaries are FIXED z-ranges (`z div 8`), i.e. a
  *     range-partition by computed key — the exact shape a
  *     `repartitionByRange(zcol).write` run would produce at scale,
  *     minus the sampling pass. The only non-map-side work is one
  *     1-row min/max aggregate broadcast back to the scan (2-pass
  *     scheme; the second pass is embarrassingly parallel) and a
  *     ~64-row per-file stats aggregate.
  *
  *  2. **Compaction planning** (`q_compact_bins`): the small-files
  *     problem. Ingest writes one file per (day) micro-batch; readers
  *     want ~target-sized files. The planner runs on file METADATA
  *     (one row per file — thousands of rows at 100 TB, not billions),
  *     so the global cumulative-sum window is metadata-scale by
  *     construction; the rewrite it plans is executed distributed.
  *     Bins are contiguous in day order (preserving rough time
  *     locality for time-range pruning after compaction).
  *
  * Reference scope: the reference engine materializes one table and
  * leaves layout to MySQL (schema.sql); these operators are part of the
  * mandated scale extension surface (SURVEY §2.B.1).
  */
object Layout {
  type Q = (SparkSession, String) => DataFrame

  /** Morton interleave of two 4-bit buckets as a SQL expression, using
    * only integer division and modulo so the same formula (modulo the
    * div operator spelling) runs in Spark (`DIV`) and DuckDB (`//`).
    * Bit i of x lands at z bit 2i, bit i of y at z bit 2i+1. */
  def zSql(x: String, y: String, divOp: String): String =
    (0 to 3).map { i =>
      val p = 1 << i // 2^i
      val w = 1 << (2 * i) // 4^i
      s"(($x $divOp $p) % 2) * $w + (($y $divOp $p) % 2) * ${2 * w}"
    }.mkString(" + ")

  /** Hilbert index of a 16×16 grid cell (order-4 curve), standard
    * xy2d bit-twiddle (public algorithm). Unlike Morton order, every
    * consecutive pair of curve positions is grid-adjacent, so files =
    * contiguous curve ranges have tighter per-file bounding boxes —
    * the property HilbertSpec asserts and q_hilbert measures. */
  def hilbertD(n: Int, xIn: Int, yIn: Int): Int = {
    var (x, y, d) = (xIn, yIn, 0)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate quadrant
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** The 256-entry Hilbert table as a SQL array lookup, generated from
    * [[hilbertD]] so Spark and DuckDB evaluate the IDENTICAL mapping —
    * the same portability trick as [[zSql]], trading formula for
    * table because the curve's quadrant rotations don't reduce to
    * div/mod arithmetic. Index = x16 * 16 + y16 (plus 1: both
    * engines' arrays are 1-based). */
  def hilbertSql(x: String, y: String, dialect: String): String = {
    val table = (0 until 256).map(i => hilbertD(16, i / 16, i % 16))
    val idx = s"$x * 16 + $y + 1"
    dialect match {
      case "spark"  => s"element_at(array(${table.mkString(",")}), CAST($idx AS INT))"
      case "duckdb" => s"([${table.mkString(",")}])[$idx]"
    }
  }

  /** 16-way equi-width bucket of `c` over [lo, hi], as SQL. The key is
    * widened to BIGINT before the multiply: an INT-typed key column
    * would otherwise wrap in 32-bit at large scale factors (Spark
    * wraps silently in non-ANSI mode; DuckDB promotes — an oracle
    * divergence exactly at the scale this query models). */
  private def bucketSql(c: String, lo: String, hi: String, divOp: String) =
    s"CAST(((CAST($c AS BIGINT) - $lo) * 16) $divOp ($hi - $lo + 1) AS INT)"

  val queries: Map[String, Q] = Map(
    // Z-order clustering effectiveness: 4 rows —
    // (layout ∈ {linear, zorder}) × (pred_dim ∈ {part, supp}) with the
    // file count and row count a mid-range predicate (bucket ∈ [4,7],
    // i.e. the 25th–50th percentile band) must scan under file-level
    // min/max skipping. Linear layout clusters by l_orderkey
    // (insertion order), so partkey/suppkey predicates scan ~all
    // files; z-order bounds both dims per file.
    "q_zorder" -> ((s, d) => {
      val li = load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val rng = li.agg(
        min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"),
        min("l_orderkey").as("omin"), max("l_orderkey").as("omax"))
      val b = li.crossJoin(broadcast(rng))
        .withColumn("x16", expr(bucketSql("l_partkey", "pmin", "pmax", "DIV")))
        .withColumn("y16", expr(bucketSql("l_suppkey", "smin", "smax", "DIV")))
      val zed = b.withColumn("z", expr(zSql("x16", "y16", "DIV")))
      // fixed z-range file boundaries: 256 z-cells / 8 = 32 files
      val assigned = zed
        .select(col("x16"), col("y16"),
          expr("z DIV 8").as("f"), lit("zorder").as("layout"))
        .unionByName(zed.select(col("x16"), col("y16"),
          expr("CAST(((CAST(l_orderkey AS BIGINT) - omin) * 32)" +
            " DIV (omax - omin + 1) AS INT)").as("f"),
          lit("linear").as("layout")))
      val fileStats = assigned.groupBy(col("layout"), col("f"))
        .agg(min("x16").as("xmin"), max("x16").as("xmax"),
          min("y16").as("ymin"), max("y16").as("ymax"),
          count(lit(1)).as("cnt"))
      val perDim = (dim: String, lo2: Int, hi2: Int, mn: String, mx: String) =>
        fileStats.groupBy(col("layout"))
          .agg(count(lit(1)).as("n_files"),
            sum("cnt").as("rows_total"),
            count_if(col(mn) <= hi2 && col(mx) >= lo2).as("files_scanned"),
            coalesce(sum(when(col(mn) <= hi2 && col(mx) >= lo2, col("cnt"))),
              lit(0L)).as("rows_scanned"))
          .withColumn("pred_dim", lit(dim))
      perDim("part", 4, 7, "xmin", "xmax")
        .unionByName(perDim("supp", 4, 7, "ymin", "ymax"))
        .select(col("layout"), col("pred_dim"), col("n_files"),
          col("files_scanned"), col("rows_total"), col("rows_scanned"))
        .orderBy("layout", "pred_dim")
    }),

    // Hilbert vs Z-order head-to-head: identical shape to q_zorder but
    // comparing the two space-filling curves — Hilbert's grid-adjacent
    // steps give files tighter bounding boxes, so it should scan no
    // more (usually fewer) files than Morton for the same band
    // predicate. Same fixed curve-range file boundaries (d div 8), no
    // global sort.
    "q_hilbert" -> ((s, d) => {
      val li = load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val rng = li.agg(
        min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      val b = li.crossJoin(broadcast(rng))
        .withColumn("x16", expr(bucketSql("l_partkey", "pmin", "pmax", "DIV")))
        .withColumn("y16", expr(bucketSql("l_suppkey", "smin", "smax", "DIV")))
      val curved = b
        .withColumn("z", expr(zSql("x16", "y16", "DIV")))
        .withColumn("h", expr(hilbertSql("x16", "y16", "spark")))
      val assigned = curved
        .select(col("x16"), col("y16"),
          expr("h DIV 8").as("f"), lit("hilbert").as("layout"))
        .unionByName(curved.select(col("x16"), col("y16"),
          expr("z DIV 8").as("f"), lit("zorder").as("layout")))
      val fileStats = assigned.groupBy(col("layout"), col("f"))
        .agg(min("x16").as("xmin"), max("x16").as("xmax"),
          min("y16").as("ymin"), max("y16").as("ymax"),
          count(lit(1)).as("cnt"))
      val perDim = (dim: String, lo2: Int, hi2: Int, mn: String, mx: String) =>
        fileStats.groupBy(col("layout"))
          .agg(count(lit(1)).as("n_files"),
            sum("cnt").as("rows_total"),
            count_if(col(mn) <= hi2 && col(mx) >= lo2).as("files_scanned"),
            coalesce(sum(when(col(mn) <= hi2 && col(mx) >= lo2, col("cnt"))),
              lit(0L)).as("rows_scanned"))
          .withColumn("pred_dim", lit(dim))
      perDim("part", 4, 7, "xmin", "xmax")
        .unionByName(perDim("supp", 4, 7, "ymin", "ymax"))
        .select(col("layout"), col("pred_dim"), col("n_files"),
          col("files_scanned"), col("rows_total"), col("rows_scanned"))
        .orderBy("layout", "pred_dim")
    }),

    // Compaction planner: per-day ingest "files" (metadata derived
    // here from events; in production: the lake's file listing) are
    // bin-packed contiguously into ~16 target-sized compaction bins
    // via a running-sum assignment. SF-invariant: the target is
    // total/16, so the plan shape is stable across scale factors.
    //
    // The running sum is a DISTRIBUTED prefix sum, not a partition-less
    // window (which would funnel the whole file listing — 10⁶–10⁷ rows
    // on a real lake — through one task): days are bucketed by VALUE
    // range (deterministic, same pattern as q_zorder's linear layout —
    // no repartitionByRange, whose sampled boundaries could differ
    // between the offsets job and the main job), the running sum runs
    // per bucket, and cross-bucket offsets come from an O(nb²)
    // self-join over the nb=32 bucket totals — metadata-of-metadata —
    // broadcast back onto the bucketed rows.
    "q_compact_bins" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nb = 32 // prefix-sum buckets = parallelism of the running sum
      val files = load(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(length(col("props"))).as("bytes"))
      val rng = files.agg(min("day").as("dmin"), max("day").as("dmax"),
        sum("bytes").as("tb"))
      val bucketed = files.crossJoin(broadcast(rng))
        .withColumn("bkt", expr(
          s"CAST((CAST(DATEDIFF(day, dmin) AS BIGINT) * $nb)" +
            " DIV (DATEDIFF(dmax, dmin) + 1) AS INT)"))
      val wIn = Window.partitionBy(col("bkt")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val btot = bucketed.groupBy(col("bkt")).agg(sum("bytes").as("btot"))
      val offsets = btot.as("a")
        .join(btot.as("b"), col("b.bkt") < col("a.bkt"), "left")
        .groupBy(col("a.bkt").as("bkt"))
        .agg(coalesce(sum(col("b.btot")), lit(0L)).as("off"))
      bucketed
        .withColumn("run_in", sum("bytes").over(wIn))
        .join(broadcast(offsets), "bkt")
        .withColumn("target", expr("tb DIV 16 + 1"))
        .withColumn("cum_before", col("off") + col("run_in") - col("bytes"))
        .withColumn("bin", expr("CAST(cum_before DIV target AS INT)"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_files"), sum("bytes").as("bin_bytes"),
          min("day").as("day_min"), max("day").as("day_max"))
        .orderBy("bin")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_zorder" -> s"""
      |WITH rng AS (
      |  SELECT min(l_partkey) pmin, max(l_partkey) pmax,
      |         min(l_suppkey) smin, max(l_suppkey) smax,
      |         min(l_orderkey) omin, max(l_orderkey) omax
      |  FROM lineitem
      |), b AS (
      |  SELECT ${bucketSql("l_partkey", "pmin", "pmax", "//")} AS x16,
      |         ${bucketSql("l_suppkey", "smin", "smax", "//")} AS y16,
      |         l_orderkey, omin, omax
      |  FROM lineitem, rng
      |), zed AS (
      |  SELECT x16, y16, ${zSql("x16", "y16", "//")} AS z,
      |         l_orderkey, omin, omax FROM b
      |), assigned AS (
      |  SELECT 'zorder' AS layout, x16, y16, z // 8 AS f FROM zed
      |  UNION ALL
      |  SELECT 'linear', x16, y16,
      |         CAST(((CAST(l_orderkey AS BIGINT) - omin) * 32)
      |              // (omax - omin + 1) AS INT)
      |  FROM zed
      |), fs AS (
      |  SELECT layout, f, min(x16) xmin, max(x16) xmax,
      |         min(y16) ymin, max(y16) ymax, count(*) cnt
      |  FROM assigned GROUP BY layout, f
      |)
      |SELECT layout, pred_dim, n_files, files_scanned, rows_total,
      |       rows_scanned
      |FROM (
      |  SELECT layout, 'part' AS pred_dim, count(*) AS n_files,
      |         CAST(sum(cnt) AS BIGINT) AS rows_total,
      |         count(*) FILTER (WHERE xmin <= 7 AND xmax >= 4) AS files_scanned,
      |         CAST(coalesce(sum(cnt) FILTER (WHERE xmin <= 7 AND xmax >= 4), 0)
      |              AS BIGINT) AS rows_scanned
      |  FROM fs GROUP BY layout
      |  UNION ALL
      |  SELECT layout, 'supp', count(*), CAST(sum(cnt) AS BIGINT),
      |         count(*) FILTER (WHERE ymin <= 7 AND ymax >= 4),
      |         CAST(coalesce(sum(cnt) FILTER (WHERE ymin <= 7 AND ymax >= 4), 0)
      |              AS BIGINT)
      |  FROM fs GROUP BY layout
      |)
      |ORDER BY layout, pred_dim
      |""".stripMargin,
    "q_hilbert" -> s"""
      |WITH rng AS (
      |  SELECT min(l_partkey) pmin, max(l_partkey) pmax,
      |         min(l_suppkey) smin, max(l_suppkey) smax
      |  FROM lineitem
      |), b AS (
      |  SELECT ${bucketSql("l_partkey", "pmin", "pmax", "//")} AS x16,
      |         ${bucketSql("l_suppkey", "smin", "smax", "//")} AS y16
      |  FROM lineitem, rng
      |), curved AS (
      |  SELECT x16, y16, ${zSql("x16", "y16", "//")} AS z,
      |         ${hilbertSql("x16", "y16", "duckdb")} AS h FROM b
      |), assigned AS (
      |  SELECT 'hilbert' AS layout, x16, y16, h // 8 AS f FROM curved
      |  UNION ALL
      |  SELECT 'zorder', x16, y16, z // 8 FROM curved
      |), fs AS (
      |  SELECT layout, f, min(x16) xmin, max(x16) xmax,
      |         min(y16) ymin, max(y16) ymax, count(*) cnt
      |  FROM assigned GROUP BY layout, f
      |)
      |SELECT layout, pred_dim, n_files, files_scanned, rows_total,
      |       rows_scanned
      |FROM (
      |  SELECT layout, 'part' AS pred_dim, count(*) AS n_files,
      |         CAST(sum(cnt) AS BIGINT) AS rows_total,
      |         count(*) FILTER (WHERE xmin <= 7 AND xmax >= 4) AS files_scanned,
      |         CAST(coalesce(sum(cnt) FILTER (WHERE xmin <= 7 AND xmax >= 4), 0)
      |              AS BIGINT) AS rows_scanned
      |  FROM fs GROUP BY layout
      |  UNION ALL
      |  SELECT layout, 'supp', count(*), CAST(sum(cnt) AS BIGINT),
      |         count(*) FILTER (WHERE ymin <= 7 AND ymax >= 4),
      |         CAST(coalesce(sum(cnt) FILTER (WHERE ymin <= 7 AND ymax >= 4), 0)
      |              AS BIGINT)
      |  FROM fs GROUP BY layout
      |)
      |ORDER BY layout, pred_dim
      |""".stripMargin,
    "q_compact_bins" -> """
      |WITH files AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |         CAST(sum(length(props)) AS BIGINT) AS bytes
      |  FROM events GROUP BY 1
      |), planned AS (
      |  SELECT day, bytes,
      |         (SELECT CAST(sum(bytes) AS BIGINT) FROM files) // 16 + 1
      |           AS target,
      |         CAST(coalesce(sum(bytes) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - bytes, 0) AS BIGINT) AS cum_before
      |  FROM files
      |)
      |SELECT CAST(cum_before // target AS INT) AS bin,
      |       count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS bin_bytes,
      |       min(day) AS day_min, max(day) AS day_max
      |FROM planned GROUP BY 1 ORDER BY bin
      |""".stripMargin
  )
}
