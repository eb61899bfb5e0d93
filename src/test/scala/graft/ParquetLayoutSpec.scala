package graft

import graft.operators.ParquetLayout
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Footer-level proof that the write-side layout helpers produce what
  * the reader prunes on: bloom filter bitsets that answer membership
  * probes, and disjoint per-file min/max ranges under sorted writes. */
class ParquetLayoutSpec extends SparkTestBase {

  private def footerFiles(dir: String): Seq[Path] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(dir))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-") &&
        st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq
  }

  test("bloom-filter writes land probeable filters in every row group") {
    val dir = Files.createTempDirectory("graft-bloom").toString + "/t"
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
    ParquetLayout.writeWithBloom(docs, dir, Seq("content_md5"), expectedNdv = 1000L)

    val present = docs.select("content_md5").limit(20)
      .collect().map(_.getString(0))
    val conf = spark.sparkContext.hadoopConfiguration
    var probedGroups = 0
    var absentHits = 0
    val nAbsent = 100
    for (f <- footerFiles(dir)) {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        for (block <- reader.getFooter.getBlocks.asScala) {
          val colMeta = block.getColumns.asScala
            .find(_.getPath.toDotString == "content_md5").get
          assert(colMeta.getBloomFilterOffset > 0,
            s"no bloom filter written for content_md5 in $f")
          val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(colMeta)
          assert(bloom != null)
          probedGroups += 1
          // no false negatives, ever: every present value must hit
          for (v <- present)
            assert(bloom.findHash(bloom.hash(Binary.fromString(v))),
              s"present value reported absent (impossible for a bloom filter): $v")
          // absent values: allow the designed false-positive rate, but
          // 100 random 32-hex strings all colliding is impossible
          for (i <- 0 until nAbsent)
            if (bloom.findHash(bloom.hash(Binary.fromString(s"not-a-real-md5-$i"))))
              absentHits += 1
        }
      } finally reader.close()
    }
    assert(probedGroups > 0, "no row groups found")
    assert(absentHits < probedGroups * nAbsent / 10,
      s"bloom filter useless: $absentHits/${probedGroups * nAbsent} absent probes hit")
  }

  test("range-sorted writes give files disjoint key ranges (maximal zone maps)") {
    val dir = Files.createTempDirectory("graft-sorted").toString + "/t"
    val li = Tables.load(spark, sfDir, "lineitem").select(col("l_orderkey"))
    ParquetLayout.writeSorted(li, dir, "l_orderkey", nFiles = 4)

    val conf = spark.sparkContext.hadoopConfiguration
    val ranges = footerFiles(dir).flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        if (blocks.isEmpty) None
        else {
          val stats = blocks.flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == "l_orderkey").map(_.getStatistics)
          Some((stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
            stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max))
        }
      } finally reader.close()
    }.sortBy(_._1)
    assert(ranges.size >= 3, s"expected ~4 data files, got ${ranges.size}")
    // consecutive files must not overlap — STRICTLY: repartitionByRange
    // puts all copies of a boundary key in one partition, so a shared
    // endpoint would mean overlapping zone maps on that key
    for (Seq((_, max1), (min2, _)) <- ranges.sliding(2))
      assert(max1 < min2, s"overlapping file ranges: $ranges")
    // and the union covers the table
    val (lo, hi) = (li.agg(min("l_orderkey")).head.getLong(0),
      li.agg(max("l_orderkey")).head.getLong(0))
    assert(ranges.head._1 == lo && ranges.last._2 == hi)
  }

  private def avgSpan(dir: String, column: String): Double = {
    val conf = spark.sparkContext.hadoopConfiguration
    val spans = footerFiles(dir).flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        if (blocks.isEmpty) None
        else {
          val stats = blocks.flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == column).map(_.getStatistics)
          Some((stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max -
            stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min).toDouble)
        }
      } finally reader.close()
    }
    spans.sum / spans.size
  }

  test("Z-order clustering tightens BOTH columns' footer ranges vs single-column sorts") {
    // single-sort keyed on A leaves B's per-file min/max window at
    // ~the full value range (zone maps prune nothing on B); the
    // interleaved-bit layout must shrink EACH column's average window
    // well below what the layout sorted on the OTHER column gives it
    val base = Files.createTempDirectory("graft-zorder").toString
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    ParquetLayout.writeSorted(li, s"$base/byA", "l_orderkey", nFiles = 16)
    ParquetLayout.writeSorted(li, s"$base/byB", "l_partkey", nFiles = 16)
    ParquetLayout.writeZOrdered(li, s"$base/z", "l_orderkey", "l_partkey", nFiles = 16)
    // rows survive the rewrite
    assert(spark.read.parquet(s"$base/z").count() == li.count())
    val zA = avgSpan(s"$base/z", "l_orderkey")
    val zB = avgSpan(s"$base/z", "l_partkey")
    val otherA = avgSpan(s"$base/byB", "l_orderkey") // A's window when B is the sort key
    val otherB = avgSpan(s"$base/byA", "l_partkey")
    assert(zA < 0.6 * otherA, s"l_orderkey window: zorder=$zA vs sorted-by-partkey=$otherA")
    assert(zB < 0.6 * otherB, s"l_partkey window: zorder=$zB vs sorted-by-orderkey=$otherB")
  }
}
