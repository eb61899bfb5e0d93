package graft

import java.nio.file.Files
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q_provenance's two halves, separated (ADVICE r6):
  *
  *  - the Spark side reads REAL `_metadata.file_path`/`row_index`, and
  *    must be correct on any layout — proven here on a 4-file directory
  *    whose per-file contents and row order are known by construction;
  *  - the DuckDB oracle CANNOT see filename/file_row_number through the
  *    driver's views, so it derives row_idx from documents.parquet
  *    being one doc_id-sorted flat file. That precondition is asserted
  *    LOUDLY at every SF here, so a generator change breaks this spec
  *    with a pointer at the oracle instead of silently reddening
  *    q_provenance in the driver's correctness table.
  */
class ProvenanceSpec extends SparkTestBase {

  test("oracle precondition: documents.parquet is ONE doc_id-sorted flat file at every SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val p = s"/root/testdata/$sf/documents.parquet"
      assert(new java.io.File(p).isFile,
        s"$p is no longer a single flat file — q_provenance's DuckDB oracle " +
          "(queries/Pipeline.scala) hardcodes the file name and derives row_idx " +
          "from doc_id order; rewrite the oracle before trusting the driver row")
      val mismatched = spark.read.parquet(p)
        .select(col("doc_id"), col("_metadata.row_index").as("ri"))
        .withColumn("rk", row_number().over(Window.orderBy("doc_id")).cast("long") - 1)
        .filter(col("ri") =!= col("rk")).count()
      assert(mismatched == 0,
        s"$p physical row order no longer equals doc_id order — q_provenance's " +
          "oracle derives row_idx from that order; rewrite it before trusting the row")
    }
  }

  test("provenance columns are correct on a multi-file layout (4 files, known contents)") {
    // build a 4-file copy where WE decide each file's rows and order,
    // so the expectation needs no metadata at all — then the real
    // _metadata read over the directory must reproduce it exactly
    import spark.implicits._
    val ids = Tables.load(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val groups = ids.grouped(math.max(1, ids.length / 4 + 1)).toSeq
    assert(groups.size >= 3, s"need >=3 files, got ${groups.size}")
    val base = Files.createTempDirectory("graft-prov").toString
    val dst = new org.apache.hadoop.fs.Path(s"$base/multi")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dst)
    val expected = groups.zipWithIndex.flatMap { case (g, i) =>
      val tmp = s"$base/g$i"
      g.toSeq.toDF("doc_id").coalesce(1).sortWithinPartitions("doc_id")
        .write.parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).filter(_.getName.startsWith("part-")).head
      assert(fs.rename(part, new org.apache.hadoop.fs.Path(dst, s"f$i.parquet")))
      g.zipWithIndex.map { case (id, j) => (id, s"f$i.parquet", j.toLong) }
    }.toSet
    val got = spark.read.parquet(dst.toString)
      .select(col("doc_id"),
        regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1).as("src_file"),
        col("_metadata.row_index").as("row_idx"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }
}
