package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the companion
  * problem of incremental ingestion: a per-interval AvailableNow job
  * (IncrementalIngestSpec) lands one small file per trigger, and a year
  * of that makes scans metadata-bound (every file costs a footer read
  * and a task). Compact rewrites the directory to ~`targetBytes` files
  * and swaps it in atomically (write to sibling temp dir, rename old
  * out, rename new in) so concurrent readers never see a half-written
  * table.
  *
  * The rewrite preserves rows, not file-level layout: row order within
  * the directory is scan order, as for any parquet table.
  */
object Compaction {

  /** @return (filesBefore, filesAfter) parquet part-file counts */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new Path(dir)
    val fs = path.getFileSystem(hconf)
    def partFiles(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).filter { st =>
        val n = st.getPath.getName
        st.isFile && n.startsWith("part-") && !n.endsWith(".crc")
      }
    // A FileStreamSink directory resolves reads through its
    // _spark_metadata commit log; replacing the files without rewriting
    // that log would HIDE the compacted history from every streaming-
    // aware reader. Refuse — compact the downstream copy instead.
    if (fs.exists(new Path(path, "_spark_metadata")))
      throw new IllegalArgumentException(
        s"$dir is a streaming file-sink directory (_spark_metadata); " +
          "compacting it would orphan the sink's commit log")
    val before = partFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = new Path(path.getParent, s".${path.getName}_compact_tmp")
    val old = new Path(path.getParent, s".${path.getName}_compact_old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    // coalesce, not repartition: no shuffle — each output task reads a
    // contiguous set of input files
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // concurrent-writer guard: if any part file was committed after
    // the listing that fed the rewrite, swapping now would silently
    // delete it — abort and let the caller retry at a quiet moment
    val nowNames = partFiles(path).map(_.getPath.getName).toSet
    val beforeNames = before.map(_.getPath.getName).toSet
    if (nowNames != beforeNames) {
      fs.delete(tmp, true)
      throw new java.io.IOException(
        s"concurrent writes detected in $dir during compaction " +
          s"(${(nowNames -- beforeNames).size} new files); aborted cleanly")
    }
    // atomic-enough swap: two renames; readers between them retry on
    // the moved-out window, never read a partial mix
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compaction swap failed: $path -> $old")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back
      throw new java.io.IOException(s"compaction swap failed: $tmp -> $path")
    }
    fs.delete(old, true)
    (before.length, partFiles(path).length)
  }
}
