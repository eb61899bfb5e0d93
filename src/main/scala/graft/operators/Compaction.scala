package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the companion
  * problem of incremental ingestion: a per-interval AvailableNow job
  * (IncrementalIngestSpec) lands one small file per trigger, and a year
  * of that makes scans metadata-bound (every file costs a footer read
  * and a task). Compact rewrites the directory to ~`targetBytes` files
  * and swaps it in via two renames (write to sibling temp dir, rename
  * old out, rename new in): readers never see a mix of old and new
  * files, though a read landing between the renames fails its task and
  * is retried by Spark. Concurrent writers are handled by an advisory
  * lock file plus two re-list guards (see [[LockFile]] and the guard
  * comments in [[compact]]). The lock is exactly as strong as the
  * filesystem's create-no-overwrite: atomic on HDFS/ABFS (full mutual
  * exclusion); on Hadoop's local filesystem it is check-then-create,
  * so two racing compactions may both enter — the unique per-attempt
  * temp/old names then guarantee the loser fails one of its renames
  * and the table is never corrupted (CompactionSpec's race test).
  *
  * The rewrite preserves rows, not file-level layout: row order within
  * the directory is scan order, as for any parquet table.
  */
object Compaction {

  /** Name of the advisory lock file taken for the duration of a
    * compaction. Cooperating writers (e.g. the incremental-ingest job)
    * should skip a write interval when it is present; non-cooperating
    * writers are caught by the re-list guards below, except in the
    * few-ms window between the last re-list and the final rename —
    * that residual window is closable only by honoring this lock.
    */
  val LockFile = "_graft_compact.lock"

  /** Default age past which a held lock is presumed to come from a
    * crashed compaction (the JVM died between taking the lock and the
    * `finally` cleanup) and is broken. Generous: a healthy compaction
    * of even a very large directory finishes well inside it, and a
    * wrongly-broken lock degrades to the concurrent-writer guards. */
  val StaleLockMs: Long = 30L * 60 * 1000

  /** @return (filesBefore, filesAfter) parquet part-file counts */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              staleLockMs: Long = StaleLockMs): (Int, Int) = {
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
    // A partitionBy'd table keeps its data under key=value
    // subdirectories; a flat rewrite would read them fine but write one
    // unpartitioned directory, silently destroying partition pruning —
    // and the file-level guards below can't see writes inside them.
    // Refuse rather than guess the layout.
    val dataDirs = fs.listStatus(path).filter { st =>
      val n = st.getPath.getName
      st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
    }
    if (dataDirs.nonEmpty)
      throw new IllegalArgumentException(
        s"$dir has partition subdirectories " +
          s"(${dataDirs.take(3).map(_.getPath.getName).mkString(", ")}…); " +
          "flat compaction would drop the partition layout — compact " +
          "each leaf partition directory instead")
    // Advisory lease: atomic create fails if another compaction holds
    // it. A crashed holder never reaches the finally-cleanup, so a lock
    // older than `staleLockMs` is presumed dead and BROKEN — but the
    // break must be claimed atomically (rename to a unique name, one
    // winner) rather than a blind delete, or two breakers could each
    // delete-and-retake and both believe they hold the lease. A younger
    // lock aborts with the holder's identity.
    val lock = new Path(path, LockFile)
    // Attempt id: names this run's temp/old artifacts AND identifies
    // this run's lock — the finally block below releases the lock only
    // if the metadata still carries this id, so a losing racer (local-fs
    // double-entry) or a wrongly-broken-then-retaken lock can never
    // delete the current holder's lease (ADVICE r6).
    val attempt = s"${ProcessHandle.current().pid()}-${System.nanoTime()}"
    final case class LockMetaWriteFailed(cause: Exception) extends Exception(cause)
    def takeLock(): Unit = {
      val out = fs.create(lock, false) // IOException HERE means contended
      try {
        out.write((s"pid=${ProcessHandle.current().pid()} " +
          s"host=${java.net.InetAddress.getLocalHost.getHostName} " +
          s"attempt=$attempt " +
          s"taken=${java.time.Instant.now()}\n").getBytes("UTF-8"))
        out.close()
      } catch {
        // created but couldn't write metadata (disk full, pipeline
        // error): WE own this half-written lock — remove it and fail as
        // a write error, never as "locked by another compaction"
        case e: Exception =>
          try out.close() catch { case _: Exception => () }
          fs.delete(lock, false)
          throw LockMetaWriteFailed(e)
      }
    }
    try takeLock()
    catch {
      case LockMetaWriteFailed(cause) =>
        throw new java.io.IOException(
          s"$dir: could not write $LockFile metadata", cause)
      case e: java.io.IOException =>
        val status =
          try Some(fs.getFileStatus(lock))
          catch { case _: java.io.FileNotFoundException => None }
        status match {
          case None =>
            // the holder released between our create and the stat —
            // the lease is genuinely free now; one retake
            try takeLock()
            catch {
              case LockMetaWriteFailed(cause) =>
                throw new java.io.IOException(
                  s"$dir: could not write $LockFile metadata", cause)
              case e2: java.io.IOException =>
                throw new java.io.IOException(
                  s"$dir was re-locked by another compaction immediately " +
                    "after the previous holder released; retry later", e2)
            }
          case Some(st) =>
            val ageMs = System.currentTimeMillis() - st.getModificationTime
            if (ageMs > staleLockMs) {
              // atomic claim of the break: exactly one renamer wins the
              // stale file; losers see rename fail and back off
              val claimed = new Path(path,
                s".$LockFile.stale-${ProcessHandle.current().pid()}-${System.nanoTime()}")
              if (!fs.rename(lock, claimed))
                throw new java.io.IOException(
                  s"$dir: stale $LockFile (age ${ageMs / 1000}s) was broken " +
                    "by a concurrent compaction first; retry later", e)
              fs.delete(claimed, false)
              try takeLock()
              catch {
                case LockMetaWriteFailed(cause) =>
                  throw new java.io.IOException(
                    s"$dir: could not write $LockFile metadata", cause)
                case e2: java.io.IOException =>
                  throw new java.io.IOException(
                    s"$dir: broke a stale $LockFile (age ${ageMs / 1000}s) but " +
                      "another compaction retook it first", e2)
              }
            } else {
              val holder =
                try new String(fs.open(lock).readAllBytes(), "UTF-8").trim
                catch { case _: java.io.IOException => "<unreadable>" }
              throw new java.io.IOException(
                s"$dir is locked by another compaction ($LockFile, " +
                  s"age ${ageMs / 1000}s, $holder); a lock older than " +
                  s"${staleLockMs / 1000}s is broken automatically", e)
            }
        }
    }
    try {
      // Age-based GC of orphaned per-attempt artifacts (ADVICE r6):
      // unique names mean no later run ever reuses-and-overwrites them,
      // so crashes would accumulate hidden `.<dir>_compact_tmp_*` dirs
      // and `.lock.stale-*` claim files forever. Under the lock, sweep
      // any older than staleLockMs — by the lock-break rationale no
      // healthy attempt lives that long. `.<dir>_compact_old_*` is
      // deliberately KEPT: it is the documented recovery copy of a
      // crashed swap (rename it back by hand).
      val cutoff = System.currentTimeMillis() - staleLockMs
      fs.listStatus(path.getParent).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(s".${path.getName}_compact_tmp_") &&
            st.getModificationTime < cutoff)
          fs.delete(st.getPath, true)
      }
      fs.listStatus(path).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(s".$LockFile.stale-") && st.getModificationTime < cutoff)
          fs.delete(st.getPath, false)
      }
      val before = partFiles(path)
      val beforeNames = before.map(_.getPath.getName).toSet
      val totalBytes = before.map(_.getLen).sum
      val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

      // UNIQUE temp/old names per attempt: (1) the lock is only as
      // atomic as the filesystem's create-no-overwrite (HDFS: atomic;
      // Hadoop's LOCAL fs: check-then-create race), so two racing
      // compactions must at worst fail each other's renames, never
      // write into the same temp directory; (2) a fixed old-name would
      // let a fresh run delete a CRASHED run's swapped-out data — with
      // unique names a crash between the two renames leaves the rows
      // recoverable in `.<dir>_compact_old_<attempt>` (documented
      // recovery: rename it back).
      val tmp = new Path(path.getParent, s".${path.getName}_compact_tmp_$attempt")
      val old = new Path(path.getParent, s".${path.getName}_compact_old_$attempt")
      // coalesce, not repartition: no shuffle — each output task reads a
      // contiguous set of input files
      spark.read.parquet(dir).coalesce(nOut)
        .write.mode("overwrite").parquet(tmp.toString)
      // guard 1: if any part file was committed after the listing that
      // fed the rewrite, swapping now would silently delete it — abort
      // and let the caller retry at a quiet moment
      val nowNames = partFiles(path).map(_.getPath.getName).toSet
      if (nowNames != beforeNames) {
        fs.delete(tmp, true)
        throw new java.io.IOException(
          s"concurrent writes detected in $dir during compaction " +
            s"(${(nowNames -- beforeNames).size} new files); aborted cleanly")
      }
      // swap: two renames; readers between them see a brief missing
      // directory and fail that task (Spark retries the task), never a
      // partial mix of old and new files
      if (!fs.rename(path, old))
        throw new java.io.IOException(s"compaction swap failed: $path -> $old")
      // guard 2: a file committed between guard 1 and the rename
      // traveled with the directory into `old` — re-list there and roll
      // back rather than lose it
      val lateNames = partFiles(old).map(_.getPath.getName).toSet
      if (lateNames != beforeNames) {
        if (!fs.rename(old, path))
          throw new java.io.IOException(
            s"compaction rollback failed: $old -> $path — data is intact " +
              s"in $old but must be moved back manually")
        fs.delete(tmp, true)
        throw new java.io.IOException(
          s"concurrent writes detected in $dir during compaction swap " +
            s"(${(lateNames -- beforeNames).size} late files); rolled back")
      }
      if (!fs.rename(tmp, path)) {
        if (!fs.rename(old, path)) // roll back
          throw new java.io.IOException(
            s"compaction swap AND rollback failed — rows are intact in $old; " +
              s"rename it back to $path manually")
        // rollback restored the table — the rewrite is garbage now;
        // without this delete the uniquely-named tmp dir would linger
        // until the age sweep (ADVICE r6)
        fs.delete(tmp, true)
        throw new java.io.IOException(s"compaction swap failed: $tmp -> $path")
      }
      fs.delete(old, true)
      (before.length, partFiles(path).length)
    } finally {
      // On success the lock traveled into `old` and was deleted with it;
      // on any abort OUR lock is still in the live directory. Release
      // only if the metadata still carries this attempt's id — a losing
      // local-fs racer or a run whose lock was (wrongly) broken and
      // retaken must leave the current holder's lease alone (ADVICE r6).
      val mine =
        try new String(fs.open(lock).readAllBytes(), "UTF-8")
          .contains(s"attempt=$attempt")
        catch { case _: java.io.IOException => false }
      if (mine) fs.delete(lock, false)
    }
  }
}
