package graft.streaming

import org.apache.spark.sql.SparkSession

/** Checkpoint-identity pinning for streaming store maintenance (r20
  * review). The exactly-once story of [[StreamingIndex]] /
  * [[StreamingAnn]] — "the stream batch id IS the store batch id" —
  * holds only while ONE checkpoint lineage feeds the store: epoch ids
  * restart at 0 for a fresh (or deleted-and-recreated) checkpoint, so a
  * restarted-from-scratch stream would collide with committed
  * `batch-stream-<n>` ids and have its re-read source data silently
  * dropped as "replays" (or, for counted stores, partially
  * double-ingested across different batch boundaries). Silent either
  * way — so the store PINS the engine's persisted streaming query id
  * (`<checkpoint>/metadata`, stable across restarts of the same
  * checkpoint, fresh for a new one) as a write-once `stream-token`
  * file, the same shape as the stores' other pinned properties (bucket
  * count, ANN cells): a pipeline whose checkpoint identity differs from
  * the store's fails LOUDLY before its first append, naming the fix
  * (resume the original checkpoint, or rebuild / explicitly re-key the
  * store).
  */
object StreamIdentity {

  private val verified =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def hfs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The engine's persisted query id for a checkpoint: the `id` field
    * of `<checkpoint>/metadata`, written by StreamExecution at query
    * start — i.e. before any `foreachBatch` body runs, so reading it
    * from inside one is always safe. Deliberately NOT cached by path:
    * a checkpoint deleted and recreated at the same path gets a fresh
    * id, and detecting exactly that recreation is this file's job. */
  def checkpointToken(spark: SparkSession, checkpoint: String): String = {
    val (fs, p) = hfs(spark, checkpoint + "/metadata")
    val in = fs.open(p)
    val raw = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toString("UTF-8")
    } finally in.close()
    "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(raw)
      .map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"streaming checkpoint metadata at $checkpoint has no query id"))
  }

  /** Pin-or-verify: the first streaming ingest records `token` at
    * `<storePath>/stream-token` (atomic create-then-rename; a racer's
    * identical write is fine); every later one must match. */
  def requireSameStream(spark: SparkSession, storePath: String,
                        token: String): Unit = {
    val key = storePath + "#" + token
    if (verified.contains(key)) return
    val (fs, p) = hfs(spark, storePath + "/stream-token")
    if (!fs.exists(p)) {
      fs.mkdirs(p.getParent)
      val tmp = new org.apache.hadoop.fs.Path(
        storePath + s"/.stream-token-tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      try out.write(token.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, p)) fs.delete(tmp, false): Unit // racer won
    }
    val in = fs.open(p)
    val recorded = try {
      val buf = new Array[Byte](256)
      val n = in.read(buf)
      new String(buf, 0, math.max(n, 0), "UTF-8")
    } finally in.close()
    if (recorded != token)
      throw new IllegalStateException(
        s"store at $storePath is maintained by streaming checkpoint " +
        s"$recorded, but this pipeline's checkpoint identity is $token — " +
        "a fresh checkpoint restarts epoch ids at 0 and would silently " +
        "collide with committed batch ids (data re-read from the source " +
        "dropped as replays). Resume the ORIGINAL checkpoint, or rebuild " +
        "the store for a new stream")
    verified.add(key): Unit
  }
}
