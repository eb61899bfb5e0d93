package graft.sources

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (driver-mandated extension): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature
  * extraction / resize / frame-sample stages.
  *
  * The decode step is a deterministic STUB (no image/audio codecs ship
  * in this container): `fakeDecode` stands in for a real libjpeg/ffmpeg
  * call. Everything around it — the schema, the binary column handling,
  * the per-partition batch shape (`mapPartitions`, one decoder instance
  * per partition, mirroring how a Python `mapInPandas`/Arrow-batch UDF
  * would amortize decoder setup), and the partitioning — is real and
  * tested (MultimodalSpec). Swap `fakeDecode` for a codec and the
  * pipeline is production-shaped.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  final case class Media(media_id: Long, kind: String, bytes: Array[Byte],
                         width: Int, height: Int, sample_rate: Int)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 mean_byte: Double, first_frame: Array[Byte])

  /** Deterministic fake media table derived from `documents`: the text's
    * UTF-8 bytes play the role of the encoded payload. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      col("text").cast("binary").as("bytes"),
      ((col("doc_id") % 16 + 1) * 64).cast("int").as("width"),
      ((col("doc_id") % 9 + 1) * 64).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"))

  /** STUB decoder — deterministic fake standing in for a codec.
    * Real shape: bytes → decoded frame/waveform; here: the identity
    * "frame" plus simple statistics so results are assertable. */
  private def fakeDecode(bytes: Array[Byte]): (Double, Array[Byte]) = {
    if (bytes == null || bytes.isEmpty) (0.0, Array.emptyByteArray)
    else {
      var s = 0L
      var i = 0
      while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
      (s.toDouble / bytes.length, bytes.take(16)) // "first frame" sample
    }
  }

  /** Decode + feature-extract via typed `mapPartitions`: one decoder
    * per partition (the Arrow-batch-UDF shape), rows stream through. */
  def extractFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[Media].mapPartitions { it =>
      // a real codec would be initialized once per partition here
      it.map { m =>
        val (mean, frame) = fakeDecode(m.bytes)
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, mean, frame)
      }
    }.toDF()
  }

  /** "Resize"/frame-sample: stride-sample the payload bytes — the
    * declarative slice that a real resize kernel would replace. */
  def frameSample(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("sampled",
      expr(s"filter(transform(sequence(1, length(bytes)), i -> " +
        s"CASE WHEN (i - 1) % $stride = 0 THEN substring(bytes, i, 1) END), x -> x IS NOT NULL)"))

  val queries: Map[String, Q] = Map(
    // Metadata + content hash over the binary column — oracle-able.
    "q_media_meta" -> ((s, d) =>
      mediaTable(s, d)
        .select(col("media_id"), col("kind"),
          length(col("bytes")).cast("long").as("n_bytes"),
          md5(col("bytes")).as("content_md5"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
        .orderBy("media_id")),

    // The decode pipeline itself (stubbed decode, real plumbing) — not
    // oracled; MultimodalSpec asserts the feature values.
    "q_media_features" -> ((s, d) =>
      extractFeatures(s, d)
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(col("mean_byte"), 4).as("mean_byte"))
        .orderBy("media_id"))
  )

  val oracles: Map[String, String] = Map(
    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
        |  MD5(text) AS content_md5,
        |  (doc_id % 16 + 1) * 64 AS width,
        |  (doc_id % 9 + 1) * 64 AS height
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
