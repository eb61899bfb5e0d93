package graft

import graft.sources.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, per-partition decode shape, stride
  * sampling. The decode itself is a deterministic stub (no codecs in
  * the image) — these tests pin the plumbing around it. */
class MultimodalSpec extends SparkTestBase {

  test("media table: binary payload with typed metadata") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val row = m.filter(col("media_id") === 3).select("kind", "width").collect().head
    assert(row.getString(0) == "image" && row.getInt(1) == 256)
    assert(m.count() > 0)
  }

  test("feature extraction via mapPartitions matches a direct computation") {
    val feats = Multimodal.extractFeatures(spark, sfDir)
      .filter(col("media_id") === 0).collect().head
    val text = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") === 0).select("text").collect().head.getString(0)
    val bytes = text.getBytes("UTF-8")
    assert(feats.getAs[Long]("n_bytes") == bytes.length.toLong)
    val mean = bytes.map(_ & 0xff).sum.toDouble / bytes.length
    assert(math.abs(feats.getAs[Double]("mean_byte") - mean) < 1e-9)
    assert(feats.getAs[Array[Byte]]("first_frame").toSeq == bytes.take(16).toSeq)
  }

  test("frame sampling strides the payload") {
    val sampled = Multimodal.frameSample(Multimodal.mediaTable(spark, sfDir), 4)
      .select(col("media_id"), size(col("sampled")).as("n"), length(col("bytes")).as("len"))
      .collect()
    sampled.foreach { r =>
      val (n, len) = (r.getInt(1), r.getInt(2))
      assert(n == (len + 3) / 4, s"media ${r.getLong(0)}: $n vs $len")
    }
  }
}
