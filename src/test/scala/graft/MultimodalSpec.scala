package graft

import graft.sources.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing AND real decode: binary columns with typed
  * metadata, per-partition decode shape, stride sampling. The image
  * (javax.imageio) and audio (javax.sound.sampled) decoders are real —
  * these tests assert the decoded features against an independent
  * recomputation from the shared deterministic generators
  * (`pixel`/`imageDims`, `sample`/`audioFrames`), NOT against the
  * encoder output, so an encode or decode bug cannot cancel out. */
class MultimodalSpec extends SparkTestBase {

  test("media table: binary payload with typed metadata") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val row = m.filter(col("media_id") === 3).select("kind", "width").collect().head
    assert(row.getString(0) == "image" && row.getInt(1) == 256)
    assert(m.count() > 0)
  }

  test("image decode: PNG/BMP payloads decode to the ground-truth raster features") {
    val feats = Multimodal.decodeImages(spark, Multimodal.imageTable(spark, sfDir))
      .filter(col("media_id") < 20).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(feats.size == 20)
    for (id <- 0L until 20L) {
      val (w, h) = Multimodal.imageDims(id)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.pixel(id, x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      val n = w.toLong * h
      val r = feats(id)
      assert(r.getAs[String]("fmt") == (if (id % 2 == 0) "png" else "bmp"))
      assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h,
        s"id=$id dims ${r.getAs[Long]("width")}x${r.getAs[Long]("height")} vs ${w}x$h")
      assert(r.getAs[Long]("mean_r") == sr * 10000 / n, s"id=$id mean_r")
      assert(r.getAs[Long]("mean_g") == sg * 10000 / n, s"id=$id mean_g")
      assert(r.getAs[Long]("mean_b") == sb * 10000 / n, s"id=$id mean_b")
      assert(r.getAs[Long]("n_bytes") > 0)
    }
  }

  test("image decode fails loudly on an undecodable payload") {
    import spark.implicits._
    val junk = Seq(Multimodal.ImageRow(7L, "png", Array[Byte](1, 2, 3))).toDF()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(spark, junk).collect()
    }
    assert(e.getMessage.contains("media_id=7") ||
      Option(e.getCause).exists(_.getMessage.contains("media_id=7")))
  }

  test("audio decode: WAVE payloads decode to the ground-truth PCM features") {
    val feats = Multimodal.decodeAudio(spark, Multimodal.audioTable(spark, sfDir))
      .filter(col("media_id") < 20).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(feats.size == 20)
    for (id <- 0L until 20L) {
      val n = Multimodal.audioFrames(id)
      var sumAbs = 0L
      for (i <- 0 until n) sumAbs += math.abs(Multimodal.sample(id, i).toLong)
      val r = feats(id)
      assert(r.getAs[Long]("sample_rate") == 8000L, s"id=$id rate")
      assert(r.getAs[Long]("n_frames") == n.toLong, s"id=$id frames")
      assert(r.getAs[Long]("mean_abs") == sumAbs / n, s"id=$id mean_abs")
    }
  }

  test("image near-dup: every planted perturbed variant pairs with its base") {
    // Ground truth: recompute each image's dHash in-process from the
    // shared pixel generator (base) and from an independently decoded
    // shifted raster (variant) — NOT via the query's own code path.
    val result = Multimodal.hammingNearDup(
        Multimodal.dHashImages(spark, Multimodal.imageNearDupTable(spark, sfDir)), 6)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Long]("hamming"))
      .toMap
    val docIds = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 5 == 0)
    assert(docIds.nonEmpty)
    var guaranteed = 0
    docIds.foreach { id =>
      val baseImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(
          Multimodal.encodeImage(id, if (id % 2 == 0) "png" else "bmp")))
      val varImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(
          Multimodal.encodeImageShifted(id, if (id % 2 == 0) "bmp" else "png", 4)))
      val d = java.lang.Long.bitCount(
        Multimodal.dHash64(baseImg) ^ Multimodal.dHash64(varImg))
      // 4×16-bit banding guarantees recall for d <= 3 (pigeonhole);
      // 4..6 is probabilistic — assert the guaranteed region exactly.
      if (d <= 3) {
        guaranteed += 1
        assert(result.get((id, id + Multimodal.VariantIdOffset)).contains(d.toLong),
          s"planted pair for doc $id (d=$d) missing or wrong distance")
      }
    }
    // the brightness+4 perturbation must keep most variants in the
    // guaranteed-recall region, or the fixture isn't testing anything
    assert(guaranteed >= docIds.length * 9 / 10,
      s"only $guaranteed/${docIds.length} variants within guaranteed recall")
    result.values.foreach(h => assert(h >= 0 && h <= 6))
  }

  test("image near-dup plan has no cartesian product") {
    val plan = Multimodal.hammingNearDup(
      Multimodal.dHashImages(spark, Multimodal.imageNearDupTable(spark, sfDir)), 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("cached fixture tables round-trip through parquet byte-identically") {
    // q_media_features/_audio read the parquet-materialized fixture so
    // the bench measures decode, not encode — this asserts the cache
    // returns exactly the rows the direct synthesis produces.
    for ((direct, cachedDf) <- Seq(
        Multimodal.imageTable(spark, sfDir) -> Multimodal.imageTableCached(spark, sfDir),
        Multimodal.audioTable(spark, sfDir) -> Multimodal.audioTableCached(spark, sfDir))) {
      val a = direct.select(col("media_id"), md5(col("bytes")).as("h"))
      val b = cachedDf.select(col("media_id"), md5(col("bytes")).as("h"))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    }
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
