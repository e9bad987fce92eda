package graft.streaming

import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Media, MediaMeta}
import org.apache.spark.sql.functions._

class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic smooth-gradient PNG (the MultimodalSpec fixture). */
  private def png(seed: Int, flipped: Int = 0): Array[Byte] = {
    val (w, h) = (64, 48)
    val (fx, fy) = (1 + seed % 3, 1 + (seed / 3) % 3)
    val (px, py) = (seed * 37 % 100 / 100.0, seed * 53 % 100 / 100.0)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val s = math.sin(2 * math.Pi * (fx.toDouble * x / w + px)) *
        math.sin(2 * math.Pi * (fy.toDouble * y / h + py))
      val v = math.min(255, math.max(0, (128 + 80 * s + 20.0 * x / w).toInt))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val rnd = new scala.util.Random(seed + 1000)
    for (_ <- 0 until flipped)
      img.setRGB(rnd.nextInt(w), rnd.nextInt(h), 0xff0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def vid(seeds: Seq[Int], flipped: Int = 0): Array[Byte] =
    Multimodal.encodeVideo(seeds.map(sd => png(sd, flipped)))

  test("media ingest: corpus near-dup quarantined, in-batch clone pair lands min id, fresh and undecodable land") {
    val corpusDir = tmpDir("media-corpus")
    val in = tmpDir("media-in")
    val out = tmpDir("media-out")
    Seq(
      Media(1, "video", vid(Seq(7, 21, 35, 49)), MediaMeta(None, None, None)),
      Media(2, "video", vid(Seq(60, 61, 62, 63)), MediaMeta(None, None, None)))
      .toDS().toDF().write.parquet(s"$corpusDir/media.parquet")
    val clone = vid(Seq(201, 202, 203, 204))
    Seq(
      // a lightly edited copy of corpus video 1 — must be quarantined
      Media(101, "video", vid(Seq(7, 21, 35, 49), flipped = 6), MediaMeta(None, None, None)),
      // genuinely new content — must land
      Media(102, "video", vid(Seq(301, 302, 303, 304)), MediaMeta(None, None, None)),
      // an in-batch clone pair with no corpus twin — exactly 103 lands
      Media(103, "video", clone, MediaMeta(None, None, None)),
      Media(104, "video", clone, MediaMeta(None, None, None)),
      // an undecodable payload: no frames, no hashes, cannot collide — lands
      Media(105, "video", "not-a-container".getBytes, MediaMeta(None, None, None)))
      .toDS().toDF().coalesce(1).write.mode("append").parquet(in)
    val q = MediaStream.mediaIngest(
        MediaStream.readMedia(spark, in), out, corpus = Some(corpusDir))
      .option("checkpointLocation", tmpDir("media-ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()
    val landed = spark.read.parquet(s"$out/b=00000")
      .select("id").collect().map(_.getLong(0)).toSet
    val quarantined = spark.read.parquet(s"$out/quarantine/b=00000")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(landed == Set(102L, 103L, 105L), s"landed=$landed")
    assert(quarantined == Set(101L, 104L), s"quarantined=$quarantined")
    // the landed rows carry their full media payloads (binary survives)
    val bytes = spark.read.parquet(s"$out/b=00000")
      .filter(col("id") === 103L).select("bytes").collect()
      .head.getAs[Array[Byte]](0)
    assert(bytes.sameElements(clone))
  }

  test("stream screen equals the batch operators on the same rows (no batch/stream drift)") {
    import org.apache.spark.sql.DataFrame
    val media = Seq(
      Media(11, "video", vid(Seq(7, 21, 35, 49)), MediaMeta(None, None, None)),
      Media(12, "video", vid(Seq(7, 21, 35, 49), flipped = 6), MediaMeta(None, None, None)),
      Media(13, "video", vid(Seq(401, 402, 403, 404)), MediaMeta(None, None, None))).toDS()
    val fh: DataFrame = Multimodal.videoHashes(media, 4).toDF()
    val dropped = MediaStream.batchNearDupDropIds(fh, 3, 3)
      .collect().map(_.getLong(0)).toSet
    val pairs = Multimodal.nearDupVideoPairs(
        Multimodal.videoHashes(media, 4), 3, 3)
      .collect().map(r => r.getLong(1)).toSet
    assert(dropped == pairs, "the stream screen IS the batch pair rule")
    assert(dropped == Set(12L))
  }
}
