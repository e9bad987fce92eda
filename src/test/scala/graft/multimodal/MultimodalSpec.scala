package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private def sampleMedia = Seq(
    Media(1, "image", "fake-png-bytes-abcdefgh".getBytes, MediaMeta(Some(64), Some(48), None)),
    Media(2, "audio", "fake-wav-bytes-0123".getBytes, MediaMeta(None, None, Some(16000))),
    Media(3, "video", ("frame0" * 10).getBytes, MediaMeta(Some(320), Some(240), None)),
    Media(4, "image", Array.emptyByteArray, MediaMeta(Some(1), Some(1), None))).toDS()

  test("extractFeatures: deterministic stub features, fixed dim, partition-safe") {
    val out = extractFeatures(sampleMedia.repartition(3), dim = 8).collect()
    assert(out.length == 4)
    assert(out.forall(_.features.length == 8))
    val again = extractFeatures(sampleMedia, dim = 8).collect()
    assert(out.sortBy(_.id).zip(again.sortBy(_.id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
    assert(out.find(_.id == 4).get.n_bytes == 0) // empty payload survives
  }

  test("sampleFrames: only video rows, n in-order byte slices") {
    val frames = sampleFrames(sampleMedia, n = 4).collect()
    assert(frames.forall(_.getLong(0) == 3))
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2, 3))
    val total = frames.map(_.getAs[Array[Byte]](2).length).sum
    assert(total > 0 && total <= "frame0".length * 10)
  }

  test("ingestFiles: binaryFile source rows become typed Media with kind + size filter") {
    val dir = tmpDir("media-ingest")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.png"), "pngbytes".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.wav"), "wavbytes!".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "c.mp4"), "m".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "huge.bin"),
      Array.fill[Byte](2048)(1))
    val media = Multimodal.ingestFiles(spark, dir, maxBytes = 1024).collect()
    assert(media.length == 3) // huge.bin filtered by length pushdown
    assert(media.map(_.kind).sorted.toSeq == Seq("audio", "image", "video"))
    assert(media.find(_.kind == "image").get.bytes.sameElements("pngbytes".getBytes))
    // features flow straight from ingest
    val feats = Multimodal.extractFeatures(
      Multimodal.ingestFiles(spark, dir, maxBytes = 1024)).collect()
    assert(feats.length == 3 && feats.forall(_.features.length == 8))
  }

  test("resizeImages: image payload becomes exactly w*h bytes, meta updated, others untouched") {
    val out = resizeImages(sampleMedia, targetW = 4, targetH = 3).collect()
    val img = out.find(_.id == 1).get
    assert(img.bytes.length == 12)
    assert(img.meta == MediaMeta(Some(4), Some(3), None))
    val audio = out.find(_.id == 2).get
    assert(audio.bytes.sameElements("fake-wav-bytes-0123".getBytes)) // pass-through
    // deterministic
    val again = resizeImages(sampleMedia, 4, 3).collect().find(_.id == 1).get
    assert(img.bytes.sameElements(again.bytes))
  }

  test("metaOnly never reads the binary column (scan prunes bytes)") {
    val dir = tmpDir("media")
    sampleMedia.toDF().write.mode("overwrite").parquet(dir)
    val plan = metaOnly(spark.read.parquet(dir)).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("bytes"), s"bytes column not pruned:\n$plan")
  }
}
