package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline.
  *
  * Media (image/audio/video) travels as an opaque `binary` column with a
  * typed metadata struct. The Spark-side plumbing — schema, partition-wise
  * batched processing, deterministic output shapes — is real and tested;
  * the actual codec work is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] derives deterministic fake features from the
  * bytes so tests are reproducible. Swap the stub body for a real codec
  * (e.g. JNI/javacv) without touching any of the surrounding plan.
  *
  * Processing uses `mapPartitions` over a typed Dataset deliberately:
  * per-record codec work is imperative, per-partition batching amortizes
  * codec init, and each partition streams — no driver collect, no state,
  * scales linearly with executors.
  */
object Multimodal {

  /** media(id, kind, bytes, meta{width,height,sample_rate}). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))), nullable = true)))

  final case class MediaMeta(width: Option[Int], height: Option[Int],
                             sample_rate: Option[Int])
  final case class Media(id: Long, kind: String, bytes: Array[Byte],
                         meta: MediaMeta)
  final case class MediaFeatures(id: Long, kind: String, n_bytes: Int,
                                 features: Array[Float])

  /** Ingest raw media files through Spark's binaryFile source: each file
    * becomes one row (path, modificationTime, length, content), mapped into
    * the media schema with kind inferred from the extension. This is the
    * production ingest path for a media corpus — the source supports
    * predicate pushdown on path/length/modificationTime, so e.g. a
    * `length < 10MB` filter prunes oversized blobs before reading content. */
  def ingestFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
                  maxBytes: Long = 10L * 1024 * 1024): Dataset[Media] = {
    import spark.implicits._
    val kind = when(col("path").rlike("\\.(png|jpe?g|gif)$"), "image")
      .when(col("path").rlike("\\.(wav|mp3|flac)$"), "audio")
      .when(col("path").rlike("\\.(mp4|avi|webm)$"), "video")
      .otherwise("binary")
    spark.read.format("binaryFile").load(dir)
      .filter(col("length") <= maxBytes) // pushed to the source
      .select(
        xxhash64(col("path")).as("id"),
        kind.as("kind"),
        col("content").as("bytes"))
      .map(r => Media(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2),
        MediaMeta(None, None, None)))
  }

  /** STUB decode: deterministic pseudo-features from the raw bytes (a real
    * implementation would decode pixels/samples here). Kept deterministic
    * so the distributed plumbing is testable without codecs. */
  def decodeStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature extraction over a media Dataset: partition-batched map, one
    * codec "session" per partition (the `it => it.map` shape is where a
    * real codec would init once per partition). */
  def extractFeatures(media: Dataset[Media], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec: init once here, close after the iterator drains
      it.map(m => MediaFeatures(m.id, m.kind,
        Option(m.bytes).map(_.length).getOrElse(0),
        decodeStub(Option(m.bytes).getOrElse(Array.emptyByteArray), dim)))
    }
  }

  /** STUB resize for image-kind rows: deterministic byte downsampling
    * standing in for pixel resampling — output payload is exactly
    * targetW×targetH bytes and the metadata struct is updated, so
    * downstream schema/size contracts are the real ones. Non-image rows
    * pass through untouched. */
  def resizeImages(media: Dataset[Media], targetW: Int, targetH: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map {
        case m if m.kind == "image" && m.bytes != null && m.bytes.nonEmpty =>
          val n = targetW * targetH
          val out = new Array[Byte](n)
          val step = math.max(1.0, m.bytes.length.toDouble / n)
          var i = 0
          while (i < n) {
            out(i) = m.bytes(math.min(m.bytes.length - 1, (i * step).toInt))
            i += 1
          }
          m.copy(bytes = out,
            meta = m.meta.copy(width = Some(targetW), height = Some(targetH)))
        case m => m
      }
    }
  }

  /** Frame sampling stub for video-kind rows: deterministic byte-range
    * slices standing in for decoded frames (n evenly spaced "frames"). */
  def sampleFrames(media: Dataset[Media], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val bytes = Option(m.bytes).getOrElse(Array.emptyByteArray)
      if (bytes.isEmpty) Iterator.empty
      else {
        val frameLen = math.max(1, bytes.length / math.max(n, 1))
        (0 until n).iterator
          .map(i => (m.id, i, bytes.slice(i * frameLen,
            math.min(bytes.length, (i + 1) * frameLen))))
          .filter(_._3.nonEmpty)
      }
    }.toDF("id", "frame_idx", "frame_bytes")
  }

  /** Metadata-only projection: never touches the binary column, so the
    * parquet scan prunes `bytes` entirely — the cheap path for filtering a
    * 100 TB media corpus down to the rows worth decoding. */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("id"), col("kind"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.sample_rate").as("sample_rate"))
}
