package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/video
 * payloads as opaque `binary` columns with typed metadata, processed in
 * partition-sized batches.
 *
 * The Spark-side architecture is real and tested: schemas, batch iteration
 * (`mapPartitions` over case-class rows — the Scala analog of Python's
 * `mapInPandas` batch shape), partition sizing, and metadata propagation.
 * The codec calls themselves are STUBBED with deterministic fakes (this
 * container has no image/audio libraries); each stub is marked and isolated
 * behind `Codecs` so a real JNI/library decode drops in without touching the
 * pipeline code.
 */
object Multimodal {

  /** Typed metadata carried with every media payload. */
  case class MediaMeta(
      mediaType: String,   // "image" | "audio" | "video"
      format: String,      // container/codec, e.g. "jpeg", "wav", "mp4"
      width: Int,          // image/video; 0 for audio
      height: Int,
      sampleRate: Int,     // audio; 0 otherwise
      durationMs: Long)    // audio/video; 0 for still images

  case class MediaRecord(id: Long, payload: Array[Byte], meta: MediaMeta)

  case class ImageFeatures(id: Long, width: Int, height: Int,
      channels: Int, meanLuma: Double, phash: Long)

  case class AudioFrames(id: Long, frameIdx: Int, startMs: Long, rms: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mediaType", StringType), StructField("format", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sampleRate", IntegerType), StructField("durationMs", LongType))))))

  // -------------------------------------------------------------------------
  // STUBBED codecs — deterministic fakes keyed off payload bytes, so tests
  // are reproducible. Replace the bodies with real decoders (e.g. TwelveMonkeys
  // ImageIO / JavaCV) for production; the signatures are the contract.
  // -------------------------------------------------------------------------
  object Codecs {
    /** STUB: "decode" an image — derives pixels stats from a hash of the
      * payload instead of a real decode. Real impl: ImageIO.read(bytes). */
    def decodeImageStub(payload: Array[Byte], meta: MediaMeta): ImageFeatures = {
      val h = java.util.Arrays.hashCode(payload).toLong & 0xFFFFFFFFL
      ImageFeatures(0L, meta.width, meta.height, 3,
        meanLuma = (h % 256).toDouble / 255.0,
        phash = h * 0x9E3779B97F4A7C15L)
    }

    /** STUB: frame-sample audio at fixed hop — RMS faked from payload hash.
      * Real impl: javax.sound.sampled decode + windowed RMS. */
    def sampleAudioStub(payload: Array[Byte], meta: MediaMeta, hopMs: Long): Seq[(Long, Double)] = {
      val n = math.max(1L, meta.durationMs / math.max(1L, hopMs)).toInt
      val h = java.util.Arrays.hashCode(payload)
      (0 until n).map(i => (i * hopMs, ((h * (i + 1)) & 0x7FFF).toDouble / 0x7FFF))
    }
  }

  /** Decode + feature-extract images, batched per partition. Rows stream
    * through the iterator (no partition-wide materialization), so partition
    * size is bounded by `spark.sql.files.maxPartitionBytes`, not row count. */
  def imageFeatures(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "image").mapPartitions { it =>
      it.map { r => Codecs.decodeImageStub(r.payload, r.meta).copy(id = r.id) }
    }
  }

  /** Resize plan: pure-metadata transform (target dims + scale factor) — runs
    * entirely in Catalyst; the byte-level resample is a Codecs stub slot. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.withColumn("scale",
      when(greatest(col("meta.width"), col("meta.height")) <= maxSide, lit(1.0))
        .otherwise(lit(maxSide) / greatest(col("meta.width"), col("meta.height")).cast("double")))
      .withColumn("target_width", ceil(col("meta.width") * col("scale")).cast("int"))
      .withColumn("target_height", ceil(col("meta.height") * col("scale")).cast("int"))

  /** Frame-sample audio/video payloads: one row per sampled frame. */
  def audioFrames(media: Dataset[MediaRecord], hopMs: Long = 1000L): Dataset[AudioFrames] = {
    import media.sparkSession.implicits._
    media.filter(r => r.meta.mediaType == "audio" || r.meta.mediaType == "video")
      .flatMap { r =>
        Codecs.sampleAudioStub(r.payload, r.meta, hopMs).zipWithIndex.map {
          case ((startMs, rms), idx) => AudioFrames(r.id, idx, startMs, rms)
        }
      }
  }

  /** Synthesize a deterministic media table from any numeric id column —
    * used by tests and demos since the driver testdata carries no binaries. */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { r =>
      val id = r
      val mt = Seq("image", "audio", "video")((id % 3).toInt)
      val payload = Array.tabulate[Byte](64)(i => ((id * 31 + i) & 0xFF).toByte)
      val meta = mt match {
        case "image" => MediaMeta("image", "jpeg", 640 + (id % 640).toInt, 480, 0, 0L)
        case "audio" => MediaMeta("audio", "wav", 0, 0, 16000, 1000L + (id % 9000))
        case _       => MediaMeta("video", "mp4", 1280, 720, 0, 2000L + (id % 8000))
      }
      MediaRecord(id, payload, meta)
    }
  }
}
