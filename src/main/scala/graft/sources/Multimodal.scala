package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and batched decode /
  * feature-extract operators.
  *
  * The Spark-side architecture is real — schema, partition-parallel
  * batched processing via `mapPartitions` over a typed Dataset, stable
  * output schema — while the codec itself is STUBBED with a
  * deterministic fake (this container has no image/audio libraries; on
  * a real cluster `decodeStub` is replaced by the JNI/FFI codec call,
  * and nothing else changes).
  *
  * Scale design: payload bytes never move through a shuffle — decode is
  * a narrow map over the scan partitions; only the (tiny) extracted
  * features flow downstream. `binaryFile` sources + partition sizing by
  * `spark.sql.files.maxPartitionBytes` keep one batch ≈ one task.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  /** Extracted features: fixed-size vector + summary stats. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  val FeatureDim = 16

  /** STUB decode: a real implementation calls the image/audio codec on
    * the payload bytes (e.g. libjpeg/ffmpeg via FFI). The fake is
    * deterministic in the payload so tests are stable: a rolling
    * checksum and a byte-histogram-derived feature vector with the
    * exact shape/batching a codec-backed extractor would have.
    */
  private[sources] def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 1125899906842597L
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      checksum = checksum * 31 + (payload(i) & 0xff)
      hist((payload(i) & 0xff) % FeatureDim) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    (checksum, hist.map(_ / n))
  }

  /** Batched decode + feature extraction: one `mapPartitions` pass, no
    * shuffle; the payload column is dropped from the output so only
    * features flow downstream.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (checksum, feature) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          checksum, feature)
      }
    }
  }

  /** Deterministic synthetic media table (payloads derived from the
    * documents table's text bytes) for exercising the plumbing.
    */
  def syntheticMedia(spark: SparkSession, documentsDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(documentsDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(300)) + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index,
    * computed declaratively (the decode of each sampled frame is the
    * stubbed step).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("sampled_frames",
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
      .withColumn("n_sampled", size(col("sampled_frames")))

  /** STUB resize: a real implementation decodes, scales, and re-encodes
    * the payload (libjpeg/swscale via FFI). The fake keeps the plumbing
    * honest — output metadata reflects the target box with aspect ratio
    * preserved, and the payload is truncated proportionally to the
    * pixel reduction so byte-accounting stays deterministic.
    */
  private[sources] def resizeStub(payload: Array[Byte], w: Int, h: Int,
      maxSide: Int): (Array[Byte], Int, Int) = {
    val scale = math.min(1.0, maxSide.toDouble / math.max(math.max(w, h), 1))
    val nw = math.max((w * scale).toInt, 1)
    val nh = math.max((h * scale).toInt, 1)
    val keep = math.max(
      (payload.length * (nw.toLong * nh) / math.max(w.toLong * h, 1L)).toInt, 1)
    (java.util.Arrays.copyOf(payload, math.min(keep, payload.length)), nw, nh)
  }

  /** Batched resize for image rows: one `mapPartitions` pass, payloads
    * never shuffle; non-image rows pass through untouched.
    */
  def resizeImages(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map {
        case r if r.kind == "image" =>
          val (p, w, h) = resizeStub(r.payload, r.width, r.height, maxSide)
          r.copy(payload = p, width = w, height = h)
        case r => r
      }
    }
  }
}
