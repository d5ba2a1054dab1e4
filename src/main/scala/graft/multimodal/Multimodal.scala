package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side machinery — schema, typed Datasets, per-partition
  * batch processing, partition sizing — is real and tested. The codec
  * itself is a clearly-marked STUB (this environment has no image/audio
  * libraries): `decodePartition` derives deterministic fake features
  * from the raw bytes. Swapping in a real decoder changes ONE function
  * and nothing about the distributed plan.
  *
  * Scale notes:
  *   - Decode runs in `mapPartitions`, so a real codec amortizes its
  *     init (model load, JNI handles) once per partition, not per row.
  *   - Media blobs make rows wide; size input partitions by bytes
  *     (`spark.sql.files.maxPartitionBytes`), and repartition by a
  *     content-hash key before decode when sources produce skewed file
  *     sizes.
  *   - Features come out as fixed-width `Array[Float]` ready for the
  *     graft.similarity operators.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      content: Array[Byte],
      declared_width: Int,
      declared_height: Int)

  /** Decoded output: per-media features + verified metadata. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Normalize an arbitrary DataFrame into the media schema: the
    * payload column is cast to binary, metadata defaulted. */
  def fromBinary(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("content"),
      lit(0).as("declared_width"),
      lit(0).as("declared_height"))
      .as[MediaRecord]
  }

  /** STUB decoder ??? — deterministic fake standing in for a real codec
    * (e.g. ImageIO / ffmpeg). Derives: byte checksum, fake dimensions
    * from header bytes, frame count from payload length, and an 8-float
    * "embedding" from a byte histogram. Deterministic → testable. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.content
    val n = bytes.length
    var checksum = 0L
    var i = 0
    while (i < n) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
    val width = if (n >= 2) ((bytes(0) & 0xff) << 4) | (bytes(1) & 0x0f) else 0
    val height = if (n >= 4) ((bytes(2) & 0xff) << 4) | (bytes(3) & 0x0f) else 0
    val nFrames = r.media_type match {
      case "video" => math.max(1, n / 1024)
      case "audio" => math.max(1, n / 256)
      case _ => 1
    }
    val hist = new Array[Float](8)
    i = 0
    while (i < n) { hist((bytes(i) & 0xff) >> 5) += 1f; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { hist(j) /= n; j += 1 } }
    MediaFeatures(r.media_id, r.media_type, n, checksum, width, height,
      nFrames, hist)
  }

  /** Decode + feature-extract: per-partition batch loop so a real codec
    * pays init cost once per partition. */
  def decode(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // real impl: open codec/session HERE, close after the iterator
      it.map(decodeStub)
    }
  }

  /** Frame sampling: keep every `stride`-th kilobyte-"frame" of the
    * payload (STUB for real frame extraction — the slicing arithmetic
    * and row shape are what a real sampler produces). */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val n = math.max(1, r.content.length / 1024)
      (0 until n by stride).map { f =>
        val from = f * 1024
        val until = math.min(r.content.length, from + 1024)
        (r.media_id, f, java.util.Arrays.copyOfRange(r.content, from, until))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Resize metadata transform (STUB: real impl re-encodes pixels; the
    * metadata contract — clamp to a bounding box, keep aspect — is the
    * tested part). */
  def resizePlan(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / greatest(col("width"), lit(1)),
      lit(maxH.toDouble) / greatest(col("height"), lit(1)),
      lit(1.0))
    df.withColumn("target_width",
        ceil(col("width") * scale).cast("int"))
      .withColumn("target_height",
        ceil(col("height") * scale).cast("int"))
  }

  /** End-to-end: binary table → decode → features DataFrame, ready to
    * feed graft.similarity (feature column) or byte-level analytics. */
  def featurize(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String, mediaType: String): DataFrame =
    decode(fromBinary(df, idCol, payloadCol, mediaType)).toDF()
}
