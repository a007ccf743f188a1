package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column pipeline.
  *
  * Media (image/audio/video) travels as an opaque `binary` column with
  * a typed metadata struct alongside — the layout a 100 TB training
  * corpus actually uses (media inline in parquet row groups, metadata
  * queryable without touching bytes). Partitioning guidance: size
  * `spark.sql.files.maxPartitionBytes` so a task holds O(100) blobs,
  * and never collect blobs to the driver.
  *
  * The decode step is STUBBED only for formats the JVM cannot decode
  * natively (H.264-class video — this environment has no codec
  * libraries): [[decodeStub]] derives deterministic fake features from
  * the bytes, and the Spark-side plumbing — schema, batching via
  * mapPartitions, feature struct — is real; swap [[decodeStub]] for a
  * JNI/codec call in production. Everything else is REAL end to end:
  * [[Wav]] builds and chunk-walks RIFF/WAVE PCM, [[Bmp]] walks raw
  * 24-bit containers, and [[Png]]/[[Jpeg]] run the JDK's built-in
  * `javax.imageio` codecs (zlib-deflate PNG, lossy DCT JPEG).
  */
object Blob {

  case class MediaRow(id: Long, blob: Array[Byte], mediaType: String)
  case class MediaFeatures(
      id: Long,
      mediaType: String,
      nBytes: Int,
      // stub features — a real decoder would emit width/height/fps/…
      byteMean: Double,
      byteMin: Int,
      byteMax: Int)

  /** Wrap a text DataFrame as a media table: (id, blob, mediaType). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("blob"),
      lit("application/octet-stream").as("mediaType"))

  /** STUB decoder — deterministic byte statistics standing in for a
    * real `decode → resize → feature-extract` media kernel. Marked
    * clearly; the surrounding pipeline shape is the deliverable.
    */
  private[multimodal] def decodeStub(blob: Array[Byte]): (Double, Int, Int) = {
    if (blob.isEmpty) (0.0, 0, 0)
    else {
      var sum = 0L; var mn = 255; var mx = 0
      var i = 0
      while (i < blob.length) {
        val b = blob(i) & 0xff
        sum += b; if (b < mn) mn = b; if (b > mx) mx = b
        i += 1
      }
      (sum.toDouble / blob.length, mn, mx)
    }
  }

  /** Per-partition batched feature extraction — the mapPartitions
    * boundary is where a real pipeline amortizes codec init per task
    * (analogous to mapInPandas batch shape in PySpark).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-task decoder init would go here
      rows.map { r =>
        val (mean, mn, mx) = decodeStub(r.blob)
        MediaFeatures(r.id, r.mediaType, r.blob.length, mean, mn, mx)
      }
    }
  }

  /** One sampled frame's features. */
  case class FrameFeatures(id: Long, frame_idx: Long, n_bytes: Long, byte_mean: Double)

  /** Frame sampling — the video-path plumbing: the blob is segmented
    * into fixed-size frames and every `stride`-th frame is decoded
    * (stub), one output row per sampled frame. A real pipeline swaps
    * the segmentation for container parsing and [[decodeStub]] for a
    * codec call; the batch shape (flatMap inside mapPartitions, frame
    * ordinals preserved) is the deliverable.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int, stride: Int): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        r.blob.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % stride == 0 =>
            val (mean, _, _) = decodeStub(frame)
            FrameFeatures(r.id, idx.toLong, frame.length.toLong, mean)
        }
      }
    }
  }
}
