package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata.
  *
  * The Spark-side plumbing — binary schema, partition-wise batched
  * processing, deterministic output schema — is real and tested; the
  * actual media decode is STUBBED (the decode libraries are not in this
  * container): `decodeImagesStub` derives deterministic fake dimensions
  * from the bytes, in batches, exactly where a JNI/FFmpeg call would sit.
  */
object BinaryPipeline {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      sha256: String,
      width: Long,
      height: Long)

  /** Pure-SQL manifest over a binary column: size, digest, and the same
    * deterministic fake dimensions the stub decoder produces (so the two
    * paths are cross-checkable).
    */
  def manifest(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      octet_length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("sha256"),
      (lit(32L) + octet_length(col(binCol)).cast("long") % 224L).as("width"),
      (lit(32L) + (octet_length(col(binCol)).cast("long") * 7L) % 224L).as("height"))

  /** Batched partition-wise decode. STUB: real decode (`???` seam) replaced
    * by a deterministic fake; batch shape (64 records) mirrors how a real
    * vectorized decoder would be fed.
    */
  def decodeImagesStub(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap { batch =>
          // real impl: hand `batch.map(_._2)` to the native decoder here
          batch.map { case (id, bytes) =>
            val digest = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
            val hex = digest.map("%02x".format(_)).mkString
            val n = bytes.length.toLong
            MediaMeta(id, n, hex, 32L + n % 224L, 32L + (n * 7L) % 224L)
          }
        }
      }
  }

  final case class ResizedMeta(doc_id: Long, width: Long, height: Long,
      out_width: Long, out_height: Long)

  /** Aspect-preserving resize plan (shorter side → `target`). STUB: only
    * the geometry is computed; the pixel op would sit in the same
    * mapPartitions batch as the decode.
    */
  def resizePlan(meta: Dataset[MediaMeta], target: Long): Dataset[ResizedMeta] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.map { m =>
      val short = math.min(m.width, m.height)
      val scaleNum = target
      ResizedMeta(m.doc_id, m.width, m.height,
        m.width * scaleNum / short, m.height * scaleNum / short)
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Long, frame_sha: String)

  /** Frame sampling for video-like binaries: every `stride`-th frame of a
    * deterministic fake frame count derived from the bytes. STUB: real
    * demux/decode would produce the frame payloads in the same flatMap.
    */
  def sampleFramesStub(df: DataFrame, idCol: String, binCol: String, stride: Long): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(stride > 0)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = 1L + bytes.length.toLong % 64L
        (0L until nFrames by stride).map { i =>
          val digest = java.security.MessageDigest.getInstance("SHA-256")
          digest.update(bytes)
          digest.update(java.nio.ByteBuffer.allocate(8).putLong(i).array())
          Frame(id, i, digest.digest().take(8).map("%02x".format(_)).mkString)
        }
      }
  }
}
