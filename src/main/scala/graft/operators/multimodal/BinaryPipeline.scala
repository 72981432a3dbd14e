package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata.
  *
  * IMAGE decode and resize are REAL — `javax.imageio` ships with the JDK
  * (PNG/JPEG/GIF/BMP, headless-safe), so [[decodeImages]] /
  * [[resizeImages]] actually decode pixels, no external libraries
  * needed. Audio/video demux remains STUBBED (no codec libraries in
  * this container): `decodeImagesStub`/`sampleFramesStub` keep the
  * batched partition-wise shape with deterministic fakes exactly where
  * a JNI/FFmpeg call would sit.
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

  final case class ImageMeta(
      doc_id: Long,
      n_bytes: Long,
      sha256: String,
      format: String,
      width: Long,
      height: Long,
      mean_luma: Double)

  /** REAL image decode over a binary column (pure-JDK `javax.imageio`:
    * PNG/JPEG/GIF/BMP). mapPartitions is the honest shape for an
    * imperative pixel decoder — rows stream through one task-local
    * decoder, never a driver loop. Undecodable/corrupt/NULL bytes yield
    * format "unknown" with -1 dimensions instead of failing the task (a
    * corrupt file must not kill a 100 TB scan); NULL-id rows carry no
    * identity and are dropped. `mean_luma` is a Rec.601 luma average
    * over a ≤64×64 SUBSAMPLED read (`setSourceSubsampling` — the decoder
    * materializes only the sampled grid, megapixel images are never
    * fully decoded here), rounded to 4 digits for cross-run stability.
    */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          if (bytes == null) ImageMeta(id, 0L, "", "unknown", -1L, -1L, -1.0)
          else {
            val digest = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
            val hex = digest.map("%02x".format(_)).mkString
            val n = bytes.length.toLong
            readImage(bytes, maxSamples = 64) match {
              case Some((fmt, w, h, img)) =>
                var sum = 0.0; var cnt = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val rgb = img.getRGB(x, y)
                    sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
                      0.114 * (rgb & 0xFF)
                    cnt += 1; x += 1
                  }
                  y += 1
                }
                val luma = math.rint(sum / cnt / 255.0 * 10000) / 10000
                ImageMeta(id, n, hex, fmt, w.toLong, h.toLong, luma)
              case None =>
                ImageMeta(id, n, hex, "unknown", -1L, -1L, -1.0)
            }
          }
        }
      }
  }

  /** REAL aspect-preserving resize (shorter side → `target`), PNG-encoded
    * output bytes — the thumbnail/normalization step of an image corpus
    * pipeline. Undecodable/NULL rows are dropped (they carry no pixels
    * to resize); pair with [[decodeImages]] to audit them.
    */
  def resizeImages(df: DataFrame, idCol: String, binCol: String, target: Int): DataFrame = {
    require(target >= 1, s"target must be >= 1, got $target")
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          readImage(bytes, maxSamples = 0).map { case (_, _, _, img) =>
            val w = img.getWidth; val h = img.getHeight
            val scale = target.toDouble / math.min(w, h)
            val ow = math.max(1, math.round(w * scale).toInt)
            val oh = math.max(1, math.round(h * scale).toInt)
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, ow, oh, null)
            g.dispose()
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", baos)
            (id, baos.toByteArray, ow.toLong, oh.toLong)
          }
        }
      }
      .toDF("doc_id", "png_bytes", "out_width", "out_height")
  }

  /** Task-local decode helper: (formatName, origWidth, origHeight,
    * image) or None for undecodable/NULL bytes. Never throws. Uses a
    * MemoryCacheImageInputStream — the bytes are already in memory, and
    * the default ImageIO file cache would create+delete a temp file per
    * ROW on the scan's hot path. `maxSamples > 0` subsamples the read to
    * at most maxSamples pixels per axis (the decoder materializes only
    * the grid); `maxSamples <= 0` reads full pixels (the resize path).
    */
  private def readImage(bytes: Array[Byte], maxSamples: Int)
      : Option[(String, Int, Int, java.awt.image.BufferedImage)] =
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          val param = reader.getDefaultReadParam
          if (maxSamples > 0) {
            // ceil-division steps keep samples-per-axis <= maxSamples
            val stepX = math.max(1, (w + maxSamples - 1) / maxSamples)
            val stepY = math.max(1, (h + maxSamples - 1) / maxSamples)
            param.setSourceSubsampling(stepX, stepY, 0, 0)
          }
          val img = reader.read(0, param)
          if (img == null) None else Some((fmt, w, h, img))
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

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
