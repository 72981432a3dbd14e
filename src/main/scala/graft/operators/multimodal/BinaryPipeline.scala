package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata.
  *
  * IMAGE decode and resize are REAL — `javax.imageio` ships with the JDK
  * (PNG/JPEG/GIF/BMP, headless-safe), so [[decodeImages]] /
  * [[resizeImages]] actually decode pixels, no external libraries
  * needed. AUDIO decode and resample are REAL too — `javax.sound.sampled`
  * parses WAV/AIFF/AU PCM out of the box, so [[decodeAudio]] /
  * [[resampleAudio]] read actual samples (compressed codecs like MP3/AAC
  * would need external libs and degrade to "unknown"). VIDEO demux is
  * REAL for AVI/MJPEG — [[sampleAviFrames]] parses the RIFF tree by hand
  * and decodes JPEG frame payloads through the image reader — for MP4 —
  * [[demuxMp4]] walks the ISO-BMFF box tree and resolves the sample
  * tables to true byte ranges ([[mp4Tracks]] / [[sampleMp4Samples]] /
  * [[sampleMp4Frames]]) — and for MKV/WebM — [[demuxMkv]] walks the
  * EBML element tree ([[mkvTracks]] / [[sampleMkvBlocks]] /
  * [[sampleMkvFrames]], incl. all four block-lacing layouts). Every
  * CONTAINER the multimodal mandate names now demuxes for real; the one
  * remaining seam is BITSTREAM decode of codecs the JDK lacks (H.264
  * etc. — `jpeg`/MJPEG tracks decode fully in all three containers);
  * the `sampleFramesStub` fake marks exactly where a JNI/FFmpeg call
  * would sit for that.
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
    * vectorized decoder would be fed. NOT a decode path — package-private
    * cross-check twin for the real [[decodeImages]]; specs diff the two
    * pipelines' plumbing (schema, batching, null handling), nothing else
    * may call it.
    */
  private[graft] def decodeImagesStub(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
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

  /** 8×8 average-hash (aHash) perceptual image fingerprint — the classic
    * image-dedup signature: bilinear-resize to 8×8, BT.601 luma per
    * cell, bit i set iff cell i's luma strictly exceeds the mean.
    * Re-encodes, mild noise and small overlays land within a few bits
    * of the original, so pairing this with
    * [[graft.operators.dedup.HammingDedup]] gives the bounded-candidate
    * image near-dup join (the C3 simhash shape on pixels instead of
    * words). Undecodable/NULL rows are dropped ([[decodeImages]] audits
    * them). Deterministic: pure-software Java2D raster + integer
    * thresholding, the same JVM-determinism class as decode/resize
    * (spec-gated, not oracle-visible — DuckDB has no image decoder).
    */
  def imageAHash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          readImage(bytes, maxSamples = 0).map { case (_, _, _, img) =>
            (id, aHashOf(img))
          }
        }
      }
      .toDF(idCol, "ahash")
  }

  /** 8×8 mean-luma average hash of a decoded image — the signature
    * behind [[imageAHash]], [[aviFrameAHash]] and the C3 Hamming
    * pigeonhole dedup. */
  private def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val out = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(
      java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 8, 8, null)
    g.dispose()
    val lumas = new Array[Double](64)
    var sum = 0.0
    var i = 0
    while (i < 64) {
      val rgb = out.getRGB(i % 8, i / 8)
      lumas(i) = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
        0.114 * (rgb & 0xFF)
      sum += lumas(i)
      i += 1
    }
    val mean = sum / 64.0
    var hash = 0L
    i = 0
    while (i < 64) {
      if (lumas(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
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

  final case class AudioMeta(
      doc_id: Long,
      n_bytes: Long,
      sha256: String,
      format: String,
      sample_rate: Double,
      channels: Long,
      bits: Long,
      frames: Long,
      duration_s: Double,
      rms: Double,
      peak: Double)

  /** REAL audio decode over a binary column (pure-JDK
    * `javax.sound.sampled`: WAV/AIFF/AU, any PCM layout the JDK's
    * PCM-to-PCM codec can reach — u8/s16, either endianness).
    * Compressed codecs (MP3/AAC) have no decoder in this image and
    * degrade to format "unknown" instead of failing the task, same
    * contract as [[decodeImages]]. `rms`/`peak` are normalized [0,1]
    * amplitudes over at most 2^20 frames (the audio twin of the image
    * path's subsampled luma — an hour-long file is never fully pulled
    * through the stats loop; `frames`/`duration_s` still report the
    * header-declared full length), rounded to 4 digits for cross-run
    * stability.
    */
  def decodeAudio(df: DataFrame, idCol: String, binCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          if (bytes == null) AudioMeta(id, 0L, "", "unknown", -1.0, -1L, -1L, -1L, -1.0, -1.0, -1.0)
          else {
            val digest = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
            val hex = digest.map("%02x".format(_)).mkString
            val n = bytes.length.toLong
            readAudio(bytes, maxFrames = 1 << 20) match {
              case Some(a) =>
                var sumSq = 0.0; var peak = 0.0; var i = 0
                while (i < a.samples.length) {
                  val v = math.abs(a.samples(i) / 32768.0)
                  sumSq += v * v; if (v > peak) peak = v; i += 1
                }
                val rms =
                  if (a.samples.length == 0) 0.0
                  else math.rint(math.sqrt(sumSq / a.samples.length) * 10000) / 10000
                AudioMeta(id, n, hex, a.format, a.sampleRate, a.channels.toLong,
                  a.bits.toLong, a.totalFrames,
                  math.rint(a.totalFrames / a.sampleRate * 10000) / 10000,
                  rms, math.rint(peak * 10000) / 10000)
              case None =>
                AudioMeta(id, n, hex, "unknown", -1.0, -1L, -1L, -1L, -1.0, -1.0, -1.0)
            }
          }
        }
      }
  }

  /** REAL resample + mono downmix to `targetRate` Hz, 16-bit WAV bytes
    * out — the audio twin of [[resizeImages]] (a training pipeline
    * normalizes every clip to one rate/channel layout before
    * featurization). Decode is the JDK parser; the rate conversion is an
    * explicit linear interpolation (the JDK's default providers don't
    * guarantee rate conversion), deterministic by construction.
    * Undecodable/NULL rows are dropped; pair with [[decodeAudio]] to
    * audit them.
    */
  def resampleAudio(df: DataFrame, idCol: String, binCol: String, targetRate: Int): DataFrame = {
    require(targetRate >= 1, s"targetRate must be >= 1, got $targetRate")
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          // zero-frame clips carry no samples to resample: drop like
          // undecodable rows (decodeAudio still reports them)
          readAudio(bytes, maxFrames = Int.MaxValue).filter(_.samples.nonEmpty).map { a =>
            val ch = a.channels
            val inFrames = a.samples.length / math.max(1, ch)
            // mono downmix: mean of channels per frame
            val mono = new Array[Double](inFrames)
            var f = 0
            while (f < inFrames) {
              var s = 0.0; var c = 0
              while (c < ch) { s += a.samples(f * ch + c); c += 1 }
              mono(f) = s / ch; f += 1
            }
            val outFrames = math.max(1, math.round(inFrames.toDouble * targetRate / a.sampleRate).toInt)
            val out = new Array[Short](outFrames)
            val step = a.sampleRate / targetRate
            var o = 0
            while (o < outFrames) {
              val pos = o * step
              val i0 = math.min(inFrames - 1, pos.toInt)
              val i1 = math.min(inFrames - 1, i0 + 1)
              val frac = pos - i0
              val v = mono(i0) * (1 - frac) + mono(i1) * frac
              out(o) = math.max(-32768.0, math.min(32767.0, math.rint(v))).toShort
              o += 1
            }
            val pcm = new Array[Byte](out.length * 2)
            var j = 0
            while (j < out.length) { // little-endian s16
              pcm(j * 2) = (out(j) & 0xFF).toByte
              pcm(j * 2 + 1) = ((out(j) >> 8) & 0xFF).toByte
              j += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(targetRate.toFloat, 16, 1, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, out.length.toLong)
            val baos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(
              ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
            (id, baos.toByteArray, targetRate.toLong, out.length.toLong)
          }
        }
      }
      .toDF("doc_id", "wav_bytes", "out_rate", "out_frames")
  }

  private final case class DecodedAudio(
      format: String,
      sampleRate: Double,
      channels: Int,
      bits: Int,
      totalFrames: Long,
      samples: Array[Short]) // interleaved s16, at most maxFrames frames

  /** 64-segment energy-envelope fingerprint — the audio member of the
    * perceptual near-dup triple (text simhash / image [[imageAHash]] /
    * this), joined by the same
    * [[graft.operators.dedup.HammingDedup]]: decode, mono-downmix,
    * split the decoded frames into 64 equal TIME segments (fractions of
    * duration, so the fingerprint is sample-rate invariant), mean
    * square energy per segment, bit i set iff segment i's energy
    * exceeds the median segment energy (own-median threshold ⇒ volume
    * invariant; envelope not spectrum ⇒ carrier-frequency
    * insensitive). Undecodable, empty, and sub-64-frame rows are
    * dropped ([[decodeAudio]] audits them); clips beyond 2^20 frames
    * fingerprint their first 2^20 (the decodeAudio bound).
    */
  def audioFingerprint(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          readAudio(bytes, maxFrames = 1 << 20)
            .filter(a => a.channels >= 1 && a.samples.length / a.channels >= 64)
            .map { a =>
              val ch = a.channels
              val frames = a.samples.length / ch
              val e = new Array[Double](64)
              val cnt = new Array[Long](64)
              var f = 0
              while (f < frames) {
                val seg = ((f.toLong * 64L) / frames).toInt
                var c = 0
                var s = 0.0
                while (c < ch) { s += a.samples(f * ch + c); c += 1 }
                val m = s / ch
                e(seg) += m * m
                cnt(seg) += 1
                f += 1
              }
              var i = 0
              while (i < 64) { if (cnt(i) > 0) e(i) /= cnt(i); i += 1 }
              val sorted = e.clone()
              java.util.Arrays.sort(sorted)
              val med = (sorted(31) + sorted(32)) / 2.0
              var hash = 0L
              i = 0
              while (i < 64) {
                if (e(i) > med) hash |= (1L << i)
                i += 1
              }
              (id, hash)
            }
        }
      }
      .toDF(idCol, "afp")
  }

  /** Task-local audio decode helper. Parses the container header for
    * (format, rate, channels, bits, declared frame count), then pulls at
    * most `maxFrames` frames through the JDK's PCM-to-PCM codec into
    * interleaved signed-16 samples. Never throws: corrupt/unsupported
    * bytes → None.
    */
  private def readAudio(bytes: Array[Byte], maxFrames: Int): Option[DecodedAudio] =
    try {
      if (bytes == null) None
      else {
        import javax.sound.sampled._
        val ff = AudioSystem.getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
        val src = ff.getFormat
        val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val s16 = new AudioFormat(
            AudioFormat.Encoding.PCM_SIGNED, src.getSampleRate, 16,
            src.getChannels, src.getChannels * 2, src.getSampleRate, false)
          val pcm = AudioSystem.getAudioInputStream(s16, ais)
          val declared = pcm.getFrameLength // may be NOT_SPECIFIED (-1)
          // the header-declared frame count is UNTRUSTED (a corrupt
          // few-hundred-byte file can declare 5e8 frames and provoke a
          // multi-GB allocation that OOMs the task before any read
          // fails): a PCM container cannot hold more frames than its
          // actual payload bytes / source frame size, so bound the
          // buffer by what the bytes could possibly contain
          // a forged blockAlign of 0 makes getFrameSize non-positive — the
          // fallback must STILL be payload-derived (one byte per frame is
          // the most pessimistic PCM framing), never the caller's
          // maxFrames, or the forged-header allocation reopens
          val srcBound =
            if (src.getFrameSize > 0) bytes.length.toLong / src.getFrameSize + 1
            else bytes.length.toLong + 1
          val toRead = Seq(
            maxFrames.toLong,
            if (declared < 0) maxFrames.toLong else declared,
            srcBound,
            (Int.MaxValue - 8).toLong / s16.getFrameSize).min.toInt
          val buf = new Array[Byte](toRead * s16.getFrameSize)
          var off = 0
          var r = pcm.read(buf, off, buf.length - off)
          while (r > 0 && off + r < buf.length) { off += r; r = pcm.read(buf, off, buf.length - off) }
          if (r > 0) off += r
          val nSamples = off / 2
          val samples = new Array[Short](nSamples)
          var i = 0
          while (i < nSamples) { // little-endian s16
            samples(i) = ((buf(i * 2) & 0xFF) | (buf(i * 2 + 1) << 8)).toShort
            i += 1
          }
          val total = if (declared >= 0) declared else (nSamples / math.max(1, src.getChannels)).toLong
          Some(DecodedAudio(
            ff.getType.toString.toLowerCase, src.getSampleRate.toDouble,
            src.getChannels, src.getSampleSizeInBits, total, samples))
        } finally ais.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  final case class Frame(doc_id: Long, frame_idx: Long, frame_sha: String)

  /** Frame sampling for video-like binaries: every `stride`-th frame of a
    * deterministic fake frame count derived from the bytes. STUB seam for
    * containers the JDK cannot parse (mkv needs an EBML demuxer) and for
    * codec bitstream decode; AVI/MJPEG and MP4 demux are REAL — see
    * [[sampleAviFrames]] / [[demuxMp4]]. Package-private: a spec-only
    * plumbing twin, not a public decode path.
    */
  private[graft] def sampleFramesStub(df: DataFrame, idCol: String, binCol: String, stride: Long): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(stride > 0)
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
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

  // ------------------------------------------------------------ video (REAL)

  /** RIFF/AVI MJPEG demux, pure JDK. An AVI file is a RIFF tree; the
    * `movi` LIST holds the frame stream as `NNdc`/`NNdb` chunks whose
    * payloads, for MJPEG, are ordinary JPEG images — which `readImage`
    * already decodes. Scoped to stream `00` (the video stream in a
    * standard AVI) so frame ordinals stay temporally meaningful when a
    * file interleaves additional streams.
    *
    * Every offset/size here is UNTRUSTED input: chunk sizes are clamped
    * to the enclosing range (a forged multi-GB size cannot allocate —
    * slices are bounded by the actual payload). Striding happens HERE,
    * against the whole stream: only every `stride`-th frame is copied
    * (skipped and zero-length dropped frames advance the ordinal but
    * cost nothing), and collection stops after `maxKept` kept frames.
    * Returns (frame ordinal, payload) pairs.
    */
  private[graft] def demuxAviFrames(
      bytes: Array[Byte], stride: Int, maxKept: Int): Vector[(Long, Array[Byte])] = {
    def cc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long =
      (bytes(off) & 0xFFL) | (bytes(off + 1) & 0xFFL) << 8 |
        (bytes(off + 2) & 0xFFL) << 16 | (bytes(off + 3) & 0xFFL) << 24
    val out = Vector.newBuilder[(Long, Array[Byte])]
    var kept = 0
    var ordinal = 0L
    def scan(start: Int, end: Int, inMovi: Boolean, depth: Int): Unit = {
      var off = start
      while (off + 8 <= end && kept < maxKept) {
        val id = cc(off)
        val declared = u32(off + 4)
        val payloadStart = off + 8
        // clamp the untrusted size to what the enclosing range can hold
        val payloadEnd = math.min(payloadStart + math.min(declared, Int.MaxValue.toLong), end.toLong).toInt
        if (payloadEnd < payloadStart) return
        if (id == "RIFF" || id == "LIST") {
          if (payloadEnd - payloadStart >= 4 && depth < 16) {
            val listType = cc(payloadStart)
            scan(payloadStart + 4, payloadEnd,
              inMovi || listType == "movi" || listType == "rec ", depth + 1)
          }
        } else if (inMovi && (id == "00dc" || id == "00db")) {
          // zero-length chunks are dropped frames: they advance the
          // ordinal (temporal position) but carry nothing to decode
          if (payloadEnd > payloadStart && ordinal % stride == 0) {
            out += ((ordinal, java.util.Arrays.copyOfRange(bytes, payloadStart, payloadEnd)))
            kept += 1
          }
          ordinal += 1
        }
        // chunks are padded to even length; payloadStart > off always, so
        // a zero-length chunk still makes progress (off + 8)
        val advance = (payloadEnd - payloadStart) + ((payloadEnd - payloadStart) & 1)
        off = math.min(payloadStart.toLong + advance.toLong, end.toLong).toInt
      }
    }
    if (bytes.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ")
      scan(12, bytes.length, inMovi = false, depth = 0)
    out.result()
  }

  /** Stream-00 video format from the AVI header tree (round 5): the
    * FIRST `strl` LIST's `strh`/`strf` pair — stream ids are assigned in
    * `strl` order, so the first one is the `00dc`/`00db` stream
    * [[demuxAviFrames]] samples. Returns (biCompression, biBitCount,
    * biWidth, |biHeight|, bottomUp) from the BITMAPINFOHEADER when the
    * stream is video ('vids'); None otherwise. Same untrusted-input
    * clamping as the frame walk.
    */
  private[graft] final case class AviVideoFormat(
      compression: Long, bitCount: Int, width: Int, height: Int, bottomUp: Boolean)

  private[graft] def parseAviVideoFormat(bytes: Array[Byte]): Option[AviVideoFormat] = {
    def cc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long =
      (bytes(off) & 0xFFL) | (bytes(off + 1) & 0xFFL) << 8 |
        (bytes(off + 2) & 0xFFL) << 16 | (bytes(off + 3) & 0xFFL) << 24
    def i32(off: Int): Int = u32(off).toInt
    def u16(off: Int): Int = (bytes(off) & 0xFF) | (bytes(off + 1) & 0xFF) << 8
    var result: Option[AviVideoFormat] = None
    var firstStrlSeen = false
    def scan(start: Int, end: Int, depth: Int): Unit = {
      var off = start
      while (off + 8 <= end && result.isEmpty) {
        val id = cc(off)
        val declared = u32(off + 4)
        val payloadStart = off + 8
        val payloadEnd =
          math.min(payloadStart + math.min(declared, Int.MaxValue.toLong), end.toLong).toInt
        if (payloadEnd < payloadStart) return
        if (id == "RIFF" || id == "LIST") {
          if (payloadEnd - payloadStart >= 4 && depth < 16) {
            val listType = cc(payloadStart)
            if (listType == "strl" && !firstStrlSeen) {
              firstStrlSeen = true
              // strh: fccType @0; strf (video): BITMAPINFOHEADER with
              // biWidth @4, biHeight @8, biBitCount @14, biCompression @16
              var o = payloadStart + 4
              var isVideo = false
              while (o + 8 <= payloadEnd) {
                val cid = cc(o)
                val clen = math.min(u32(o + 4), (payloadEnd - o - 8).toLong).toInt
                if (cid == "strh" && clen >= 4) isVideo = cc(o + 8) == "vids"
                if (cid == "strf" && isVideo && clen >= 20) {
                  val w = i32(o + 8 + 4)
                  val rawH = i32(o + 8 + 8)
                  if (w > 0 && rawH != 0)
                    result = Some(AviVideoFormat(u32(o + 8 + 16), u16(o + 8 + 14),
                      w, math.abs(rawH), bottomUp = rawH > 0))
                }
                o += 8 + clen + (clen & 1)
              }
            } else if (listType == "hdrl" || id == "RIFF") {
              scan(payloadStart + 4, payloadEnd, depth + 1)
            }
          }
        }
        val advance = (payloadEnd - payloadStart) + ((payloadEnd - payloadStart) & 1)
        off = math.min(payloadStart.toLong + advance.toLong, end.toLong).toInt
      }
    }
    if (bytes.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ")
      scan(12, bytes.length, depth = 0)
    result
  }

  /** REAL decode of an uncompressed DIB frame (BI_RGB): validates the
    * payload against the header geometry (4-byte-aligned rows — a
    * forged header cannot over-read: the row math is checked against
    * the actual payload length before any copy) and materializes the
    * pixels into a BufferedImage, un-flipping bottom-up rows. Supports
    * the DIB layouts the format actually uses uncompressed: 8 (gray/
    * palette index), 24 (BGR), 32 (BGRX) bits. Returns the image so
    * callers can assert true pixel values, plus the true dims.
    */
  private[graft] def decodeRawDib(
      payload: Array[Byte],
      fmt: AviVideoFormat): Option[(java.awt.image.BufferedImage, Int, Int)] =
    try {
      if (fmt.compression != 0L || !Set(8, 24, 32).contains(fmt.bitCount)) None
      else {
        val w = fmt.width
        val h = fmt.height
        val rowBytes = ((w.toLong * fmt.bitCount / 8 + 3) / 4) * 4
        if (w <= 0 || h <= 0 || rowBytes * h > payload.length) None
        else {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < h) {
            val srcRow = if (fmt.bottomUp) h - 1 - y else y
            val base = srcRow.toLong * rowBytes
            var x = 0
            while (x < w) {
              val rgb = fmt.bitCount match {
                case 8 =>
                  val v = payload((base + x).toInt) & 0xFF
                  (v << 16) | (v << 8) | v
                case bc =>
                  val p = (base + x.toLong * bc / 8).toInt
                  (payload(p) & 0xFF) | (payload(p + 1) & 0xFF) << 8 |
                    (payload(p + 2) & 0xFF) << 16
              }
              img.setRGB(x, y, rgb)
              x += 1
            }
            y += 1
          }
          Some((img, w, h))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------ mp4 (REAL demux)

  /** One track's resolved sample table. `sampleOffsets`/`sampleSizes` are
    * parallel (offsets may resolve shorter than the declared size list
    * when chunk offsets run out — extraction zips them).
    */
  private[graft] final case class Mp4TrackInfo(
      handler: String,
      codec: String,
      timescale: Long,
      duration: Long,
      sampleSizes: IndexedSeq[Long],
      sampleOffsets: IndexedSeq[Long])

  /** ISO-BMFF (mp4/mov) DEMUX, pure JDK — box-tree walk of
    * `moov/trak/mdia/{mdhd,hdlr,minf/stbl/{stsd,stsz,stsc,stco,co64}}`,
    * then the standard sample-table resolution (stsc chunk runs × stco
    * chunk bases + stsz prefix sums) to absolute byte ranges. This
    * closes the container half of the round-3 mp4 stub: track layout,
    * codecs, timing and every encoded sample are REAL; only bitstream
    * DECODE (H.264 etc.) still needs a codec the JDK lacks — `jpeg`-
    * codec tracks decode fully via the image reader (see
    * [[sampleMp4Frames]]).
    *
    * Every size/offset/count is UNTRUSTED (same contract as
    * [[demuxAviFrames]]): box sizes clamp to the enclosing range
    * (forged 64-bit largesize included), table counts clamp to the
    * bytes actually present in their box (a forged billion-entry stsz
    * cannot allocate), recursion depth is capped, and malformed boxes
    * stop the current range instead of throwing.
    */
  private[graft] def demuxMp4(
      bytes: Array[Byte], maxSamplesPerTrack: Int = 1 << 20): Vector[Mp4TrackInfo] = {
    val n = bytes.length.toLong
    def cc(off: Long): String =
      new String(bytes, off.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Long): Long = // big-endian, unlike RIFF
      (bytes(off.toInt) & 0xFFL) << 24 | (bytes(off.toInt + 1) & 0xFFL) << 16 |
        (bytes(off.toInt + 2) & 0xFFL) << 8 | (bytes(off.toInt + 3) & 0xFFL)
    def u64(off: Long): Long = u32(off) << 32 | u32(off + 4)

    final class TrackAcc {
      var handler = "unknown"; var codec = "unknown"
      var timescale = 0L; var duration = 0L
      var sizes: IndexedSeq[Long] = Vector.empty
      var chunkOffsets: IndexedSeq[Long] = Vector.empty
      var chunkRuns: IndexedSeq[(Long, Long)] = Vector.empty // (firstChunk, samplesPerChunk)
    }
    val tracks = Vector.newBuilder[Mp4TrackInfo]
    var cur: TrackAcc = null

    // invalid chunk bases map to the file end: chunk indexing is
    // preserved (dropping would shift later chunks onto wrong offsets)
    // and any sample resolved there fails the emit-site range check
    def clampOff(v: Long): Long =
      if (v < 0L || v > bytes.length.toLong) bytes.length.toLong else v

    def resolve(t: TrackAcc): Mp4TrackInfo = {
      // stsc runs + stco bases + stsz prefix sums -> absolute offsets
      val offs = Vector.newBuilder[Long]
      var sampleIdx = 0
      var run = 0
      var c = 1L
      while (c <= t.chunkOffsets.length && sampleIdx < t.sizes.length
          && sampleIdx < maxSamplesPerTrack) {
        while (run + 1 < t.chunkRuns.length && t.chunkRuns(run + 1)._1 <= c) run += 1
        val spc = if (t.chunkRuns.isEmpty) 0L else t.chunkRuns(run)._2
        var i = 0L
        var off = t.chunkOffsets((c - 1).toInt)
        while (i < spc && sampleIdx < t.sizes.length && sampleIdx < maxSamplesPerTrack) {
          offs += off
          off += t.sizes(sampleIdx)
          sampleIdx += 1
          i += 1
        }
        c += 1
      }
      Mp4TrackInfo(t.handler, t.codec, t.timescale, t.duration, t.sizes, offs.result())
    }

    def walk(start: Long, end: Long, depth: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val declared = u32(off)
        val typ = cc(off + 4)
        var payloadStart = off + 8
        val boxEnd: Long =
          if (declared == 0L) end // "to end of file" form
          else if (declared == 1L) { // 64-bit largesize
            if (off + 16 > end) return
            payloadStart = off + 16
            val ls = u64(off + 8)
            if (ls < 16) return
            val be = off + ls
            if (be < off || be > end) end else be // overflow/forged -> clamp
          } else if (declared < 8) return // malformed: cannot advance
          else math.min(off + declared, end)
        if (boxEnd < payloadStart) return
        val ps = payloadStart
        val room = boxEnd - ps
        typ match {
          case "moov" | "mdia" | "minf" | "stbl" =>
            if (depth < 16) walk(ps, boxEnd, depth + 1)
          case "trak" =>
            if (depth < 16) {
              cur = new TrackAcc
              walk(ps, boxEnd, depth + 1)
              tracks += resolve(cur)
              cur = null
            }
          case "mdhd" if cur != null && room >= 4 =>
            val v = bytes(ps.toInt) & 0xFF
            if (v == 1 && room >= 32) {
              cur.timescale = u32(ps + 20); cur.duration = u64(ps + 24)
            } else if (v == 0 && room >= 20) {
              cur.timescale = u32(ps + 12); cur.duration = u32(ps + 16)
            }
          case "hdlr" if cur != null && room >= 12 =>
            cur.handler = cc(ps + 8)
          case "stsd" if cur != null && room >= 16 =>
            // first sample entry: 4-byte size then the codec fourcc
            cur.codec = cc(ps + 12)
          case "stsz" if cur != null && room >= 12 =>
            val fixed = u32(ps + 4)
            val count = math.min(u32(ps + 8), maxSamplesPerTrack.toLong)
            if (fixed != 0L) {
              // same forged-count discipline as the variable path: real
              // samples of size `fixed` cannot outnumber the file's bytes,
              // so a tiny file packed with forged stsz boxes cannot
              // amplify into megabytes of size-vector allocation
              val cap = math.min(count, bytes.length.toLong / fixed + 1L)
              cur.sizes = Vector.fill(cap.toInt)(fixed)
            } else {
              val avail = math.min(count, (room - 12) / 4) // forged count clamps here
              cur.sizes = (0L until avail).map(i => u32(ps + 12 + i * 4))
            }
          case "stco" if cur != null && room >= 8 =>
            val avail = math.min(u32(ps + 4), (room - 8) / 4)
            cur.chunkOffsets = (0L until avail).map(i => clampOff(u32(ps + 8 + i * 4)))
          case "co64" if cur != null && room >= 8 =>
            // clamped at parse: a forged 2^63-ish co64 base would otherwise
            // overflow resolve()'s `off += size` accumulation and could
            // wrap into range, emitting wrong bytes as a "real" sample.
            // With every base <= file length, base + maxSamplesPerTrack
            // u32 sizes stays far below Long.MaxValue.
            val avail = math.min(u32(ps + 4), (room - 8) / 8)
            cur.chunkOffsets = (0L until avail).map(i => clampOff(u64(ps + 8 + i * 8)))
          case "stsc" if cur != null && room >= 8 =>
            val avail = math.min(u32(ps + 4), (room - 8) / 12)
            cur.chunkRuns = (0L until avail).map(i =>
              (u32(ps + 8 + i * 12), u32(ps + 12 + i * 12)))
          case _ => () // unknown boxes (ftyp, mvhd, tkhd, mdat, ...) skip
        }
        if (boxEnd <= off) return // no progress possible
        off = boxEnd
      }
    }

    if (n >= 12 && cc(4) == "ftyp") walk(0L, n, 0)
    tracks.result()
  }

  // ------------------------------------------------------ mkv (REAL demux)

  private[graft] final case class MkvTrackInfo(
      number: Long, trackType: Long, codec: String, width: Long, height: Long,
      colourSpace: String)

  /** Matroska/WebM (EBML) DEMUX, pure JDK — the other container the
    * round-3 stub declared. EBML is a length-prefixed element tree:
    * variable-length IDs (marker bits kept) and sizes (marker cleared,
    * all-value-bits-set = "unknown", which extends to the enclosing
    * range). The walk covers
    * `Segment/Tracks/TrackEntry/{TrackNumber,TrackType,CodecID,Video/{PixelWidth,PixelHeight}}`
    * and `Segment/Cluster/{SimpleBlock,BlockGroup/Block}`; block
    * payloads are split into their encoded frames under ALL four
    * lacing layouts (none, Xiph running 255-sums, fixed equal split,
    * EBML vint + signed-vint deltas; a malformed lace table drops the
    * block, never mis-slices it — all sizes validate BEFORE any frame
    * is emitted). V_MJPEG frames are plain JPEGs — decodable.
    * `stride` and `maxKept` apply PER TRACK (ordinals are per-track
    * positions), so a busy audio track can neither phase-shift nor
    * starve a video track's sampling; `maxKept = 0` walks the tree for
    * metadata only, copying no frame bytes. Returns (tracks, frames as
    * (trackNumber, ordinal, payload)).
    *
    * Untrusted-input contract matches [[demuxMp4]]/[[demuxAviFrames]]:
    * sizes clamp to the enclosing range, vint reads are bounds-checked,
    * recursion depth is capped, malformed elements stop the current
    * range, and kept frames are capped.
    */
  private[graft] def demuxMkv(
      bytes: Array[Byte],
      stride: Int = 1,
      maxKept: Int = 4096): (Vector[MkvTrackInfo], Vector[(Long, Long, Array[Byte])]) = {
    val n = bytes.length.toLong
    // EBML vint: leading zero bits of the first byte give the width
    def vint(off: Long, keepMarker: Boolean): Option[(Long, Int)] = {
      if (off >= n) return None
      val first = bytes(off.toInt) & 0xFF
      if (first == 0) return None // width > 8: not used by real files
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
      if (off + len > n) return None
      var v = (if (keepMarker) first else first & (0xFF >>> len)).toLong
      var i = 1
      while (i < len) { v = v << 8 | (bytes((off + i).toInt) & 0xFFL); i += 1 }
      Some((v, len))
    }
    def isUnknownSize(v: Long, len: Int): Boolean =
      v == (1L << (7 * len)) - 1 // all value bits set

    final class TrackAcc {
      var number = -1L; var trackType = -1L; var codec = "unknown"
      var width = 0L; var height = 0L; var colourSpace = ""
    }
    val tracks = Vector.newBuilder[MkvTrackInfo]
    val frames = Vector.newBuilder[(Long, Long, Array[Byte])]
    var cur: TrackAcc = null
    // per-track ordinal/kept state: stride phase and the kept cap belong
    // to each track, or an interleaved audio track would starve video
    val ordinals = scala.collection.mutable.Map.empty[Long, Long]
    val kepts = scala.collection.mutable.Map.empty[Long, Int]

    def uintAt(ps: Long, pe: Long): Long = {
      var v = 0L
      var i = ps
      while (i < pe && i - ps < 8) { v = v << 8 | (bytes(i.toInt) & 0xFFL); i += 1 }
      v
    }
    def emit(trackNum: Long, from: Long, to: Long): Unit = {
      // every parsed frame advances the track ordinal — including a legal
      // zero-length laced frame. Skipping the increment for empty frames
      // would phase-shift every later ordinal of the track, making stride
      // sampling and frame_idx disagree with true container indices (the
      // exact drift the whole-table lace validation exists to prevent).
      val ordinal = ordinals.getOrElse(trackNum, 0L)
      val kept = kepts.getOrElse(trackNum, 0)
      if (to > from && kept < maxKept && ordinal % stride == 0) {
        frames += ((trackNum, ordinal,
          java.util.Arrays.copyOfRange(bytes, from.toInt, to.toInt)))
        kepts(trackNum) = kept + 1
      }
      ordinals(trackNum) = ordinal + 1
    }
    def block(ps: Long, pe: Long): Unit = {
      // payload: track vint, s16 relative time, flags, then frame data —
      // un-laced, or one of the three lacing layouts (Xiph running
      // 255-sums, fixed equal split, EBML vint + signed-vint deltas)
      vint(ps, keepMarker = false).foreach { case (trackNum, tl) =>
        val flagsOff = ps + tl + 2
        if (flagsOff < pe) {
          val lacing = (bytes(flagsOff.toInt) >> 1) & 0x3
          val dataStart = flagsOff + 1
          if (lacing == 0) emit(trackNum, dataStart, pe)
          else if (dataStart < pe) {
            val nFrames = (bytes(dataStart.toInt) & 0xFF) + 1
            var off = dataStart + 1
            val sizes = Array.ofDim[Long](nFrames)
            var ok = true
            lacing match {
              case 1 => // Xiph: per-frame byte runs summing until a non-255
                var i = 0
                while (ok && i < nFrames - 1) {
                  var s = 0L
                  var b = 255
                  while (ok && b == 255) {
                    if (off >= pe) ok = false
                    else { b = bytes(off.toInt) & 0xFF; s += b; off += 1 }
                  }
                  sizes(i) = s; i += 1
                }
              case 3 => // EBML: first unsigned vint, then signed deltas
                vint(off, keepMarker = false) match {
                  case Some((s0, l0)) if off + l0 <= pe =>
                    sizes(0) = s0; off += l0
                    var i = 1
                    while (ok && i < nFrames - 1) {
                      vint(off, keepMarker = false) match {
                        case Some((d, dl)) if off + dl <= pe =>
                          val signed = d - ((1L << (7 * dl - 1)) - 1)
                          sizes(i) = sizes(i - 1) + signed; off += dl; i += 1
                        case _ => ok = false
                      }
                    }
                  case _ => ok = false
                }
              case _ => // fixed: equal split of the remainder
                val rem = pe - off
                if (nFrames > 0 && rem % nFrames == 0)
                  java.util.Arrays.fill(sizes, rem / nFrames)
                else ok = false
            }
            if (ok) {
              // last frame (Xiph/EBML) is the remainder after the others
              if (lacing != 2) {
                val head = sizes.take(nFrames - 1).sum
                sizes(nFrames - 1) = pe - off - head
              }
              // validate the WHOLE table first: a malformed lace table
              // must drop the block, not emit a partial prefix (which
              // would also phase-shift every later ordinal)
              var i = 0
              var fo = off
              while (ok && i < nFrames) {
                val sz = sizes(i)
                if (sz < 0 || fo + sz > pe) ok = false
                else { fo += sz; i += 1 }
              }
              if (ok) {
                i = 0; fo = off
                while (i < nFrames) { emit(trackNum, fo, fo + sizes(i)); fo += sizes(i); i += 1 }
              }
            }
          }
        }
      }
    }

    def walk(start: Long, end: Long, depth: Int): Unit = {
      var off = start
      // no global early-stop: kept caps are per track, and the walk cost
      // is bounded by the file length regardless
      while (off + 2 <= end) {
        val idRead = vint(off, keepMarker = true)
        if (idRead.isEmpty) return
        val (id, idLen) = idRead.get
        val szRead = vint(off + idLen, keepMarker = false)
        if (szRead.isEmpty) return
        val (szRaw, szLen) = szRead.get
        val ps = off + idLen + szLen
        val pe =
          if (isUnknownSize(szRaw, szLen)) end // unknown size: to range end
          else math.min(ps + szRaw, end) // forged size clamps
        if (pe < ps) return
        id match {
          case 0x18538067L | 0x1654AE6BL | 0x1F43B675L | 0xA0L => // Segment/Tracks/Cluster/BlockGroup
            if (depth < 16) walk(ps, pe, depth + 1)
          case 0xAEL => // TrackEntry
            if (depth < 16) {
              cur = new TrackAcc
              walk(ps, pe, depth + 1)
              if (cur.number >= 0)
                tracks += MkvTrackInfo(cur.number, cur.trackType, cur.codec,
                  cur.width, cur.height, cur.colourSpace)
              cur = null
            }
          case 0xE0L => // Video settings inside TrackEntry
            if (cur != null && depth < 16) walk(ps, pe, depth + 1)
          case 0xD7L if cur != null => cur.number = uintAt(ps, pe)
          case 0x83L if cur != null => cur.trackType = uintAt(ps, pe)
          case 0x86L if cur != null && pe > ps =>
            cur.codec = new String(bytes, ps.toInt, math.min(pe - ps, 64L).toInt,
              java.nio.charset.StandardCharsets.US_ASCII).takeWhile(_ != '\u0000')
          case 0xB0L if cur != null => cur.width = uintAt(ps, pe)
          case 0xBAL if cur != null => cur.height = uintAt(ps, pe)
          case 0x2EB524L if cur != null && pe > ps => // ColourSpace fourcc
            cur.colourSpace = new String(bytes, ps.toInt, math.min(pe - ps, 8L).toInt,
              java.nio.charset.StandardCharsets.US_ASCII).takeWhile(_ != '\u0000')
          case 0xA3L | 0xA1L => block(ps, pe) // SimpleBlock / Block
          case _ => () // EBML header, Info, Cues, Void, ... skip
        }
        if (pe <= off) return // progress guarantee
        off = pe
      }
    }

    // 0x1A45DFA3 = EBML header magic
    if (n >= 4 && (bytes(0) & 0xFF) == 0x1A && (bytes(1) & 0xFF) == 0x45
        && (bytes(2) & 0xFF) == 0xDF && (bytes(3) & 0xFF) == 0xA3)
      walk(0L, n, 0)
    (tracks.result(), frames.result())
  }

  final case class MkvTrack(doc_id: Long, track_number: Long, track_type: String,
      codec: String, width: Long, height: Long, colour_space: String)

  /** Track-level mkv/webm metadata: one row per TrackEntry (type
    * video/audio/other, CodecID, pixel dims for video). Non-mkv and
    * corrupt rows yield no rows.
    */
  def mkvTracks(df: DataFrame, idCol: String, binCol: String): Dataset[MkvTrack] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        // maxKept = 0: metadata-only walk, no frame bytes are copied
        demuxMkv(bytes, maxKept = 0)._1.map { t =>
          val typ = t.trackType match {
            case 1 => "video"; case 2 => "audio"; case _ => "other"
          }
          MkvTrack(id, t.number, typ, t.codec, t.width, t.height, t.colourSpace)
        }
      }
  }

  /** Every `stride`-th un-laced block of the given track (default: all
    * tracks when `trackNumber` < 0): encoded frame bytes fingerprinted
    * like [[sampleMp4Samples]] — codec-agnostic dedup/integrity grain.
    */
  def sampleMkvBlocks(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int,
      trackNumber: Long = -1L,
      maxKeptPerDoc: Int = 4096): Dataset[Mp4Sample] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(stride > 0, s"stride must be > 0, got $stride")
    require(maxKeptPerDoc > 0, s"maxKeptPerDoc must be > 0, got $maxKeptPerDoc")
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        demuxMkv(bytes, stride, maxKeptPerDoc)._2.iterator
          .filter { case (tn, _, _) => trackNumber < 0 || tn == trackNumber }
          .map { case (tn, ord, payload) =>
            val sha = java.security.MessageDigest.getInstance("SHA-256")
              .digest(payload).take(8).map("%02x".format(_)).mkString
            Mp4Sample(id, tn, ord, payload.length.toLong, sha)
          }
      }
  }

  /** REAL decode of a Matroska V_UNCOMPRESSED frame: packed pixels,
    * top-down, no row padding (unlike DIB). The only layout accepted is
    * the one the track geometry proves: payload length must EQUAL
    * w·h·3 (24-bit packed) or w·h (8-bit gray) — anything else drops.
    * Channel order honors the track's ColourSpace fourcc: 'BGR*' swaps
    * the outer channels, anything else reads as RGB (dims and payload
    * fingerprints are order-invariant either way).
    */
  private[graft] def decodeRawPacked(
      payload: Array[Byte], w: Long, h: Long,
      bgr: Boolean = false): Option[(java.awt.image.BufferedImage, Int, Int)] =
    try {
      if (w <= 0 || h <= 0 || w > Int.MaxValue / 4 || h > Int.MaxValue / 4) None
      else if (payload.length.toLong != w * h * 3 && payload.length.toLong != w * h) None
      else {
        val gray = payload.length.toLong == w * h
        val img = new java.awt.image.BufferedImage(
          w.toInt, h.toInt, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h.toInt) {
          var x = 0
          while (x < w.toInt) {
            val rgb =
              if (gray) {
                val v = payload(y * w.toInt + x) & 0xFF
                (v << 16) | (v << 8) | v
              } else {
                val p = (y * w.toInt + x) * 3
                // channel order from the track's ColourSpace fourcc:
                // 'BGR*' swaps the outer channels, default/RGB keeps them
                val (c0, c2) = if (bgr) (payload(p + 2), payload(p))
                  else (payload(p), payload(p + 2))
                (c0 & 0xFF) << 16 | (payload(p + 1) & 0xFF) << 8 | (c2 & 0xFF)
              }
            img.setRGB(x, y, rgb)
            x += 1
          }
          y += 1
        }
        Some((img, w.toInt, h.toInt))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Full pixel decode for mkv V_MJPEG tracks (JPEG frames in EBML
    * blocks) — the mkv twin of [[sampleMp4Frames]]. Since round 5,
    * V_UNCOMPRESSED tracks decode too (geometry from the track header,
    * payload validated to exactly w·h·3 / w·h bytes — see
    * [[decodeRawPacked]]). Other codecs yield no rows here; their
    * encoded blocks stay reachable via [[sampleMkvBlocks]].
    */
  def sampleMkvFrames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int,
      maxKeptPerDoc: Int = 4096): Dataset[VideoFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(stride > 0, s"stride must be > 0, got $stride")
    require(maxKeptPerDoc > 0, s"maxKeptPerDoc must be > 0, got $maxKeptPerDoc")
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val (tracks, frames) = demuxMkv(bytes, stride, maxKeptPerDoc)
          val mjpegTracks = tracks.filter(t => t.trackType == 1L && t.codec == "V_MJPEG")
            .map(_.number).toSet
          val rawTracks: Map[Long, (Long, Long, Boolean)] = tracks
            .filter(t => t.trackType == 1L && t.codec == "V_UNCOMPRESSED" &&
              t.width > 0 && t.height > 0)
            .map(t => t.number ->
              ((t.width, t.height, t.colourSpace.startsWith("BGR")))).toMap
          frames.iterator
            .flatMap { case (tn, ord, payload) =>
              val decoded =
                if (mjpegTracks.contains(tn))
                  readImage(payload, 64).map { case (_, w, h, _) => (w, h) }
                else rawTracks.get(tn).flatMap { case (tw, th, bgr) =>
                  decodeRawPacked(payload, tw, th, bgr).map { case (_, w, h) => (w, h) }
                }
              decoded.map { case (w, h) =>
                val sha = java.security.MessageDigest.getInstance("SHA-256")
                  .digest(payload).take(8).map("%02x".format(_)).mkString
                VideoFrame(id, ord, w.toLong, h.toLong, sha)
              }
            }
        }
      }
  }

  final case class Mp4Track(doc_id: Long, track_idx: Long, handler: String,
      codec: String, timescale: Long, duration_ts: Long, n_samples: Long)

  /** Track-level mp4 metadata: one row per track (handler `vide`/`soun`,
    * codec fourcc, media timescale/duration, declared sample count).
    * Non-mp4 and corrupt rows yield no rows — the degrade-don't-fail
    * contract of the other decoders.
    */
  def mp4Tracks(df: DataFrame, idCol: String, binCol: String): Dataset[Mp4Track] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        demuxMp4(bytes).zipWithIndex.map { case (t, i) =>
          Mp4Track(id, i.toLong, t.handler, t.codec, t.timescale, t.duration,
            t.sampleSizes.length.toLong)
        }
      }
  }

  final case class Mp4Sample(doc_id: Long, track_idx: Long, sample_idx: Long,
      n_bytes: Long, sample_sha: String)

  /** Every `stride`-th ENCODED sample of each `vide` track: true byte
    * ranges out of `mdat`, size + sha256 fingerprint. The payload stays
    * encoded — fingerprint/count/size are codec-agnostic, which is what
    * corpus-level video dedup and integrity audits actually need; pixel
    * decode of non-JPEG codecs is the one remaining (declared) seam.
    * Samples whose resolved range escapes the payload are dropped, not
    * clamped — a truncated file yields fewer samples, never garbage.
    */
  def sampleMp4Samples(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int,
      maxKeptPerDoc: Int = 4096): Dataset[Mp4Sample] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(stride > 0, s"stride must be > 0, got $stride")
    require(maxKeptPerDoc > 0, s"maxKeptPerDoc must be > 0, got $maxKeptPerDoc")
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        demuxMp4(bytes).zipWithIndex.iterator.flatMap {
          case (t, ti) if t.handler == "vide" =>
            t.sampleOffsets.zip(t.sampleSizes).zipWithIndex.iterator
              .filter { case (_, ord) => ord % stride == 0 }
              .take(maxKeptPerDoc)
              .flatMap { case ((off, sz), ord) =>
                // overflow-safe form: `off + sz` on forged near-Long.Max
                // offsets wraps negative and would pass a naive `<=` check
                if (off >= 0 && sz > 0 && sz <= bytes.length && off <= bytes.length - sz) {
                  val payload = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
                  val sha = java.security.MessageDigest.getInstance("SHA-256")
                    .digest(payload).take(8).map("%02x".format(_)).mkString
                  Some(Mp4Sample(id, ti.toLong, ord.toLong, sz, sha))
                } else None
              }
          case _ => Iterator.empty
        }
      }
  }

  /** Full pixel decode for mp4 tracks whose codec the JDK CAN decode
    * (`jpeg` — Motion-JPEG-in-mp4): every `stride`-th sample through the
    * same bounded image reader as [[sampleAviFrames]]. Other codecs
    * yield no rows here (their encoded samples are still reachable via
    * [[sampleMp4Samples]]).
    */
  def sampleMp4Frames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int,
      maxKeptPerDoc: Int = 4096): Dataset[VideoFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(stride > 0, s"stride must be > 0, got $stride")
    require(maxKeptPerDoc > 0, s"maxKeptPerDoc must be > 0, got $maxKeptPerDoc")
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          demuxMp4(bytes).iterator.flatMap {
            case t if t.handler == "vide" && t.codec == "jpeg" =>
              t.sampleOffsets.zip(t.sampleSizes).zipWithIndex.iterator
                .filter { case (_, ord) => ord % stride == 0 }
                .take(maxKeptPerDoc)
                .flatMap { case ((off, sz), ord) =>
                  // overflow-safe form: `off + sz` on forged near-Long.Max
                // offsets wraps negative and would pass a naive `<=` check
                if (off >= 0 && sz > 0 && sz <= bytes.length && off <= bytes.length - sz) {
                    val payload = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
                    readImage(payload, 64).map { case (_, w, h, _) =>
                      val sha = java.security.MessageDigest.getInstance("SHA-256")
                        .digest(payload).take(8).map("%02x".format(_)).mkString
                      VideoFrame(id, ord.toLong, w.toLong, h.toLong, sha)
                    }
                  } else None
                }
            case _ => Iterator.empty
          }
        }
      }
  }

  final case class VideoFrame(doc_id: Long, frame_idx: Long,
      width: Long, height: Long, frame_sha: String)

  /** REAL frame sampling over AVI/MJPEG binaries: demux the RIFF `movi`
    * stream (stream 00), keep every `stride`-th frame ACROSS THE WHOLE
    * video (striding happens inside the demux — skipped frames are never
    * copied, and a long video is sampled end to end, not just its head),
    * decode each kept JPEG payload (dims via the same subsampled ImageIO
    * reader the image path uses) and fingerprint it. Null/non-AVI rows
    * and undecodable frames drop — the same degrade-don't-fail contract
    * as image/audio decode. `frame_idx` is the frame's true ordinal in
    * the stream. KEPT frames per row are capped (`maxKeptPerDoc`) so a
    * pathological container cannot balloon a task.
    */
  def sampleAviFrames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int,
      maxKeptPerDoc: Int = 4096): Dataset[VideoFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(stride > 0, s"stride must be > 0, got $stride")
    require(maxKeptPerDoc > 0, s"maxKeptPerDoc must be > 0, got $maxKeptPerDoc")
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          // round 5: uncompressed streams (BI_RGB 'DIB ' frames) decode
          // too — geometry from the stream-00 BITMAPINFOHEADER, pixels
          // materialized and validated against the payload. JPEG is
          // tried first (an MJPEG payload is self-describing; a raw
          // payload is claimed by no ImageIO reader, so the fallback
          // order cannot misclassify)
          val rawFmt = parseAviVideoFormat(bytes).filter(_.compression == 0L)
          demuxAviFrames(bytes, stride, maxKeptPerDoc).iterator.flatMap { case (ord, payload) =>
            val decoded = readImage(payload, 64).map { case (_, w, h, _) => (w, h) }
              .orElse(rawFmt.flatMap(f => decodeRawDib(payload, f).map { case (_, w, h) => (w, h) }))
            decoded.map { case (w, h) =>
              val sha = java.security.MessageDigest.getInstance("SHA-256")
                .digest(payload).take(8).map("%02x".format(_)).mkString
              VideoFrame(id, ord, w.toLong, h.toLong, sha)
            }
          }
        }
      }
  }

  /** Per-frame perceptual signature over an AVI column: the same 8×8
    * mean-luma aHash as [[imageAHash]], so a frame and the standalone
    * image it was cut from hash IDENTICALLY (spec-pinned). Decodes
    * MJPEG payloads through the image reader and BI_RGB 'DIB ' frames
    * through the stream-00 geometry — the [[sampleAviFrames]] codec
    * coverage; undecodable frames drop but keep their ordinals.
    * One row per kept frame: (doc_id, frame_idx, ahash).
    */
  def aviFrameAHash(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int,
      maxKeptPerDoc: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(stride > 0, s"stride must be > 0, got $stride")
    require(maxKeptPerDoc > 0, s"maxKeptPerDoc must be > 0, got $maxKeptPerDoc")
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val rawFmt = parseAviVideoFormat(bytes).filter(_.compression == 0L)
          demuxAviFrames(bytes, stride, maxKeptPerDoc).iterator.flatMap {
            case (ord, payload) =>
              readImage(payload, maxSamples = 0).map(_._4)
                .orElse(rawFmt.flatMap(f => decodeRawDib(payload, f).map(_._1)))
                .map(img => (id, ord, aHashOf(img)))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "ahash")
  }

  /** Shot-boundary (scene cut) detection over ANY per-frame 64-bit
    * signature table: a cut is a consecutive-frame pair whose Hamming
    * distance exceeds `minHamming` (within-shot frames drift a few
    * bits under codec noise; a cut flips a large fraction of the
    * luma-vs-mean grid). Generic over the signature column — the C3
    * HammingDedup convention — so MJPEG aHash frames, MKV frames, or
    * any externally-computed perceptual hash all work.
    *
    * Scale shape: one per-video window over the (id, ord) frame table
    * (bounded by frames-per-video — the sampleAviFrames cap); the xor
    * + bit_count comparison is codegen'd, no UDF. Emits one row per
    * detected cut: (id, frame_idx of the first frame AFTER the cut,
    * prev_idx, hamming).
    */
  def sceneCuts(
      frames: DataFrame,
      idCol: String,
      ordCol: String,
      sigCol: String,
      minHamming: Int): DataFrame = {
    require(minHamming >= 1 && minHamming <= 64,
      s"minHamming must be in [1, 64], got $minHamming")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col(ordCol))
    frames
      .where(col(idCol).isNotNull && col(ordCol).isNotNull && col(sigCol).isNotNull)
      .withColumn("__prev_ord", lag(col(ordCol), 1).over(w))
      .withColumn("__prev_sig", lag(col(sigCol), 1).over(w))
      .where(col("__prev_sig").isNotNull)
      .withColumn("hamming",
        bit_count(col(sigCol).bitwiseXOR(col("__prev_sig"))).cast("int"))
      .where(col("hamming") > minHamming)
      .select(col(idCol), col(ordCol), col("__prev_ord").as("prev_idx"),
        col("hamming"))
  }
}
