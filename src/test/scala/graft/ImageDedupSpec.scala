package graft

import org.apache.spark.sql.functions._

import graft.operators.dedup.HammingDedup
import graft.operators.multimodal.BinaryPipeline

/** Perceptual image dedup: aHash invariance/sensitivity plants (same
  * pixels re-encoded => identical hash; tiny overlay => within the
  * hamming bar; different pattern => far) and the HammingDedup join
  * over the signatures — the C3 pigeonhole shape on pixels.
  */
class ImageDedupSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic two-tone pattern images; a "checker" reads very
  // differently from a "bars" image at 8x8 cell grain
  private def pattern(w: Int, h: Int, kind: String, overlay: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val on = kind match {
          case "checker" => ((x / 16) + (y / 16)) % 2 == 0
          case "bars" => (x / 16) % 2 == 0
          case _ => y < h / 2
        }
        img.setRGB(x, y, if (on) 0xFFFFFF else 0x000000)
      }
    }
    if (overlay) // a 4x4 dot in one corner: sub-cell at 8x8 => few bits
      (0 until 4).foreach(y => (0 until 4).foreach(x => img.setRGB(x, y, 0x808080)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("aHash: re-encode-invariant, overlay-tolerant, pattern-sensitive") {
    val rows = Seq(
      (1L, pattern(128, 128, "checker", overlay = false)),
      (2L, pattern(128, 128, "checker", overlay = false)), // same pixels, fresh encode
      (3L, pattern(128, 128, "checker", overlay = true)),  // near-dup
      (4L, pattern(128, 128, "bars", overlay = false)),    // different image
      (5L, "corrupt".getBytes("UTF-8")),                   // dropped
      (6L, null: Array[Byte])                              // dropped
    ).toDF("doc_id", "payload")
    val h = BinaryPipeline.imageAHash(rows, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.keySet == Set(1L, 2L, 3L, 4L))
    assert(h(1L) == h(2L), "identical pixels must hash identically")
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 3,
      s"overlay twin at hamming ${java.lang.Long.bitCount(h(1L) ^ h(3L))}")
    assert(java.lang.Long.bitCount(h(1L) ^ h(4L)) > 3,
      s"different pattern at hamming ${java.lang.Long.bitCount(h(1L) ^ h(4L))}")

    // the composed near-dup join: exact + overlay twins found, bars not
    val pairs = HammingDedup.pairs(
      BinaryPipeline.imageAHash(rows, "doc_id", "payload"), "doc_id", "ahash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((2L, 3L)), pairs)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), pairs)
  }

  // amplitude-pattern WAV: 8 loudness blocks of `seconds/8` each — an
  // ENVELOPE signal (a constant sine's flat envelope carries no bits)
  private def envWav(rate: Float, freq: Double, blocks: Seq[Double],
      seconds: Double = 1.0): Array[Byte] = {
    import javax.sound.sampled._
    val frames = math.round(rate * seconds).toInt
    val pcm = new Array[Byte](frames * 2)
    (0 until frames).foreach { f =>
      val amp = blocks((f * blocks.length / frames).min(blocks.length - 1))
      val v = math.round(amp * 32767.0 * math.sin(2 * math.Pi * freq * f / rate)).toShort
      pcm(f * 2) = (v & 0xFF).toByte
      pcm(f * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("audio fingerprint: rate/volume/carrier-invariant, envelope-sensitive") {
    val p1 = Seq(1.0, 0.1, 1.0, 0.1, 0.1, 1.0, 0.1, 1.0)
    val p2 = Seq(0.1, 1.0, 0.1, 1.0, 1.0, 0.1, 1.0, 0.1) // inverted envelope
    val rows = Seq(
      (1L, envWav(8000f, 440.0, p1)),
      (2L, envWav(16000f, 220.0, p1)),               // re-rate + re-carrier twin
      (3L, envWav(8000f, 440.0, p1.map(_ * 0.5))),   // half volume
      (4L, envWav(8000f, 440.0, p2)),                // different envelope
      (5L, "not audio".getBytes("UTF-8")),           // dropped
      (6L, null: Array[Byte])                        // dropped
    ).toDF("doc_id", "payload")
    val h = BinaryPipeline.audioFingerprint(rows, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.keySet == Set(1L, 2L, 3L, 4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) <= 3, s"re-rate twin at hamming ${ham(h(1L), h(2L))}")
    assert(ham(h(1L), h(3L)) <= 3, s"volume twin at hamming ${ham(h(1L), h(3L))}")
    assert(ham(h(1L), h(4L)) > 3, s"inverted envelope at hamming ${ham(h(1L), h(4L))}")

    // same generic join as images: twins found, the inverted clip is not
    val pairs = HammingDedup.pairs(
      BinaryPipeline.audioFingerprint(rows, "doc_id", "payload"), "doc_id", "afp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)), pairs)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), pairs)
  }

  test("HammingDedup matches SimHashDedup semantics on planted signatures") {
    // hand-built 64-bit signatures: known hamming distances
    val rows = Seq(
      (10L, 0x0000000000000000L),
      (11L, 0x0000000000000007L), // hamming 3 from 10 -> kept
      (12L, 0x000000000000000FL), // hamming 4 from 10 -> dropped; 1 from 11 -> kept
      (13L, 0xFFFFFFFFFFFFFFFFL) // far from all
    ).toDF("id", "sig")
    val got = HammingDedup.pairs(rows, "id", "sig")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((10L, 11L, 3), (11L, 12L, 1)), got)
    intercept[IllegalArgumentException] {
      HammingDedup.pairs(rows, "id", "sig", maxHamming = 4)
    }
  }
}
