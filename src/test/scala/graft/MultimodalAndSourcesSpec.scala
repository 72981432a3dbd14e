package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.multimodal.BinaryPipeline
import graft.sources.Snapshot

class MultimodalAndSourcesSpec extends SparkSpecBase {
  import spark.implicits._

  test("stub decoder agrees with the SQL manifest on every field") {
    val d = Snapshot(spark, sf()).documents.limit(100)
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val viaSql = BinaryPipeline.manifest(d, "doc_id", "payload")
      .orderBy("doc_id").collect().toSeq
    val viaMap = BinaryPipeline.decodeImagesStub(d, "doc_id", "payload")
      .toDF().select("doc_id", "n_bytes", "sha256", "width", "height")
      .orderBy("doc_id").collect().toSeq
    assert(viaSql == viaMap)
  }

  test("resize plan preserves aspect ratio; frame sampling strides deterministically") {
    val d = Snapshot(spark, sf()).documents.limit(20)
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val meta = BinaryPipeline.decodeImagesStub(d, "doc_id", "payload")
    val resized = BinaryPipeline.resizePlan(meta, 256).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(math.min(r.out_width, r.out_height) >= 256)
      assert(math.min(r.out_width, r.out_height) < 256 + 256) // shorter side ~target
    }
    val frames = BinaryPipeline.sampleFramesStub(d, "doc_id", "payload", 8)
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).forall(_ % 8 == 0))
      assert(fs.map(_.frame_sha).distinct.length == fs.length) // per-frame digests differ
    }
    // determinism: same input -> same frames
    val again = BinaryPipeline.sampleFramesStub(d, "doc_id", "payload", 8).collect()
    assert(again.sortBy(f => (f.doc_id, f.frame_idx)).toSeq ==
      frames.collect().sortBy(f => (f.doc_id, f.frame_idx)).toSeq)
  }

  /** Minimal valid ISO-BMFF mp4 built box by box (big-endian sizes):
    * ftyp, then moov(trak(mdia(mdhd v0, hdlr, minf(stbl(stsd, stsz,
    * stsc, stco))))), then mdat holding the samples. Chunking: first
    * stsc run packs 2 samples/chunk, second run 1 — exercising the run
    * walk, not just a flat layout. Returns (file, samplePayloads).
    */
  private def makeMp4(samples: Seq[Array[Byte]], codec: String,
      timescale: Int = 1000, duration: Int = 3000): Array[Byte] = {
    def cc(s: String) = s.getBytes("US-ASCII")
    def be(v: Int) = Array((v >> 24 & 0xFF).toByte, (v >> 16 & 0xFF).toByte,
      (v >> 8 & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be(8 + payload.length) ++ cc(typ) ++ payload
    val ftyp = box("ftyp", cc("isom") ++ be(0) ++ cc("isom"))
    val mdhd = box("mdhd", be(0) ++ be(0) ++ be(0) ++ be(timescale) ++ be(duration))
    val hdlr = box("hdlr", be(0) ++ be(0) ++ cc("vide") ++ new Array[Byte](12))
    val stsd = box("stsd", be(0) ++ be(1) ++ (be(16) ++ cc(codec) ++ new Array[Byte](8)))
    val stsz = box("stsz", be(0) ++ be(0) ++ be(samples.length) ++
      samples.flatMap(s => be(s.length)).toArray)
    // chunk 1 holds two samples, every later chunk holds one
    val nChunks = if (samples.length <= 2) 1 else 1 + (samples.length - 2)
    val stsc = box("stsc", be(0) ++ be(2) ++
      (be(1) ++ be(2) ++ be(1)) ++ (be(2) ++ be(1) ++ be(1)))
    // moov length is independent of the offset VALUES -> lay out with
    // dummy offsets first, then rebuild with the real ones
    def moovWith(chunkOffs: Seq[Int]): Array[Byte] = {
      val stco = box("stco", be(0) ++ be(chunkOffs.length) ++ chunkOffs.flatMap(be).toArray)
      box("moov", box("trak", box("mdia", mdhd ++ hdlr ++
        box("minf", box("stbl", stsd ++ stsz ++ stsc ++ stco)))))
    }
    val moovLen = moovWith(Seq.fill(nChunks)(0)).length
    val mdatPayloadStart = ftyp.length + moovLen + 8
    val chunkOffs = {
      val offs = Seq.newBuilder[Int]
      var off = mdatPayloadStart
      var i = 0
      var chunk = 0
      while (i < samples.length) {
        offs += off
        val inChunk = if (chunk == 0) math.min(2, samples.length) else 1
        (0 until inChunk).foreach { j => off += samples(i + j).length }
        i += inChunk
        chunk += 1
      }
      offs.result()
    }
    val mdat = box("mdat", samples.flatten.toArray)
    ftyp ++ moovWith(chunkOffs) ++ mdat
  }

  private def sha8(b: Array[Byte]): String = java.security.MessageDigest
    .getInstance("SHA-256").digest(b).take(8).map("%02x".format(_)).mkString

  test("REAL mp4 demux: track metadata and encoded samples at planted byte ranges") {
    val payloads = Seq("FRAME_A", "FRAME_BB", "FRAME_CCC", "FRAME_DDDD")
      .map(_.getBytes("US-ASCII"))
    val mp4 = makeMp4(payloads, "avc1")
    val rows = Seq((9L, mp4)).toDF("doc_id", "payload")
    val tracks = BinaryPipeline.mp4Tracks(rows, "doc_id", "payload").collect()
    assert(tracks.length == 1)
    val t = tracks.head
    assert(t.handler == "vide" && t.codec == "avc1")
    assert(t.timescale == 1000L && t.duration_ts == 3000L && t.n_samples == 4L)
    // every sample extracted at its true mdat byte range: sizes AND content
    val got = BinaryPipeline.sampleMp4Samples(rows, "doc_id", "payload", stride = 1)
      .collect().sortBy(_.sample_idx)
    assert(got.map(_.n_bytes).toSeq == Seq(7L, 8L, 9L, 10L))
    assert(got.map(_.sample_sha).toSeq == payloads.map(sha8))
    // striding keeps ordinals 0, 2
    val strided = BinaryPipeline.sampleMp4Samples(rows, "doc_id", "payload", stride = 2)
      .collect().sortBy(_.sample_idx)
    assert(strided.map(_.sample_idx).toSeq == Seq(0L, 2L))
  }

  test("mp4 demux degrades on garbage, truncation, and forged table counts") {
    val payloads = (0 until 4).map(i => s"SAMPLE_$i".getBytes("US-ASCII"))
    val mp4 = makeMp4(payloads, "avc1")
    // non-mp4 -> no tracks
    assert(BinaryPipeline.demuxMp4("not an mp4 file either".getBytes).isEmpty)
    // truncated mid-mdat: moov (before mdat) still parses, but samples
    // whose byte range escapes the remaining payload DROP — never garbage
    val truncated = mp4.take(mp4.length - payloads.last.length - 2)
    val rows = Seq((1L, truncated)).toDF("doc_id", "payload")
    val got = BinaryPipeline.sampleMp4Samples(rows, "doc_id", "payload", 1).collect()
    assert(got.length < 4 && got.nonEmpty)
    assert(got.sortBy(_.sample_idx).map(_.sample_sha).toSeq ==
      payloads.take(got.length).map(sha8))
    // forge stsz's sample_count to ~2^31: the table clamps to the bytes
    // actually inside the box — no allocation from the header, no throw
    val forged = mp4.clone()
    val stszIdx = {
      var i = 0; var found = -1
      while (found < 0 && i < forged.length - 4) {
        if (new String(forged, i, 4, "US-ASCII") == "stsz") found = i else i += 1
      }
      found
    }
    assert(stszIdx > 0)
    forged(stszIdx + 12) = 0x7F.toByte; forged(stszIdx + 13) = 0xFF.toByte
    forged(stszIdx + 14) = 0xFF.toByte; forged(stszIdx + 15) = 0xFF.toByte
    val bounded = BinaryPipeline.demuxMp4(forged)
    assert(bounded.length == 1)
    assert(bounded.head.sampleSizes.length <= 4)
    // null / non-binary rows degrade like the other decoders
    val mixed = Seq((1L, mp4), (2L, null)).toDF("doc_id", "payload")
    val ok = BinaryPipeline.mp4Tracks(mixed, "doc_id", "payload").collect()
    assert(ok.nonEmpty && ok.forall(_.doc_id == 1L))
  }

  test("mp4 jpeg-codec tracks decode to true pixel dimensions") {
    // Motion-JPEG-in-mp4: the one codec the JDK can fully decode — the
    // demux hands the reader real JPEG payloads out of mdat
    val jpegs = (0 until 3).map(i => makeImage(20 + i, 10, 0x336699 + i, "jpg"))
    val mp4 = makeMp4(jpegs, "jpeg")
    val rows = Seq((5L, mp4)).toDF("doc_id", "payload")
    val frames = BinaryPipeline.sampleMp4Frames(rows, "doc_id", "payload", stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.width).toSeq == Seq(20L, 21L, 22L))
    assert(frames.forall(_.height == 10L))
    assert(frames.map(_.frame_sha).toSeq == jpegs.map(sha8))
    // an avc1 track never reaches the pixel decoder (no codec for it)
    val avc = Seq((6L, makeMp4(jpegs, "avc1"))).toDF("doc_id", "payload")
    assert(BinaryPipeline.sampleMp4Frames(avc, "doc_id", "payload", 1).collect().isEmpty)
  }

  /** Minimal valid Matroska file built element by element: EBML header
    * magic, then Segment(Tracks(TrackEntry(number, type=video, codec,
    * Video(w,h))), Cluster(SimpleBlock × frames)). Sizes use 2-byte
    * vints so payloads over 127 bytes encode correctly.
    */
  private def makeMkv(frames: Seq[Array[Byte]], codec: String = "V_MJPEG",
      w: Int = 20, h: Int = 10, colourSpace: String = ""): Array[Byte] = {
    def sz(v: Int): Array[Byte] = { // 2-byte vint, v < 2^14
      require(v < (1 << 14) - 1); Array((0x40 | (v >> 8)).toByte, (v & 0xFF).toByte)
    }
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] = id ++ sz(payload.length) ++ payload
    def id1(b: Int) = Array(b.toByte)
    def id4(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val header = el(id4(0x1A45DFA3L), Array.empty)
    def id3(v: Int) = Array((v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val colour = if (colourSpace.isEmpty) Array.empty[Byte]
      else el(id3(0x2EB524), colourSpace.getBytes("US-ASCII")) // ColourSpace fourcc
    val trackEntry = el(id1(0xAE),
      el(id1(0xD7), Array(1.toByte)) ++            // TrackNumber = 1
        el(id1(0x83), Array(1.toByte)) ++          // TrackType = video
        el(id1(0x86), codec.getBytes("US-ASCII")) ++ // CodecID
        el(id1(0xE0),                              // Video settings
          el(id1(0xB0), Array(w.toByte)) ++ el(id1(0xBA), Array(h.toByte)) ++ colour))
    val tracks = el(id4(0x1654AE6BL), trackEntry)
    val blocks = frames.flatMap { f =>
      // SimpleBlock payload: track vint 0x81, s16 rel. time, flags (no
      // lacing), then the frame bytes
      el(id1(0xA3), Array[Byte](0x81.toByte, 0, 0, 0) ++ f)
    }.toArray
    val cluster = el(id4(0x1F43B675L), el(id1(0xE7), Array(0.toByte)) ++ blocks)
    header ++ el(id4(0x18538067L), tracks ++ cluster)
  }

  test("REAL mkv demux: track metadata and un-laced block frames at planted content") {
    val payloads = Seq("BLOCK_A", "BLOCK_BB", "BLOCK_CCC").map(_.getBytes("US-ASCII"))
    val mkv = makeMkv(payloads, codec = "V_TEST", w = 33, h = 17)
    val rows = Seq((3L, mkv)).toDF("doc_id", "payload")
    val tracks = BinaryPipeline.mkvTracks(rows, "doc_id", "payload").collect()
    assert(tracks.length == 1)
    val t = tracks.head
    assert(t.track_number == 1L && t.track_type == "video" && t.codec == "V_TEST")
    assert(t.width == 33L && t.height == 17L)
    val got = BinaryPipeline.sampleMkvBlocks(rows, "doc_id", "payload", stride = 1)
      .collect().sortBy(_.sample_idx)
    assert(got.map(_.n_bytes).toSeq == Seq(7L, 8L, 9L))
    assert(got.map(_.sample_sha).toSeq == payloads.map(sha8))
    assert(BinaryPipeline.sampleMkvBlocks(rows, "doc_id", "payload", stride = 2)
      .collect().map(_.sample_idx).sorted.toSeq == Seq(0L, 2L))
  }

  test("mkv V_MJPEG frames decode to true pixel dimensions; degrade paths hold") {
    val jpegs = (0 until 3).map(i => makeImage(24 + i, 12, 0x884422 + i, "jpg"))
    val mkv = makeMkv(jpegs)
    val rows = Seq((4L, mkv)).toDF("doc_id", "payload")
    val frames = BinaryPipeline.sampleMkvFrames(rows, "doc_id", "payload", stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.width).toSeq == Seq(24L, 25L, 26L))
    assert(frames.forall(_.height == 12L))
    assert(frames.map(_.frame_sha).toSeq == jpegs.map(sha8))
    // non-MJPEG codec never reaches the pixel decoder
    val other = Seq((5L, makeMkv(jpegs, codec = "V_VP9"))).toDF("doc_id", "payload")
    assert(BinaryPipeline.sampleMkvFrames(other, "doc_id", "payload", 1).collect().isEmpty)
    // garbage is not an mkv
    assert(BinaryPipeline.demuxMkv("certainly not ebml".getBytes)._1.isEmpty)
    // truncated mid-cluster: the blocks that fit come back, never a throw
    val truncated = mkv.take(mkv.length - jpegs.last.length - 2)
    val some = BinaryPipeline.demuxMkv(truncated)._2
    assert(some.length < 3)
    // forged element size beyond the file clamps to the enclosing range
    val forged = mkv.clone()
    // the Segment's 2-byte size vint sits right after its 4-byte id
    val segIdx = {
      var i = 0; var found = -1
      while (found < 0 && i < forged.length - 4) {
        if ((forged(i) & 0xFF) == 0x18 && (forged(i + 1) & 0xFF) == 0x53
          && (forged(i + 2) & 0xFF) == 0x80 && (forged(i + 3) & 0xFF) == 0x67) found = i
        else i += 1
      }
      found
    }
    assert(segIdx > 0)
    // 0x7FFE = 16382, far beyond the file (0x7FFF would be the legal
    // "unknown size" marker — clamping and unknown-size resolve the same)
    forged(segIdx + 4) = 0x7F.toByte; forged(segIdx + 5) = 0xFE.toByte
    val clamped = BinaryPipeline.demuxMkv(forged)
    assert(clamped._1.length == 1 && clamped._2.length == 3) // still fully parsed
  }

  test("mkv lacing: Xiph, fixed, and EBML laced blocks split into exact frames") {
    def sz(v: Int): Array[Byte] = {
      require(v < (1 << 14) - 1); Array((0x40 | (v >> 8)).toByte, (v & 0xFF).toByte)
    }
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] = id ++ sz(payload.length) ++ payload
    def id1(b: Int) = Array(b.toByte)
    def id4(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val fA = Array.fill[Byte](7)(0x41)          // 'A' x 7
    val fB = Array.fill[Byte](300)(0x42)        // forces a 255+45 Xiph run
    val fC = Array.fill[Byte](5)(0x43)
    def blockHdr(flags: Int, count: Int) =
      Array[Byte](0x81.toByte, 0, 0, flags.toByte, (count - 1).toByte)
    // Xiph (lacing=1, flags 0x02): sizes [7]=7, [255,45]=300; last implicit
    val xiph = el(id1(0xA3), blockHdr(0x02, 3) ++
      Array[Byte](7) ++ Array[Byte](255.toByte, 45) ++ fA ++ fB ++ fC)
    // fixed (lacing=2, flags 0x04): three equal 7-byte frames
    val fixed = el(id1(0xA3), blockHdr(0x04, 3) ++ fA ++ fA ++ fA)
    // EBML (lacing=3, flags 0x06): first size 7 as vint 0x87, then delta
    // +2 stored as 2 + 63 = 65 -> vint 0xC1 (frame sizes 7, 9, implicit 5)
    val f9 = Array.fill[Byte](9)(0x44)
    val ebml = el(id1(0xA3), blockHdr(0x06, 3) ++
      Array[Byte](0x87.toByte, 0xC1.toByte) ++ fA ++ f9 ++ fC)
    // malformed Xiph: size run larger than the payload -> block dropped
    val bad = el(id1(0xA3), blockHdr(0x02, 3) ++
      Array[Byte](255.toByte, 255.toByte, 255.toByte, 100) ++ fA)
    val header = el(id4(0x1A45DFA3L), Array.empty)
    val cluster = el(id4(0x1F43B675L),
      el(id1(0xE7), Array(0.toByte)) ++ xiph ++ fixed ++ ebml ++ bad)
    val mkv = header ++ el(id4(0x18538067L), cluster)
    val (_, frames) = BinaryPipeline.demuxMkv(mkv)
    // 3 + 3 + 3 frames, ordinals contiguous, exact sizes and content
    assert(frames.map(_._3.length).toSeq == Seq(7, 300, 5, 7, 7, 7, 7, 9, 5))
    assert(frames.map(_._2).toSeq == (0L until 9L).toSeq)
    assert(frames(1)._3.forall(_ == 0x42) && frames(7)._3.forall(_ == 0x44))
    assert(frames.forall(_._1 == 1L))
  }

  test("mp4 forged co64/fixed-stsz: near-Long.Max offsets and amplified counts degrade, never throw") {
    def cc(s: String) = s.getBytes("US-ASCII")
    def be(v: Int) = Array((v >> 24 & 0xFF).toByte, (v >> 16 & 0xFF).toByte,
      (v >> 8 & 0xFF).toByte, (v & 0xFF).toByte)
    def be8(v: Long) = be((v >> 32).toInt) ++ be(v.toInt)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be(8 + payload.length) ++ cc(typ) ++ payload
    val ftyp = box("ftyp", cc("isom") ++ be(0) ++ cc("isom"))
    val mdhd = box("mdhd", be(0) ++ be(0) ++ be(0) ++ be(1000) ++ be(3000))
    val hdlr = box("hdlr", be(0) ++ be(0) ++ cc("vide") ++ new Array[Byte](12))
    val stsd = box("stsd", be(0) ++ be(1) ++ (be(16) ++ cc("avc1") ++ new Array[Byte](8)))
    def mp4With(stbl: Array[Byte]) =
      ftyp ++ box("moov", box("trak", box("mdia", mdhd ++ hdlr ++
        box("minf", box("stbl", stbl)))))

    // (a) co64 base near Long.MaxValue: resolve()'s `off += size` would
    // wrap negative-then-positive and the naive `off + sz <= len` guard
    // would pass on the wrap — the parse-time clamp must keep the walk
    // alive (metadata intact) and the sample extractor empty
    val stszTwo = box("stsz", be(0) ++ be(0) ++ be(2) ++ be(40) ++ be(40))
    val stsc = box("stsc", be(0) ++ be(1) ++ (be(1) ++ be(2) ++ be(1)))
    val co64 = box("co64", be(0) ++ be(1) ++ be8(Long.MaxValue - 20))
    val forged = mp4With(stsd ++ stszTwo ++ stsc ++ co64)
    val tracks = BinaryPipeline.demuxMp4(forged)
    assert(tracks.length == 1 && tracks.head.handler == "vide")
    val rows = Seq((1L, forged)).toDF("doc_id", "payload")
    assert(BinaryPipeline.sampleMp4Samples(rows, "doc_id", "payload", 1).collect().isEmpty)

    // (b) fixed-size stsz with a forged million-sample count: the size
    // vector must stay bounded by the file's own byte budget, like the
    // variable path's room clamp
    val stszFixed = box("stsz", be(0) ++ be(50) ++ be(1000000))
    val stco1 = box("stco", be(0) ++ be(1) ++ be(0))
    val amplified = mp4With(stsd ++ stszFixed ++ stsc ++ stco1)
    val t2 = BinaryPipeline.demuxMp4(amplified)
    assert(t2.length == 1)
    assert(t2.head.sampleSizes.length <= amplified.length / 50 + 1,
      s"forged fixed-stsz count amplified to ${t2.head.sampleSizes.length} sizes")
  }

  test("mkv zero-length laced frame advances the ordinal (no phase shift)") {
    def sz(v: Int): Array[Byte] = {
      require(v < (1 << 14) - 1); Array((0x40 | (v >> 8)).toByte, (v & 0xFF).toByte)
    }
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] = id ++ sz(payload.length) ++ payload
    def id1(b: Int) = Array(b.toByte)
    def id4(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val fA = Array.fill[Byte](7)(0x41)
    val fC = Array.fill[Byte](5)(0x43)
    // Xiph lace [7, 0, implicit 5]: the empty middle frame is LEGAL and
    // must consume ordinal 1 — otherwise every later frame's ordinal and
    // stride phase drift from the true container index
    val xiph = el(id1(0xA3), Array[Byte](0x81.toByte, 0, 0, 0x02, 2) ++
      Array[Byte](7, 0) ++ fA ++ fC)
    val header = el(id4(0x1A45DFA3L), Array.empty)
    val cluster = el(id4(0x1F43B675L), el(id1(0xE7), Array(0.toByte)) ++ xiph)
    val mkv = header ++ el(id4(0x18538067L), cluster)
    val (_, frames) = BinaryPipeline.demuxMkv(mkv)
    assert(frames.map(f => (f._2, f._3.length)).toSeq == Seq((0L, 7), (2L, 5)),
      s"got ${frames.map(f => (f._2, f._3.length))}")
    // stride 2 keeps ordinals 0 and 2 — both real frames, because the
    // empty frame holds the odd slot
    val strided = BinaryPipeline.demuxMkv(mkv, stride = 2)._2
    assert(strided.map(_._2).toSeq == Seq(0L, 2L))
  }

  test("mkv multi-track interleave: stride and caps are per track, never global") {
    def sz(v: Int): Array[Byte] = {
      require(v < (1 << 14) - 1); Array((0x40 | (v >> 8)).toByte, (v & 0xFF).toByte)
    }
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] = id ++ sz(payload.length) ++ payload
    def id1(b: Int) = Array(b.toByte)
    def id4(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def sb(track: Int, tag: Byte, len: Int) = el(id1(0xA3),
      Array[Byte]((0x80 | track).toByte, 0, 0, 0) ++ Array.fill[Byte](len)(tag))
    // interleaved: a1 v1 a2 v2 a3 v3 a4 v4 (audio=track1, video=track2)
    val blocks = (0 until 4).flatMap(i =>
      sb(1, 'a'.toByte, 4 + i) ++ sb(2, 'v'.toByte, 10 + i)).toArray
    val header = el(id4(0x1A45DFA3L), Array.empty)
    val cluster = el(id4(0x1F43B675L), el(id1(0xE7), Array(0.toByte)) ++ blocks)
    val mkv = header ++ el(id4(0x18538067L), cluster)
    // stride 2 must keep each track's ordinals 0 and 2 — a global ordinal
    // would sample alternate TRACKS instead of alternate frames
    val strided = BinaryPipeline.demuxMkv(mkv, stride = 2)._2
    assert(strided.map(t => (t._1, t._2)).toSet == Set((1L, 0L), (1L, 2L), (2L, 0L), (2L, 2L)))
    // a kept-cap of 2 bounds EACH track; the busy first track cannot
    // starve the second
    val capped = BinaryPipeline.demuxMkv(mkv, stride = 1, maxKept = 2)._2
    assert(capped.count(_._1 == 1L) == 2 && capped.count(_._1 == 2L) == 2)
    assert(capped.filter(_._1 == 2L).map(_._3.length).sorted.toSeq == Seq(10, 11))
    // track filter + per-track stride compose in the public sampler
    val rows = Seq((8L, mkv)).toDF("doc_id", "payload")
    val t2 = BinaryPipeline.sampleMkvBlocks(rows, "doc_id", "payload", stride = 2, trackNumber = 2L)
      .collect().sortBy(_.sample_idx)
    assert(t2.map(_.sample_idx).toSeq == Seq(0L, 2L))
    assert(t2.map(_.n_bytes).toSeq == Seq(10L, 12L))
  }

  // real images for the REAL decode path: tiny solid/gradient PNGs+JPEGs
  // generated with the same pure-JDK imageio the operator uses
  private def makeImage(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  test("real image decode: dimensions, format, and luma from actual pixels") {
    val rows = Seq(
      (1L, makeImage(40, 30, 0xFFFFFF, "png")),  // white png
      (2L, makeImage(16, 64, 0x000000, "jpg")),  // black jpeg
      (3L, makeImage(20, 20, 0x808080, "png")),  // mid gray
      (4L, "not an image at all".getBytes("UTF-8")), // corrupt row
      (5L, null: Array[Byte]) // NULL payload: degrade, don't NPE the task
    ).toDF("doc_id", "payload")
    val meta = BinaryPipeline.decodeImages(rows, "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).width == 40L && meta(1L).height == 30L)
    assert(meta(1L).format == "png" && meta(1L).mean_luma > 0.99)
    assert(meta(2L).width == 16L && meta(2L).height == 64L)
    assert(meta(2L).format.startsWith("jp") && meta(2L).mean_luma < 0.05)
    assert(math.abs(meta(3L).mean_luma - 0x80 / 255.0) < 0.02)
    // corrupt bytes degrade gracefully instead of failing the task
    assert(meta(4L).format == "unknown" && meta(4L).width == -1L)
    assert(meta(4L).n_bytes == "not an image at all".getBytes("UTF-8").length)
    assert(meta(5L).format == "unknown" && meta(5L).n_bytes == 0L)
  }

  test("real image resize: shorter side hits the target, output decodes back") {
    val rows = Seq(
      (1L, makeImage(100, 40, 0x336699, "png")),
      (2L, makeImage(30, 90, 0x996633, "png")),
      (3L, "corrupt".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = BinaryPipeline.resizeImages(rows, "doc_id", "payload", 20)
    val got = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(3L)) // undecodable rows dropped, not failed
    assert(got(1L).getLong(2) == 50L && got(1L).getLong(3) == 20L) // 100x40 -> 50x20
    assert(got(2L).getLong(2) == 20L && got(2L).getLong(3) == 60L) // 30x90 -> 20x60
    // the emitted PNG bytes are themselves decodable at the new dims
    val redecoded = BinaryPipeline.decodeImages(
      out.select(col("doc_id"), col("png_bytes")), "doc_id", "png_bytes")
      .collect().map(m => m.doc_id -> m).toMap
    assert(redecoded(1L).width == 50L && redecoded(1L).height == 20L)
    assert(redecoded(1L).format == "png")
  }

  // real WAV bytes for the REAL audio path: sine-wave PCM written with
  // the same pure-JDK javax.sound.sampled the operator uses
  private def makeWav(rate: Float, channels: Int, seconds: Double, freq: Double,
      amp: Double): Array[Byte] = {
    import javax.sound.sampled._
    val frames = math.round(rate * seconds).toInt
    val pcm = new Array[Byte](frames * channels * 2)
    (0 until frames).foreach { f =>
      val v = math.round(amp * 32767.0 * math.sin(2 * math.Pi * freq * f / rate)).toShort
      (0 until channels).foreach { c =>
        val i = (f * channels + c) * 2
        pcm(i) = (v & 0xFF).toByte; pcm(i + 1) = ((v >> 8) & 0xFF).toByte
      }
    }
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("real audio decode: rate, channels, duration, and amplitude from actual samples") {
    val rows = Seq(
      (1L, makeWav(44100f, 2, 0.5, 440.0, 0.5)),  // stereo A4 at half amplitude
      (2L, makeWav(8000f, 1, 2.0, 100.0, 1.0)),   // mono, full scale
      (3L, "definitely not audio".getBytes("UTF-8")), // corrupt row
      (4L, null: Array[Byte]) // NULL payload: degrade, don't NPE the task
    ).toDF("doc_id", "payload")
    val meta = BinaryPipeline.decodeAudio(rows, "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).format == "wave" && meta(1L).sample_rate == 44100.0)
    assert(meta(1L).channels == 2L && meta(1L).bits == 16L)
    assert(meta(1L).frames == 22050L && math.abs(meta(1L).duration_s - 0.5) < 1e-9)
    // sine RMS = amp/sqrt(2); peak = amp
    assert(math.abs(meta(1L).rms - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(meta(1L).peak - 0.5) < 0.01)
    assert(meta(2L).sample_rate == 8000.0 && meta(2L).channels == 1L)
    assert(math.abs(meta(2L).duration_s - 2.0) < 1e-9)
    assert(math.abs(meta(2L).rms - 1.0 / math.sqrt(2)) < 0.01)
    assert(meta(3L).format == "unknown" && meta(3L).frames == -1L)
    assert(meta(4L).format == "unknown" && meta(4L).n_bytes == 0L)
  }

  test("real audio resample: mono downmix at the target rate, output decodes back") {
    val rows = Seq(
      (1L, makeWav(44100f, 2, 1.0, 440.0, 0.8)),
      (2L, "corrupt".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = BinaryPipeline.resampleAudio(rows, "doc_id", "payload", 16000)
    val got = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(2L)) // undecodable rows dropped, not failed
    assert(got(1L).getLong(2) == 16000L)
    assert(math.abs(got(1L).getLong(3) - 16000L) <= 1L) // ~1s of frames
    // the emitted WAV bytes are themselves decodable at the new layout,
    // and a 440 Hz tone survives 44.1k->16k resampling with its RMS intact
    val redecoded = BinaryPipeline.decodeAudio(
      out.select(col("doc_id"), col("wav_bytes")), "doc_id", "wav_bytes")
      .collect().map(m => m.doc_id -> m).toMap
    assert(redecoded(1L).format == "wave" && redecoded(1L).sample_rate == 16000.0)
    assert(redecoded(1L).channels == 1L)
    assert(math.abs(redecoded(1L).duration_s - 1.0) < 0.001)
    assert(math.abs(redecoded(1L).rms - 0.8 / math.sqrt(2)) < 0.02)
    // determinism: two runs emit byte-identical WAVs
    val again = BinaryPipeline.resampleAudio(rows, "doc_id", "payload", 16000)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(java.util.Arrays.equals(
      got(1L).getAs[Array[Byte]](1), again(1L).getAs[Array[Byte]](1)))
  }

  test("audio decode survives a forged header declaring ~2^31 frames (no multi-GB buffer)") {
    // take a real 1s WAV and forge the RIFF + data chunk sizes to huge
    // values: the declared frame count is untrusted input and must not
    // size an allocation (a few-hundred-byte file declaring 5e8 frames
    // would otherwise OOM the task)
    val wav = makeWav(8000f, 1, 0.01, 100.0, 0.5) // 80 frames, 160 PCM bytes
    val forged = wav.clone()
    def putLE(off: Int, v: Long): Unit = (0 until 4).foreach { i =>
      forged(off + i) = ((v >> (8 * i)) & 0xFF).toByte
    }
    putLE(4, 0x7FFFFFF0L)  // RIFF chunk size
    putLE(40, 0x7FFFFFF0L) // data chunk size (canonical PCM header layout)
    val rows = Seq((1L, forged)).toDF("doc_id", "payload")
    // both paths must stay bounded: decode stats and the full-read resample
    val meta = BinaryPipeline.decodeAudio(rows, "doc_id", "payload").collect()
    assert(meta.length == 1) // completed without OOM
    val out = BinaryPipeline.resampleAudio(rows, "doc_id", "payload", 4000).collect()
    // either dropped as undecodable or resampled from the REAL ~80 frames —
    // never a 2^31-frame buffer
    out.foreach(r => assert(r.getLong(3) < 1000L, s"out_frames ${r.getLong(3)}"))
  }

  test("audio decode survives a forged zero blockAlign (fallback stays payload-bounded)") {
    // getFrameSize <= 0 must fall back to a payload-derived bound, not the
    // caller's maxFrames — otherwise the forged-header allocation reopens
    val wav = makeWav(8000f, 1, 0.01, 100.0, 0.5)
    val forged = wav.clone()
    forged(32) = 0; forged(33) = 0 // fmt-chunk blockAlign = 0
    val rows = Seq((1L, forged)).toDF("doc_id", "payload")
    val meta = BinaryPipeline.decodeAudio(rows, "doc_id", "payload").collect()
    assert(meta.length == 1) // completed without OOM (decoded or "unknown")
    val out = BinaryPipeline.resampleAudio(rows, "doc_id", "payload", 4000).collect()
    out.foreach(r => assert(r.getLong(3) < 1000L, s"out_frames ${r.getLong(3)}"))
  }

  test("mkv V_UNCOMPRESSED frames decode via track geometry; wrong-size payloads drop") {
    val (w, h) = (4, 2)
    // packed top-down RGB, marker at (x=2, y=1)
    val rgb = new Array[Byte](w * h * 3)
    val p = (1 * w + 2) * 3
    rgb(p) = 0x12.toByte; rgb(p + 1) = 0x34.toByte; rgb(p + 2) = 0x56.toByte
    val gray = Array.tabulate[Byte](w * h)(i => (i * 10).toByte)
    val wrong = new Array[Byte](w * h * 3 - 1) // fails the exact-length check
    val mkv = makeMkv(Seq(rgb, wrong, gray), codec = "V_UNCOMPRESSED", w = w, h = h)
    val img = BinaryPipeline.decodeRawPacked(rgb, w, h).get._1
    assert((img.getRGB(2, 1) & 0xFFFFFF) == 0x123456)
    assert((img.getRGB(0, 0) & 0xFFFFFF) == 0)
    val rows = Seq((11L, mkv)).toDF("doc_id", "payload")
    val got = BinaryPipeline.sampleMkvFrames(rows, "doc_id", "payload", stride = 1)
      .collect().sortBy(_.frame_idx)
    // frames 0 (rgb) and 2 (gray) decode; frame 1 drops but keeps its ordinal
    assert(got.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(got.forall(f => f.width == w.toLong && f.height == h.toLong))
    // a V_UNCOMPRESSED track with NO geometry never decodes (0x0 declared)
    val noGeo = makeMkv(Seq(rgb), codec = "V_UNCOMPRESSED", w = 0, h = 0)
    val none = Seq((12L, noGeo)).toDF("doc_id", "payload")
    assert(BinaryPipeline.sampleMkvFrames(none, "doc_id", "payload", 1).collect().isEmpty)
    // ColourSpace fourcc surfaces on the track row and flips channel order
    val bgrMkv = makeMkv(Seq(rgb), codec = "V_UNCOMPRESSED", w = w, h = h,
      colourSpace = "BGR")
    val bgrRows = Seq((13L, bgrMkv)).toDF("doc_id", "payload")
    val bgrTrack = BinaryPipeline.mkvTracks(bgrRows, "doc_id", "payload").collect().head
    assert(bgrTrack.colour_space == "BGR")
    val bgrImg = BinaryPipeline.decodeRawPacked(rgb, w, h, bgr = true).get._1
    assert((bgrImg.getRGB(2, 1) & 0xFFFFFF) == 0x563412) // outer channels swapped
    assert(BinaryPipeline.sampleMkvFrames(bgrRows, "doc_id", "payload", 1)
      .collect().map(_.frame_idx).toSeq == Seq(0L))
  }

  /** Minimal valid AVI: RIFF(AVI ) → LIST(hdrl with an empty avih, and —
    * when `rawFmt` is given — a stream-00 strl with a 'vids' strh and a
    * BITMAPINFOHEADER strf) → LIST(movi) holding each frame as a 00dc
    * chunk (even-padded). `rawFmt` = (width, height, bitCount); height
    * is signed exactly as in the real header (positive = bottom-up).
    */
  private def makeAvi(
      frames: Seq[Array[Byte]],
      rawFmt: Option[(Int, Int, Int)] = None): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def u32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, (v >> 8 & 0xFF).toByte, (v >> 16 & 0xFF).toByte, (v >> 24 & 0xFF).toByte)
    def u16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, (v >> 8 & 0xFF).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ u32(payload.length) ++ payload ++ pad
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      cc("LIST") ++ u32(payload.length + 4) ++ cc(listType) ++ payload
    val strl = rawFmt.map { case (w, h, bpp) =>
      val strh = cc("vids") ++ cc("DIB ") ++ new Array[Byte](48)
      val strf = u32(40) ++ u32(w) ++ u32(h) ++ u16(1) ++ u16(bpp) ++
        u32(0) ++ new Array[Byte](20) // biCompression = 0 (BI_RGB)
      list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    }.getOrElse(Array.empty[Byte])
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)) ++ strl)
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    bo.write(cc("RIFF")); bo.write(u32(body.length)); bo.write(body)
    bo.toByteArray
  }

  test("scene cuts: per-frame aHash matches imageAHash; the shot boundary is the only cut") {
    // two shots of patterned frames: left-half-white vs TOP-half-white —
    // solid frames would both aHash to 0 (every luma equals the mean),
    // so the patterns guarantee a large cross-shot Hamming distance
    // while JPEG noise keeps within-shot distance tiny
    def pattern(leftHalf: Boolean): Array[Byte] = {
      val (w, h) = (32, 32)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val white = if (leftHalf) x < w / 2 else y < h / 2
        img.setRGB(x, y, if (white) 0xFFFFFF else 0x000000)
      })
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val shotA = pattern(leftHalf = true)
    val shotB = pattern(leftHalf = false)
    val avi = makeAvi(Seq(shotA, shotA, shotA, shotB, shotB, shotB))
    val rows = Seq((21L, avi)).toDF("doc_id", "payload")
    val hashes = BinaryPipeline.aviFrameAHash(rows, "doc_id", "payload", stride = 1)
    val got = hashes.collect().sortBy(_.getLong(1))
    assert(got.map(_.getLong(1)).toSeq == (0L until 6L).toSeq, "all 6 frames hash")
    // frame 0's hash equals the standalone image's aHash — one signature
    val standalone = BinaryPipeline.imageAHash(
      Seq((1L, shotA)).toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().head.getLong(1)
    assert(got.head.getLong(2) == standalone)
    val cuts = BinaryPipeline.sceneCuts(hashes, "doc_id", "frame_idx", "ahash",
      minHamming = 10).collect()
    assert(cuts.length == 1, s"exactly one shot boundary, got ${cuts.toSeq}")
    assert((cuts.head.getLong(0), cuts.head.getLong(1), cuts.head.getLong(2))
      == ((21L, 3L, 2L)))
    assert(cuts.head.getInt(3) > 20, "orthogonal half-patterns flip a large fraction")
    // repeated identical frames alone never cut
    val steady = makeAvi(Seq(shotA, shotA, shotA, shotA))
    val steadyHashes = BinaryPipeline.aviFrameAHash(
      Seq((22L, steady)).toDF("doc_id", "payload"), "doc_id", "payload", 1)
    assert(BinaryPipeline.sceneCuts(steadyHashes, "doc_id", "frame_idx", "ahash",
      10).collect().isEmpty)
  }

  test("REAL AVI/MJPEG demux: strided frames decode with true dims and payload identity") {
    val jpegs = (0 until 10).map(i => makeImage(32 + i, 24, 0x112233 * (i + 1), "jpg"))
    val avi = makeAvi(jpegs)
    val rows = Seq((7L, avi)).toDF("doc_id", "payload")
    val got = BinaryPipeline.sampleAviFrames(rows, "doc_id", "payload", stride = 3)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(got.map(_.width).toSeq == Seq(32L, 35L, 38L, 41L))
    assert(got.forall(_.height == 24L))
    // frame fingerprints are of the demuxed payloads, i.e. the exact JPEGs
    val wantSha = Seq(0, 3, 6, 9).map(i => java.security.MessageDigest
      .getInstance("SHA-256").digest(jpegs(i)).take(8).map("%02x".format(_)).mkString)
    assert(got.map(_.frame_sha).toSeq == wantSha)
  }

  test("uncompressed AVI (BI_RGB 'DIB ') frames decode: true dims, un-flipped pixels") {
    // 5x3, 24bpp, bottom-up: rows pad to 4 bytes (15 -> 16). Paint one
    // marker pixel at image (x=1, y=0 top-down) = raw row (h-1-0)=2
    val (w, h) = (5, 3)
    val rowBytes = 16
    def rawFrame(marker: Int): Array[Byte] = {
      val f = new Array[Byte](rowBytes * h)
      val p = 2 * rowBytes + 1 * 3 // bottom row in the buffer = top row on screen
      f(p) = (marker & 0xFF).toByte         // B
      f(p + 1) = ((marker >> 8) & 0xFF).toByte  // G
      f(p + 2) = ((marker >> 16) & 0xFF).toByte // R
      f
    }
    val frames = Seq(rawFrame(0xAA1122), rawFrame(0x0BB330))
    val avi = makeAvi(frames, rawFmt = Some((w, h, 24)))
    // format parse sees the stream-00 header
    val fmt = BinaryPipeline.parseAviVideoFormat(avi)
    assert(fmt.contains(BinaryPipeline.AviVideoFormat(0L, 24, w, h, bottomUp = true)))
    // pixel-level: the decoder un-flips, so the marker lands at (1, 0)
    val img = BinaryPipeline.decodeRawDib(frames.head, fmt.get).get._1
    assert((img.getRGB(1, 0) & 0xFFFFFF) == 0xAA1122)
    assert((img.getRGB(0, 0) & 0xFFFFFF) == 0)
    // end-to-end through the demux
    val rows = Seq((9L, avi)).toDF("doc_id", "payload")
    val got = BinaryPipeline.sampleAviFrames(rows, "doc_id", "payload", stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(got.length == 2)
    assert(got.forall(f => f.width == w.toLong && f.height == h.toLong))
    val wantSha = frames.map(f => java.security.MessageDigest
      .getInstance("SHA-256").digest(f).take(8).map("%02x".format(_)).mkString)
    assert(got.map(_.frame_sha).toSeq == wantSha)
    // a truncated raw frame fails the geometry check and drops; the
    // intact frame still comes back
    val aviShort = makeAvi(Seq(frames.head.take(rowBytes * h - 1), frames(1)),
      rawFmt = Some((w, h, 24)))
    val short = Seq((10L, aviShort)).toDF("doc_id", "payload")
    val kept = BinaryPipeline.sampleAviFrames(short, "doc_id", "payload", 1).collect()
    assert(kept.map(_.frame_idx).toSeq == Seq(1L))
  }

  test("AVI demux degrades on garbage, truncation, and forged chunk sizes") {
    val jpegs = (0 until 4).map(i => makeImage(16, 16, 0x00FF00 + i, "jpg"))
    val avi = makeAvi(jpegs)
    // non-AVI bytes -> no frames
    assert(BinaryPipeline.demuxAviFrames("not a riff file at all".getBytes, 1, 100).isEmpty)
    // truncated mid-stream -> parses the frames that fit, never throws
    val truncated = avi.take(avi.length / 2)
    val some = BinaryPipeline.demuxAviFrames(truncated, 1, 100)
    assert(some.length < 4)
    // forge the first frame chunk's size to ~2^31: the clamp bounds the
    // slice to the real payload — no allocation from the header
    val forged = avi.clone()
    val moviIdx = {
      var i = 12; var found = -1
      while (found < 0 && i < forged.length - 8) {
        if (new String(forged, i, 4, "US-ASCII") == "00dc") found = i else i += 1
      }
      found
    }
    assert(moviIdx > 0)
    forged(moviIdx + 4) = 0xF0.toByte; forged(moviIdx + 5) = 0xFF.toByte
    forged(moviIdx + 6) = 0xFF.toByte; forged(moviIdx + 7) = 0x7F.toByte
    val bounded = BinaryPipeline.demuxAviFrames(forged, 1, 100)
    // the forged chunk swallows the rest of movi (clamped), so at most one
    // oversized frame comes back — and nothing allocated beyond the file
    assert(bounded.length <= 1)
    assert(bounded.forall(_._2.length <= forged.length))
  }

  test("AVI demux: dropped frames advance ordinals, other streams ignored, null rows degrade") {
    def cc(s: String) = s.getBytes("US-ASCII")
    def u32b(v: Int) = Array((v & 0xFF).toByte, (v >> 8 & 0xFF).toByte,
      (v >> 16 & 0xFF).toByte, (v >> 24 & 0xFF).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ u32b(payload.length) ++ payload ++ pad
    }
    val jpegs = (0 until 4).map(i => makeImage(16, 16, 0xAA0000 + i, "jpg"))
    // stream 00: frame0, DROPPED (zero-length), frame1, audio-ish 01dc
    // interloper, frame2, frame3
    val moviPayload = cc("movi") ++ chunk("00dc", jpegs(0)) ++
      chunk("00dc", Array.empty[Byte]) ++ chunk("00dc", jpegs(1)) ++
      chunk("01dc", jpegs(2).take(40)) ++ chunk("00dc", jpegs(2)) ++ chunk("00dc", jpegs(3))
    val movi = cc("LIST") ++ u32b(moviPayload.length) ++ moviPayload
    val body = cc("AVI ") ++ movi
    val avi = cc("RIFF") ++ u32b(body.length) ++ body
    // parser must resync past the zero-length chunk: ALL 4 real frames of
    // stream 00 come back; the 01dc chunk never appears; the dropped
    // frame holds ordinal 1
    val frames = BinaryPipeline.demuxAviFrames(avi, 1, 100)
    assert(frames.map(_._1) == Vector(0L, 2L, 3L, 4L))
    assert(frames.map(_._2.toSeq) == Vector(jpegs(0), jpegs(1), jpegs(2), jpegs(3)).map(_.toSeq))
    // striding covers the whole stream, not just the first maxKept frames:
    // stride 2 keeps ordinals 0,2,4 even with maxKept = 2 capping to 2
    assert(BinaryPipeline.demuxAviFrames(avi, 2, 100).map(_._1) == Vector(0L, 2L, 4L))
    assert(BinaryPipeline.demuxAviFrames(avi, 2, 2).map(_._1) == Vector(0L, 2L))
    // null payload / null id rows drop instead of NPEing the task
    val rows = Seq((1L, avi), (2L, null)).toDF("doc_id", "payload")
      .union(Seq((Option.empty[Long], Option.empty[Array[Byte]])).toDF("doc_id", "payload"))
    val got = BinaryPipeline.sampleAviFrames(rows, "doc_id", "payload", stride = 1).collect()
    assert(got.nonEmpty && got.forall(_.doc_id == 1L))
    val stub = BinaryPipeline.sampleFramesStub(rows, "doc_id", "payload", 7L).collect()
    assert(stub.nonEmpty && stub.forall(_.doc_id == 1L))
  }

  test("GraftExtensions injects the planner strategy") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e)
    val strategies = org.apache.spark.sql.GraftPlanBridge.plannerStrategies(e, spark)
    assert(strategies.contains(graft.plans.TopKPerKeyStrategy))
  }

  test("csv and json round-trip through the engine") {
    val tmp = Files.createTempDirectory("graft_io").toFile
    tmp.deleteOnExit()
    val src = Snapshot(spark, sf()).nation
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    src.write.mode("overwrite").json(s"$tmp/json")
    val fromCsv = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$tmp/csv")
    val fromJson = spark.read.json(s"$tmp/json")
    assert(fromCsv.count() == src.count())
    assert(fromJson.count() == src.count())
    assert(fromJson.select("n_name").as[String].collect().toSet ==
      src.select("n_name").as[String].collect().toSet)
  }

  test("orc round-trips through the engine with schema intact") {
    val tmp = Files.createTempDirectory("graft_orc").toFile
    tmp.deleteOnExit()
    val src = Snapshot(spark, sf()).nation
    src.write.mode("overwrite").orc(s"$tmp/orc")
    val fromOrc = spark.read.orc(s"$tmp/orc")
    assert(fromOrc.count() == src.count())
    assert(fromOrc.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)))
  }

  test("schema evolution: widened files merge, old rows read null, pruning survives") {
    // the ingestion contract a long-lived parquet feed needs: a producer
    // adds a column mid-stream; mergeSchema reads old+new files as one
    // relation with NULLs for pre-evolution rows, and both pushdown and
    // the added column's filters still reach the scan. DataShape's RAW
    // drift tripwire names encoding changes; this pins the SCHEMA-WIDTH
    // change path next to it.
    val tmp = Files.createTempDirectory("graft_evolve").toFile
    tmp.deleteOnExit()
    val dir = s"$tmp/feed"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("id", "v", "score"))
    assert(merged.count() == 4L)
    assert(merged.where($"score".isNull).select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(merged.where($"score" >= 40L).select("id").as[Long].collect().toSeq == Seq(4L))
    // without mergeSchema the footer Spark happens to sample wins —
    // the tripwire reason callers must opt in explicitly for evolving
    // feeds (order-dependent schema is not a correctness surface)
    val plan = merged.where($"score" === 30L)
    plan.collect()
    val p = plan.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("score"), p.take(1500))
  }

  test("intermediary registration is explicit, named or generated, and queryable") {
    val df = SparkEntry.queries("q_intermediary")(spark, sf())
    val named = graft.api.Procurement.registerIntermediary(df, Some("intermediary_table"))
    assert(named == "intermediary_table")
    assert(spark.sql("SELECT COUNT(*) FROM intermediary_table").head().getLong(0) > 0)
    // generated names are unique per call — no clobbering between queries
    val g1 = graft.api.Procurement.registerIntermediary(df)
    val g2 = graft.api.Procurement.registerIntermediary(df.limit(1))
    assert(g1 != g2)
    assert(spark.sql(s"SELECT COUNT(*) FROM $g2").head().getLong(0) == 1)
  }
}
