package graft

import org.apache.spark.sql.functions._

import graft.operators.ann.{BruteForceKNN, Quantize}
import graft.operators.sample.Mixing
import graft.operators.text.Chunking
import graft.sources.Snapshot

class ChunkQuantizeMixSpec extends SparkSpecBase {
  import spark.implicits._

  // ------------------------------------------------------------- chunking

  test("chunking covers every token, overlaps exactly, short doc -> one chunk") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens -> 4 chunks
      (2L, "a b c"),                                   // shorter than one chunk
      (3L, (1 to 32).map(i => s"t$i").mkString(" ")),  // exactly one chunk
      (4L, (1 to 33).map(i => s"u$i").mkString(" "))   // one token past a chunk
    ).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", 32, 8)
      .orderBy("doc_id", "chunk_idx").collect()

    // doc 1: stride 24, ceil((100-8)/24) = 4 chunks at starts 0/24/48/72
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.length == 4)
    val texts = d1.map(_.getString(3))
    // dropping each later chunk's 8-token overlap reconstructs the document
    val rebuilt = texts.head.split(" ") ++ texts.tail.flatMap(_.split(" ").drop(8))
    assert(rebuilt.toSeq == (1 to 100).map(i => s"w$i"))
    // consecutive chunks share exactly the declared overlap
    texts.sliding(2).foreach { w =>
      assert(w(0).split(" ").takeRight(8).toSeq == w(1).split(" ").take(8).toSeq)
    }

    assert(out.filter(_.getLong(0) == 2L).toSeq.map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      == Seq((0L, 3L, "a b c")))
    assert(out.count(_.getLong(0) == 3L) == 1)
    val d4 = out.filter(_.getLong(0) == 4L)
    // second chunk = 8 overlap tokens + the 1 new token
    assert(d4.length == 2 && d4(1).getLong(2) == 9L)
  }

  test("chunking with zero overlap partitions the tokens exactly") {
    val docs = Seq((1L, (1 to 50).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", 16)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(16L, 16L, 16L, 2L))
    assert(out.flatMap(_.getString(3).split(" ")).toSeq == (1 to 50).map(i => s"w$i"))
  }

  // ----------------------------------------------------------- quantization

  test("int8 quantization: bounded reconstruction error, high cosine fidelity") {
    val fid = Quantize.fidelity(Snapshot(spark, sf()).embeddings, "vec_id", "embedding")
      .collect()
    assert(fid.nonEmpty)
    fid.foreach { r =>
      val (scale, err, cos) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // round-to-nearest: every element off by at most scale/2 (clamp only
      // binds at the max element, which quantizes to exactly +-127)
      assert(err <= scale * 0.5 + 1e-9, s"vec ${r.getLong(0)}: err $err vs scale $scale")
      assert(cos >= 0.995, s"vec ${r.getLong(0)}: cos $cos")
    }
  }

  test("quantized top-k recalls the exact float top-k") {
    val e = Snapshot(spark, sf()).embeddings
    val queries = e.where(col("vec_id") < 5)
    val exact = BruteForceKNN.topK(queries, e, "vec_id", "embedding", "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val qc = Quantize.quantize(e, "embedding")
    val approx = Quantize.topKQuantized(
      queries, qc, "vec_id", "embedding", "vec_id", "q_vec", "q_scale", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 $recall")
  }

  test("quantized vectors are 4x slimmer on disk than float32") {
    // the actual scale claim: array<tinyint> + one double vs array<float>
    val e = Snapshot(spark, sf()).embeddings.limit(200)
    val dir = java.nio.file.Files.createTempDirectory("quant").toString
    e.select("vec_id", "embedding").write.mode("overwrite").parquet(s"$dir/f32")
    Quantize.quantize(e, "embedding").select("vec_id", "q_vec", "q_scale")
      .write.mode("overwrite").parquet(s"$dir/i8")
    def bytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val (f32, i8) = (bytes(s"$dir/f32"), bytes(s"$dir/i8"))
    assert(i8.toDouble / f32 < 0.5, s"i8 $i8 vs f32 $f32") // <0.5 despite parquet overheads
  }

  test("quantized IVF index: 4x slimmer on disk, high recall vs the float index") {
    import graft.operators.ann.IvfKNN
    val e = Snapshot(spark, sf()).embeddings
    val idx = IvfKNN.buildIndex(e, "vec_id", "embedding", nLists = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfq").toString
    IvfKNN.save(idx, dir)
    IvfKNN.saveQuantized(idx, dir)
    def bytes(sub: String): Long = {
      var sum = 0L
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/$sub")).forEach { p =>
        if (p.toString.endsWith(".parquet")) sum += p.toFile.length()
      }
      sum
    }
    assert(bytes("assigned_q").toDouble / bytes("assigned") < 0.55,
      s"q ${bytes("assigned_q")} vs f32 ${bytes("assigned")}")

    val queries = e.where(col("vec_id") < 5)
    def hits(ix: IvfKNN.Index) =
      IvfKNN.search(ix, queries, "vec_id", "embedding", k = 10, nProbe = 4)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val f32 = hits(IvfKNN.load(spark, dir))
    val i8 = hits(IvfKNN.loadQuantized(spark, dir))
    // same cells probed (assignment is full-precision on both paths);
    // only in-cell similarity sees quantized vectors
    val recall = f32.intersect(i8).size.toDouble / f32.size
    assert(recall >= 0.9, s"recall $recall")

    // appended batches must reach EVERY stored representation — a
    // quantized index silently losing appends would be a recall leak
    val extra = e.where(col("vec_id") < 5).withColumn("vec_id", col("vec_id") + 100000L)
    IvfKNN.appendToSaved(spark, dir, extra, "vec_id", "embedding")
    val nF = IvfKNN.load(spark, dir).assigned.where(col("neighbor_id") >= 100000L).count()
    val nQ = IvfKNN.loadQuantized(spark, dir).assigned.where(col("neighbor_id") >= 100000L).count()
    assert(nF == 5L && nQ == 5L, s"float $nF quantized $nQ")
  }

  // ----------------------------------------------------------------- mixing

  test("balanced mix equalizes group sizes; smallest group kept in full; deterministic") {
    val d = Snapshot(spark, sf()).documents
    val kept = Mixing.balancedSample(d, "doc_id", "lang")
    val counts = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val orig = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    val nmin = orig.values.min
    // the min group's bound is exactly 2^24 (exact double division), so it
    // is kept deterministically in full — not just in expectation
    assert(counts(orig.minBy(_._2)._1) == nmin)
    counts.foreach { case (lang, n) =>
      assert(math.abs(n - nmin) <= math.max(8L, (0.35 * nmin).toLong), s"$lang: $n vs $nmin")
    }
    val again = Mixing.balancedSample(d, "doc_id", "lang")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == kept.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("mix samplers drop null-group rows (documented contract)") {
    val d = Seq((1L, "en"), (2L, null), (3L, "en"), (4L, "de"))
      .toDF("doc_id", "lang")
    val bal = Mixing.balancedSample(d, "doc_id", "lang").select("doc_id").as[Long].collect()
    assert(!bal.contains(2L))
    val tgt = Mixing.targetMix(d, "doc_id", "lang", Seq("en" -> 0.5, "de" -> 0.5))
      .select("doc_id").as[Long].collect()
    assert(!tgt.contains(2L))
  }

  test("target mix hits declared shares and drops unweighted groups") {
    val d = Snapshot(spark, sf()).documents
    val kept = Mixing.targetMix(d, "doc_id", "lang", Seq("en" -> 0.7, "de" -> 0.3))
    val counts = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("en", "de"))
    val orig = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    // de binds (n_de/0.3 < n_en/0.7 on this data): rate 1 up to one ulp of
    // the double bound expression
    assert(counts("de") >= orig("de") - 1)
    val expectEn = 0.7 * (orig("de") / 0.3)
    assert(math.abs(counts("en") - expectEn) < 0.25 * expectEn, s"en ${counts("en")} vs $expectEn")
  }

  test("temperatureWeights: exact sqrt-weights on perfect squares, flattening direction") {
    // counts 4 and 9: sqrt = 2 and 3, total 5 — every value exact in IEEE
    val docs = ((1 to 4).map(i => (i.toLong, "sq4")) ++ (1 to 9).map(i => (100L + i, "sq9")))
      .toDF("doc_id", "source")
    val got = graft.operators.sample.Mixing
      .temperatureWeights(docs.withColumn("text", lit("x")), "source", 10L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(("sq4", 4L, 0.4, 4L), ("sq9", 9L, 0.6, 6L)), got.toSeq)
    // flattening: the small source's weight share EXCEEDS its count
    // share (4/13 ≈ 0.308 < 0.4), the alpha-sampling point
    assert(0.4 > 4.0 / 13.0)
  }
}
