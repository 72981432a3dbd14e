package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.functions.ZValue

/** Property-based invariants for the pure driver-side kernels — the
  * pieces whose edge cases (tiny docs, odd overlap/chunk combinations,
  * boundary-equal values) are cheap to sweep exhaustively with
  * generators instead of hand-picked examples. Spark-side equivalence is
  * covered by the respective operator specs; here we pin the MATH.
  */
class PropertySpec extends SparkSpecBase {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$name: $r")
  }

  // chunk-count formula mirrored from Chunking (and its DuckDB oracle):
  // max(1, ceil((n - overlap) / stride))
  private def nChunks(n: Int, chunk: Int, overlap: Int): Int = {
    val stride = chunk - overlap
    math.max(1, (n - overlap + stride - 1) / stride)
  }

  test("chunk windows cover every token, overlap exactly, and each adds a new token") {
    val gen = for {
      chunk <- Gen.choose(1, 64)
      overlap <- Gen.choose(0, chunk - 1)
      n <- Gen.choose(1, 500)
    } yield (n, chunk, overlap)
    check("coverage", forAll(gen) { case (n, chunk, overlap) =>
      val stride = chunk - overlap
      val nc = nChunks(n, chunk, overlap)
      val windows = (0 until nc).map { i =>
        val s = i * stride
        (s, math.min(s + chunk, n)) // [start, end) clamped like slice()
      }
      val headTail = windows.head._1 == 0 && windows.last._1 < n
      val covered = Array.fill(n)(false)
      windows.foreach { case (s, e) => (s until math.min(e, n)).foreach(covered(_) = true) }
      val overlapOk = windows.sliding(2).forall {
        case Seq((s1, e1), (s2, _)) =>
          // consecutive windows share EXACTLY `overlap` tokens unless the
          // earlier one was clamped by the document end
          s2 == s1 + stride && (e1 == n || e1 - s2 == overlap)
        case _ => true
      }
      val newTokenOk = windows.forall { case (s, e) => e > s }
      headTail && covered.forall(identity) && overlapOk && newTokenOk
    })
  }

  test("production chunker matches the window model on an exhaustive small grid") {
    // binds the invariants above to Chunking.chunkByTokens itself: one
    // DataFrame of docs with 1..40 tokens, swept across (chunk, overlap)
    // combinations, chunk boundaries compared against the model
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (1 to 40).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    for {
      chunk <- Seq(1, 2, 3, 8, 16)
      overlap <- Seq(0, 1, chunk / 2, chunk - 1).distinct if overlap < chunk
    } {
      val got = graft.operators.text.Chunking
        .chunkByTokens(docs, "doc_id", "text", chunk, overlap)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap
      val stride = chunk - overlap
      (1 to 40).foreach { n =>
        val toks = (1 to n).map(i => s"t$i")
        val want = (0 until nChunks(n, chunk, overlap))
          .map(i => toks.slice(i * stride, math.min(i * stride + chunk, n)).mkString(" "))
        assert(got(n.toLong) == want, s"n=$n chunk=$chunk overlap=$overlap")
      }
    }
  }

  test("z-value bucket is the count of boundaries below the value, and interleave is invertible") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.DoubleType
    val gen = for {
      bits <- Gen.choose(1, 6)
      nb = (1 << bits) - 1
      raw <- Gen.listOfN(nb, Gen.choose(-1000.0, 1000.0))
      bnds = raw.sorted
      // mix boundary-EQUAL values in so the strict-> tie rule (equal goes
      // to the lower bucket) is actually exercised, not hit with p~0
      coord = Gen.frequency(3 -> Gen.choose(-1100.0, 1100.0), 1 -> Gen.oneOf(bnds))
      x <- coord
      y <- coord
    } yield (bits, bnds, x, y)
    check("zvalue", forAll(gen) { case (bits, bnds, x, y) =>
      val z = ZValue(
        Seq(Literal.create(x, DoubleType), Literal.create(y, DoubleType)),
        Seq(bnds, bnds)).eval(null).asInstanceOf[Long]
      // de-interleave and compare against the reference bucket definition
      def deinterleave(j: Int): Int =
        (0 until bits).map(i => (((z >> (i * 2 + j)) & 1L) << i).toInt).sum
      def bucket(v: Double): Int = bnds.count(b => v > b)
      deinterleave(0) == bucket(x) && deinterleave(1) == bucket(y) &&
        z >= 0 && z < (1L << (2 * bits))
    })
  }

  test("mix bound formula: kept fraction tracks the requested rate within hash resolution") {
    // floor(2^24 * nmin / n) as a keep-bound: the implied rate error vs
    // nmin/n is below one part in 2^24 — the documented bound contract
    val gen = for {
      nmin <- Gen.choose(1L, 1000000L)
      // weight the binding-group case (n == nmin) so the kept-in-full
      // clause is really tested, not hit with p ~ 1e-6
      n <- Gen.frequency(4 -> Gen.choose(nmin, 2000000L), 1 -> Gen.const(nmin))
    } yield (nmin, n)
    check("bound", forAll(gen) { case (nmin, n) =>
      val bound = math.floor(16777216.0 * nmin / n)
      val rate = bound / 16777216.0
      val want = nmin.toDouble / n
      bound >= 0 && bound <= 16777216.0 &&
        (want - rate) >= 0 && (want - rate) < 1.0 / 16777216.0 + 1e-12 &&
        (nmin != n || bound == 16777216.0) // smallest group: kept in full
    })
  }
}
