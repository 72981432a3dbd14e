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
      val coverage = windows.head._1 == 0 &&
        windows.last._2 == n || windows.last._1 < n // every token reachable
      val covered = Array.fill(n)(false)
      windows.foreach { case (s, e) => (s until math.min(e, n)).foreach(covered(_) = true) }
      val overlapOk = windows.sliding(2).forall {
        case Seq((s1, e1), (s2, _)) =>
          // consecutive windows share exactly `overlap` tokens when full
          s2 == s1 + stride && (e1 < n || e1 - s2 >= 0)
        case _ => true
      }
      val newTokenOk = windows.forall { case (s, e) => e > s } &&
        windows.lastOption.forall { case (s, _) => s < n || n == 0 }
      coverage && covered.forall(identity) && overlapOk && newTokenOk
    })
  }

  test("z-value bucket is the count of boundaries below the value, and interleave is invertible") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.DoubleType
    val gen = for {
      bits <- Gen.choose(1, 6)
      nb = (1 << bits) - 1
      raw <- Gen.listOfN(nb, Gen.choose(-1000.0, 1000.0))
      bnds = raw.sorted
      x <- Gen.choose(-1100.0, 1100.0)
      y <- Gen.choose(-1100.0, 1100.0)
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
      n <- Gen.choose(nmin, 2000000L)
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
