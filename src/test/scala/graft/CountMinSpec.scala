package graft

import org.apache.spark.sql.Encoders

import graft.operators.sketch.{CMSketch, CountMin}

/** Gates for the Count–Min sketch (B120): the one-sided estimate
  * guarantee, the cell-exact associative merge (the property D30 rides),
  * and geometry hygiene.
  */
class CountMinSpec extends SparkSpecBase {
  import spark.implicits._

  private val words: Seq[String] =
    Seq.fill(50)("spark") ++ Seq.fill(30)("join") ++ Seq.fill(7)("stream") ++
      Seq.fill(1)("rare") ++ (1 to 40).map(i => s"noise$i")

  test("estimates are one-sided: est >= exact for every term, n absorbed") {
    val sk = words.toDS().select(new CountMin(4, 256).toColumn).first()
    assert(sk.n == words.size)
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (t, c) =>
      assert(sk.estimate(t) >= c, s"$t: ${sk.estimate(t)} < $c")
    }
    // absent terms can only read colliding mass, never negative
    assert(sk.estimate("never-seen") >= 0L)
  }

  test("merge is cell-exact and associative: batched == one-shot") {
    def sketch(ws: Seq[String]): CMSketch =
      ws.toDS().select(new CountMin(4, 256).toColumn).first()
    val (p1, rest) = words.splitAt(40)
    val (p2, p3) = rest.splitAt(45)
    val oneShot = sketch(words)
    val leftFold = sketch(p1).merged(sketch(p2)).merged(sketch(p3))
    val rightFold = sketch(p1).merged(sketch(p2).merged(sketch(p3)))
    assert(leftFold == oneShot)
    assert(rightFold == oneShot)
  }

  test("null terms are skipped; geometry mismatch is rejected") {
    val sk = Seq[String]("a", null, "a")
      .toDS().select(new CountMin(2, 16).toColumn).first()
    assert(sk.n == 2L && sk.estimate("a") >= 2L)
    intercept[IllegalArgumentException] {
      sk.merged(CMSketch(2, 32, 0L, Seq.fill(64)(0L)))
    }
  }

  test("cellIndex is deterministic, in range, and row-diverse") {
    val terms = Seq("spark", "join", "stream", "Ünïcode", "")
    terms.foreach { t =>
      (0 until 4).foreach { r =>
        val i = CountMin.cellIndex(t, r, 1024)
        assert(i >= 0 && i < 1024)
        assert(i == CountMin.cellIndex(t, r, 1024))
      }
    }
    // the 4 row functions should not all collapse to one index
    val idx = (0 until 4).map(r => CountMin.cellIndex("spark", r, 1024))
    assert(idx.distinct.size > 1, s"row hashes degenerate: $idx")
  }
}
