package graft

import graft.operators.stats.Isotonic
import org.apache.spark.sql.functions._

/** B144 — the minimax-identity isotonic fit must equal the classic
  * stack PAV (the fit is unique; both compute pooled means as ONE
  * double division of exact longs, so agreement is bit-level when the
  * block structures coincide), stay monotone, and leave already-
  * monotone inputs untouched.
  */
class IsotonicSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference: sequential pool-adjacent-violators with double means. */
  private def pavRef(cells: Seq[(Double, Long, Long)]): Map[Double, Double] = {
    case class Block(pos: Long, cnt: Long, bins: List[Double]) {
      def mean: Double = pos.toDouble / cnt.toDouble
    }
    val st = scala.collection.mutable.ListBuffer.empty[Block]
    cells.sortBy(_._1).foreach { case (b, p, c) =>
      var blk = Block(p, c, List(b))
      while (st.nonEmpty && st.last.mean > blk.mean) {
        val prev = st.remove(st.length - 1)
        blk = Block(prev.pos + blk.pos, prev.cnt + blk.cnt, prev.bins ++ blk.bins)
      }
      st += blk
    }
    st.flatMap(b => b.bins.map(_ -> b.mean)).toMap
  }

  /** Expand (bin, pos, cnt) cells to row grain and run the operator. */
  private def fit(cells: Seq[(Double, Long, Long)]): Map[Double, Double] = {
    val rows = cells.flatMap { case (b, p, c) =>
      (0L until c).map(i => (b, i < p))
    }
    Isotonic.fitBinned(rows.toDF("score", "lbl"), col("score"), col("lbl"), 3)
      .select("bin", "rate_iso").as[(Double, Double)].collect().toMap
  }

  test("violation pools to the adjacent mean (hand-derived)") {
    // rates .2 / .8 / .4: bins 2+3 pool to (8+4)/20 = 0.6
    val cells = Seq((0.1, 2L, 10L), (0.2, 8L, 10L), (0.3, 4L, 10L))
    assert(fit(cells) == Map(0.1 -> 0.2, 0.2 -> 0.6, 0.3 -> 0.6))
  }

  test("weighted pooling: a light violator merges into the heavy block") {
    // 1/1 then 0/3: pooled mean (1+0)/(1+3) = 0.25 for both bins
    val cells = Seq((0.1, 1L, 1L), (0.2, 0L, 3L))
    assert(fit(cells) == Map(0.1 -> 0.25, 0.2 -> 0.25))
  }

  test("already-monotone input is returned unchanged") {
    val cells = Seq((0.1, 1L, 10L), (0.2, 5L, 10L), (0.3, 9L, 10L))
    assert(fit(cells) == Map(0.1 -> 0.1, 0.2 -> 0.5, 0.3 -> 0.9))
  }

  test("minimax fit == stack PAV on a 20-bin zigzag, and is monotone") {
    // deterministic zigzag with irregular counts — multiple nested pools
    val cells = (0 until 20).map { i =>
      val pos = ((i * 7) % 11 + (if (i % 3 == 0) 5 else 0)).toLong
      val cnt = pos + ((i * 5) % 7 + 1).toLong
      ((i + 1) / 1000.0, pos, cnt)
    }
    val got = fit(cells)
    val want = pavRef(cells)
    assert(got == want, s"minimax vs PAV: ${got.toSeq.sorted} vs ${want.toSeq.sorted}")
    val ordered = got.toSeq.sortBy(_._1).map(_._2)
    assert(ordered == ordered.sorted, s"fit not monotone: $ordered")
  }
}
