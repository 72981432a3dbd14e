package graft

import graft.operators.stats.Stats

class SpearmanSpec extends SparkSpecBase {
  import spark.implicits._

  private def rho(rows: Seq[(String, Double, Double)]): Map[String, Option[Double]] =
    Stats.spearmanByGroup(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  /** Independent plain-Scala Spearman (average ranks, textbook Pearson
    * on them) for approximate cross-checks. */
  private def reference(xs: Seq[Double], ys: Seq[Double]): Double = {
    def avgRanks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted
      v.map { x =>
        val lo = sorted.indexOf(x) + 1
        val hi = sorted.lastIndexOf(x) + 1
        (lo + hi) / 2.0
      }
    }
    val (rx, ry) = (avgRanks(xs), avgRanks(ys))
    val n = xs.size.toDouble
    val (mx, my) = (rx.sum / n, ry.sum / n)
    val num = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum) *
      math.sqrt(ry.map(b => (b - my) * (b - my)).sum)
    num / den
  }

  test("perfect monotone association is exactly 1, even when nonlinear") {
    // y = x^3: Pearson r < 1, Spearman rho == 1 (identical rank vectors
    // make the corr chain collapse to num/num)
    val cubic = Seq(("g", 1.0, 1.0), ("g", 2.0, 8.0), ("g", 3.0, 27.0), ("g", 4.0, 64.0))
    assert(rho(cubic) == Map("g" -> Some(1.0)))
    val pearson = Stats.regression(
      cubic.toDF("g", "x", "y"), "x", "y", Seq("g")).collect().head
    assert(pearson.getDouble(6) < 1.0, "Pearson on the raw values is < 1")
  }

  test("reversed order is exactly -1; constant column is NULL") {
    assert(rho(Seq(("r", 1.0, 9.0), ("r", 2.0, 5.0), ("r", 3.0, 1.0)))
      == Map("r" -> Some(-1.0)))
    assert(rho(Seq(("c", 1.0, 7.0), ("c", 2.0, 7.0), ("c", 3.0, 7.0)))
      == Map("c" -> None))
  }

  test("tie handling: average ranks, cross-checked against an independent implementation") {
    val xs = Seq(1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 4.0)
    val ys = Seq(2.0, 1.0, 4.0, 4.0, 3.0, 5.0, 5.0)
    val got = rho(xs.zip(ys).map { case (x, y) => ("t", x, y) })("t").get
    assert(math.abs(got - reference(xs, ys)) < 1e-7, s"got $got vs ${reference(xs, ys)}")
  }

  test("groups are independent; NULL rows drop") {
    val df = Seq(
      (Some("a"), Some(1.0), Some(1.0)), (Some("a"), Some(2.0), Some(2.0)),
      (Some("a"), Some(3.0), Some(3.0)),
      (Some("b"), Some(1.0), Some(3.0)), (Some("b"), Some(2.0), Some(2.0)),
      (Some("b"), Some(3.0), Some(1.0)),
      (None, Some(1.0), Some(1.0)), (Some("a"), None, Some(1.0)),
      (Some("b"), Some(9.0), None)).toDF("g", "x", "y")
    val got = Stats.spearmanByGroup(df, Seq("g"), "x", "y").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toMap2
    assert(got == Map("a" -> ((3L, 1.0)), "b" -> ((3L, -1.0))))
  }

  test("sf0.001 catalog q_spearman: bounded in [-1, 1], customers with >= 2 orders present") {
    val rows = SparkEntry.queries("q_spearman")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        val v = r.getDouble(2)
        assert(v >= -1.0 && v <= 1.0, s"rho out of range: $v")
      }
    }
    assert(rows.exists(r => !r.isNullAt(2)), "some customer has a defined rho")
  }

  test("sf0.001 catalog q_trimmed_mean: mean inside the fences, ~90% kept") {
    val rows = SparkEntry.queries("q_trimmed_mean")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val n = sources.Snapshot(spark, sf()).orders
      .where($"o_totalprice".isNotNull).count()
    val kept = rows.map(_.getLong(3)).sum
    assert(kept >= (n * 0.85).toLong && kept <= n, s"kept $kept of $n")
    rows.foreach { r =>
      val (lo, hi, m) = (r.getDouble(1), r.getDouble(2), r.getDouble(4))
      assert(lo <= m && m <= hi, s"trimmed mean $m outside [$lo, $hi]")
    }
  }

  private implicit class ToMap2[K, A, B](rows: Array[(K, A, B)]) {
    def toMap2: Map[K, (A, B)] = rows.map { case (k, a, b) => k -> ((a, b)) }.toMap
  }
}
