package graft

import graft.operators.temporal.Cusum

class CusumSpec extends SparkSpecBase {
  import spark.implicits._

  /** The operator's exact op sequence: s₀=0, sₜ=max(0, sₜ₋₁+(xₜ−k)). */
  private def refCusum(xs: Seq[Double], k: Double): (Double, Double) = {
    val ss = xs.scanLeft(0.0)((s, x) => math.max(0.0, s + (x - k))).tail
    (ss.last, ss.max)
  }

  test("bit-exact parity with the in-memory recursion, order scrambled on input") {
    val rnd = new scala.util.Random(29)
    val series = (1 to 40).map(i => (i, rnd.nextDouble() * 30))
    val df = rnd.shuffle(series).map { case (i, v) => ("k1", i, v) }.toDF("k", "ord", "v")
    val got = Cusum.perKeyCusum(df, Seq("k"), "ord", "ord", "v", k = 14.0, h = 25.0)
      .collect().head
    val (fin, mx) = refCusum(series.sortBy(_._1).map(_._2), 14.0)
    assert(got.getInt(1) == 40)
    assert(got.getDouble(2) == fin) // EXACT double equality
    assert(got.getDouble(3) == mx)
    assert(got.getBoolean(4) == (mx > 25.0))
  }

  test("the PEAK alarms even after the excursion fully resets (the delayed-max slot)") {
    // k=10: s = 20, 40, 30, 20, 10 -> max 40 while final is 10
    val df = Seq(30.0, 30.0, 0.0, 0.0, 0.0).zipWithIndex
      .map { case (v, i) => ("k", i, v) }.toDF("k", "ord", "v")
    val r = Cusum.perKeyCusum(df, Seq("k"), "ord", "ord", "v", k = 10.0, h = 35.0)
      .collect().head
    assert((r.getDouble(2), r.getDouble(3), r.getBoolean(4)) == ((10.0, 40.0, true)))
  }

  test("an in-control series pins to zero; the alarm threshold is strictly exceeded") {
    val below = (1 to 6).map(i => ("calm", i, 3.0)).toDF("k", "ord", "v")
    val calm = Cusum.perKeyCusum(below, Seq("k"), "ord", "ord", "v", k = 5.0, h = 1.0)
      .collect().head
    assert((calm.getDouble(2), calm.getDouble(3), calm.getBoolean(4)) == ((0.0, 0.0, false)))
    // cusum_max lands EXACTLY on h: strict > must not alarm
    val edge = Seq(("e", 1, 7.0)).toDF("k", "ord", "v")
    val r = Cusum.perKeyCusum(edge, Seq("k"), "ord", "ord", "v", k = 5.0, h = 2.0)
      .collect().head
    assert((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))
      == ((1, 2.0, 2.0, false)))
  }

  test("ties break on the tie column; null rows drop; keys isolate") {
    val df = Seq(
      (Some("a"), Some(1), Some(10L), Some(9.0)),
      (Some("a"), Some(1), Some(2L), Some(20.0)), // lower tie folds FIRST
      (Some("a"), Some(2), Some(5L), Some(1.0)),
      (Some("b"), Some(7), Some(1L), Some(42.0)),
      (None, Some(1), Some(1L), Some(1.0)),
      (Some("c"), None, Some(1L), Some(1.0)),
      (Some("c"), Some(1), Some(1L), None)
    ).toDF("k", "ord", "tie", "v")
    val got = Cusum.perKeyCusum(df, Seq("k"), "ord", "tie", "v", k = 5.0, h = 10.0)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    // a folds 20, 9, 1: s = 15, 19, 15 -> final 15, max 19
    assert(got.keySet == Set("a", "b"))
    assert(got("a") == ((3, 15.0, 19.0)))
    assert(got("b") == ((1, 37.0, 37.0)))
  }

  test("pageHinkley: running-mean walk parity; upward shift alarms, downward does not") {
    // shift-up key: [10,10,10,10,20,20] -> m stays 0 through the stable
    // head, climbs once the shift outruns the running mean; min stays 0.
    // shift-down key: m only falls, min tracks it -> ph_stat ~ 0.
    val df = (Seq(10.0, 10.0, 10.0, 10.0, 20.0, 20.0).zipWithIndex.map {
      case (v, i) => ("up", i, i, v)
    } ++ Seq(20.0, 20.0, 10.0, 10.0).zipWithIndex.map {
      case (v, i) => ("down", i, i, v)
    }).toDF("k", "o", "t", "v")
    val got = Cusum.pageHinkley(df, Seq("k"), "o", "t", "v",
      delta = 0.0, lambda = 10.0)
      .collect().map(r => r.getString(0) -> r).toMap
    // re-derive with the operator's own op sequence
    def trace(vals: Seq[Double]): (Double, Double) = {
      var m = 0.0; var mmin = 0.0; var s = 0.0; var n = 0.0
      vals.foreach { x =>
        val m2 = m + (x - (s + x) / (n + 1.0) - 0.0)
        mmin = math.min(mmin, m); m = m2; s = s + x; n = n + 1.0
      }
      (m, math.min(mmin, m))
    }
    val (mu, mnu) = trace(Seq(10.0, 10.0, 10.0, 10.0, 20.0, 20.0))
    val up = got("up")
    assert(up.getDouble(up.fieldIndex("ph_final")) == mu)
    assert(up.getDouble(up.fieldIndex("ph_min")) == mnu)
    assert(up.getDouble(up.fieldIndex("ph_stat")) == mu - mnu)
    assert(up.getBoolean(up.fieldIndex("alarm")), "upward shift must alarm")
    val down = got("down")
    assert(!down.getBoolean(down.fieldIndex("alarm")),
      "a downward shift must not trip the one-sided increase detector")
    assert(down.getDouble(down.fieldIndex("ph_stat")) <= 1e-9)
  }

  test("ewmaChart: recursion parity with the in-memory fold; sustained shift alarms") {
    // 20 stable cells then a 5-cell sustained shift: z stays exactly at
    // the stable level through t=20 (0.2*10 + 0.8*10 == 10.0 exactly),
    // then climbs toward 20; the retrospective 3-sigma band is wide
    // (sigma sees the shift) but the LAST point must still breach it.
    val vals = Seq.fill(20)(10.0) ++ Seq.fill(5)(20.0)
    val cells = vals.zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("key", "m", "x")
    val out = Cusum.ewmaChart(cells, Seq("key"), "m", "x")
      .orderBy("m").collect()
    assert(out.length == 25)
    // re-derive with the operator's own op sequence
    val n = vals.length.toDouble
    val s1 = vals.foldLeft(0.0)(_ + _)
    val s2 = vals.foldLeft(0.0)((a, x) => a + x * x)
    val mu = s1 / n
    val sigma = math.sqrt(math.max((s2 - s1 * s1 / n) / (n - 1.0), 0.0))
    val om = 1.0 - 0.2
    var z = vals.head; var pw = 1.0
    vals.indices.foreach { i =>
      if (i > 0) z = 0.2 * vals(i) + om * z
      pw = pw * om * om
      val r = out(i)
      assert(r.getDouble(r.fieldIndex("ewma")) == z, s"z at $i")
      val band = 3.0 * sigma * math.sqrt(0.2 / (2.0 - 0.2) * (1.0 - pw))
      assert(r.getDouble(r.fieldIndex("ucl")) == mu + band, s"ucl at $i")
      assert(r.getBoolean(r.fieldIndex("alarm")) == (z > mu + band || z < mu - band))
    }
    // the early plateau is exactly 10.0 (no float creep), and only the
    // tail of the shift breaches the retrospective band
    assert(out.take(20).forall(r => r.getDouble(r.fieldIndex("ewma")) == 10.0))
    assert(!out(19).getBoolean(out(19).fieldIndex("alarm")))
    assert(out.last.getBoolean(out.last.fieldIndex("alarm")),
      "the sustained shift's last point must alarm")
  }

  test("changepoint: hand-derived AMOC argmax, earliest-split tie, catalog row bounds") {
    import graft.operators.temporal.Changepoint
    // [1,1,1,9,9,9]: Q_t = |6*S_t - 30t| peaks at t=3 with 72
    // [0,5,0]: Q_1 = Q_2 = 5 -> earliest split wins
    val df = (Seq.tabulate(6)(i => ("a", i, i, if (i < 3) 1.0 else 9.0)) ++
      Seq(("b", 0, 0, 0.0), ("b", 1, 1, 5.0), ("b", 2, 2, 0.0)) ++
      Seq(("solo", 0, 0, 7.0)))
      .toDF("k", "o", "t", "v")
    val got = Changepoint.amocByKey(df, Seq("k"), "o", "t", "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(!got.contains("solo"), "n = 1 has no split")
    assert(got("a") == ((6L, 3L, 72.0)))
    assert(got("b") == ((3L, 1L, 5.0)))
    // catalog: 1 <= cp_index < n_points, stat >= 0
    val rows = SparkEntry.queries("q_changepoint")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) < r.getLong(1), r.toString)
      assert(r.getDouble(3) >= 0.0)
    }
  }
}
