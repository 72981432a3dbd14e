package graft

import graft.operators.temporal.Forecast

class ForecastSpec extends SparkSpecBase {
  import spark.implicits._

  /** The operator's exact IEEE op sequence (Forecast scaladoc): expanded
    * trend form, zero-trend init.
    */
  private def refHolt(xs: Seq[Double], a: Double, oma: Double,
      bt: Double, omb: Double): (Double, Double) =
    xs.tail.foldLeft((xs.head, 0.0)) { case ((l, b), x) =>
      val nl = a * x + oma * (l + b)
      val nb = bt * (a * (x - l) + oma * b) + omb * b
      (nl, nb)
    }

  test("bit-exact parity with the in-memory fold, order scrambled on input") {
    val rnd = new scala.util.Random(11)
    val series = (1 to 25).map(i => (i, rnd.nextDouble() * 100))
    val df = rnd.shuffle(series).map { case (i, v) => ("k1", i, v) }.toDF("k", "ord", "v")
    val got = Forecast.perKeyHolt(df, Seq("k"), "ord", "ord", "v",
      0.5, 0.5, 0.25, 0.75, horizon = 3).collect().head
    val (l, b) = refHolt(series.sortBy(_._1).map(_._2), 0.5, 0.5, 0.25, 0.75)
    assert(got.getString(0) == "k1" && got.getInt(1) == 25)
    assert(got.getDouble(2) == l) // EXACT double equality
    assert(got.getDouble(3) == b)
    assert(got.getDouble(4) == l + 3.0 * b)
  }

  test("singleton series returns its own value with zero trend") {
    val df = Seq(("k", 1, 42.5)).toDF("k", "ord", "v")
    val r = Forecast.perKeyHolt(df, Seq("k"), "ord", "ord", "v",
      0.5, 0.5, 0.25, 0.75, horizon = 5).collect().head
    assert((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      == ((1, 42.5, 0.0, 42.5)))
  }

  test("constant series keeps zero trend and forecasts the constant exactly") {
    val df = (1 to 9).map(i => ("k", i, 7.25)).toDF("k", "ord", "v")
    val r = Forecast.perKeyHolt(df, Seq("k"), "ord", "ord", "v",
      0.5, 0.5, 0.25, 0.75, horizon = 3).collect().head
    // x - l = 0 every step => l stays x, b stays 0 — exactly, not approximately
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) == ((7.25, 0.0, 7.25)))
  }

  test("alpha=beta=1 degenerates to last value + horizon * last difference") {
    // l_t = x_t, b_t = x_t - x_{t-1}: the analytic naive-trend forecast
    val df = Seq(("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 35.0)).toDF("k", "ord", "v")
    val r = Forecast.perKeyHolt(df, Seq("k"), "ord", "ord", "v",
      1.0, 0.0, 1.0, 0.0, horizon = 2).collect().head
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) == ((35.0, 15.0, 65.0)))
  }

  test("ties break on the tie column; null key/order/tie/value rows drop; keys isolate") {
    val df = Seq(
      (Some("a"), Some(1), Some(10L), Some(4.0)),
      (Some("a"), Some(1), Some(2L), Some(8.0)), // same ord, lower tie folds FIRST
      (Some("a"), Some(2), Some(5L), Some(16.0)),
      (Some("b"), Some(7), Some(1L), Some(42.0)),
      (None, Some(1), Some(1L), Some(1.0)),
      (Some("c"), None, Some(1L), Some(1.0)),
      (Some("c"), Some(1), None, Some(1.0)),
      (Some("c"), Some(1), Some(1L), None)
    ).toDF("k", "ord", "tie", "v")
    val got = Forecast.perKeyHolt(df, Seq("k"), "ord", "tie", "v",
      0.5, 0.5, 0.25, 0.75, horizon = 1)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val (la, _) = refHolt(Seq(8.0, 4.0, 16.0), 0.5, 0.5, 0.25, 0.75)
    assert(got.keySet == Set("a", "b"))
    assert(got("a") == ((3, la)))
    assert(got("b") == ((1, 42.0)))
  }

  /** Holt-Winters reference fold: the operator's exact IEEE op sequence
    * (expanded forms, positional seasonal queue).
    */
  private def refHw(xs: Seq[Double], a: Double, oma: Double,
      bt: Double, omb: Double, g: Double, omg: Double, m: Int)
      : (Double, Double, Vector[Double]) =
    xs.tail.foldLeft((xs.head, 0.0, Vector.fill(m)(0.0))) {
      case ((l, b, q), x) =>
        val s1 = q.head
        val nl = a * (x - s1) + oma * (l + b)
        val nb = bt * (a * (x - s1 - l) + oma * b) + omb * b
        val ns = g * (oma * (x - l - b) + a * s1) + omg * s1
        (nl, nb, q.tail :+ ns)
    }

  test("holt-winters: bit-exact parity with the in-memory fold, scrambled input") {
    val rnd = new scala.util.Random(23)
    // period-4 seasonal signal + trend + noise so every state slot works
    val series = (1 to 30).map(i =>
      (i, 100.0 + 2.0 * i + Seq(10.0, -5.0, 3.0, -8.0)(i % 4) + rnd.nextDouble()))
    val df = rnd.shuffle(series).map { case (i, v) => ("k1", i, v) }.toDF("k", "ord", "v")
    val got = Forecast.perKeyHoltWinters(df, Seq("k"), "ord", "ord", "v",
      0.5, 0.5, 0.25, 0.75, 0.25, 0.75, period = 4, horizon = 4).collect().head
    val (l, b, q) = refHw(series.sortBy(_._1).map(_._2),
      0.5, 0.5, 0.25, 0.75, 0.25, 0.75, 4)
    assert(got.getInt(1) == 30)
    assert(got.getDouble(2) == l && got.getDouble(3) == b)
    // h=4 with m=4 uses queue slot ((4-1) mod 4)+1 = 4 = the freshest push
    assert(got.getDouble(4) == q(3))
    assert(got.getDouble(5) == l + 4.0 * b + q(3))
  }

  test("holt-winters: seasonal queue phase — horizon picks the right slot") {
    val series = (1 to 13).map(i => (i, (i % 3).toDouble * 9.0))
    val df = series.map { case (i, v) => ("k", i, v) }.toDF("k", "ord", "v")
    for (h <- 1 to 3) {
      val got = Forecast.perKeyHoltWinters(df, Seq("k"), "ord", "ord", "v",
        0.5, 0.5, 0.25, 0.75, 0.25, 0.75, period = 3, horizon = h).collect().head
      val (l, b, q) = refHw(series.map(_._2), 0.5, 0.5, 0.25, 0.75, 0.25, 0.75, 3)
      assert(got.getDouble(4) == q((h - 1) % 3), s"horizon $h seasonal slot")
      assert(got.getDouble(5) == l + h.toDouble * b + q((h - 1) % 3))
    }
  }

  test("holt-winters: constant series stays at the constant with zero trend/seasonals") {
    // x - l = 0 and s1 = 0 every step: l stays x, b and seasonals stay 0
    val df = (1 to 12).map(i => ("k", i, 6.5)).toDF("k", "ord", "v")
    val r = Forecast.perKeyHoltWinters(df, Seq("k"), "ord", "ord", "v",
      0.5, 0.5, 0.25, 0.75, 0.25, 0.75, period = 4, horizon = 4).collect().head
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      == ((6.5, 0.0, 0.0, 6.5)))
  }
}
