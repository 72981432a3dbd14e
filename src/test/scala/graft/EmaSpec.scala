package graft

import graft.operators.temporal.Ema

class EmaSpec extends SparkSpecBase {
  import spark.implicits._

  private def refEma(xs: Seq[Double], a: Double, b: Double): Double =
    xs.tail.foldLeft(xs.head)((acc, x) => a * x + b * acc)

  test("bit-exact parity with an in-memory sequential fold, order scrambled on input") {
    val rnd = new scala.util.Random(3)
    val series = (1 to 25).map(i => (i, rnd.nextDouble() * 100))
    val shuffled = rnd.shuffle(series)
    val df = shuffled.map { case (i, v) => ("k1", i, v) }.toDF("k", "ord", "v")
    val got = Ema.perKeyEma(df, Seq("k"), "ord", "ord", "v", 0.25, 0.75)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).head
    val expected = refEma(series.sortBy(_._1).map(_._2), 0.25, 0.75)
    assert(got == (("k1", 25, expected))) // EXACT double equality
  }

  test("ties break on the tie column; singleton series returns its value; null rows drop") {
    val df = Seq(
      (Some("a"), Some(1), Some(10L), Some(4.0)),
      (Some("a"), Some(1), Some(2L), Some(8.0)), // same ord, lower tie → folds FIRST
      (Some("a"), Some(2), Some(5L), Some(16.0)),
      (Some("b"), Some(7), Some(1L), Some(42.0)),
      (None, Some(1), Some(1L), Some(1.0)),
      (Some("c"), None, Some(1L), Some(1.0)),
      (Some("c"), Some(1), Some(1L), None)
    ).toDF("k", "ord", "tie", "v")
    val got = Ema.perKeyEma(df, Seq("k"), "ord", "tie", "v", 0.5, 0.5)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    // a: fold order 8, 4, 16 → ((8*.5+4*.5)=6 → 6*.5+16*.5=11)
    assert(got == Map("a" -> ((3, 11.0)), "b" -> ((1, 42.0))))
  }

  test("alpha=1 tracks the last value exactly") {
    val df = Seq(("k", 1, 3.0), ("k", 2, 99.5), ("k", 3, 7.25)).toDF("k", "ord", "v")
    val got = Ema.perKeyEma(df, Seq("k"), "ord", "ord", "v", 1.0, 0.0)
      .collect().head.getDouble(2)
    assert(got == 7.25)
  }
}
