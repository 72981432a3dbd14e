package graft

import org.apache.spark.sql.functions.col

import graft.operators.temporal.Trend

class TrendSpec extends SparkSpecBase {
  import spark.implicits._

  private def mk(rows: Seq[(String, Int, Int, Double)]) =
    Trend.mannKendall(rows.toDF("k", "o", "tie", "v"), Seq("k"), "o", "tie", "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getString(5))))
      .toMap

  test("hand-derived statistics: monotone, tied, and tie-corrected series") {
    val rows =
      // strictly increasing n=5: S=10, var18 = 5*4*15 = 300
      Seq.tabulate(5)(i => ("up", i, i, (i + 1).toDouble)) ++
      // strictly decreasing mirror: S=-10
      Seq.tabulate(5)(i => ("down", i, i, (5 - i).toDouble)) ++
      // all tied: S=0, ties cancel var18 to 0 -> z NULL
      Seq.tabulate(5)(i => ("flat", i, i, 7.0)) ++
      // [1,2,2,3]: S=5; tie t=2 -> 18; var18 = 4*3*13 - 18 = 138
      Seq(("mix", 0, 0, 1.0), ("mix", 1, 1, 2.0), ("mix", 2, 2, 2.0), ("mix", 3, 3, 3.0)) ++
      // n=2: below the n>=3 floor, must be absent
      Seq(("tiny", 0, 0, 1.0), ("tiny", 1, 1, 2.0))
    val got = mk(rows)
    assert(!got.contains("tiny"))
    val zUp = 9.0 / math.sqrt(300.0 / 18.0)
    assert(got("up") == ((5L, 10L, 300L, Some(zUp), "inc")))
    assert(got("down") == ((5L, -10L, 300L, Some(-zUp), "dec")))
    assert(got("flat") == ((5L, 0L, 0L, None, "none")))
    val zMix = 4.0 / math.sqrt(138.0 / 18.0)
    assert(got("mix") == ((4L, 5L, 138L, Some(zMix), "none")))
    assert(zMix < 1.96 && zUp > 1.96, "the chosen series must straddle the bar")
  }

  test("input row order cannot change the result; tied order keys sort by the tie column") {
    // (o=1, tie=0, v=9) must precede (o=1, tie=1, v=1) regardless of
    // arrival order — S counts the pair as decreasing
    val base = Seq(("k", 0, 0, 5.0), ("k", 1, 0, 9.0), ("k", 1, 1, 1.0))
    val a = mk(base)
    val b = mk(base.reverse)
    assert(a == b)
    // pairs: (5,9)+1, (5,1)-1, (9,1)-1 -> S = -1
    assert(a("k")._2 == -1L)
  }

  test("NULL keys, orders, ties, and values drop") {
    val df = Seq(
      (Some("k"), Some(1), Some(1), Some(1.0)),
      (Some("k"), Some(2), Some(2), Some(2.0)),
      (Some("k"), Some(3), Some(3), Some(3.0)),
      (None, Some(4), Some(4), Some(4.0)),
      (Some("k"), None, Some(5), Some(5.0)),
      (Some("k"), Some(6), None, Some(6.0)),
      (Some("k"), Some(7), Some(7), None)).toDF("k", "o", "tie", "v")
    val got = Trend.mannKendall(df, Seq("k"), "o", "tie", "v").collect()
    assert(got.length == 1 && got.head.getLong(1) == 3L)
  }

  test("sf0.001 catalog query: S bounded by pair count, var positive, labels consistent") {
    val rows = SparkEntry.queries("q_mann_kendall")(spark, sf()).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, s) = (r.getLong(1), r.getLong(2))
      assert(math.abs(s) <= n * (n - 1) / 2, "S bounded by pair count")
      if (!r.isNullAt(4)) {
        val z = r.getDouble(4)
        val expected = if (z > 1.96) "inc" else if (z < -1.96) "dec" else "none"
        assert(r.getString(5) == expected)
      } else assert(r.getString(5) == "none")
    }
  }

  test("1-point key is dropped before the pair fold, even with predicate pushdown disabled") {
    // sequence(1, size-1) DESCENDS to [1, 0] for a 1-point key and
    // element_at(sp, 0) is an unconditional error — the n >= 3 filter
    // must sit structurally below the projection, not rely on the
    // optimizer pushing a later filter through it (VERDICT r11 item 3).
    // Isolated newSession so the excluded rule cannot leak to parallel
    // suites (the BloomJoin isolation pattern).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.PushDownPredicates")
    import s2.implicits._
    val rows = Seq(("solo", 0, 0, 5.0)) ++
      Seq.tabulate(5)(i => ("up", i, i, (i + 1).toDouble))
    val df = rows.toDF("k", "o", "tie", "v")
    val got = Trend.mannKendall(df, Seq("k"), "o", "tie", "v").collect()
    assert(got.map(_.getString(0)).toSet == Set("up"))
    // the D22 state path reaches the same fold through explode
    val st = Trend.seriesState(df, Seq("k"), "o", "tie", "v")
    val viaState = Trend.mannKendallFromState(st, Seq("k")).collect()
    assert(viaState.map(_.getString(0)).toSet == Set("up"))
  }

  test("theilSen: hand-derived medians; equal-x pairs skipped; catalog row brackets") {
    // (0,0),(1,2),(2,8): slopes 2,4,6 -> lower median 4
    // equal-x key: (0,0),(0,5),(1,3): valid slopes 3, -2 -> lower median -2
    val df = Seq(
      ("a", 0, 1, 0.0), ("a", 1, 2, 2.0), ("a", 2, 3, 8.0),
      ("b", 0, 1, 0.0), ("b", 0, 2, 5.0), ("b", 1, 3, 3.0),
      ("solo", 0, 1, 9.0))
      .toDF("k", "x", "t", "v")
    val got = Trend.theilSen(df, Seq("k"), "x", "t", "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(!got.contains("solo"))
    assert(got("a") == ((3L, 3L, 4.0)))
    assert(got("b") == ((3L, 2L, -2.0)))
    // catalog: per-customer slopes exist and n_slopes <= C(n_points, 2)
    val rows = SparkEntry.queries("q_theil_sen")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (np, ns) = (r.getLong(1), r.getLong(2))
      assert(ns >= 1 && ns <= np * (np - 1) / 2, r.toString)
    }
  }

  test("hodgesLehmann: hand-derived Walsh medians; outlier robustness; singleton") {
    // {1,2,10}: walsh {1, 1.5, 5.5, 2, 6, 10} sorted -> element 3 = 2.0
    // (the outlier 10 cannot drag it; the mean would be 4.33)
    // {1,2,3,4}: 10 walsh averages, lower median (element 5) = 2.5
    // {7}: single value -> hl = 7
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 10.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 7.0))
      .toDF("k", "v")
    val got = Trend.hodgesLehmann(df, Seq("k"), "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got("a") == ((3L, 6L, 2.0)))
    assert(got("b") == ((4L, 10L, 2.5)))
    assert(got("c") == ((1L, 1L, 7.0)))
    // permutation invariance: scrambled input gives identical output
    val scrambled = Trend.hodgesLehmann(
      df.orderBy(col("v").desc), Seq("k"), "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(scrambled == got)
  }
}
