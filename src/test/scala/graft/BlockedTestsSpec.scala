package graft

import org.apache.spark.sql.functions._

import graft.operators.stats.Stats

/** Hand-derived gates for the round-13 blocked/paired test batch:
  * Friedman (B110), Cochran's Q (B111), mutual-information cells
  * (B112), and Durbin–Watson (B113). Expectations are worked by hand
  * from the classical formulas; where the operator's arithmetic is a
  * fixed IEEE chain the expectation replays the SAME op sequence (the
  * InterpolateSpec convention — never an algebraically-equal
  * rearrangement).
  */
class BlockedTestsSpec extends SparkSpecBase {
  import spark.implicits._

  // ---------------------------------------------------------------- Friedman

  test("friedman: classical no-tie hand case gives chi2_F = 2 exactly") {
    // 3 blocks x 3 treatments; ranks b1/b2: (1,2,3), b3: (3,1,2)
    // R = [5,5,8] -> chi2 = 12/(3*3*4)*114 - 36 = 2
    val df = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 1.0), ("b2", "t2", 2.0), ("b2", "t3", 3.0),
      ("b3", "t1", 3.0), ("b3", "t2", 1.0), ("b3", "t3", 2.0))
      .toDF("b", "t", "v")
    val r = Stats.friedman(df, "b", "t", "v").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0)
  }

  test("friedman: within-block tie uses the doubled average rank") {
    // b1: t1 = t2 = 1 < t3 -> doubled ranks (3, 3, 6); b2 untied (2,4,6).
    // R2 = [5,7,12]; n(k+1) = 8 -> d = [-3,-1,4], sumd2 = 26, num = 52;
    // A2 = 9+9+36+4+16+36 = 110, C2 = 2*3*16 = 96, den = 14;
    // chi2 = 52/14
    val df = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 1.0), ("b1", "t3", 2.0),
      ("b2", "t1", 1.0), ("b2", "t2", 2.0), ("b2", "t3", 3.0))
      .toDF("b", "t", "v")
    val r = Stats.friedman(df, "b", "t", "v").collect().head
    assert(r.getDouble(2) == 52.0 / 14.0)
  }

  test("friedman: incomplete blocks drop from the test") {
    // b2 misses t3 -> only b1 enters; one untied block: R2 = [2,4,6],
    // d = [-2,0,2], num = 2*8 = 16; A2 = 56, C2 = 48, den = 8 -> chi2 = 2
    val df = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 1.0), ("b2", "t2", 2.0))
      .toDF("b", "t", "v")
    val r = Stats.friedman(df, "b", "t", "v").collect().head
    assert(r.getLong(0) == 1L, "only the complete block should count")
    assert(r.getDouble(2) == 2.0)
  }

  test("friedman: fully-tied blocks degenerate the denominator to NULL chi2") {
    // every block ties all k values -> every r2 = k+1 -> A2 = C2
    val df = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 1.0), ("b1", "t3", 1.0),
      ("b2", "t1", 7.0), ("b2", "t2", 7.0), ("b2", "t3", 7.0))
      .toDF("b", "t", "v")
    val r = Stats.friedman(df, "b", "t", "v").collect().head
    assert(r.getLong(0) == 2L && r.isNullAt(2))
  }

  test("friedman: cells aggregate values before ranking") {
    // two rows per (block, treatment) cell sum before the rank:
    // b1 cells (t1 = 1+4 = 5, t2 = 2+2 = 4) -> t2 < t1
    val df = Seq(
      ("b1", "t1", 1.0), ("b1", "t1", 4.0),
      ("b1", "t2", 2.0), ("b1", "t2", 2.0),
      ("b2", "t1", 9.0), ("b2", "t2", 1.0))
      .toDF("b", "t", "v")
    // both blocks rank t2 < t1 -> R2 = [t1: 4+4, t2: 2+2] with k = 2:
    // n(k+1) = 6 -> d = [2,-2], sumd2 = 8, num = 8; A2 = 16+16+4+4 = 40,
    // C2 = 2*2*9 = 36, den = 4 -> chi2 = 2
    val r = Stats.friedman(df, "b", "t", "v").collect().head
    assert(r.getDouble(2) == 2.0)
  }

  // ---------------------------------------------------------------- Cochran Q

  test("cochranQ: classical hand case gives Q = 3 exactly") {
    // rows (1,1,0),(1,0,0),(1,1,1),(0,0,0): C = [3,2,1], N = 6,
    // sumR2 = 14, sumC2 = 14 -> Q = 2*(42-36)/(18-14) = 3
    val df = Seq(
      ("b1", true, true, false),
      ("b2", true, false, false),
      ("b3", true, true, true),
      ("b4", false, false, false))
      .toDF("b", "t1", "t2", "t3")
    val r = Stats.cochranQ(df, "b", Seq("t1", "t2", "t3")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == 3.0)
  }

  test("cochranQ: saturated blocks leave the denominator 0 -> NULL Q") {
    val df = Seq(("b1", true, true), ("b2", false, false))
      .toDF("b", "t1", "t2")
    val r = Stats.cochranQ(df, "b", Seq("t1", "t2")).collect().head
    assert(r.getLong(0) == 2L)
    assert(r.isNullAt(3))
  }

  test("cochranQ: null block or treatment rows drop") {
    val df = Seq(
      (Option("b1"), Option(true), Option(false)),
      (Option.empty[String], Option(true), Option(true)),
      (Option("b3"), Option.empty[Boolean], Option(true)),
      (Option("b4"), Option(false), Option(true)))
      .toDF("b", "t1", "t2")
    val r = Stats.cochranQ(df, "b", Seq("t1", "t2")).collect().head
    assert(r.getLong(0) == 2L, "null-bearing rows must not count as blocks")
  }

  // ------------------------------------------------------------ Durbin-Watson

  test("durbinWatson: hand series [1,2,3,2] gives DW = 1.5 exactly") {
    // mean = 8.000000/4 = 2 exactly; e = [-1,0,1,0] -> den = 2;
    // diffs = [1,1,-1] squared -> num = 3; dw = 1.5
    val df = Seq(
      ("k1", 1, 1, 1.0), ("k1", 2, 2, 2.0), ("k1", 3, 3, 3.0), ("k1", 4, 4, 2.0))
      .toDF("k", "d", "t", "v")
    val r = Stats.durbinWatson(df, Seq("k"), "d", "t", "v").collect().head
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 1.5)
  }

  test("durbinWatson: alternating series pushes DW toward 4, trend toward 0") {
    val alt = Seq.tabulate(20)(i => ("alt", i, i, if (i % 2 == 0) 1.0 else -1.0))
    val trend = Seq.tabulate(20)(i => ("tr", i, i, i.toDouble))
    val df = (alt ++ trend).toDF("k", "d", "t", "v")
    val rows = Stats.durbinWatson(df, Seq("k"), "d", "t", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows("alt") > 3.5, s"alternating DW should approach 4: ${rows("alt")}")
    assert(rows("tr") < 0.5, s"trending DW should approach 0: ${rows("tr")}")
  }

  test("durbinWatson: singleton keys drop; fold order is the (order, tie) sort") {
    val df = Seq(
      ("solo", 1, 1, 5.0),
      // shuffled input order must not change the fold (array_sort owns it)
      ("k1", 3, 3, 3.0), ("k1", 1, 1, 1.0), ("k1", 4, 4, 2.0), ("k1", 2, 2, 2.0))
      .toDF("k", "d", "t", "v")
    val rows = Stats.durbinWatson(df, Seq("k"), "d", "t", "v").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "k1")
    assert(rows.head.getDouble(2) == 1.5)
  }

  // ------------------------------------------------------- mutual information

  test("mutualInformation: 2x2 hand case matches the exact-count formula") {
    val df = (Seq.fill(10)(("a", "p")) ++ Seq.fill(30)(("a", "q")) ++
      Seq.fill(30)(("b", "p")) ++ Seq.fill(30)(("b", "q")))
      .toDF("x", "y")
    val rows = Stats.mutualInformation(df, "x", "y").collect()
    assert(rows.length == 4)
    val byCell = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val aa = byCell(("a", "p"))
    assert(aa.getLong(2) == 10L && aa.getLong(3) == 40L &&
      aa.getLong(4) == 40L && aa.getLong(5) == 100L)
    assert(aa.getDouble(6) == 0.1)
    // operator's own op sequence incl. the floor-formula round
    val raw = 0.1 * math.log((BigInt(10) * BigInt(100)).toDouble /
      (BigInt(40) * BigInt(40)).toDouble)
    val expected = math.floor(raw * 1e4 + 0.5) / 1e4
    assert(aa.getDouble(7) == expected)
    // contributions of an exactly-balanced table sum to ~0 only under
    // independence; here the a-row is skewed, so total MI > 0
    val total = rows.map { r =>
      (r.getLong(2).toDouble / r.getLong(5).toDouble) *
        math.log((BigInt(r.getLong(2)) * BigInt(r.getLong(5))).toDouble /
          (BigInt(r.getLong(3)) * BigInt(r.getLong(4))).toDouble)
    }.sum
    assert(total > 0.0)
  }

  test("mutualInformation: independent table gives all-zero contributions") {
    // perfectly proportional counts -> ratio exactly 1 -> ln = 0
    val df = (Seq.fill(10)(("a", "p")) ++ Seq.fill(20)(("a", "q")) ++
      Seq.fill(20)(("b", "p")) ++ Seq.fill(40)(("b", "q")))
      .toDF("x", "y")
    val rows = Stats.mutualInformation(df, "x", "y").collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getDouble(7) == 0.0))
  }

  test("mutualInformation: output is (x, y)-ordered and null rows drop") {
    val df = Seq(
      (Option("b"), Option("q")), (Option("a"), Option("p")),
      (Option.empty[String], Option("p")), (Option("a"), Option.empty[String]))
      .toDF("x", "y")
    val rows = Stats.mutualInformation(df, "x", "y").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "p"), ("b", "q")))
    assert(rows.forall(_.getLong(5) == 2L))
  }
}
