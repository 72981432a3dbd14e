package graft

import graft.operators.stats.{Profiling, Stats}

/** Hand-derived gates for the round-13 effect-size/diagnostic batch:
  * partial correlation (B117), odds ratio / relative risk (B118),
  * Poisson overdispersion (B119), and per-source lexical diversity
  * (C74). IEEE-chain expectations replay the operator's own op
  * sequence.
  */
class EffectSizeSpec extends SparkSpecBase {
  import spark.implicits._

  // ------------------------------------------------------- partial corr

  test("partialCorr: hand case follows the exact sufficient-stat chain") {
    val df = Seq(
      ("r1", 1.0, 2.0, 1.0), ("r2", 2.0, 4.0, 1.0),
      ("r3", 3.0, 5.0, 2.0), ("r4", 4.0, 9.0, 2.0))
      .toDF("k", "x", "y", "z")
    val r = Stats.partialCorr(df, "x", "y", "z").collect().head
    assert(r.getLong(0) == 4L)
    // operator's own IEEE sequence over the exact decimal sums
    val n = 4.0
    val (sx, sy, sz) = (10.0, 20.0, 6.0)
    val (sxx, syy, szz) = (30.0, 126.0, 10.0)
    val (sxy, sxz, syz) = (61.0, 17.0, 34.0)
    val vx = sxx / n - (sx / n) * (sx / n)
    val vy = syy / n - (sy / n) * (sy / n)
    val vz = szz / n - (sz / n) * (sz / n)
    val rxy = (sxy / n - (sx / n) * (sy / n)) / math.sqrt(vx * vy)
    val rxz = (sxz / n - (sx / n) * (sz / n)) / math.sqrt(vx * vz)
    val ryz = (syz / n - (sy / n) * (sz / n)) / math.sqrt(vy * vz)
    val partial = (rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    def hr(v: Double): Double = math.floor(v * 1e4 + 0.5) / 1e4
    assert(r.getDouble(1) == hr(rxy))
    assert(r.getDouble(2) == hr(rxz))
    assert(r.getDouble(3) == hr(ryz))
    assert(r.getDouble(4) == hr(partial))
  }

  test("partialCorr: a +/-1 control correlation NULLs the partial") {
    // z == x exactly -> r_xz = 1 -> denominator arg 0
    val df = Seq(("r1", 1.0, 3.0, 1.0), ("r2", 2.0, 5.0, 2.0),
      ("r3", 3.0, 4.0, 3.0)).toDF("k", "x", "y", "z")
    val r = Stats.partialCorr(df, "x", "y", "z").collect().head
    assert(r.getDouble(2) == 1.0, "r_xz should round to exactly 1")
    assert(r.isNullAt(4))
  }

  test("partialCorr: a constant column NULLs its correlations") {
    val df = Seq(("r1", 1.0, 2.0, 5.0), ("r2", 2.0, 1.0, 5.0))
      .toDF("k", "x", "y", "z")
    val r = Stats.partialCorr(df, "x", "y", "z").collect().head
    assert(!r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  // --------------------------------------------------------- odds ratio

  test("oddsRatio: hand 2x2 gives OR = 4 and RR via the exact chain") {
    val df = (Seq.fill(10)((true, true)) ++ Seq.fill(20)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(40)((false, false)))
      .toDF("e", "o")
    val r = Stats.oddsRatio(df, "e", "o").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 20L, 5L, 40L)))
    assert(r.getDouble(4) == 400.0 / 100.0)
    assert(r.getDouble(5) == (10.0 / 30.0) / (5.0 / 45.0))
  }

  test("oddsRatio: zero off-diagonal cells NULL the ratios") {
    val df = (Seq.fill(5)((true, true)) ++ Seq.fill(5)((false, false)))
      .toDF("e", "o")
    val r = Stats.oddsRatio(df, "e", "o").collect().head
    assert(r.isNullAt(4), "b = c = 0 must NULL the odds ratio")
    assert(r.isNullAt(5), "zero unexposed risk must NULL the relative risk")
  }

  // ----------------------------------------------------- overdispersion

  test("overdispersion: counts [1,3] give dispersion 0.5 exactly") {
    // units: u1 x1 row, u2 x3 rows -> n=2, S1=4, S2=10
    // num = 2*10 - 16 = 4, den = 2*4 = 8 -> 0.5; mean_rate = 2
    val df = (Seq("u1") ++ Seq.fill(3)("u2")).toDF("u")
    val r = Stats.overdispersion(df, "u").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 0.5)
  }

  test("overdispersion: constant counts give dispersion 0; bursty > 1") {
    val flat = (1 to 6).flatMap(i => Seq.fill(2)(s"f$i")).toDF("u")
    assert(Stats.overdispersion(flat, "u").collect().head.getDouble(3) == 0.0)
    val bursty = (Seq.fill(9)("hot") ++ Seq("c1", "c2", "c3")).toDF("u")
    assert(Stats.overdispersion(bursty, "u").collect().head.getDouble(3) > 1.0)
  }

  // --------------------------------------------------------------- grubbs

  test("grubbs: planted extreme follows the exact chain and is selected") {
    // values 1..5 plus 100: n=6, s1=115, s2=10055; m=115/6
    val df = ((1 to 5).map(i => ("g", i.toDouble)) :+ ("g", 100.0)).toDF("g", "v")
    val r = Stats.grubbs(df, "g", "v").collect().head
    assert(r.getLong(1) == 6L && r.getDouble(2) == 1.0 && r.getDouble(3) == 100.0)
    val n = 6.0
    val m = 115.0 / n
    val sd = math.sqrt((10055.0 - n * m * m) / (n - 1.0))
    val g = (100.0 - m) / sd
    def hr(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    def hr2(v: Double) = math.floor(v * 1e2 + 0.5) / 1e2
    assert(r.getDouble(4) == hr2(m) && r.getDouble(5) == hr2(sd))
    assert(r.getDouble(6) == hr(g))
    assert(r.getDouble(7) == 100.0, "the high side wins the deviation compare")
  }

  test("grubbs: low-side extremes win; tiny/constant groups NULL out") {
    val df = (Seq(("lo", -100.0)) ++ (1 to 5).map(i => ("lo", i.toDouble)) ++
      Seq(("tiny", 1.0), ("tiny", 2.0)) ++
      Seq.fill(4)(("flat", 7.0))).toDF("g", "v")
    val rows = Stats.grubbs(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("lo").getDouble(7) == -100.0)
    assert(rows("tiny").isNullAt(6), "n < 3 must NULL G")
    assert(rows("flat").isNullAt(6), "zero sd must NULL G")
  }

  // ------------------------------------------------------------------ vif

  test("vif3: hand case follows the pairwise-correlation identities") {
    val df = Seq(
      ("r1", 1.0, 2.0, 1.0), ("r2", 2.0, 4.0, 1.0),
      ("r3", 3.0, 5.0, 2.0), ("r4", 4.0, 9.0, 2.0))
      .toDF("k", "x", "y", "z")
    val r = Stats.vif3(df, "x", "y", "z").collect().head
    val n = 4.0
    val (sx, sy, sz) = (10.0, 20.0, 6.0)
    val (sxx, syy, szz) = (30.0, 126.0, 10.0)
    val (sxy, sxz, syz) = (61.0, 17.0, 34.0)
    val vx = sxx / n - (sx / n) * (sx / n)
    val vy = syy / n - (sy / n) * (sy / n)
    val vz = szz / n - (sz / n) * (sz / n)
    val rxy = (sxy / n - (sx / n) * (sy / n)) / math.sqrt(vx * vy)
    val rxz = (sxz / n - (sx / n) * (sz / n)) / math.sqrt(vx * vz)
    val ryz = (syz / n - (sy / n) * (sz / n)) / math.sqrt(vy * vz)
    def vif(rab: Double, rac: Double, rbc: Double): Double =
      1.0 / (1.0 - (rab * rab + rac * rac - 2.0 * rab * rac * rbc) /
        (1.0 - rbc * rbc))
    def hr(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    assert(r.getDouble(1) == hr(vif(rxy, rxz, ryz)))
    assert(r.getDouble(2) == hr(vif(rxy, ryz, rxz)))
    assert(r.getDouble(3) == hr(vif(rxz, ryz, rxy)))
    // collinear predictors inflate: y ~ x here, so vif_x and vif_y >> 1
    assert(r.getDouble(1) > 2.0 && r.getDouble(2) > 2.0)
  }

  test("vif3: a perfectly collinear companion pair NULLs the dependent VIFs") {
    // z == x exactly -> r_xz = 1: vif_y's (1 - rxz^2) denominator is 0
    val df = Seq(("r1", 1.0, 3.0, 1.0), ("r2", 2.0, 5.0, 2.0),
      ("r3", 3.0, 4.0, 3.0)).toDF("k", "x", "y", "z")
    val r = Stats.vif3(df, "x", "y", "z").collect().head
    assert(r.isNullAt(2), "vif_y must NULL when its companions are collinear")
  }

  // ------------------------------------------------------- template prefix

  test("templatePrefix: modal share, tiebreak, and the templated flag") {
    val df = Seq(
      ("t", "TEMPLATE HEADER alpha"), ("t", "TEMPLATE HEADER beta"),
      ("t", "TEMPLATE HEADER gamma"), ("t", "something else entirely"),
      ("free", "aa"), ("free", "bb"), ("free", "cc"), ("free", "bb"))
      .toDF("source", "text")
    val out = graft.operators.text.TextStats
      .templatePrefix(df.toDF(), "source", "text", k = 16)
      .collect().map(r => r.getString(0) -> r).toMap
    val t = out("t")
    assert(t.getLong(1) == 4L && t.getLong(2) == 2L)
    assert(t.getString(3) == "TEMPLATE HEADER ")
    assert(t.getDouble(4) == 3.0 / 4.0 && t.getBoolean(5))
    val f = out("free")
    // counts: bb=2, aa=1, cc=1 -> modal bb with share 1/2, not templated
    assert(f.getString(3) == "bb" && f.getDouble(4) == 2.0 / 4.0)
    assert(!f.getBoolean(5), "share must be STRICTLY above 0.5 to flag")
  }

  // -------------------------------------------------- lexical diversity

  test("lexicalDiversityBySource: exact type/hapax counts per source") {
    val df = Seq(
      ("A", "a b a"), ("B", "x y"), ("B", "x z z"))
      .toDF("source", "text")
    val rows = Profiling.lexicalDiversityBySource(df, "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("A")
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L && a.getLong(3) == 1L)
    assert(a.getDouble(4) == 2.0 / 3.0 && a.getDouble(5) == 1.0 / 2.0)
    val b = rows("B")
    // words: x y x z z -> 5 tokens, types {x, y, z}, hapax {y}
    assert(b.getLong(1) == 5L && b.getLong(2) == 3L && b.getLong(3) == 1L)
  }

  test("lexicalDiversityBySource: null text/source rows drop; output source-ordered") {
    val df = Seq(
      (Option("B"), Option("b b")), (Option("A"), Option("a")),
      (Option.empty[String], Option("x")), (Option("C"), Option.empty[String]))
      .toDF("source", "text")
    val rows = Profiling.lexicalDiversityBySource(df, "source", "text").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B"))
  }
}
