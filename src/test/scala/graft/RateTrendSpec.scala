package graft

import org.apache.spark.sql.functions._

import graft.operators.stats.Stats

/** Hand-derived gates for the round-14 rate/agreement batch: Cohen's d
  * / Hedges' g (B132), the paired sign test (B133), the
  * Cochran–Armitage trend test (B134) and Gwet's AC1 (B135). Where the
  * operator's arithmetic is a fixed IEEE chain the expectation replays
  * the SAME op sequence (the AgreementSpec convention).
  */
class RateTrendSpec extends SparkSpecBase {
  import spark.implicits._

  private def hr4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  // ------------------------------------------------------------ Cohen's d

  test("cohensD: hand case replays the welch-order pooled chain") {
    // a: [2,4,6] -> n=3, s1=12, s2=56; b: [1,2,3] -> n=3, s1=6, s2=14
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r = Stats.cohensD(df, "g", "v", "a", "b").collect().head
    val ma = 12.0 / 3.0; val mb = 6.0 / 3.0
    val ssa = 56.0 - 12.0 * ma; val ssb = 14.0 - 6.0 * mb
    val pv = (ssa + ssb) / (3.0 + 3.0 - 2.0)
    val d = (ma - mb) / math.sqrt(pv)
    val g = d * (1.0 - 3.0 / (4.0 * (3.0 + 3.0) - 9.0))
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == hr4(ma) && r.getDouble(3) == hr4(mb))
    assert(r.getDouble(4) == hr4(d), s"d: ${r.getDouble(4)} vs ${hr4(d)}")
    assert(r.getDouble(5) == hr4(g), s"g: ${r.getDouble(5)} vs ${hr4(g)}")
  }

  test("cohensD: constant cohorts (zero pooled variance) and n<2 give NULL d/g") {
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val r1 = Stats.cohensD(const, "g", "v", "a", "b").collect().head
    assert(r1.isNullAt(4) && r1.isNullAt(5))
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 4.0)).toDF("g", "v")
    val r2 = Stats.cohensD(tiny, "g", "v", "a", "b").collect().head
    assert(r2.isNullAt(4) && r2.isNullAt(5))
  }

  // ------------------------------------------------------------ sign test

  test("signTest: zeros and NULLs drop; z = (pos-neg)/sqrt(n) exactly") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(-1.0), Some(0.0), None)
      .toDF("d")
    val r = Stats.signTest(df, "d").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 2.0 / math.sqrt(4.0))
    assert(!r.getBoolean(3)) // 1.0 < 1.96
  }

  test("signTest: all-zero diffs give NULL z; lopsided input flags moved") {
    val zeros = Seq(0.0, 0.0).toDF("d")
    assert(Stats.signTest(zeros, "d").collect().head.isNullAt(2))
    val lop = (1 to 9).map(_.toDouble).toDF("d") // 9 pos, 0 neg: z = 3 > 1.96
    val r = Stats.signTest(lop, "d").collect().head
    assert(r.getDouble(2) == 3.0 && r.getBoolean(3))
  }

  // ------------------------------------------------------- Cochran-Armitage

  test("cochranArmitage: planted dose-response ladder follows the exact chain") {
    // score 1: 2/10, score 2: 5/10, score 3: 8/10
    // N=30 X=15 Sw=60 Sw2=140 Sws=36; t = 36-30 = 6; var = .25*20 = 5
    val rows = Seq.tabulate(10)(i => (1, if (i < 2) 1 else 0)) ++
      Seq.tabulate(10)(i => (2, if (i < 5) 1 else 0)) ++
      Seq.tabulate(10)(i => (3, if (i < 8) 1 else 0))
    val df = rows.toDF("w", "s")
    val r = Stats.cochranArmitage(df, col("w"), col("s")).collect().head
    assert(r.getLong(0) == 30L && r.getLong(1) == 15L)
    val p = 15.0 / 30.0
    val t = 36.0 - 900.0 / 30.0
    val v = p * (1.0 - p) * (140.0 - 3600.0 / 30.0)
    assert(r.getDouble(2) == t / math.sqrt(v))
    assert(r.getBoolean(3)) // z ~ 2.68 > 1.96
  }

  test("cochranArmitage: degenerate rates and constant scores give NULL z") {
    // all success -> p = 1
    val allS = Seq((1, 1), (2, 1), (3, 1)).toDF("w", "s")
    assert(Stats.cochranArmitage(allS, col("w"), col("s"))
      .collect().head.isNullAt(2))
    // one score level -> Var = 0
    val oneW = Seq((2, 0), (2, 1), (2, 1)).toDF("w", "s")
    assert(Stats.cochranArmitage(oneW, col("w"), col("s"))
      .collect().head.isNullAt(2))
  }

  // ------------------------------------------------------------ Gwet AC1

  test("gwetAc1: perfect agreement gives ac1 = 1 exactly") {
    val df = Seq(("a", "a"), ("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val r = Stats.gwetAc1(df, "x", "y").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.0)
    // pe = (1 - (6^2+4^2)/(4*25)) / 1 = 0.48; ac1 = 0.52/0.52 = 1
    assert(r.getDouble(4) == 0.48 && r.getDouble(5) == 1.0)
  }

  test("gwetAc1: hand 2x2 replays the telescoped chance chain") {
    // cells (a,a)=4 (a,b)=1 (b,a)=1 (b,b)=2: N=8, agree=6
    // rows a=5 b=3, cols a=5 b=3 -> rc 10,6 -> S=136
    val rows = Seq.fill(4)(("a", "a")) ++ Seq(("a", "b"), ("b", "a")) ++
      Seq.fill(2)(("b", "b"))
    val r = Stats.gwetAc1(rows.toDF("x", "y"), "x", "y").collect().head
    val po = 6.0 / 8.0
    val pe = (1.0 - 136.0 / 256.0) / 1.0
    assert(r.getDouble(3) == po && r.getDouble(4) == pe)
    assert(r.getDouble(5) == (po - pe) / (1.0 - pe))
  }

  test("gwetAc1: survives the kappa paradox; single class gives NULL") {
    // skewed marginals where kappa collapses: 45 (y,y), 1 (y,n), 4 (n,y)
    val rows = Seq.fill(45)(("y", "y")) ++ Seq(("y", "n")) ++
      Seq.fill(4)(("n", "y"))
    val df = rows.toDF("x", "y")
    val kappa = Stats.cohensKappa(df, "x", "y").collect().head.getDouble(4)
    val ac1 = Stats.gwetAc1(df, "x", "y").collect().head.getDouble(5)
    assert(ac1 > kappa && ac1 > 0.8,
      s"AC1 should stay high where kappa collapses (ac1=$ac1 kappa=$kappa)")
    val mono = Seq(("y", "y"), ("y", "y")).toDF("x", "y")
    assert(Stats.gwetAc1(mono, "x", "y").collect().head.isNullAt(5))
  }

  // ------------------------------------------------------------ Kendall's W

  test("kendallW: perfect concordance gives W = 1 exactly; friedman identity holds") {
    // 3 blocks, 3 treatments, identical ordering in every block
    val rows = for (b <- 1 to 3; (t, v) <- Seq(("x", 1.0), ("y", 2.0), ("z", 3.0)))
      yield (b, t, v * b) // scaled per block — order identical
    val df = rows.toDF("b", "t", "v")
    val w = Stats.kendallW(df, "b", "t", "v").collect().head
    assert(w.getLong(0) == 3L && w.getLong(1) == 3L && w.getDouble(2) == 1.0)
    // chi2_F = m(k-1)·W (different op order — compare within fp slack)
    val chi2 = Stats.friedman(df, "b", "t", "v").collect().head.getDouble(2)
    assert(math.abs(chi2 - 3.0 * 2.0 * w.getDouble(2)) < 1e-12)
  }

  test("kendallW: disagreeing blocks give W in (0,1); all-tied blocks NULL") {
    val rows = Seq(
      (1, "x", 1.0), (1, "y", 2.0), (1, "z", 3.0),
      (2, "x", 3.0), (2, "y", 2.0), (2, "z", 1.0)) // reversed order
    val w = Stats.kendallW(rows.toDF("b", "t", "v"), "b", "t", "v")
      .collect().head
    assert(w.getDouble(2) == 0.0) // exact opposition: rank sums all equal
    val tied = Seq((1, "x", 5.0), (1, "y", 5.0), (1, "z", 5.0))
    assert(Stats.kendallW(tied.toDF("b", "t", "v"), "b", "t", "v")
      .collect().head.isNullAt(2))
  }

  // ------------------------------------------------------------ Ljung-Box

  test("ljungBox: Q replays the acf fold exactly; short series and zero variance NULL") {
    // unit counts 1..6 over units 1..6 (one row per unit repeated u times)
    val rows = (1 to 6).flatMap(u => Seq.fill(u)(u))
    val df = rows.toDF("u")
    val got = Stats.ljungBoxGlobal(df, "u", 3).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    // reference replay with the operator's own IEEE sequence
    val xs = (1 to 6).map(_.toDouble)
    val n = xs.size
    val mean = xs.sum / n // Σ of integers is exact; /n one division
    val devs = xs.map(_ - mean)
    val den = devs.foldLeft(0.0)((a, d) => a + d * d)
    def r(k: Int): Double = {
      val num = devs.dropRight(k).zip(devs.drop(k))
        .foldLeft(0.0) { case (a, (x, y)) => a + x * y }
      num / den
    }
    def q(k: Int): Double =
      n.toDouble * (n.toDouble + 2.0) * (1 to k).foldLeft(0.0)(
        (a, j) => a + r(j) * r(j) / (n.toDouble - j.toDouble))
    (1 to 3).foreach(k => assert(got(k).contains(q(k)), s"lag $k"))
    // n = 3 series: lag-3 Q needs n > 3 — NULL
    val tiny = Seq(1, 2, 2, 3, 3, 3).toDF("u")
    val t = Stats.ljungBoxGlobal(tiny, "u", 3).collect()
    assert(t.count(_.isNullAt(2)) >= 1)
    // constant counts: zero variance — every acf and Q NULL
    val const = Seq(1, 2, 3, 4, 5).toDF("u")
    assert(Stats.ljungBoxGlobal(const, "u", 2).collect().forall(_.isNullAt(2)))
    // EMPTY series: the state-derived path must stay total — n_points 0
    // (the oracle's COUNT-over-empty), every q/exceeds NULL (ADVICE r14)
    val empty = Stats.ljungBoxGlobal(Seq.empty[Int].toDF("u"), "u", 3).collect()
    assert(empty.length == 3)
    assert(empty.forall(r => r.getLong(1) == 0L && r.isNullAt(2) && r.isNullAt(3)))
  }

  // ------------------------------------------------------------ Mood's median

  test("moodsMedian: hand 2-group split gives chi2 = 3 exactly") {
    // a: [1,2,3], b: [4,5,6] -> median element 4 (2·cum ≥ N+1), above = {5,6}
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Stats.moodsMedian(df, "g", "v").collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 4.0)
    assert(r.getDouble(3) == 3.0)
  }

  // ------------------------------------------------------------ variance ratio

  test("varianceRatio: hand case replays the welch-order chain; degenerates NULL") {
    // a: [2,4,6] -> va=4; b: [10,16,22] -> vb=36; F = 1/9
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0),
      ("b", 10.0), ("b", 16.0), ("b", 22.0)).toDF("g", "v")
    val r = graft.operators.stats.Stats
      .varianceRatio(df, "g", "v", "a", "b").collect().head
    assert(r.getDouble(2) == 4.0 && r.getDouble(3) == 36.0)
    assert(r.getDouble(4) == hr4(4.0 / 36.0))
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    assert(graft.operators.stats.Stats
      .varianceRatio(const, "g", "v", "a", "b").collect().head.isNullAt(4))
  }

  // ------------------------------------------------------------ Bartlett

  test("bartlett: equal variances give chi2 exactly 0; unequal replay the chain") {
    // two groups of 3 with identical variance 4.0: sp2 = 4 exactly and
    // the ln terms cancel bit-for-bit (2·ln4 + 2·ln4 == 4·ln4 in IEEE)
    val eq = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0),
      ("b", 12.0), ("b", 14.0), ("b", 16.0)).toDF("g", "v")
    val r = graft.operators.stats.Stats.bartlett(eq, "g", "v").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 4.0 && r.getDouble(3) == 0.0)
    // unequal: a var 4, b: [10, 16, 22] -> var 36; replay the op chain
    val un = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0),
      ("b", 10.0), ("b", 16.0), ("b", 22.0)).toDF("g", "v")
    val r2 = graft.operators.stats.Stats.bartlett(un, "g", "v").collect().head
    val (sw, sl, si) = ((3.0 - 1.0) * 4.0 + (3.0 - 1.0) * 36.0,
      2.0 * math.log(4.0) + 2.0 * math.log(36.0), 1.0 / 2.0 + 1.0 / 2.0)
    val nmk = 6.0 - 2.0
    val sp2 = sw / nmk
    val chi2 = (nmk * math.log(sp2) - sl) /
      (1.0 + (si - 1.0 / nmk) / (3.0 * 1.0))
    assert(r2.getDouble(2) == hr4(sp2) && r2.getDouble(3) == hr4(chi2))
    // a 1-row group makes the statistic undefined
    val tiny = Seq(("a", 1.0), ("a", 3.0), ("b", 9.0)).toDF("g", "v")
    assert(graft.operators.stats.Stats.bartlett(tiny, "g", "v")
      .collect().head.isNullAt(3))
  }

  // ------------------------------------------------------------ cv / cadence

  test("cvByGroup: hand case replays the welch-order chain; degenerates NULL") {
    // a: [2,4,6] -> m=4, va=4, sd=2, cv=0.5, rse=0.5/sqrt(3)
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "v")
    val rows = graft.operators.stats.Stats.cvByGroup(df, "g", "v")
      .orderBy("g").collect()
    val a = rows(0)
    assert(a.getLong(1) == 3L && a.getDouble(2) == 4.0 && a.getDouble(3) == 2.0)
    assert(a.getDouble(4) == 0.5)
    assert(a.getDouble(5) == hr4(0.5 / math.sqrt(3.0)))
    val b = rows(1) // constant group: va = 0 -> NULL spread stats
    assert(b.getDouble(2) == 5.0 && b.isNullAt(3) && b.isNullAt(4))
  }

  test("interarrival: span telescopes the mean; max gap from the sorted fold; singletons drop") {
    val d = java.sql.Date.valueOf(_: String)
    val df = Seq(
      ("c1", d("2020-01-01"), 1L), ("c1", d("2020-01-11"), 2L),
      ("c1", d("2020-01-13"), 3L), // gaps 10, 2 -> span 12, mean 6, max 10
      ("c2", d("2020-05-05"), 4L), // singleton drops
      ("c3", d("2020-02-01"), 5L), ("c3", d("2020-02-01"), 6L)) // same-day: gap 0
      .toDF("k", "dt", "t")
    val got = graft.operators.stats.Stats
      .interarrival(df, Seq("k"), "dt", "t").orderBy("k").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("c1", "c3"))
    val c1 = got(0)
    assert(c1.getLong(1) == 3L && c1.getLong(2) == 12L && c1.getLong(3) == 10L)
    assert(c1.getDouble(4) == 6.0)
    val c3 = got(1)
    assert(c3.getLong(2) == 0L && c3.getLong(3) == 0L && c3.getDouble(4) == 0.0)
  }

  // ------------------------------------------------------------ Page trend

  test("pageTrend: perfectly ordered blocks give the exact hand z; reversal negates it") {
    // 2 blocks, 3 treatments valued ALONG the ordinal: ranks 1,2,3
    // per block -> r2 = 2,4,6; R2 = (4,8,12); L2 = 56; E2 = 48; Var2 = 16
    val inc = for (b <- 1 to 2; (t, v) <- Seq(("1-A", 1.0), ("2-B", 2.0), ("3-C", 3.0)))
      yield (b, t, v * b)
    val r = graft.operators.stats.Stats.pageTrend(
      inc.toDF("b", "t", "v"), "b", "t", "v",
      c => substring(c, 1, 1).cast("int")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L && r.getLong(2) == 56L)
    assert(r.getDouble(3) == (56.0 - 48.0) / math.sqrt(16.0) && r.getBoolean(4))
    val dec = for (b <- 1 to 2; (t, v) <- Seq(("1-A", 3.0), ("2-B", 2.0), ("3-C", 1.0)))
      yield (b, t, v * b)
    val r2 = graft.operators.stats.Stats.pageTrend(
      dec.toDF("b", "t", "v"), "b", "t", "v",
      c => substring(c, 1, 1).cast("int")).collect().head
    assert(r2.getLong(2) == 40L && r2.getDouble(3) == -2.0 && !r2.getBoolean(4))
  }

  test("moodsMedian: all-equal values and single groups give NULL chi2") {
    val eq = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val r1 = Stats.moodsMedian(eq, "g", "v").collect().head
    assert(r1.getDouble(2) == 5.0 && r1.isNullAt(3))
    val one = Seq(("a", 1.0), ("a", 2.0), ("a", 9.0)).toDF("g", "v")
    assert(Stats.moodsMedian(one, "g", "v").collect().head.isNullAt(3))
  }
}
