package graft

import org.apache.spark.sql.functions._

import graft.operators.stats.{Drift, Stats}

/** Hand-derived gates for the round-13 agreement/consistency batch:
  * Fleiss' kappa (B114), Cronbach's alpha (B115), and the Hellinger
  * category divergence (B116). Where the operator's arithmetic is a
  * fixed IEEE chain the expectation replays the SAME op sequence.
  */
class AgreementSpec extends SparkSpecBase {
  import spark.implicits._

  // ------------------------------------------------------------ Fleiss kappa

  test("weightedKappa: hand 2x2 case, perfect agreement = 1, degenerate NULL, merge parity") {
    // cells (0,0):2, (0,1):1, (1,1):3 -> N=6, sum_wn=1;
    // den = r0*c1 + r1*c0 = 3*4 + 3*2 = 18; kappa_w = 1 - 6/18
    val df = (Seq.fill(2)((0, 0)) ++ Seq((0, 1)) ++ Seq.fill(3)((1, 1)))
      .toDF("a", "b")
    val r = Stats.weightedKappaFromCells(Stats.agreementCells(df, "a", "b"))
      .collect().head
    assert(r.getLong(r.fieldIndex("n_docs")) == 6L &&
      r.getLong(r.fieldIndex("sum_wn")) == 1L)
    assert(r.getDouble(r.fieldIndex("kappa_w")) == 1.0 - 6.0 / 18.0)
    // perfect agreement on >= 2 categories: sum_wn = 0 -> kappa_w = 1
    val perf = Seq((0, 0), (1, 1), (2, 2)).toDF("a", "b")
    val rp = Stats.weightedKappaFromCells(Stats.agreementCells(perf, "a", "b"))
      .collect().head
    assert(rp.getDouble(rp.fieldIndex("kappa_w")) == 1.0)
    // one shared category: zero expected disagreement -> NULL
    val degen = Seq((2, 2), (2, 2)).toDF("a", "b")
    val rd = Stats.weightedKappaFromCells(Stats.agreementCells(degen, "a", "b"))
      .collect().head
    assert(rd.isNullAt(rd.fieldIndex("kappa_w")))
    // D35 composition: merged half-cells reproduce the one-shot exactly
    val left = (Seq.fill(2)((0, 0)) ++ Seq((0, 1))).toDF("a", "b")
    val right = Seq.fill(3)((1, 1)).toDF("a", "b")
    val merged = Stats.mergeAgreementCells(
      Stats.agreementCells(left, "a", "b"), Stats.agreementCells(right, "a", "b"))
    val rm = Stats.weightedKappaFromCells(merged).collect().head
    assert(rm.getDouble(rm.fieldIndex("kappa_w")) ==
      r.getDouble(r.fieldIndex("kappa_w")))
  }

  test("fleissKappa: 4-item 3-rater hand case gives kappa = 22/82 exactly") {
    // cells: (a,a,a) s2=9; (a,a,b) 5; (b,b,b) 9; (a,b,c) 3 -> sum 26
    // p_o = (26-12)/24; C = [6,5,1] -> sumC2 = 62, p_e = 62/144
    val df = Seq(
      ("i1", "a", "a", "a"), ("i2", "a", "a", "b"),
      ("i3", "b", "b", "b"), ("i4", "a", "b", "c"))
      .toDF("i", "r1", "r2", "r3")
    val r = Stats.fleissKappa(df, "i", Seq("r1", "r2", "r3")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    val po = 14.0 / 24.0
    val pe = 62.0 / 144.0
    assert(r.getDouble(2) == po && r.getDouble(3) == pe)
    assert(r.getDouble(4) == (po - pe) / (1.0 - pe))
  }

  test("fleissKappa: perfect agreement gives kappa = 1 exactly") {
    val df = Seq(("i1", "a", "a", "a"), ("i2", "b", "b", "b"))
      .toDF("i", "r1", "r2", "r3")
    val r = Stats.fleissKappa(df, "i", Seq("r1", "r2", "r3")).collect().head
    assert(r.getDouble(2) == 1.0 && r.getDouble(4) == 1.0)
  }

  test("fleissKappa: a single category from every rater gives NULL kappa") {
    val df = Seq(("i1", "a", "a", "a"), ("i2", "a", "a", "a"))
      .toDF("i", "r1", "r2", "r3")
    val r = Stats.fleissKappa(df, "i", Seq("r1", "r2", "r3")).collect().head
    assert(r.getDouble(3) == 1.0 && r.isNullAt(4))
  }

  test("fleissKappa: items with any NULL rating drop") {
    val df = Seq(
      (Option("i1"), Option("a"), Option("a")),
      (Option("i2"), Option.empty[String], Option("b")),
      (Option.empty[String], Option("a"), Option("b")))
      .toDF("i", "r1", "r2")
    val r = Stats.fleissKappa(df, "i", Seq("r1", "r2")).collect().head
    assert(r.getLong(0) == 1L)
  }

  // --------------------------------------------------------- Cronbach alpha

  test("cronbachAlpha: two perfectly-correlated items follow the exact chain") {
    val df = Seq(("s1", 1.0, 1.0), ("s2", 2.0, 2.0), ("s3", 3.0, 3.0))
      .toDF("s", "x1", "x2")
    val r = Stats.cronbachAlpha(df, "s", Seq("x1", "x2")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    // the operator's own IEEE sequence: Var = sxx/n - (sx/n)^2, fold
    // 0.0 + v1 + v2 in item-name order, one division, floor-round 4
    val v = 14.0 / 3.0 - (6.0 / 3.0) * (6.0 / 3.0)
    val vt = 56.0 / 3.0 - (12.0 / 3.0) * (12.0 / 3.0)
    val ratio = (0.0 + v + v) / vt
    val alpha = (2.0 / 1.0) * (1.0 - ratio)
    assert(r.getDouble(2) == math.floor(ratio * 1e4 + 0.5) / 1e4)
    assert(r.getDouble(3) == math.floor(alpha * 1e4 + 0.5) / 1e4)
    // correlated items halve the summed variance: alpha = 1
    assert(r.getDouble(3) == 1.0)
  }

  test("cronbachAlpha: an anti-correlated pair drives alpha negative") {
    val df = Seq(("s1", 1.0, 3.0), ("s2", 2.0, 2.0), ("s3", 3.0, 1.0))
      .toDF("s", "x1", "x2")
    // totals are constant -> Var_t = 0 -> NULL (degenerate guard)
    val r = Stats.cronbachAlpha(df, "s", Seq("x1", "x2")).collect().head
    assert(r.isNullAt(3), "zero total variance must NULL alpha")
    // a nearly-cancelling pair: totals barely vary, alpha << 0
    val df2 = Seq(("s1", 1.0, 3.0), ("s2", 2.0, 2.0), ("s3", 3.0, 1.5))
      .toDF("s", "x1", "x2")
    val r2 = Stats.cronbachAlpha(df2, "s", Seq("x1", "x2")).collect().head
    assert(r2.getDouble(3) < 0.0)
  }

  test("cronbachAlpha: an out-of-decimal-range item RAISES, never silently drops") {
    // the hhi rule: ANSI-off DECIMAL(18,6) overflow would NULL the
    // subject out of every sum silently — the guard raises instead
    val df = Seq(("s1", 1.0, 2.0), ("s2", 1.0e12, 1.0)).toDF("s", "x1", "x2")
    val e = intercept[Exception] {
      Stats.cronbachAlpha(df, "s", Seq("x1", "x2")).collect()
    }
    assert(e.getMessage != null)
  }

  test("cronbachAlpha: NULL subject or item rows drop") {
    val df = Seq(
      (Option("s1"), Option(1.0), Option(2.0)),
      (Option("s2"), Option(2.0), Option(1.0)),
      (Option.empty[String], Option(9.0), Option(9.0)),
      (Option("s4"), Option.empty[Double], Option(5.0)))
      .toDF("s", "x1", "x2")
    val r = Stats.cronbachAlpha(df, "s", Seq("x1", "x2")).collect().head
    assert(r.getLong(0) == 2L)
  }

  // -------------------------------------------------------------- Hellinger

  test("hellinger: identical distributions give zero contribs and zero total") {
    val base = (Seq.fill(30)("a") ++ Seq.fill(20)("b")).toDF("cat")
    val cur = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).toDF("cat")
    val rows = Drift.hellingerByCategory(base, cur, "cat", topK = 8)
      .orderBy("category").collect()
    // spine = {a, b, __OTHER__}; equal shares -> p == q bit-exact
    assert(rows.length == 3)
    assert(rows.forall(_.getDouble(5) == 0.0))
    assert(rows.forall(_.getDouble(6) == 0.0))
  }

  test("hellinger: disjoint distributions give total = 1 exactly") {
    val base = Seq.fill(10)("a").toDF("cat")
    val cur = Seq.fill(7)("b").toDF("cat")
    val rows = Drift.hellingerByCategory(base, cur, "cat", topK = 8)
      .orderBy("category").collect()
    // cur's 'b' buckets to __OTHER__; p = (1,0), q = (0,1)
    assert(rows.forall(_.getDouble(6) == 1.0))
  }

  test("hellinger: hand case matches the operator's own IEEE sequence") {
    val base = (Seq.fill(10)("a") ++ Seq.fill(30)("b")).toDF("cat")
    val cur = (Seq.fill(20)("a") ++ Seq.fill(20)("b")).toDF("cat")
    val rows = Drift.hellingerByCategory(base, cur, "cat", topK = 8)
      .orderBy("category").collect()
    val byCat = rows.map(r => r.getString(0) -> r).toMap
    def contrib(p: Double, q: Double): Double =
      (math.sqrt(p) - math.sqrt(q)) * (math.sqrt(p) - math.sqrt(q))
    val ca = contrib(10.0 / 40.0, 20.0 / 40.0)
    val cb = contrib(30.0 / 40.0, 20.0 / 40.0)
    val co = contrib(0.0 / 40.0, 0.0 / 40.0)
    assert(byCat("a").getDouble(5) == ca)
    assert(byCat("b").getDouble(5) == cb)
    // fold in category-sorted order: __OTHER__ < a < b (ASCII)
    val total = math.sqrt((0.0 + co + ca + cb) / 2.0)
    assert(byCat("a").getDouble(6) == total)
    assert(total > 0.0 && total < 1.0)
  }
}
