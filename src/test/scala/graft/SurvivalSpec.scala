package graft

import graft.operators.stats.Survival

class SurvivalSpec extends SparkSpecBase {
  import spark.implicits._

  private def km(rows: Seq[(String, Long, Boolean)]) =
    Survival.kaplanMeier(
      rows.toDF("g", "t", "obs"), Seq("g"), "t", "obs")
      .orderBy("g", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))

  test("textbook curve: events-before-censoring ties, censoring-only rows keep S") {
    // durations (observed): 6(e), 6(e), 6(c), 7(e), 10(c)
    // t=6: n=5 (censored-at-6 still at risk), d=2 -> S = 1 - 2/5 = 0.6
    // t=7: n=2, d=1                          -> S = 0.6 * (1 - 1/2) = 0.3
    // t=10: n=1, d=0, c=1                    -> S unchanged at 0.3
    val got = km(Seq(
      ("g", 6L, true), ("g", 6L, true), ("g", 6L, false),
      ("g", 7L, true), ("g", 10L, false)))
    assert(got.toSeq == Seq(
      ("g", 6L, 5L, 2L, 1L, 1.0 - 2.0 / 5.0),
      ("g", 7L, 2L, 1L, 0L, (1.0 - 2.0 / 5.0) * (1.0 - 1.0 / 2.0)),
      ("g", 10L, 1L, 0L, 1L, (1.0 - 2.0 / 5.0) * (1.0 - 1.0 / 2.0))))
  }

  test("groups are independent risk sets") {
    val got = km(Seq(
      ("a", 1L, true), ("a", 2L, true),
      ("b", 1L, false), ("b", 2L, true)))
    assert(got.toSeq == Seq(
      ("a", 1L, 2L, 1L, 0L, 0.5),
      ("a", 2L, 1L, 1L, 0L, 0.0),
      ("b", 1L, 2L, 0L, 1L, 1.0),
      ("b", 2L, 1L, 1L, 0L, 0.0)))
  }

  test("all-censored group stays at survival 1.0; NULL rows drop") {
    val df = Seq(
      (Some("c"), Some(3L), Some(false)), (Some("c"), Some(9L), Some(false)),
      (None, Some(1L), Some(true)), (Some("c"), None, Some(true)),
      (Some("c"), Some(5L), None)).toDF("g", "t", "obs")
    val got = Survival.kaplanMeier(df, Seq("g"), "t", "obs")
      .orderBy("g", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.toSeq == Seq(("c", 3L, 2L, 1.0), ("c", 9L, 1L, 1.0)))
  }

  test("log-rank: hand-derived two-group case, fold-order-exact") {
    // A: 1(e), 2(e); B: 1(c), 2(e), 3(e) — combined spine t=1,2,3
    // risk: A 2,1,0 / B 3,2,1; totals d 1,2,1 / n 5,3,1
    val df = Seq(
      ("A", 1L, true), ("A", 2L, true),
      ("B", 1L, false), ("B", 2L, true), ("B", 3L, true)).toDF("g", "t", "obs")
    val got = Survival.logRank(df, "g", "t", "obs").orderBy("g").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("A", 2L, 2L), ("B", 3L, 2L)))
    // the operator's own IEEE sequence, folded in t order from 0.0
    val uA = 0.0 + (1.0 - 1.0 * 2.0 / 5.0) + (1.0 - 2.0 * 1.0 / 3.0) +
      (0.0 - 1.0 * 0.0 / 1.0)
    val vA = 0.0 +
      1.0 * (2.0 / 5.0) * (1.0 - 2.0 / 5.0) * ((5.0 - 1.0) / (5.0 - 1.0)) +
      2.0 * (1.0 / 3.0) * (1.0 - 1.0 / 3.0) * ((3.0 - 2.0) / (3.0 - 1.0)) + 0.0
    val a = got.head
    assert(a.getDouble(3) == uA, s"u_stat ${a.getDouble(3)} != $uA")
    assert(a.getDouble(4) == vA, s"v_stat ${a.getDouble(4)} != $vA")
    assert(a.getDouble(5) == uA / math.sqrt(vA))
    assert(a.getDouble(6) == (uA / math.sqrt(vA)) * (uA / math.sqrt(vA)))
    // two-group antisymmetry (up to fp association): U_B ~ -U_A, V_B ~ V_A
    val b = got.last
    assert(math.abs(b.getDouble(3) + uA) < 1e-12)
    assert(math.abs(b.getDouble(4) - vA) < 1e-12)
  }

  test("log-rank: a lone group vs an empty rest has zero variance and NULL z") {
    val df = Seq(("only", 1L, true), ("only", 2L, true), ("only", 3L, false))
      .toDF("g", "t", "obs")
    val got = Survival.logRank(df, "g", "t", "obs").collect()
    assert(got.length == 1)
    assert(got.head.getDouble(3) == 0.0, "observed == expected when group is everyone")
    assert(got.head.getDouble(4) == 0.0)
    assert(got.head.isNullAt(5) && got.head.isNullAt(6))
  }

  test("sf0.001 catalog q_logrank: group-vs-rest statistics are internally consistent") {
    val rows = SparkEntry.queries("q_logrank")(spark, sf()).collect()
    assert(rows.length >= 2, "need multiple first-type cohorts")
    // per-time contributions sum to zero across groups => sum U_g ~ 0
    assert(math.abs(rows.map(_.getDouble(3)).sum) < 1e-6)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0, "variance nonnegative")
      if (!r.isNullAt(5))
        assert(r.getDouble(6) == r.getDouble(5) * r.getDouble(5), "chi2 == z^2")
    }
    // subject counts re-add to the population
    val subjTotal = rows.map(_.getLong(1)).sum
    assert(subjTotal > 0 && rows.map(_.getLong(2)).sum <= subjTotal)
  }

  test("sf0.001 catalog query: curves nonincreasing, risk sets telescope, both classes present") {
    val rows = SparkEntry.queries("q_survival")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val byGroup = rows.groupBy(_.getString(0))
    for ((g, rs) <- byGroup) {
      val sorted = rs.sortBy(_.getLong(1))
      val surv = sorted.map(_.getDouble(5))
      assert(surv.zip(surv.tail).forall { case (a, b) => b <= a },
        s"group $g: survival must be nonincreasing")
      // risk set telescopes: n_{i+1} == n_i - d_i - c_i
      val ok = sorted.zip(sorted.tail).forall { case (a, b) =>
        b.getLong(2) == a.getLong(2) - a.getLong(3) - a.getLong(4) }
      assert(ok, s"group $g: risk sets must telescope by d+c")
      assert(sorted.head.getLong(2) == sorted.map(r => r.getLong(3) + r.getLong(4)).sum,
        s"group $g: first risk set must equal the group's subject count")
    }
    assert(rows.map(_.getLong(3)).sum > 0, "some events observed")
    assert(rows.map(_.getLong(4)).sum > 0, "some subjects censored")
  }
}
