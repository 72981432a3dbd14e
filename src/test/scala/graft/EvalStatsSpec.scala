package graft

import graft.operators.stats.Stats
import org.apache.spark.sql.functions.{col, lit, when}

/** rocAucByGroup + chiSquareCells — the round-10 eval/stat additions.
  * Every expected value is hand-derived with the operator's own IEEE op
  * sequence (SURVEY §5), asserted with EXACT double equality.
  */
class EvalStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def auc(rows: Seq[(String, Long, String)]) =
    Stats.rocAucByGroup(
      rows.toDF("g", "score", "lang"), Seq("g"), "score", col("lang") === "en")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap

  test("perfect separation scores AUC exactly 1; inverted separation exactly 0") {
    val rows = Seq(
      ("hi", 1L, "de"), ("hi", 2L, "de"), ("hi", 3L, "en"), ("hi", 4L, "en"),
      ("lo", 1L, "en"), ("lo", 2L, "en"), ("lo", 3L, "de"), ("lo", 4L, "de"))
    val got = auc(rows)
    assert(got("hi") == ((4L, 2L, Some(1.0))))
    assert(got("lo") == ((4L, 2L, Some(0.0))))
  }

  test("an uninformative (all-tied) score is exactly 0.5 through average ranks") {
    // every score equal: 2*rank-sum identity gives PN/2PN = 0.5 EXACTLY
    val rows = (1 to 8).map(i => ("g", 7L, if (i % 2 == 0) "en" else "de"))
    assert(auc(rows) == Map("g" -> ((8L, 4L, Some(0.5)))))
  }

  test("hand-derived tie case matches the average-rank identity bit for bit") {
    // (score,label): (1,0),(1,1),(2,0),(2,1),(3,1)
    // avg ranks: score1 -> 1.5, score2 -> 3.5, score3 -> 5
    // sum_pos = 1.5+3.5+5 = 10; P=3, N=2
    // auc = (2*10 - 3*4) / (2*3*2) = 8/12
    val rows = Seq(
      ("g", 1L, "de"), ("g", 1L, "en"), ("g", 2L, "de"), ("g", 2L, "en"), ("g", 3L, "en"))
    assert(auc(rows) == Map("g" -> ((5L, 3L, Some(8.0 / 12.0)))))
  }

  test("a one-class group yields NULL (never x/0); groups never mix rows") {
    val rows = Seq(
      ("allpos", 1L, "en"), ("allpos", 2L, "en"),
      ("allneg", 1L, "de"), ("allneg", 2L, "de"),
      ("ok", 1L, "de"), ("ok", 2L, "en"))
    val got = auc(rows)
    assert(got("allpos") == ((2L, 2L, None)))
    assert(got("allneg") == ((2L, 0L, None)))
    assert(got("ok") == ((2L, 1L, Some(1.0))))
  }

  private def chi(rows: Seq[(String, String)]) =
    Stats.chiSquareCells(rows.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))).toMap

  test("hand-derived 2x2 contingency: expected and contrib via the exact IEEE sequence") {
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
        Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val got = chi(rows)
    // rows a=30 b=70; cols x=40 y=60; n=100
    def e(r: Long, c: Long): Double = (r.toDouble * c.toDouble) / 100.0
    def contrib(o: Long, ex: Double): Double = (o.toDouble - ex) * (o.toDouble - ex) / ex
    assert(got(("a", "x")) == ((10L, 30L, 40L, 100L, e(30, 40), contrib(10, e(30, 40)))))
    assert(got(("b", "y")) == ((40L, 70L, 60L, 100L, e(70, 60), contrib(40, e(70, 60)))))
  }

  test("an exactly independent table contributes zero in every cell") {
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
        Seq.fill(20)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val got = chi(rows)
    assert(got.values.forall(_._6 == 0.0))
    assert(got(("a", "x"))._5 == 10.0) // E = 30*30/90
  }

  test("null categories drop from the contingency entirely") {
    val rows = Seq(
      (Some("a"), Some("x")), (Some("a"), Some("x")),
      (Some("a"), None), (None, Some("x")))
      .toDF("a", "b")
    val got = Stats.chiSquareCells(rows, "a", "b").collect()
    assert(got.length == 1 && got.head.getLong(2) == 2L && got.head.getLong(5) == 2L)
  }

  test("NULL labels are dropped, not silently scored as negatives") {
    // count(lit(1)) would count a NULL-label row that sum(label) skips;
    // the operator filters labelCol.isNotNull instead (ADVICE r11)
    val rows = Seq(
      ("g", 1L, Some("de")), ("g", 2L, Some("de")),
      ("g", 3L, Some("en")), ("g", 4L, Some("en")),
      ("g", 5L, None))
    val got = Stats.rocAucByGroup(
      rows.toDF("g", "score", "lang"), Seq("g"), "score", col("lang") === "en")
      .collect()
    assert(got.length == 1)
    // n = 4 (the NULL-label row is gone), and the clean rows still
    // separate perfectly
    assert(got.head.getLong(1) == 4L && got.head.getLong(2) == 2L &&
      got.head.getDouble(3) == 1.0)
  }

  test("mannWhitney: hand-derived U and z, with and without ties") {
    // A=[1,2], B=[3,4]: U_a = 0; z = -4 / (2*sqrt(4/12*(5 - 0/12)))
    val d1 = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)).toDF("g", "v")
    val r1 = Stats.mannWhitney(d1, "g", "v", "A", "B").collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == ((2L, 2L, 0L)))
    val z1 = -4.0 / (2.0 * math.sqrt(4.0 / 12.0 * (5.0 - 0.0 / 12.0)))
    assert(r1.getDouble(3) == z1)
    // ties: A=[1,1], B=[1,2]: R2a=8, U_a=1, ties=24, var=1, z=-1
    val d2 = Seq(("A", 1.0), ("A", 1.0), ("B", 1.0), ("B", 2.0)).toDF("g", "v")
    val r2 = Stats.mannWhitney(d2, "g", "v", "A", "B").collect().head
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == ((2L, 2L, 1L)))
    assert(r2.getDouble(3) == -1.0)
    // all-tied: variance degenerates -> NULL z
    val d3 = Seq(("A", 7.0), ("A", 7.0), ("B", 7.0)).toDF("g", "v")
    val r3 = Stats.mannWhitney(d3, "g", "v", "A", "B").collect().head
    assert(r3.isNullAt(3))
  }

  test("anovaOneWay: hand-derived F; degenerate within-variance yields NULL") {
    // A=[1,2,3], B=[4,5,6]: SSB=13.5, SSW=4, F=(13.5/1)/(4/4)=13.5
    val d1 = (Seq(1, 2, 3).map(v => ("A", v.toDouble)) ++
      Seq(4, 5, 6).map(v => ("B", v.toDouble))).toDF("g", "v")
    val r1 = Stats.anovaOneWay(d1, "g", "v").collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getDouble(2)) == ((2L, 6L, 13.5)))
    // zero within-group variance -> SSW = 0 -> NULL
    val d2 = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0)).toDF("g", "v")
    assert(Stats.anovaOneWay(d2, "g", "v").collect().head.isNullAt(2))
    // one group -> NULL
    val d3 = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v")
    assert(Stats.anovaOneWay(d3, "g", "v").collect().head.isNullAt(2))
  }

  test("ksTwoSample: hand-derived distance with the min-value tiebreak") {
    import graft.operators.stats.Drift
    // A=[1,2,3], B=[2,3,4] -- expected d computed with the operator's
    // own IEEE op sequence (1/3 is not exact; fractions would be an
    // ulp off, the q_interpolate lesson)
    val df = (Seq(1, 2, 3).map(v => ("A", v.toDouble)) ++
      Seq(2, 3, 4).map(v => ("B", v.toDouble))).toDF("g", "v")
    val r = Drift.ksTwoSample(df, "g", "v", "A", "B").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    val ds = Seq(
      1.0 -> math.abs(1.0 / 3.0 - 0.0 / 3.0),
      2.0 -> math.abs(2.0 / 3.0 - 1.0 / 3.0),
      3.0 -> math.abs(3.0 / 3.0 - 2.0 / 3.0),
      4.0 -> math.abs(3.0 / 3.0 - 3.0 / 3.0))
    val maxD = ds.map(_._2).max
    val atV = ds.filter(_._2 == maxD).map(_._1).min
    assert(r.getDouble(2) == maxD && r.getDouble(3) == atV)
  }

  test("ksTwoSample: a group matching zero rows yields NULL, not NaN") {
    import graft.operators.stats.Drift
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0)).toDF("g", "v")
    val r = Drift.ksTwoSample(df, "g", "v", "A", "B").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 0L)))
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("mannWhitney: a 2.15M-row tied block (t^3 > 2^63) stays exact") {
    // One value tied on 2,150,000 rows: t^3 = 9.938e18 exceeds
    // Long.MaxValue (9.223e18), so a LONG tie accumulator would wrap
    // silently under ANSI-off. The DECIMAL(38,0) path must agree with
    // the formula re-derived here over exact BigInt counts.
    val big = spark.range(2150000L).select(
      when(col("id") < 1100000L, lit("A")).otherwise(lit("B")).as("g"),
      lit(1.0).as("v"))
      .unionAll(spark.range(100L).select(lit("A").as("g"), lit(0.0).as("v")))
    val r = Stats.mannWhitney(big, "g", "v", "A", "B").collect().head
    val na = 1100100L; val nb = 1050000L; val bigN = na + nb
    // spine: v=0.0 (ca=100, cnt=100, bef=0), v=1.0 (ca=1.1M, cnt=2.15M, bef=100)
    val r2a = BigInt(100) * 101 + BigInt(1100000) * (2 * 100 + 2150000 + 1)
    val ties = (BigInt(100).pow(3) - 100) +
      (BigInt(2150000).pow(3) - 2150000)
    assert(ties > BigInt(Long.MaxValue)) // the wrap regime is actually hit
    val u2 = r2a - BigInt(na) * (na + 1)
    assert((r.getLong(0), r.getLong(1)) == ((na, nb)))
    assert(r.getLong(2) == (u2 / 2).toLong)
    // the operator's own IEEE sequence over correctly-rounded conversions
    val varU = BigDecimal(BigInt(na) * nb).toDouble / 12.0 *
      ((bigN + 1L).toDouble -
        BigDecimal(ties).toDouble / BigDecimal(BigInt(bigN) * (bigN - 1)).toDouble)
    val z = BigDecimal(u2 - BigInt(na) * nb).toDouble / (2.0 * math.sqrt(varU))
    assert(r.getDouble(3) == z)
  }
}
