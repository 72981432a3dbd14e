package graft

import org.apache.spark.sql.functions._

import graft.operators.quantile.Outliers

/** Tukey-fence outlier audit on planted distributions. */
class OutlierSpec extends SparkSpecBase {

  test("planted extremes are flagged; clean groups report zero with null extremes") {
    val s2 = spark; import s2.implicits._
    // group a: 1..100 plus two planted extremes; group b: 1..100 only.
    // For 1..100 p25=25.75, p75=75.25 (linear interp), IQR=49.5 →
    // fences ≈ [-48.5, 149.5]: ±1000 are far outside, the body is inside.
    val rows = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("a", 1000.0), ("a", -1000.0)) ++
      (1 to 100).map(i => ("b", i.toDouble))).toDF("g", "v")
    val out = Outliers.iqrAudit(rows, "g", "v").orderBy("g").collect()
    val a = out(0); val b = out(1)
    assert(a.getLong(1) == 102 && a.getLong(2) == 2)
    assert(a.getDouble(5) == -1000.0 && a.getDouble(6) == 1000.0)
    assert(b.getLong(1) == 100 && b.getLong(2) == 0)
    assert(b.isNullAt(5) && b.isNullAt(6))
    // fences are the 4-digit-rounded contract values
    assert(b.getDouble(3) == round4(25.75 - 1.5 * 49.5) &&
      b.getDouble(4) == round4(75.25 + 1.5 * 49.5))
  }

  test("boxplotStats: five-number summary with Tukey-clamped whiskers (B126)") {
    val s2 = spark; import s2.implicits._
    // 1..100 + extremes ±1000: fences [-48.5, 149.5] -> whiskers clamp
    // to the extreme DATA values inside them (1 and 100)
    val rows = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("a", 1000.0), ("a", -1000.0))).toDF("g", "v")
    val r = Outliers.boxplotStats(rows, "g", "v").collect().head
    // (g, n_rows, v_min, q1, median, q3, v_max, w_lo, w_hi, n_below, n_above)
    assert(r.getLong(1) == 102L)
    assert(r.getDouble(2) == -1000.0 && r.getDouble(6) == 1000.0)
    assert(r.getDouble(7) == 1.0 && r.getDouble(8) == 100.0)
    assert(r.getLong(9) == 1L && r.getLong(10) == 1L)
    // quartiles are the round-4 percentile contract values over the
    // FULL 102-value group (extremes included)
    assert(r.getDouble(4) == round4(50.5))
    assert(r.getDouble(3) <= r.getDouble(4) && r.getDouble(4) <= r.getDouble(5))
    // ordering invariant the renderer requires
    assert(r.getDouble(7) <= r.getDouble(3) && r.getDouble(5) <= r.getDouble(8))
  }

  test("k widens the fences: a milder multiplier flags more") {
    val s2 = spark; import s2.implicits._
    val rows = ((1 to 50).map(i => ("g", i.toDouble)) :+ ("g", 90.0)).toDF("g", "v")
    val strict = Outliers.iqrAudit(rows, "g", "v", k = 0.5).collect().head.getLong(2)
    val loose = Outliers.iqrAudit(rows, "g", "v", k = 3.0).collect().head.getLong(2)
    assert(strict >= loose)
  }

  test("madAuditApprox: sketch medians pass the exact-rank audit (hand case + catalog row)") {
    import spark.implicits._
    // 1..1001: the GK p50 at accuracy 10000 is rank-exact on this size,
    // and the deviation median audits against the SAME approx median
    val df = (1 to 1001).map(i => ("g", i.toDouble)).toDF("g", "v")
    val got = graft.operators.quantile.Outliers
      .madAuditApprox(df, "g", "v").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n") == 1001L)
    assert(r.getAs[Boolean]("med_in_bounds") && r.getAs[Boolean]("mad_in_bounds"))
    // rank-exact here: the median IS 501, the MAD IS 250
    assert(r.getAs[Double]("approx_med") == 501.0)
    assert(r.getAs[Double]("approx_mad") == 250.0)
    // catalog row (B35c): static-verdict booleans true at sf0.001
    val cat = SparkEntry.queries("q_outliers_mad_sketch")(spark, sf()).collect()
    assert(cat.nonEmpty)
    cat.foreach(r => assert(r.getBoolean(2) && r.getBoolean(3), r.toString))
  }

  test("winsorAudit: clamp counts and the clamped-decimal mean, replicated exactly") {
    import spark.implicits._
    val vals = (1 to 10).map(_.toDouble)
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = graft.operators.quantile.Outliers
      .winsorAudit(df, "g", "v").collect().head
    // exact percentile interpolation: p05 = 1.45, p95 = 9.55
    val lo = round4(1.0 + 0.05 * 9.0)
    val hi = round4(1.0 + 0.95 * 9.0)
    assert(r.getDouble(4) == lo && r.getDouble(5) == hi)
    assert(r.getLong(1) == 10L && r.getLong(2) == 1L && r.getLong(3) == 1L)
    // clamped decimal sum: doubles -> DECIMAL(18,6) via shortest-repr
    // HALF_UP (the Spark cast), exact sum, one division, floor-round
    val dec = vals.map(v => BigDecimal(math.max(lo, math.min(hi, v)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(r.getDouble(6) == round4(dec.toDouble / 10.0))
  }

  private def round4(x: Double): Double =
  // the operator rounds with the hashRound floor formula (r12)
    math.floor(x * 10000.0 + 0.5) / 10000.0
}
