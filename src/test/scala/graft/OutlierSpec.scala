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

  test("k widens the fences: a milder multiplier flags more") {
    val s2 = spark; import s2.implicits._
    val rows = ((1 to 50).map(i => ("g", i.toDouble)) :+ ("g", 90.0)).toDF("g", "v")
    val strict = Outliers.iqrAudit(rows, "g", "v", k = 0.5).collect().head.getLong(2)
    val loose = Outliers.iqrAudit(rows, "g", "v", k = 3.0).collect().head.getLong(2)
    assert(strict >= loose)
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
}
