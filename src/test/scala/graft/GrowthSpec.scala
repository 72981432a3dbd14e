package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.temporal.Growth

/** B84 q_growth_accounting and B85 q_lorenz. */
class GrowthSpec extends SparkSpecBase {
  import spark.implicits._

  test("growth accounting: hand case incl. a year boundary, a gap, and the max-month churn fence") {
    def t(s: String) = Timestamp.valueOf(s + " 10:00:00")
    // A: jan, feb, apr 2024 (gap -> resurrected; apr = max month, no churn)
    // B: feb only (churns into mar)
    // C: dec 2023 + jan 2024 (retained across the year boundary, churns into feb)
    val df = Seq(
      ("A", t("2024-01-05")), ("A", t("2024-01-20")), ("A", t("2024-02-01")),
      ("A", t("2024-04-09")),
      ("B", t("2024-02-14")),
      ("C", t("2023-12-31")), ("C", t("2024-01-01"))).toDF("u", "ts")
    val got = Growth.monthlyAccounting(df, "u", "ts")
      .orderBy("month").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("2023-12-01", 1L, 0L, 0L, 0L),
      ("2024-01-01", 1L, 1L, 0L, 0L),
      ("2024-02-01", 1L, 1L, 0L, 1L),
      ("2024-03-01", 0L, 0L, 0L, 2L),
      ("2024-04-01", 0L, 0L, 1L, 0L)))
  }

  test("sf0.001 q_growth_accounting: MAU identities hold exactly and every class is exercised") {
    val rows = SparkEntry.queries("q_growth_accounting")(spark, sf()).collect()
    assert(rows.length > 12, "orders span years — many months expected")
    val mau = sources.Snapshot(spark, sf()).orders
      .where($"o_custkey".isNotNull && $"o_orderdate".isNotNull)
      .select((year($"o_orderdate") * 12 + month($"o_orderdate") - 1).as("mi"),
        $"o_custkey")
      .distinct()
      .groupBy("mi").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def mi(d: java.sql.Date): Int = {
      val ld = d.toLocalDate
      ld.getYear * 12 + ld.getMonthValue - 1
    }
    rows.foreach { r =>
      val m = mi(r.getDate(0))
      val (nNew, nRet, nRes, nChu) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nNew + nRet + nRes == mau.getOrElse(m, 0L),
        s"month $m: active classes must re-add to MAU")
      // everyone active last month either stayed or churned
      assert(nRet + nChu == mau.getOrElse(m - 1, 0L),
        s"month $m: retained+churned must equal the previous MAU")
    }
    // non-vacuous: all four classes fire somewhere (the events table
    // spans ONE month and would leave everything but 'new' at zero)
    assert(rows.map(_.getLong(1)).sum > 0, "new")
    assert(rows.map(_.getLong(2)).sum > 0, "retained")
    assert(rows.map(_.getLong(3)).sum > 0, "resurrected")
    assert(rows.map(_.getLong(4)).sum > 0, "churned")
    assert(rows.length >= mau.size)
  }

  test("sf0.001 q_cohort_ltv: cohort identities and running-sum consistency") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sf()).collect()
    assert(rows.length > 12, "multi-year orders give many cohorts/ages")
    val byCohort = rows.groupBy(_.getDate(0).toString)
    assert(byCohort.exists(_._2.length > 1), "some cohort has later-age rows")
    byCohort.foreach { case (cohort, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.head.getInt(1) == 0, s"$cohort must have an age-0 row")
      val nCohort = sorted.head.getLong(2)
      assert(sorted.head.getLong(3) == nCohort, "age-0 actives ARE the cohort")
      assert(sorted.forall(_.getLong(2) == nCohort))
      assert(sorted.forall(r => r.getLong(3) <= nCohort), "active never exceeds the cohort")
      // cum re-adds the per-age revenues EXACTLY (each double is an
      // exact decimal conversion under 2^53, so the BigDecimal sum
      // reproduces the decimal cum); ltv is exactly cum / size
      var acc = BigDecimal(0)
      sorted.foreach { r =>
        acc += BigDecimal(r.getDouble(4))
        assert(r.getDouble(5) == acc.toDouble,
          s"$cohort age ${r.getInt(1)} cum")
        assert(r.getDouble(6) == r.getDouble(5) / nCohort.toDouble)
      }
    }
    // cohort sizes re-add to the distinct customer universe
    val nUsers = sources.Snapshot(spark, sf()).orders
      .where($"o_custkey".isNotNull && $"o_orderdate".isNotNull &&
        $"o_totalprice".isNotNull)
      .select("o_custkey").distinct().count()
    assert(byCohort.values.map(_.head.getLong(2)).sum == nUsers)
  }

  test("sf0.001 q_lorenz: 100 buckets, cumulative share reaches exactly 1, customers re-add") {
    val rows = SparkEntry.queries("q_lorenz")(spark, sf()).collect()
    assert(rows.length == 100)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 100L))
    val cum = rows.map(_.getDouble(3))
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a }, "cum share nondecreasing")
    assert(cum.last == 1.0)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.005, "bucket shares re-add (mod rounding)")
    val nCust = sources.Snapshot(spark, sf()).orders
      .where($"o_custkey".isNotNull && $"o_totalprice".isNotNull)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    // the poorest bucket holds less than the richest
    assert(rows.head.getDouble(2) < rows.last.getDouble(2))
  }
}
