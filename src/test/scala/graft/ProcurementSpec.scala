package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.api.Procurement
import graft.sources.Snapshot

class ProcurementSpec extends SparkSpecBase {
  import spark.implicits._

  test("pivotTable API matches the conditional-agg formulation") {
    val orders = Snapshot(spark, sf()).orders
    val viaPivot = Procurement.pivotTable(orders, "o_orderpriority", "o_orderstatus", Seq("F", "O", "P"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val viaCase = SparkEntry.queries("q_pivot_status")(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(viaPivot == viaCase)
  }

  test("gap fill inserts zero months for sparse data") {
    def ts(s: String) = Timestamp.valueOf(s)
    val sparse = Seq(
      (1L, ts("2024-01-15 00:00:00"), 100.0),
      (2L, ts("2024-04-02 00:00:00"), 50.0) // Feb + Mar missing
    ).toDF("id", "dt", "amount")
    val filled = Procurement.monthlyTrendGapFilled(sparse, "dt", "amount").collect()
    assert(filled.length == 4)
    val feb = filled(1)
    assert(feb.getAs[Timestamp]("month") == ts("2024-02-01 00:00:00"))
    assert(feb.getAs[Double]("total_budget") == 0.0)
    assert(feb.getAs[Long]("n_packages") == 0L)
  }

  test("chart validation: structural rules replace the reference's LLM judge") {
    import Procurement.{ChartType, validateForChart}
    val sn = Snapshot(spark, sf())
    val barData = Procurement.barAgg(
      sn.orders.join(sn.customer, col("o_custkey") === col("c_custkey"))
        .join(sn.nation, col("c_nationkey") === col("n_nationkey")),
      "n_name", "o_totalprice")
    assert(validateForChart(barData, ChartType.Bar, "n_name", Some("total_budget")).suitable)
    // 25 nations > 12 slices
    val pie = validateForChart(barData, ChartType.Pie, "n_name", Some("total_budget"))
    assert(!pie.suitable && pie.issues.exists(_.contains("12")))
    // line chart on a non-temporal axis
    val line = validateForChart(barData, ChartType.Line, "n_name", Some("total_budget"))
    assert(!line.suitable)
    val trend = Procurement.monthlyTrend(sn.orders, "o_orderdate", "o_totalprice")
    assert(validateForChart(trend, ChartType.Line, "month", Some("total_budget")).suitable)
    // missing column
    assert(!validateForChart(trend, ChartType.Bar, "nope", None).suitable)
  }

  test("preview returns bounded schema + rows") {
    val p = Procurement.preview(Snapshot(spark, sf()).nation, 3)
    assert(p.startsWith("schema: [n_nationkey, n_name, n_regionkey]"))
    assert(p.linesIterator.size == 4) // header + 3 rows
  }

  test("keyword filter composes OR within groups, AND across groups") {
    val df = Seq(
      (1L, "spark shuffle join"), (2L, "stream join"), (3L, "spark only"), (4L, "join only")
    ).toDF("id", "text")
    val got = Procurement.keywordSearch(df, "text", Seq(Seq("spark", "stream"), Seq("join")))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L)) // needs (spark|stream) AND join
  }
}
