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

  test("keyword filter composes OR within groups, AND across groups") {
    val df = Seq(
      (1L, "spark shuffle join"), (2L, "stream join"), (3L, "spark only"), (4L, "join only")
    ).toDF("id", "text")
    val got = Procurement.keywordSearch(df, "text", Seq(Seq("spark", "stream"), Seq("join")))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L)) // needs (spark|stream) AND join
  }
}
