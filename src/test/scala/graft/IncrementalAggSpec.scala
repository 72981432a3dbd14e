package graft

import org.apache.spark.sql.functions._

import graft.operators.agg.IncrementalAgg

/** merge(aggregate(a), b) == aggregate(a ∪ b) — the operator's whole
  * contract, plus the append-only edge cases.
  */
class IncrementalAggSpec extends SparkSpecBase {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("g"), col("n_rows"), col("sum_value").cast("double"),
      col("min_value"), col("max_value"))
      .collect().map(_.toString).toSeq.sorted

  test("single merge equals from-scratch; new groups appear; nulls follow SQL rules") {
    val s2 = spark; import s2.implicits._
    val a = Seq(
      (Option("x"), Option(1.5)), (Option("x"), Option(2.5)),
      (Option("y"), Option(10.0)), (Option.empty[String], Option(5.0)),
      (Option("x"), Option.empty[Double]) // null value: counted, not summed
    ).toDF("g", "v")
    val b = Seq(
      (Option("x"), Option(4.0)),
      (Option("z"), Option(7.0)), // group born in the delta
      (Option.empty[String], Option(3.0))
    ).toDF("g", "v")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.aggregate(a, Seq("g"), col("v")), b, Seq("g"), col("v"))
    val scratch = IncrementalAgg.aggregate(a.unionAll(b), Seq("g"), col("v"))
    assert(canon(merged) == canon(scratch))
    val x = merged.where($"g" === "x").collect().head
    assert(x.getLong(1) == 4 && x.getDecimal(2).doubleValue == 8.0 &&
      x.getDouble(3) == 1.5 && x.getDouble(4) == 4.0)
  }

  test("chained merges and empty deltas stay exact") {
    val s2 = spark; import s2.implicits._
    val batches = (1 to 4).map(i =>
      (1 to 25).map(j => (s"g${j % 3}", i * j * 0.125)).toDF("g", "v"))
    val chained = batches.tail.foldLeft(
      IncrementalAgg.aggregate(batches.head, Seq("g"), col("v")))(
      (st, d) => IncrementalAgg.merge(st, d, Seq("g"), col("v")))
    val scratch = IncrementalAgg.aggregate(
      batches.reduce(_ unionAll _), Seq("g"), col("v"))
    assert(canon(chained) == canon(scratch))
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    assert(canon(IncrementalAgg.merge(chained, empty, Seq("g"), col("v"))) ==
      canon(scratch), "empty delta must be a no-op")
  }

  test("merge exchanges carry group-grain state rows, never raw data") {
    val s2 = spark; import s2.implicits._
    val base = IncrementalAgg.aggregate(
      (1 to 1000).map(i => (s"g${i % 5}", i.toDouble, s"payload$i"))
        .toDF("g", "v", "wide"), Seq("g"), col("v"))
    val d = (1 to 100).map(i => (s"g${i % 7}", i * 2.0, s"p$i")).toDF("g", "v", "wide")
    val merged = IncrementalAgg.merge(base, d, Seq("g"), col("v"))
    merged.collect() // AQE finalizes only after execution
    val p = merged.queryExecution.executedPlan.toString
    // partial aggregation on both the delta agg and the state re-agg
    assert(p.contains("partial"), p.take(2000))
    // the untouched payload column never enters the merge plan
    assert(!p.contains("wide"), p.take(2000))
  }
}
