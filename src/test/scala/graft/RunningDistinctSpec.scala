package graft

import graft.operators.window.RunningDistinct

class RunningDistinctSpec extends SparkSpecBase {
  import spark.implicits._

  private def brute(rows: Seq[(String, Int, Long)]): Map[(String, Int), (Long, Long, Long)] = {
    // reference: per (part, period) — n_new, cumulative distinct count,
    // cumulative distinct sum, from a driver-side running set
    rows.groupBy(_._1).flatMap { case (p, rs) =>
      val periods = rs.map(_._2).distinct.sorted
      var seen = Set.empty[Long]
      periods.map { per =>
        val upTo = rs.filter(_._2 <= per).map(_._3).toSet
        val now = rs.filter(_._2 == per).map(_._3).toSet
        val newVals = now -- seen
        seen = upTo
        (p, per) -> ((newVals.size.toLong, upTo.size.toLong, upTo.sum))
      }
    }
  }

  test("parity with a driver-side running set, including zero-debut periods") {
    val rnd = new scala.util.Random(11)
    // small value domain forces repeats => periods where every value was
    // already seen (the n_new = 0, cumulative-carry case)
    val rows = (1 to 300).map(_ =>
      (if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(8) + 1, rnd.nextInt(12).toLong))
    val df = rows.toDF("p", "per", "v")
    val got = RunningDistinct
      .cumulativeDistinct(df, Seq("p"), "per", "v", "cum_cnt", Some("cum_sum"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == brute(rows))
    assert(got.values.exists(_._1 == 0L), "test data must exercise a zero-debut period")
  }

  test("null values and null periods drop; a value moving partitions counts in both") {
    val df = Seq(
      (Some("a"), Some(1), Some(10L)),
      (Some("a"), Some(2), Some(10L)), // repeat: not new in period 2
      (Some("b"), Some(1), Some(10L)), // same value, other partition: new there
      (Some("a"), Some(1), None), // null value drops
      (Some("a"), None, Some(99L)) // null period drops
    ).toDF("p", "per", "v")
    val got = RunningDistinct
      .cumulativeDistinct(df, Seq("p"), "per", "v", "cum_cnt", Some("cum_sum"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      ("a", 1) -> ((1L, 1L, 10L)),
      ("a", 2) -> ((0L, 1L, 10L)),
      ("b", 1) -> ((1L, 1L, 10L))))
  }

  test("approx twin: exact in sparse mode, axis parity with the exact operator") {
    // below the sketch's sparse-mode ceiling the HLL estimate is exact —
    // the approx twin must reproduce the exact operator's counts AND its
    // axis (same rows, same null contract) verbatim
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map(_ =>
      (if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(8) + 1, rnd.nextInt(12).toLong))
    val df = rows.toDF("p", "per", "v")
      .union(Seq(("a", 0, -1L)).toDF("p", "per", "v").withColumn("v", org.apache.spark.sql.functions.lit(null).cast("long")))
    val exact = RunningDistinct.cumulativeDistinct(df, Seq("p"), "per", "v", "c")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    val approx = RunningDistinct.cumulativeDistinctApprox(df, Seq("p"), "per", "v", "c")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(approx == exact)
  }

  test("approx twin tracks exact within 3×rsd on the real orders axis at every SF") {
    // the driver-gated q_window_distinct_approx audit, swept at all
    // three SFs: cumulative distinct custkeys per priority by month
    import org.apache.spark.sql.functions._
    val lgK = 12
    val rsd = 1.04 / math.sqrt((1 << lgK).toDouble)
    for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val o = graft.sources.Snapshot(spark, sf(dir)).orders.select(
        col("o_orderpriority").as("p"),
        date_trunc("month", col("o_orderdate")).as("per"),
        col("o_custkey").as("v"))
      val exact = RunningDistinct.cumulativeDistinct(o, Seq("p"), "per", "v", "c")
        .select(col("p"), col("per"), col("c").as("exact"))
      val approx = RunningDistinct.cumulativeDistinctApprox(o, Seq("p"), "per", "v", "c")
        .select(col("p"), col("per"), col("c").as("est"))
      val joined = exact.join(approx, Seq("p", "per"), "full")
        .select(col("exact"), col("est")).collect()
      assert(joined.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
        s"$dir: exact and approx must emit the identical (part, period) axis")
      val worst = joined.iterator
        .map(r => math.abs(r.getLong(1) - r.getLong(0)).toDouble / math.max(1L, r.getLong(0)))
        .max
      assert(worst <= 3.0 * rsd,
        f"$dir: worst relative error $worst%.4f exceeds 3×rsd ${3.0 * rsd}%.4f")
    }
  }

  test("scale shape: the window runs over period grain, never over base rows") {
    val df = (1 to 5000).map(i => ("p" + i % 3, i % 40, (i % 17).toLong)).toDF("p", "per", "v")
    val out = RunningDistinct.cumulativeDistinct(df, Seq("p"), "per", "v", "c", Some("s"))
    out.collect() // materialize first — AQE finalizes the plan (CLAUDE.md)
    val plan = out.queryExecution.executedPlan.toString
    // the Window's child chain must contain the period-grain join, and
    // every aggregate below the window carries partial (map-side) modes;
    // a collect_set/window-over-base formulation would show a Window
    // directly over the scan with no aggregate between
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0, plan)
    val below = plan.substring(winIdx)
    assert(below.contains("HashAggregate"), s"window must sit over aggregated grain:\n$plan")
    assert(!plan.contains("collect_set"), plan)
    // spot-check output size == distinct (p, per) pairs, i.e. period grain
    assert(out.count() == 3 * 40)
  }
}
