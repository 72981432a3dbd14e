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
