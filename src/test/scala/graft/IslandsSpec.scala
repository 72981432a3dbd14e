package graft

import org.apache.spark.sql.functions._
import graft.operators.temporal.Islands

class IslandsSpec extends SparkSpecBase {
  import spark.implicits._

  private def islands(rows: Seq[(Long, String)]) =
    Islands.activityIslands(
      rows.toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp")),
      "user_id", "ts")
      .orderBy("user_id", "island_start")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDate(2).toString,
        r.getLong(3), r.getLong(4)))

  test("runs of consecutive days collapse; gaps split islands") {
    val got = islands(Seq(
      1L -> "2024-01-01 08:00:00", 1L -> "2024-01-02 09:00:00",
      1L -> "2024-01-03 23:59:59",
      1L -> "2024-01-05 00:00:00",
      1L -> "2024-01-07 12:00:00", 1L -> "2024-01-08 12:00:00"))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", "2024-01-03", 3L, 3L),
      (1L, "2024-01-05", "2024-01-05", 1L, 1L),
      (1L, "2024-01-07", "2024-01-08", 2L, 2L)))
  }

  test("multiple events on one day count once toward n_days, all toward n_events") {
    val got = islands(Seq(
      7L -> "2024-03-10 01:00:00", 7L -> "2024-03-10 02:00:00",
      7L -> "2024-03-10 03:00:00", 7L -> "2024-03-11 01:00:00"))
    assert(got.toSeq == Seq((7L, "2024-03-10", "2024-03-11", 2L, 4L)))
  }

  test("islands bridge month and year boundaries") {
    val got = islands(Seq(
      2L -> "2023-12-30 10:00:00", 2L -> "2023-12-31 10:00:00",
      2L -> "2024-01-01 10:00:00", 2L -> "2024-01-02 10:00:00"))
    assert(got.toSeq == Seq((2L, "2023-12-30", "2024-01-02", 4L, 4L)))
  }

  test("keys are independent; null keys and null timestamps are dropped") {
    val df = Seq(
      (java.lang.Long.valueOf(1L), "2024-01-01 10:00:00"),
      (java.lang.Long.valueOf(2L), "2024-01-01 10:00:00"),
      (java.lang.Long.valueOf(2L), "2024-01-02 10:00:00"),
      (null.asInstanceOf[java.lang.Long], "2024-01-01 10:00:00"),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[String]))
      .toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val got = Islands.activityIslands(df, "user_id", "ts")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  test("parity with a window-free brute force on real events (sf0.001)") {
    val ev = sources.Snapshot(spark, sf()).events
    val got = Islands.activityIslands(ev, "user_id", "ts")
    // independent derivation: for each active (user, day), the day is an
    // island START iff (user, day-1) is not active; island count per
    // user = number of starts. Checks the anchor construction without
    // reusing it.
    val days = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val starts = days.as("d").join(
        days.select(col("user_id"), date_add(col("day"), 1).as("day")).as("p"),
        Seq("user_id", "day"), "left_anti")
      .groupBy("user_id").agg(count(lit(1)).as("n_islands"))
    val islandCounts = got.groupBy("user_id").agg(count(lit(1)).as("n_islands"))
    assert(islandCounts.except(starts).isEmpty && starts.except(islandCounts).isEmpty)
    // and the day/event totals are conserved
    val (sumDays, sumEvents) = got.agg(sum("n_days"), sum("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(sumDays == days.count())
    assert(sumEvents == ev.where(col("user_id").isNotNull && col("ts").isNotNull).count())
  }

  test("mergeIntervals: overlap and touch merge, gaps split, invalid rows drop") {
    val s2 = spark; import s2.implicits._
    val iv = Seq(
      // key a: [1,5] overlaps [3,8], [8,10] touches -> one group [1,10];
      //        [12,13] gapped -> its own group
      ("a", 1L, 1, 5), ("a", 2L, 3, 8), ("a", 3L, 8, 10), ("a", 4L, 12, 13),
      // key b: containment [1,10] ⊇ [2,3]; later [20,21]
      ("b", 5L, 1, 10), ("b", 6L, 2, 3), ("b", 7L, 20, 21),
      // invalid rows: end < start, null endpoint, null key — all dropped
      ("a", 8L, 9, 4)
    ).toDF("k", "tie", "s", "e")
      .unionByName(Seq(
        (Option("a"), Option(9L), Option.empty[Int], Option(7)),
        (Option.empty[String], Option(10L), Option(1), Option(2))
      ).toDF("k", "tie", "s", "e"))
    val got = Islands.mergeIntervals(iv, Seq("k"), "s", "e", "tie")
      .orderBy("k", "merged_start")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("a", 1, 10, 3L), ("a", 12, 13, 1L),
      ("b", 1, 10, 2L), ("b", 20, 21, 1L)), s"got $got")
  }

  test("mergeIntervals conserves coverage: merged groups are disjoint with gaps between") {
    val s2 = spark; import s2.implicits._
    // derived from real orders (the q_interval_merge shape): per key the
    // merged output must be strictly ordered with a gap > 0 between
    // consecutive groups, and interval counts must sum to the input's
    val o = sources.Snapshot(spark, sf()).orders
      .where(col("o_orderkey") % 97 === 0)
      .select(col("o_orderpriority").as("k"), col("o_orderkey").as("tie"),
        to_date(col("o_orderdate")).as("s"),
        date_add(to_date(col("o_orderdate")), 3).as("e"))
    val got = Islands.mergeIntervals(o, Seq("k"), "s", "e", "tie")
    assert(got.agg(sum("n_intervals")).head().getLong(0) == o.count())
    val bad = got.as("x").join(got.as("y"),
      col("x.k") === col("y.k") &&
        col("x.merged_end") >= col("y.merged_start") &&
        col("x.merged_start") < col("y.merged_start"))
    assert(bad.isEmpty, "merged groups must not touch or overlap")
  }
}
