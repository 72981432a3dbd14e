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
}
