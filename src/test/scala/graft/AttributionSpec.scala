package graft

import java.sql.Timestamp

import graft.operators.temporal.Attribution

class AttributionSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, Long, Timestamp, String, Double)]) =
    Attribution.linearCredit(
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"),
      "event_id", "user_id", "ts", "event_type", "value",
      conversionType = "purchase", touchTypes = Seq("click", "view"),
      lookback = "INTERVAL 7 DAYS")

  test("equal split across in-window touches; window edges are [ts-7d, ts)") {
    val rows = Seq(
      (1L, 10L, ts("2024-01-10 12:00:00"), "purchase", 90.0),
      (2L, 10L, ts("2024-01-10 11:00:00"), "click", 0.0),    // in
      (3L, 10L, ts("2024-01-10 09:00:00"), "click", 0.0),    // in
      (4L, 10L, ts("2024-01-03 12:00:00"), "view", 0.0),     // exactly ts-7d: in (>=)
      (5L, 10L, ts("2024-01-03 11:59:59"), "view", 0.0),     // beyond lookback: out
      (6L, 10L, ts("2024-01-10 12:00:00"), "click", 0.0),    // at conversion ts: out (<)
      (7L, 11L, ts("2024-01-10 11:30:00"), "click", 0.0)     // another user: out
    )
    val r = run(rows).collect()
    assert(r.length == 1)
    val p = r.head
    assert(p.getLong(0) == 1L && p.getLong(1) == 10L && p.getDouble(2) == 90.0)
    // n_touches=3 (2 clicks + boundary view), credit = 90/3
    assert((p.getLong(3), p.getLong(4), p.getLong(5)) == ((3L, 2L, 1L)))
    assert(p.getDouble(6) == 30.0)
  }

  test("zero-touch conversions are kept with NULL credit; error/other types never count") {
    val rows = Seq(
      (1L, 10L, ts("2024-01-10 12:00:00"), "purchase", 50.0),
      (2L, 10L, ts("2024-01-10 11:00:00"), "error", 0.0),   // not a touch type
      (3L, 10L, ts("2024-01-10 10:00:00"), "signup", 0.0)
    )
    val r = run(rows).collect()
    assert(r.length == 1)
    val p = r.head
    assert((p.getLong(3), p.getLong(4), p.getLong(5)) == ((0L, 0L, 0L)))
    assert(p.isNullAt(6))
  }

  test("each conversion attributes independently — shared touches credit BOTH (last-touch dedup is a different model)") {
    val rows = Seq(
      (1L, 10L, ts("2024-01-10 12:00:00"), "purchase", 30.0),
      (2L, 10L, ts("2024-01-11 12:00:00"), "purchase", 40.0),
      (3L, 10L, ts("2024-01-10 09:00:00"), "click", 0.0) // inside both lookbacks
    )
    val got = run(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(6)))).toMap
    assert(got == Map(1L -> ((1L, 30.0)), 2L -> ((1L, 40.0))))
  }
}
