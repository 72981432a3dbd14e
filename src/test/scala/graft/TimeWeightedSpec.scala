package graft

import java.sql.Timestamp

import graft.operators.temporal.TimeWeighted

class TimeWeightedSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hand-computed integral mean over irregular intervals") {
    // v=10 held 10s, v=20 held 30s => (10*10e6 + 20*30e6) / 40e6 = 17.5
    val df = Seq(
      ("k", ts("2024-01-01 00:00:00"), 1L, 10.0),
      ("k", ts("2024-01-01 00:00:10"), 2L, 20.0),
      ("k", ts("2024-01-01 00:00:40"), 3L, 30.0) // last sample: no successor
    ).toDF("k", "t", "id", "v")
    val r = TimeWeighted.avgByKey(df, Seq("k"), "t", "id", "v").collect().head
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == ((2L, 40000000L, 17.5)))
  }

  test("same-timestamp samples weigh zero via the tiebreak, deterministically") {
    // two samples at t=0 (ids 1,2): id 1 spans 0 us to id 2; id 2 spans 10s
    val df = Seq(
      ("k", ts("2024-01-01 00:00:00"), 1L, 999.0), // zero-weight
      ("k", ts("2024-01-01 00:00:00"), 2L, 10.0),
      ("k", ts("2024-01-01 00:00:10"), 3L, 20.0)
    ).toDF("k", "t", "id", "v")
    val r = TimeWeighted.avgByKey(df, Seq("k"), "t", "id", "v").collect().head
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == ((2L, 10000000L, 10.0)))
  }

  test("single-observation keys are absent; an all-zero span yields NULL, never x/0") {
    val df = Seq(
      ("solo", ts("2024-01-01 00:00:00"), 1L, 5.0),
      ("zero", ts("2024-01-01 00:00:00"), 1L, 5.0),
      ("zero", ts("2024-01-01 00:00:00"), 2L, 6.0)
    ).toDF("k", "t", "id", "v")
    val rows = TimeWeighted.avgByKey(df, Seq("k"), "t", "id", "v").collect()
    assert(rows.map(_.getString(0)).toSet == Set("zero"))
    val z = rows.head
    assert(z.getLong(2) == 0L && z.isNullAt(3))
  }

  test("null key/ts/tie/value rows drop; keys never lend intervals to each other") {
    val df = Seq(
      (Some("a"), Some(ts("2024-01-01 00:00:00")), Some(1L), Some(10.0)),
      (Some("a"), Some(ts("2024-01-01 00:00:02")), Some(2L), Some(30.0)),
      (Some("b"), Some(ts("2024-01-01 00:00:01")), Some(3L), Some(99.0)),
      (Some("b"), Some(ts("2024-01-01 00:00:03")), Some(4L), Some(1.0)),
      (None, Some(ts("2024-01-01 00:00:00")), Some(5L), Some(1.0)),
      (Some("a"), None, Some(6L), Some(1.0)),
      (Some("a"), Some(ts("2024-01-01 00:00:09")), None, Some(1.0)),
      (Some("a"), Some(ts("2024-01-01 00:00:09")), Some(7L), None)
    ).toDF("k", "t", "id", "v")
    val got = TimeWeighted.avgByKey(df, Seq("k"), "t", "id", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    // a: one 2s interval at v=10; b: one 2s interval at v=99
    assert(got == Map("a" -> ((1L, 10.0)), "b" -> ((1L, 99.0))))
  }

  test("decimal-exact weighting: fractional values with microsecond spans") {
    // v has 6 decimals — DECIMAL(18,6) carries it exactly; dt=3us and 1us
    val df = Seq(
      ("k", Timestamp.from(java.time.Instant.ofEpochSecond(0, 1000)), 1L, 0.123456),
      ("k", Timestamp.from(java.time.Instant.ofEpochSecond(0, 4000)), 2L, 1.5),
      ("k", Timestamp.from(java.time.Instant.ofEpochSecond(0, 5000)), 3L, 9.0)
    ).toDF("k", "t", "id", "v")
    val r = TimeWeighted.avgByKey(df, Seq("k"), "t", "id", "v").collect().head
    // exact decimal sum 0.370368 + 1.500000 = 1.870368, over 4 us;
    // the mean rounds at 4 via the hashRound floor formula (r12)
    val expected = math.floor((1.870368 / 4.0) * 10000.0 + 0.5) / 10000.0
    assert((r.getLong(2), r.getDouble(3)) == ((4L, expected)))
  }
}
