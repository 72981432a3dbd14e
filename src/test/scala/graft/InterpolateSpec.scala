package graft

import org.apache.spark.sql.functions._

import graft.operators.temporal.Interpolate

/** Linear interpolation: hand-computed fills, edge-NULL contract, and
  * series isolation.
  */
class InterpolateSpec extends SparkSpecBase {
  import spark.implicits._

  test("fills interior gaps linearly, leaves edges null, isolates series") {
    val df = Seq(
      ("a", 0L, None), // leading edge: no predecessor -> stays null
      ("a", 1L, Some(10.0)),
      ("a", 2L, None), // 10 + 30 * 1/3 = 20
      ("a", 3L, None), // 10 + 30 * 2/3 = 30
      ("a", 4L, Some(40.0)),
      ("a", 5L, None), // neighbors t=4 and t=7: 40 + 20 * 1/3
      ("a", 7L, Some(60.0)), // uneven spacing: t=5 sits (5-4)/(7-4) in
      ("a", 8L, None), // trailing edge: no successor -> stays null
      ("b", 2L, Some(5.0)), // another series: must not lend neighbors
      ("b", 3L, None)
    ).toDF("k", "t", "v")
    val got = Interpolate.linear(df, Seq("k"), "t", "v")
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
    // expectations are the SAME IEEE op sequence the operator runs
    // (1/3 is not exact in binary — "30.0" would be an ulp off)
    val exp = Seq(
      ("a", 0L, None, false),
      ("a", 1L, Some(10.0), false),
      ("a", 2L, Some(10.0 + 30.0 * (1.0 / 3.0)), true),
      ("a", 3L, Some(10.0 + 30.0 * (2.0 / 3.0)), true),
      ("a", 4L, Some(40.0), false),
      ("a", 5L, Some(40.0 + 20.0 * (1.0 / 3.0)), true),
      ("a", 7L, Some(60.0), false),
      ("a", 8L, None, false),
      ("b", 2L, Some(5.0), false),
      ("b", 3L, None, false))
    assert(got.toSeq == exp, got.toSeq)
  }
}
