package graft

import graft.operators.sketch.OverlapSketch

class OverlapSketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted overlaps: exact intersections, zero rows for disjoint pairs, verdicts hold") {
    val rows =
      (1L to 100L).map(("A", _)) ++
        (51L to 150L).map(("B", _)) ++
        (200L to 209L).map(("C", _))
    val df = rows.toDF("cat", "id")
    val got = OverlapSketch.overlapAudit(df, "cat", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(got(("A", "B")) == ((100L, 100L, 50L, true)))
    assert(got(("A", "C")) == ((100L, 10L, 0L, true)))
    assert(got(("B", "C")) == ((100L, 10L, 0L, true)))
  }

  test("duplicate (cat, id) observations never inflate counts; null cat/id rows drop") {
    val rows = Seq(
      (Some("A"), Some(1L)), (Some("A"), Some(1L)), (Some("A"), Some(2L)),
      (Some("B"), Some(1L)), (Some("B"), Some(1L)),
      (None, Some(9L)), (Some("B"), None))
    val df = rows.toDF("cat", "id")
    val got = OverlapSketch.overlapAudit(df, "cat", "id").collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((2L, 1L, 1L)))
    assert(r.getBoolean(5))
  }
}
