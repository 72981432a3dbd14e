package graft

import graft.operators.ann.Standardize

class StandardizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def round4(x: Double): Double =
  // the operator rounds with the hashRound floor formula (r12)
    math.floor(x * 10000.0 + 0.5) / 10000.0

  test("fit: hand-derived per-dimension stats via the operator's own IEEE sequence") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, 4.0f)),
      (3L, Seq(5.0f, 6.0f))
    ).toDF("id", "embedding")
    val got = Standardize.fit(df, "embedding", 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // dim1: sums exact (9, 35); mean 3, var 35/3 - 3*3, std = sqrt
    val m1 = 9.0 / 3.0
    val s1 = round4(math.sqrt(35.0 / 3.0 - m1 * m1))
    val m2 = 12.0 / 3.0
    val s2 = round4(math.sqrt(56.0 / 3.0 - m2 * m2))
    assert(got(1) == ((3L, 1.0, 5.0, round4(m1), s1)))
    assert(got(2) == ((3L, 2.0, 6.0, round4(m2), s2)))
  }

  test("fit: null vectors and wrong-length vectors drop; a constant dimension has std 0") {
    val df = Seq(
      (1L, Some(Seq(7.0f, 1.0f))),
      (2L, Some(Seq(7.0f, 3.0f))),
      (3L, Some(Seq(7.0f))), // wrong length: dropped
      (4L, None)
    ).toDF("id", "embedding")
    val got = Standardize.fit(df, "embedding", 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(1) == ((2L, 7.0, 0.0)))
    assert(got(2)._1 == 2L)
  }

  test("transform z-scores against the fit, NULLs constant dimensions, leaves others exact") {
    val df = Seq(
      (1L, Seq(1.0f, 9.0f)),
      (2L, Seq(3.0f, 9.0f)),
      (3L, Seq(5.0f, 9.0f))
    ).toDF("id", "embedding")
    val fit = Standardize.fit(df, "embedding", 2)
    val out = Standardize.transform(df, "embedding", fit)
      .orderBy("id").collect().map(_.getSeq[Any](2))
    val m = 3.0
    val s = round4(math.sqrt(35.0 / 3.0 - m * m))
    // dim1 standardizes with the ROUNDED fit params (the published
    // scaler is what a pipeline applies); dim2 is constant -> NULL
    assert(out(0) == Seq((1.0 - round4(m)) / s, null))
    assert(out(1) == Seq((3.0 - round4(m)) / s, null))
    assert(out(2) == Seq((5.0 - round4(m)) / s, null))
  }
}
