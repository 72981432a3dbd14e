package graft

import graft.operators.ann.CorrMatrix

class CorrMatrixSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted linear relations: +1, -1, NULL on constant, exact diagonal") {
    // dims: [x, 2x, -x, 7] — dim2 perfectly correlated with dim1,
    // dim3 perfectly anti-correlated, dim4 constant (no correlation)
    val vecs = Seq(1f, 2f, 3f, 4f).map(x => Seq(x, 2 * x, -x, 7f))
    val df = vecs.toDF("embedding")
    val got = CorrMatrix.pearsonByDimPair(df, "embedding", 4, 4)
      .orderBy("dim_i", "dim_j").collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    assert(got.size == 10, "4 dims -> 10 upper-triangle pairs")
    assert(got((1, 2)) == ((4L, Some(1.0))))
    assert(got((1, 3)) == ((4L, Some(-1.0))))
    for (i <- 1 to 3) {
      assert(got((i, i))._2 == Some(1.0), s"diagonal ($i,$i)")
      assert(got((i, 4))._2 == None, s"constant dim pair ($i,4) must be NULL")
    }
    assert(got((4, 4))._2 == None, "constant diagonal is NULL too")
  }

  test("wrong-length and NULL vectors are dropped from every pair's n") {
    val df = Seq(
      Some(Seq(1f, 2f)), Some(Seq(3f, 5f)), Some(Seq(4f, 4f)),
      Some(Seq(1f, 2f, 3f)), None).toDF("embedding")
    val got = CorrMatrix.pearsonByDimPair(df, "embedding", 2, 2).collect()
    assert(got.forall(_.getLong(2) == 3L))
  }

  test("sf0.001 catalog query: full upper triangle, corr within [-1, 1], diag 1") {
    val rows = SparkEntry.queries("q_corr_matrix")(spark, sf()).collect()
    assert(rows.length == 16 * 17 / 2)
    for (r <- rows; if !r.isNullAt(4)) {
      val c = r.getDouble(4)
      assert(c >= -1.0001 && c <= 1.0001, s"corr out of range: $c")
      if (r.getInt(0) == r.getInt(1)) assert(c == 1.0, "diagonal must be exactly 1")
    }
  }
}
