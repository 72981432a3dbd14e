package graft

import graft.operators.stats.Stats

/** Hand-derived gates for the round-13 sequence-analysis batch: the
  * multi-lag ACF (B122) and conditional transition entropy (B123).
  */
class AcfEntropySpec extends SparkSpecBase {
  import spark.implicits._

  test("acfGlobal: hand series [1,2,3,2] gives exact lag values") {
    // units with 1/2/3/2 rows -> devs [-1,0,1,0], den = 2
    // lag1: 0; lag2: -1 -> -0.5; lag3: 0; lag4: n <= k -> NULL
    val df = (Seq("d1") ++ Seq.fill(2)("d2") ++ Seq.fill(3)("d3") ++
      Seq.fill(2)("d4")).toDF("u")
    val rows = Stats.acfGlobal(df, "u", maxLag = 4).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(rows.forall(_.getLong(1) == 4L))
    assert(rows(0).getDouble(2) == 0.0)
    assert(rows(1).getDouble(2) == -0.5)
    assert(rows(2).getDouble(2) == 0.0)
    assert(rows(3).isNullAt(2), "lag >= n must be NULL")
  }

  test("acfGlobal: alternating series flips sign by lag parity") {
    // counts [3,1,3,1,3,1] -> devs [1,-1,...]: acf1 = -5/6, acf2 = 4/6
    val df = (1 to 6).flatMap(i =>
      Seq.fill(if (i % 2 == 1) 3 else 1)(f"d$i%02d")).toDF("u")
    val rows = Stats.acfGlobal(df, "u", maxLag = 2).collect()
    assert(rows(0).getDouble(2) == -5.0 / 6.0)
    assert(rows(1).getDouble(2) == 4.0 / 6.0)
  }

  test("acfGlobal: constant series degenerates to NULL (zero deviation sum)") {
    val df = (1 to 5).flatMap(i => Seq.fill(2)(s"d$i")).toDF("u")
    val rows = Stats.acfGlobal(df, "u", maxLag = 2).collect()
    assert(rows.forall(_.isNullAt(2)))
  }

  test("conditionalEntropy: hand cells follow the exact formula") {
    val cells = Seq(("a", "x", 3L), ("a", "y", 1L), ("b", "x", 4L))
      .toDF("f", "t", "n")
    val rows = Stats.conditionalEntropy(cells, "f", "t", "n")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ax = rows(("a", "x"))
    assert(ax.getLong(2) == 3L && ax.getLong(3) == 4L && ax.getLong(4) == 8L)
    assert(ax.getDouble(5) == 3.0 / 4.0)
    val raw = -(3.0 / 8.0) * math.log(3.0 / 4.0)
    assert(ax.getDouble(6) == math.floor(raw * 1e4 + 0.5) / 1e4)
    // a single-destination source is perfectly predictable: contrib 0
    val bx = rows(("b", "x"))
    assert(bx.getDouble(5) == 1.0 && bx.getDouble(6) == 0.0)
    // total H is positive when any source branches
    val h = Seq(("a", "x"), ("a", "y"), ("b", "x")).map { k =>
      val r = rows(k)
      -(r.getLong(2).toDouble / r.getLong(4).toDouble) *
        math.log(r.getLong(2).toDouble / r.getLong(3).toDouble)
    }.sum
    assert(h > 0.0)
  }
}
