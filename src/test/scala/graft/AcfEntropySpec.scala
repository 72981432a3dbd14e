package graft

import graft.operators.stats.Stats

/** Hand-derived gates for the round-13 sequence-analysis batch: the
  * multi-lag ACF (B122) and conditional transition entropy (B123).
  */
class AcfEntropySpec extends SparkSpecBase {
  import spark.implicits._

  test("burstinessFromUnitCounts: hand moments; constant series hits B = -1") {
    // counts [1,1,4]: mu=2, var=(18-12)/2=3, fano=1.5, B=(sqrt3-2)/(sqrt3+2)
    val u = Seq(("d1", 1L), ("d2", 1L), ("d3", 4L)).toDF("u", "x")
    val r = Stats.burstinessFromUnitCounts(u).collect().head
    assert(r.getLong(r.fieldIndex("n_units")) == 3L &&
      r.getLong(r.fieldIndex("n_events")) == 6L)
    assert(r.getDouble(r.fieldIndex("mean_rate")) == 2.0)
    val vr = (18.0 - 6.0 * 6.0 / 3.0) / 2.0
    assert(r.getDouble(r.fieldIndex("fano")) == vr / 2.0)
    assert(r.getDouble(r.fieldIndex("burstiness")) ==
      (math.sqrt(vr) - 2.0) / (math.sqrt(vr) + 2.0))
    // perfectly regular arrivals: sd = 0 -> fano 0, B = -1 (the
    // periodic extreme of the Goh-Barabasi scale)
    val reg = Seq(("d1", 2L), ("d2", 2L), ("d3", 2L)).toDF("u", "x")
    val r2 = Stats.burstinessFromUnitCounts(reg).collect().head
    assert(r2.getDouble(r2.fieldIndex("fano")) == 0.0)
    assert(r2.getDouble(r2.fieldIndex("burstiness")) == -1.0)
  }

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

  test("etaSquared: two-group hand case follows the exact fold chain") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Stats.etaSquared(df, "g", "v").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    // exact sums: s=21, q=91, b=87; ssb=13.5, sst=17.5, msw=1
    val corr = 21.0 * 21.0 / 6.0
    val ssb = 87.0 - corr; val sst = 91.0 - corr
    val msw = (91.0 - 87.0) / 4.0
    def hr(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    assert(r.getDouble(2) == hr(ssb / sst))
    assert(r.getDouble(3) == hr((ssb - 1.0 * msw) / (sst + msw)))
  }

  test("etaSquared: a constant column degenerates to NULL effect sizes") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val r = Stats.etaSquared(df, "g", "v").collect().head
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("theilBetween: hand buckets follow the exact formula; equal shares give 0") {
    val buckets = Seq((1L, 2L, 2.0), (2L, 2L, 6.0)).toDF("b", "n", "s")
    val rows = Stats.theilBetween(buckets, "b", "n", "s").collect()
    def hr(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    assert(rows(0).getDouble(2) == hr(2.0 / 8.0))
    assert(rows(0).getDouble(3) == hr((2.0 / 8.0) * math.log((2.0 / 8.0) / (2.0 / 4.0))))
    assert(rows(1).getDouble(3) == hr((6.0 / 8.0) * math.log((6.0 / 8.0) / (2.0 / 4.0))))
    // perfectly proportional buckets -> every contribution exactly 0
    val eq = Seq((1L, 1L, 3.0), (2L, 3L, 9.0)).toDF("b", "n", "s")
    assert(Stats.theilBetween(eq, "b", "n", "s").collect()
      .forall(_.getDouble(3) == 0.0))
    // zero-sum buckets contribute exact 0 via the guard
    val z = Seq((1L, 2L, 0.0), (2L, 2L, 8.0)).toDF("b", "n", "s")
    assert(Stats.theilBetween(z, "b", "n", "s").collect()
      .head.getDouble(3) == 0.0)
  }

  test("tukeyHsd: two-group hand case follows the exact chain") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Stats.tukeyHsd(df, "g", "v").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "a" && row.getString(1) == "b")
    // MSW = (91 - 87)/4 = 1; diff = 2 - 5 = -3; q = 3/sqrt(0.5*(2/3))
    val diff = 6.0 / 3.0 - 15.0 / 3.0
    val q = math.abs(diff) / math.sqrt((1.0 / 2.0) * (1.0 / 3.0 + 1.0 / 3.0))
    def hr(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    assert(row.getDouble(4) == hr(diff))
    assert(row.getDouble(5) == hr(q))
  }

  test("tukeyHsd: three groups emit the three ordered pairs") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 4.0), ("b", 6.0),
      ("c", 10.0), ("c", 11.0)).toDF("g", "v")
    val pairs = Stats.tukeyHsd(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSeq == Seq(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("volumePeaks: strict local maxima above the factor threshold; boundaries never peak") {
    // counts per unit: d1=9, d2=1, d3=3, d4=1, d5=2, d6=5, d7=1
    // mean = 22/7; 1.25*mean ~ 3.93: d3 (3) fails the threshold,
    // d6 (5) peaks; d1 (9) is a boundary -> never a peak
    val counts = Seq("d1" -> 9, "d2" -> 1, "d3" -> 3, "d4" -> 1,
      "d5" -> 2, "d6" -> 5, "d7" -> 1)
    val df = counts.flatMap { case (u, c) => Seq.fill(c)(u) }.toDF("u")
    val rows = Stats.volumePeaks(df, "u", factor = 1.25).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("d6"))
    val r = rows.head
    assert(r.getLong(1) == 5L && r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 22.0 / 7.0)
    // a lower factor admits the smaller local max too
    val loose = Stats.volumePeaks(df, "u", factor = 0.5).collect()
      .map(_.getString(0)).toSeq
    assert(loose == Seq("d3", "d6"))
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
