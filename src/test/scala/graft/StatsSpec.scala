package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.stats.{Profiling, Skyline, Stats}

class StatsSpec extends SparkSpecBase {
  import spark.implicits._

  // ---------------------------------------------------------- regression

  test("regression matches the closed form on a hand-checked group") {
    // y = 3x + 2 exactly: slope 3, intercept 2, corr 1
    val df = Seq(("g", 1.0, 5.0), ("g", 2.0, 8.0), ("g", 3.0, 11.0), ("g", 4.0, 14.0))
      .toDF("k", "x", "y")
    val r = Stats.regression(df, "x", "y", Seq("k")).collect().head
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-9)
    assert(r.getAs[Double]("x_mean") == 2.5 && r.getAs[Double]("y_mean") == 9.5)
  }

  test("regression: anti-correlated group, null pairs dropped, constant-x yields NULLs") {
    val df = Seq(
      ("dn", 1.0, 9.0), ("dn", 2.0, 7.0), ("dn", 3.0, 5.0),
      ("dn", null.asInstanceOf[Any], 99.0), ("dn", 4.0, null.asInstanceOf[Any]),
      ("const", 5.0, 1.0), ("const", 5.0, 2.0)
    ).map { case (k, x, y) =>
      (k, Option(x).map(_.asInstanceOf[Double]), Option(y).map(_.asInstanceOf[Double]))
    }.toDF("k", "x", "y")
    val rows = Stats.regression(df, "x", "y", Seq("k"))
      .collect().map(r => r.getString(0) -> r).toMap
    val dn = rows("dn")
    assert(dn.getAs[Long]("n_pairs") == 3L) // null-bearing pairs dropped
    assert(math.abs(dn.getAs[Double]("slope") + 2.0) < 1e-9)
    assert(math.abs(dn.getAs[Double]("corr") + 1.0) < 1e-9)
    val const = rows("const")
    assert(const.getAs[Long]("n_pairs") == 2L)
    assert(const.isNullAt(const.fieldIndex("slope")))
    assert(const.isNullAt(const.fieldIndex("intercept")))
    assert(const.isNullAt(const.fieldIndex("corr")))
  }

  test("regression is bit-identical across partitionings (exact sufficient stats)") {
    val li = sources.Snapshot(spark, sf()).lineitem
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      Stats.regression(df, "l_quantity", "l_extendedprice", Seq("l_returnflag"))
        .orderBy("l_returnflag")
        .collect().map(_.mkString("|")).toSeq
    val a = run(li)
    val b = run(li.repartition(37, col("l_orderkey")))
    val c = run(li.coalesce(1))
    assert(a == b && a == c)
  }

  // MarginAuditSpec convention, applied to q_regression's rounded
  // ratios: cross-engine drift comes from decimal→double conversions
  // whose unscaled sums exceed 2^53 (≤ ~|v|·1e-14), so every rounded
  // hashed value must sit far from its round-half boundary at ITS
  // column's digit count (4/6/8 scaled to magnitude — see Stats).
  // Threshold: margin > 1e3 × the per-value drift bound.
  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"regression margin audit at $dir: rounded values clear of boundaries") {
      val li = sources.Snapshot(spark, sf(dir)).lineitem
      val rows = Stats
        .regression(li, "l_quantity", "l_extendedprice", Seq("l_returnflag", "l_linestatus"))
        .collect()
      assert(rows.nonEmpty)
      val hashed = for {
        r <- rows
        f <- Seq("x_mean", "y_mean", "slope", "intercept", "corr")
        if !r.isNullAt(r.fieldIndex(f))
      } yield r.getAs[Double](f)
      // the operator output is already rounded — the margin must be
      // measured on the PRE-rounding doubles, re-derived here from the
      // same sufficient statistics with plain double math
      val agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("n"),
        graft.functions.ExactMath.dsum(col("l_quantity")).as("sx"),
        graft.functions.ExactMath.dsum(col("l_extendedprice")).as("sy"),
        sum((col("l_quantity").cast("decimal(18,6)") * col("l_extendedprice").cast("decimal(18,6)"))
          .cast("decimal(18,6)")).cast("double").as("sxy"),
        sum((col("l_quantity").cast("decimal(18,6)") * col("l_quantity").cast("decimal(18,6)"))
          .cast("decimal(18,6)")).cast("double").as("sxx"),
        sum((col("l_extendedprice").cast("decimal(18,6)") * col("l_extendedprice").cast("decimal(18,6)"))
          .cast("decimal(18,6)")).cast("double").as("syy")).collect()
      def margin(x: Double, digits: Int): Double = {
        val scale = math.pow(10, digits)
        val frac = x * scale - math.floor(x * scale)
        math.abs(frac - 0.5) / scale
      }
      val unrounded: Seq[(Double, Int)] = agg.toSeq.flatMap { r =>
        val n = r.getAs[Long]("n").toDouble
        val (sx, sy) = (r.getAs[Double]("sx"), r.getAs[Double]("sy"))
        val (sxy, sxx, syy) =
          (r.getAs[Double]("sxy"), r.getAs[Double]("sxx"), r.getAs[Double]("syy"))
        val num = n * sxy - sx * sy
        val denx = n * sxx - sx * sx
        val deny = n * syy - sy * sy
        Seq(sx / n -> 4, sy / n -> 4) ++
          (if (denx > 0) Seq(num / denx -> 6, (sy - (num / denx) * sx) / n -> 4) else Nil) ++
          (if (denx > 0 && deny > 0)
            Seq(num / (math.sqrt(denx) * math.sqrt(deny)) -> 8) else Nil)
      }
      assert(unrounded.nonEmpty && hashed.nonEmpty)
      unrounded.foreach { case (v, digits) =>
        val m = margin(v, digits)
        val driftBound = (math.abs(v) + 1.0) * 1e-14
        assert(m > 1e3 * driftBound,
          f"$dir: unrounded value $v%.10g sits $m%.3e from its $digits-digit " +
            f"round-half boundary (drift bound $driftBound%.3e) — could flip the hash")
      }
    }
  }

  // ------------------------------------------------------- columnProfile

  private val profDf = Seq(
    (1L, Some("b"), Some(2.5), Some(Timestamp.valueOf("2024-01-02 03:04:05"))),
    (2L, Some("a"), Some(-1.5), Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
    (3L, None, None, None),
    (4L, Some("a"), Some(7.25), Some(Timestamp.valueOf("2024-02-01 00:00:00")))
  ).toDF("id", "s", "d", "ts")

  test("columnProfile: counts, nulls, distincts and typed min/max families") {
    val rows = Profiling.columnProfile(profDf, Seq("id", "s", "d", "ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id", "s", "d", "ts"))
    val id = rows("id")
    assert(id.getAs[Long]("n_rows") == 4 && id.getAs[Long]("n_nulls") == 0)
    assert(id.getAs[Long]("n_distinct") == 4)
    assert(id.getAs[Long]("min_int") == 1L && id.getAs[Long]("max_int") == 4L)
    assert(id.isNullAt(id.fieldIndex("min_dbl")) && id.isNullAt(id.fieldIndex("min_str")))
    val s = rows("s")
    assert(s.getAs[Long]("n_nulls") == 1 && s.getAs[Long]("n_distinct") == 2)
    assert(s.getAs[String]("min_str") == "a" && s.getAs[String]("max_str") == "b")
    val d = rows("d")
    assert(d.getAs[Double]("min_dbl") == -1.5 && d.getAs[Double]("max_dbl") == 7.25)
    val ts = rows("ts")
    assert(ts.getAs[Long]("n_nulls") == 1 && ts.getAs[Long]("n_distinct") == 3)
    // epoch micros, UTC session
    assert(ts.getAs[Long]("min_int") == Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L)
  }

  test("columnProfile approx path agrees with exact within HLL tolerance") {
    val orders = sources.Snapshot(spark, sf()).orders
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    def distincts(approx: Boolean): Map[String, Long] =
      Profiling.columnProfile(orders, cols, approx = approx)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    val exact = distincts(approx = false)
    val est = distincts(approx = true)
    cols.foreach { c =>
      assert(math.abs(est(c) - exact(c)).toDouble / exact(c).max(1L) < 0.15,
        s"$c: est ${est(c)} vs exact ${exact(c)}")
    }
  }

  test("columnProfile rejects unsupported column types") {
    val df = Seq((1L, Array(1.0))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      Profiling.columnProfile(df, Seq("vec"))
    }
  }

  // ------------------------------------------------------------- skyline

  test("skyline equals the quadratic dominance definition on random data") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 500).map(_ => (rnd.nextInt(30), (rnd.nextInt(1000) / 4.0)))
    val df = pts.toDF("x", "y")
    val got = Skyline.frontier2D(df, "x", "y")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    val perX = pts.groupBy(_._1).map { case (x, ps) => (x, ps.map(_._2).max) }
    val brute = perX.filter { case (x, y) =>
      !perX.exists { case (x2, y2) => x2 > x && y2 >= y }
    }.toSet
    assert(got == brute && got.nonEmpty)
  }

  test("skyline: dominated same-x rows collapse; the max-x point always survives") {
    val df = Seq((1, 10.0), (1, 50.0), (2, 40.0), (3, 20.0), (3, 5.0)).toDF("x", "y")
    val got = Skyline.frontier2D(df, "x", "y")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    // x=3 survives (max x); x=2 (40 > 20) survives; x=1 (50 > 40) survives
    assert(got == Set((1, 50.0), (2, 40.0), (3, 20.0)))
  }

  // ---------------------------------------------------------------- gini

  test("gini: equality gives exactly 0, total concentration gives (n-1)/n") {
    val eq = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L), ("a", 4L, 5L))
      .toDF("g", "id", "size")
    val gEq = Stats.giniByGroup(eq, Seq("g"), "size", "id").collect().head
    assert(gEq.getAs[Long]("n_entities") == 4L)
    assert(gEq.getAs[Double]("gini") == 0.0) // exact, not approximate

    val conc = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 100L))
      .toDF("g", "id", "size")
    val gConc = Stats.giniByGroup(conc, Seq("g"), "size", "id").collect().head
    assert(gConc.getAs[Double]("gini") == 3.0 / 4.0) // (n-1)/n exactly
  }

  test("gini: null/negative sizes dropped, zero-total group yields null gini") {
    val df = Seq(
      ("a", 1L, Option(3L)),
      ("a", 2L, Option(-1L)), // dropped
      ("a", 3L, Option.empty[Long]), // dropped
      ("a", 4L, Option(1L)),
      ("z", 9L, Option(0L)) // zero-total group -> null gini
    ).toDF("g", "id", "size")
    val got = Stats.giniByGroup(df, Seq("g"), "size", "id")
      .collect().map(r => r.getString(0) -> ((r.getAs[Long]("n_entities"), Option(r.get(2))))).toMap
    assert(got("a")._1 == 2L)
    // two entities 1 and 3: G = (2*(1*1+2*3) - 3*4) / (2*4) = 2/8
    assert(got("a")._2.contains(0.25))
    assert(got("z") == ((1L, None)))
  }

  // ------------------------------------------------------------- z-test

  test("twoProportionZ: hand case matches the closed form, flags significance") {
    // A: 50/100 vs rest 10/100 -> z = 0.4 / sqrt(0.3*0.7*(0.02))
    val rows = (0 until 100).map(i => ("A", if (i < 50) 1 else 0)) ++
      (0 until 100).map(i => ("B", if (i < 10) 1 else 0))
    val got = Stats.twoProportionZ(rows.toDF("g", "su"), "g", "su")
      .collect().map(r => r.getString(0) -> r).toMap
    val expZ = {
      val z = (0.5 - 0.1) / math.sqrt(0.3 * (1.0 - 0.3) * (1.0 / 100 + 1.0 / 100))
      math.floor(z * 10000.0 + 0.5) / 10000.0 // hashRound floor formula (r12)
    }
    assert(got("A").getAs[Long]("n_group") == 100L)
    assert(got("A").getAs[Long]("n_success") == 50L)
    assert(got("A").getAs[Double]("p_group") == 0.5)
    assert(got("A").getAs[Double]("z_score") == expZ)
    assert(got("A").getAs[Boolean]("significant"))
    assert(got("B").getAs[Double]("z_score") == -expZ) // symmetric two-group case
    assert(got("B").getAs[Boolean]("significant"))
  }

  test("twoProportionZ: degenerate pooled rates and missing complement yield null") {
    // every row succeeds -> pooled rate 1 -> zero variance -> null z/flag
    val allSucc = Seq(("A", 1), ("A", 1), ("B", 1)).toDF("g", "su")
    Stats.twoProportionZ(allSucc, "g", "su").collect().foreach { r =>
      assert(r.isNullAt(r.fieldIndex("z_score")) && r.isNullAt(r.fieldIndex("significant")))
    }
    // single group -> empty complement (n2 = 0) -> null
    val one = Seq(("A", 1), ("A", 0)).toDF("g", "su")
    val r = Stats.twoProportionZ(one, "g", "su").collect().head
    assert(r.isNullAt(r.fieldIndex("z_score")))
    // near-balanced groups -> |z| small -> not significant
    val even = ((0 until 50).map(i => ("A", i % 2)) ++ (0 until 50).map(i => ("B", (i + 1) % 2)))
    val rr = Stats.twoProportionZ(even.toDF("g", "su"), "g", "su").collect().head
    assert(!rr.getAs[Boolean]("significant"))
  }

  // ------------------------------------------------------- rolling trend

  test("rollingTrend: linear ramps hit ±1, constants null, partial frames excluded") {
    def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)
    val up = (1 to 8).map(i => ("up", i.toLong, ts(i), i.toDouble))
    val down = (1 to 8).map(i => ("down", i.toLong, ts(i), (9 - i).toDouble))
    val flat = (1 to 8).map(i => ("flat", i.toLong, ts(i), 5.0))
    val short = (1 to 4).map(i => ("short", i.toLong, ts(i), i.toDouble)) // < frame
    val df = (up ++ down ++ flat ++ short).toDF("g", "id", "ts", "v")
    val got = Stats.rollingTrend(df, "g", "ts", "id", "v", frameLen = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    // frames 5..8 emit per full-length group; 'short' emits nothing
    assert(got.keys.map(_._1).toSet == Set("up", "down", "flat"))
    assert(got.count(_._1._1 == "up") == 4)
    assert(got(("up", 8L)).contains(1.0))
    assert(got(("down", 8L)).contains(-1.0))
    assert(got(("flat", 8L)).isEmpty) // zero variance -> null
  }

  test("rollingTrend matches a naive per-frame Pearson within rounding") {
    def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)
    val rnd = new scala.util.Random(1234)
    // 2-decimal values: the operator's DECIMAL(18,2) quantization is lossless here
    val ys = (1 to 60).map(_ => rnd.nextInt(10000) / 100.0)
    val df = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, ts(i), y) }
      .toDF("g", "id", "ts", "v")
    val l = 7
    val got = Stats.rollingTrend(df, "g", "ts", "id", "v", frameLen = l)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got.size == 60 - l + 1)
    got.foreach { case (id, corr) =>
      val frame = ys.slice(id.toInt - l + 1, id.toInt + 1)
      val xs = (1 to l).map(_.toDouble)
      val n = l.toDouble
      val sx = xs.sum; val sy = frame.sum
      val sxy = xs.zip(frame).map { case (a, b) => a * b }.sum
      val sxx = xs.map(x => x * x).sum; val syy = frame.map(y => y * y).sum
      val exp = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(math.abs(corr - exp) < 1e-6, s"id=$id got $corr expected $exp")
    }
  }

  // ------------------------------------------------------------ benford

  test("benford: arithmetic digit extraction, spine completeness, planted counts") {
    import graft.operators.stats.Drift
    val vals = Seq(1.0, 1.5, 19.0, 25.0, 999.0, 10.0, 1000000.0, 999999.9,
      0.5 /* dropped: < 1 */)
    val df = vals.map(Tuple1(_)).toDF("v")
      .union(Seq(Tuple1(Option.empty[Double])).toDF("v")) // null dropped
    val got = Drift.benfordByDigit(df, "v", maxDecade = 6)
      .orderBy("digit").collect()
    assert(got.length == 9) // all digits present even with zero counts
    val byDigit = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // digits: 1,1,1,2,9,1(10.0/10),1(1e6/1e6),9(999999.9/1e5=9.999999) -> 8 rows kept
    assert(byDigit == Map(1L -> 5L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L,
      6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 2L))
    // expected shares are the Benford literals, rounded to 4
    assert(got.head.getAs[Double]("exp_share") == 0.301)
    assert(got.last.getAs[Double]("exp_share") == 0.0458)
    // chi-square contribution present for every digit (n > 0), zero-count
    // digits carry their full expected mass n*e_d
    got.foreach(r => assert(!r.isNullAt(r.fieldIndex("chi2_contrib"))))
    val n = vals.count(_ >= 1).toDouble
    val e3 = 0.12493873660829993
    val exp3 = { val c = (0.0 - n * e3) * (0.0 - n * e3) / (n * e3)
      math.floor(c * 10000.0 + 0.5) / 10000.0 } // hashRound floor formula (r12)
    assert(byDigit(3L) == 0L &&
      got(2).getAs[Double]("chi2_contrib") == exp3)
  }

  test("gini matches a brute-force rank-formula reference on random counts") {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 300).map(i => (s"g${rnd.nextInt(3)}", i.toLong, rnd.nextInt(12).toLong))
    val got = Stats.giniByGroup(rows.toDF("g", "id", "size"), Seq("g"), "size", "id")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(_._3).sorted
      val n = sorted.size.toLong
      val a = sorted.zipWithIndex.map { case (s, i) => (i + 1) * s }.sum
      val b = sorted.sum
      val exp = (2L * a - (n + 1) * b).toDouble / (n * b).toDouble
      assert(got(g) == exp, s"group $g") // bit-exact: same integer sums, one IEEE division
    }
  }

  test("hhiByGroup: monopoly = 1, equal split = 1/n, order-independent") {
    import graft.operators.stats.Stats
    val df = Seq(
      ("mono", 1L, 10.0), ("mono", 1L, 5.0), // one entity, two rows -> 1.0
      ("duo", 1L, 7.0), ("duo", 2L, 7.0), // two equal entities -> 0.5
      ("quad", 1L, 2.0), ("quad", 2L, 2.0), ("quad", 3L, 2.0), ("quad", 4L, 2.0))
      .toDF("g", "e", "v")
    val got = Stats.hhiByGroup(df, Seq("g"), "e", $"v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("mono") == ((1L, 1.0)))
    assert(got("duo") == ((2L, 0.5)))
    assert(got("quad") == ((4L, 0.25)))
    // partition-order independence: repartitioned input folds identically
    val got2 = Stats.hhiByGroup(df.repartition(7), Seq("g"), "e", $"v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.forall { case (k, (_, h)) => got2(k) == h })
  }

  test("psiByCategory: top-K spine, OTHER absorbs the tail and new categories") {
    import graft.operators.stats.Drift
    // baseline: a=5, b=3, c=2, d=1; current: a=1, b=1, e=6 (e is NEW)
    val base = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
      .toDF("cat")
    val cur = (Seq("a", "b") ++ Seq.fill(6)("e")).toDF("cat")
    val out = Drift.psiByCategory(base, cur, "cat", topK = 2)
      .orderBy("category").collect()
    // spine = top-2 of baseline (a, b) + OTHER — exactly 3 rows
    assert(out.map(_.getString(0)).toSeq == Seq("__OTHER__", "a", "b"))
    val m = out.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("a") == ((5L, 1L)) && m("b") == ((3L, 1L)))
    // OTHER: baseline c+d = 3; current e = 6 (the NEW category lands here
    // — its share moving IS the vocabulary drift signal)
    assert(m("__OTHER__") == ((3L, 6L)))
    // smoothing denominators use the spine size: p sums to 1 across rows
    val pSum = out.map(_.getDouble(3)).sum
    assert(math.abs(pSum - 1.0) < 0.01, s"p_base sums to $pSum")
    // tie at the top-K cut resolves by category ASC: with ties (x=2,y=2)
    // and K=1, x enters the spine, y lands in OTHER — both engines agree
    val tb = (Seq.fill(2)("y") ++ Seq.fill(2)("x")).toDF("cat")
    val to = Drift.psiByCategory(tb, tb, "cat", topK = 1)
      .orderBy("category").collect().map(_.getString(0)).toSeq
    assert(to == Seq("__OTHER__", "x"))
  }

  // q_anova's F rides the same decimal->double conversion drift class as
  // regression; margin-audit the PRE-rounding F at its 4-digit floor
  // boundary at all three SFs (the B38 protocol)
  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"anova margin audit at $dir: unrounded F clear of its 4-digit boundary") {
      val li = sources.Snapshot(spark, sf(dir)).lineitem
      val agg = li
        .where(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
        .groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          graft.functions.ExactMath.dsum(col("l_quantity")).as("sg"),
          sum((col("l_quantity").cast("decimal(18,6)") * col("l_quantity").cast("decimal(18,6)"))
            .cast("decimal(18,6)")).cast("double").as("qg"))
        .orderBy("l_returnflag")
        .collect()
      val k = agg.length
      val n = agg.map(_.getAs[Long]("n")).sum
      val sTot = agg.map(_.getAs[Double]("sg")).foldLeft(0.0)(_ + _)
      val qTot = agg.map(_.getAs[Double]("qg")).foldLeft(0.0)(_ + _)
      val bTot = agg.map(r => r.getAs[Double]("sg") * r.getAs[Double]("sg")
        / r.getAs[Long]("n").toDouble).foldLeft(0.0)(_ + _)
      assert(k >= 2 && (qTot - bTot) > 0.0)
      val f = ((bTot - sTot * sTot / n.toDouble) / (k - 1).toDouble) /
        ((qTot - bTot) / (n - k).toDouble)
      val scale = 10000.0
      val frac = f * scale - math.floor(f * scale)
      val margin = math.abs(frac - 0.5) / scale
      val driftBound = (math.abs(f) + 1.0) * 1e-14
      assert(margin > 1e3 * driftBound,
        f"$dir: unrounded F $f%.10g sits $margin%.3e from its 4-digit boundary")
    }
  }

  // q_eta_squared rides the identical construction and drift class;
  // margin-audit the PRE-rounding eta^2/omega^2 at 3 SFs
  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"eta-squared margin audit at $dir: unrounded effect sizes clear of boundaries") {
      val li = sources.Snapshot(spark, sf(dir)).lineitem
      val agg = li
        .where(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
        .groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          graft.functions.ExactMath.dsum(col("l_quantity")).as("sg"),
          sum((col("l_quantity").cast("decimal(18,6)") * col("l_quantity").cast("decimal(18,6)"))
            .cast("decimal(18,6)")).cast("double").as("qg"))
        .orderBy("l_returnflag")
        .collect()
      val k = agg.length
      val n = agg.map(_.getAs[Long]("n")).sum
      val sTot = agg.map(_.getAs[Double]("sg")).foldLeft(0.0)(_ + _)
      val qTot = agg.map(_.getAs[Double]("qg")).foldLeft(0.0)(_ + _)
      val bTot = agg.map(r => r.getAs[Double]("sg") * r.getAs[Double]("sg")
        / r.getAs[Long]("n").toDouble).foldLeft(0.0)(_ + _)
      val corr = sTot * sTot / n.toDouble
      val ssb = bTot - corr
      val sst = qTot - corr
      val msw = (qTot - bTot) / (n - k).toDouble
      val eta = ssb / sst
      val omega = (ssb - (k - 1).toDouble * msw) / (sst + msw)
      val scale = 10000.0
      Seq("eta" -> eta, "omega" -> omega).foreach { case (name, v) =>
        val frac = v * scale - math.floor(v * scale)
        val margin = math.abs(frac - 0.5) / scale
        val driftBound = (math.abs(v) + 1.0) * 1e-14
        assert(margin > 1e3 * driftBound,
          f"$dir: unrounded $name $v%.10g sits $margin%.3e from its 4-digit boundary")
      }
    }
  }

  // q_cv_by_group rides the anova drift class; margin-audit the
  // PRE-rounding mean/sd/cv/rse per group at 3 SFs
  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"cv margin audit at $dir: unrounded mean/sd/cv/rse clear of boundaries") {
      val li = sources.Snapshot(spark, sf(dir)).lineitem
      val groups = li
        .where(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
        .groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          graft.functions.ExactMath.dsum(col("l_quantity")).as("s1"),
          sum((col("l_quantity").cast("decimal(18,6)") * col("l_quantity").cast("decimal(18,6)"))
            .cast("decimal(18,6)")).cast("double").as("s2"))
        .collect()
      assert(groups.nonEmpty)
      val scale = 10000.0
      groups.foreach { r =>
        val n = r.getAs[Long]("n").toDouble
        val s1 = r.getAs[Double]("s1"); val s2 = r.getAs[Double]("s2")
        val m = s1 / n
        val va = (s2 - s1 * m) / (n - 1.0)
        val sd = math.sqrt(va); val cv = sd / m; val rse = cv / math.sqrt(n)
        Seq("mean" -> m, "sd" -> sd, "cv" -> cv, "rse" -> rse).foreach {
          case (name, v) =>
            val frac = v * scale - math.floor(v * scale)
            val margin = math.abs(frac - 0.5) / scale
            val driftBound = (math.abs(v) + 1.0) * 1e-14
            assert(margin > 1e3 * driftBound,
              f"$dir: unrounded $name $v%.10g sits $margin%.3e from its 4-digit boundary")
        }
      }
    }
  }

  // q_cohens_d rides welch's sums and drift class; margin-audit the
  // PRE-rounding means/d/g at 3 SFs (the eta-squared protocol)
  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"cohens-d margin audit at $dir: unrounded means/d/g clear of boundaries") {
      val li = sources.Snapshot(spark, sf(dir)).lineitem
      def sideStats(flag: String): (Long, Double, Double) = {
        val r = li
          .where(col("l_returnflag") === flag && col("l_quantity").isNotNull)
          .agg(count(lit(1)),
            graft.functions.ExactMath.dsum(col("l_quantity")),
            sum((col("l_quantity").cast("decimal(18,6)") * col("l_quantity").cast("decimal(18,6)"))
              .cast("decimal(18,6)")).cast("double"))
          .collect().head
        (r.getLong(0), r.getDouble(1), r.getDouble(2))
      }
      val (na, s1a, s2a) = sideStats("R")
      val (nb, s1b, s2b) = sideStats("A")
      val ma = s1a / na.toDouble; val mb = s1b / nb.toDouble
      val ssa = s2a - s1a * ma; val ssb = s2b - s1b * mb
      val pv = (ssa + ssb) / (na.toDouble + nb.toDouble - 2.0)
      val d = (ma - mb) / math.sqrt(pv)
      val g = d * (1.0 - 3.0 / (4.0 * (na.toDouble + nb.toDouble) - 9.0))
      // q_variance_ratio rides the same side sums — audit its hashed
      // surface here too (welch-order variances + one division)
      val va = (s2a - s1a * (s1a / na.toDouble)) / (na.toDouble - 1.0)
      val vb = (s2b - s1b * (s1b / nb.toDouble)) / (nb.toDouble - 1.0)
      val scale = 10000.0
      Seq("mean_a" -> ma, "mean_b" -> mb, "d" -> d, "g" -> g,
        "var_a" -> va, "var_b" -> vb, "f" -> (va / vb)).foreach {
        case (name, v) =>
          val frac = v * scale - math.floor(v * scale)
          val margin = math.abs(frac - 0.5) / scale
          val driftBound = (math.abs(v) + 1.0) * 1e-14
          assert(margin > 1e3 * driftBound,
            f"$dir: unrounded $name $v%.10g sits $margin%.3e from its 4-digit boundary")
      }
    }
  }

  test("momentsByGroup: hand-derived moments via the operator's own IEEE sequence") {
    import spark.implicits._
    def hr(x: Double, d: Int): Double = {
      val sc = (1 to d).foldLeft(1L)((a, _) => a * 10L).toDouble
      math.floor(x * sc + 0.5) / sc
    }
    // [1..5]: s1=15, s2=55, s3=225, s4=979; replicate the exact op chain
    val (n, s1, s2, s3, s4) = (5.0, 15.0, 55.0, 225.0, 979.0)
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m
    val m4 = s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n) - 3.0 * m * m * m * m
    val df = (1 to 5).map(v => ("g", v.toDouble)).toDF("g", "v")
    val r = Stats.momentsByGroup(df, "g", "v").collect().head
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == hr(m, 4) && r.getDouble(3) == hr(m2, 4))
    assert(r.getDouble(4) == hr(m3 / (math.sqrt(m2) * m2), 6))
    assert(r.getDouble(5) == hr(m4 / (m2 * m2) - 3.0, 6))
    // constant group: NULL shape stats
    val c = Stats.momentsByGroup(
      Seq(("g", 7.0), ("g", 7.0)).toDF("g", "v"), "g", "v").collect().head
    assert(c.isNullAt(4) && c.isNullAt(5))
  }

  // q_tukey_hsd rides the anova state's conversions; margin-audit every
  // pair's PRE-rounding mean_diff and q statistic at 3 SFs
  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"tukey-hsd margin audit at $dir: pair stats clear of 4-digit boundaries") {
      val li = sources.Snapshot(spark, sf(dir)).lineitem
      val agg = li
        .where(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
        .groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          graft.functions.ExactMath.dsum(col("l_quantity")).as("sg"),
          sum((col("l_quantity").cast("decimal(18,6)") * col("l_quantity").cast("decimal(18,6)"))
            .cast("decimal(18,6)")).cast("double").as("qg"))
        .orderBy("l_returnflag")
        .collect()
      val k = agg.length
      val n = agg.map(_.getAs[Long]("n")).sum
      val qTot = agg.map(_.getAs[Double]("qg")).foldLeft(0.0)(_ + _)
      val bTot = agg.map(r => r.getAs[Double]("sg") * r.getAs[Double]("sg")
        / r.getAs[Long]("n").toDouble).foldLeft(0.0)(_ + _)
      val msw = (qTot - bTot) / (n - k).toDouble
      val scale = 10000.0
      for {
        i <- agg.indices; j <- agg.indices if i < j
      } {
        val (na, sa) = (agg(i).getAs[Long]("n"), agg(i).getAs[Double]("sg"))
        val (nb, sb) = (agg(j).getAs[Long]("n"), agg(j).getAs[Double]("sg"))
        val diff = sa / na.toDouble - sb / nb.toDouble
        val q = math.abs(diff) /
          math.sqrt((msw / 2.0) * (1.0 / na.toDouble + 1.0 / nb.toDouble))
        Seq("mean_diff" -> diff, "q_stat" -> q).foreach { case (name, v) =>
          val frac = v * scale - math.floor(v * scale)
          val margin = math.abs(frac - 0.5) / scale
          val driftBound = (math.abs(v) + 1.0) * 1e-14
          assert(margin > 1e3 * driftBound,
            f"$dir: unrounded $name $v%.10g sits $margin%.3e from its boundary")
        }
      }
    }
  }

  // q_grubbs rides the anova conversion class; margin-audit every
  // group's PRE-rounding mean/sd/G at 3 SFs
  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"grubbs margin audit at $dir: group stats clear of 4-digit boundaries") {
      val o = sources.Snapshot(spark, sf(dir)).orders
      val agg = o
        .where(col("o_orderpriority").isNotNull && col("o_totalprice").isNotNull)
        .groupBy("o_orderpriority").agg(
          count(lit(1)).as("n"),
          graft.functions.ExactMath.dsum(col("o_totalprice")).as("s1"),
          sum((col("o_totalprice").cast("decimal(18,6)") * col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(18,6)")).cast("double").as("s2x"),
          min(col("o_totalprice")).as("vmin"),
          max(col("o_totalprice")).as("vmax"))
        .collect()
      val scale = 10000.0
      agg.foreach { r =>
        val n = r.getAs[Long]("n").toDouble
        val m = r.getAs[Double]("s1") / n
        val sd = math.sqrt((r.getAs[Double]("s2x") - n * m * m) / (n - 1.0))
        val devHi = r.getAs[Double]("vmax") - m
        val devLo = m - r.getAs[Double]("vmin")
        val g = (if (devHi >= devLo) devHi else devLo) / sd
        // the B38 rule: mean/sd round at 2 (1e5 magnitudes), G at 4
        Seq(("mean", m, 100.0), ("sd", sd, 100.0), ("g", g, scale))
          .foreach { case (name, v, sc) =>
            val frac = v * sc - math.floor(v * sc)
            val margin = math.abs(frac - 0.5) / sc
            val driftBound = (math.abs(v) + 1.0) * 1e-14
            assert(margin > 1e3 * driftBound,
              f"$dir: unrounded grubbs $name $v%.10g sits $margin%.3e from its boundary")
          }
      }
    }
  }

  // q_skew_kurtosis margin audit at 3 SFs (the anova/regression class:
  // s4's decimal->double conversion leaves the 2^53 envelope)
  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"moments margin audit at $dir: rounded values clear of boundaries") {
      val li = sources.Snapshot(spark, sf(dir)).lineitem
      def p19(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")
      def prod(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        (a * b).cast("decimal(18,6)")
      val vd = p19(col("l_quantity"))
      val agg = li.where(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
        .groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          sum(vd).cast("double").as("s1"),
          sum(prod(vd, vd)).cast("double").as("s2"),
          sum(prod(prod(vd, vd), vd)).cast("double").as("s3"),
          sum(prod(prod(vd, vd), prod(vd, vd))).cast("double").as("s4"))
        .collect()
      def margin(x: Double, digits: Int): Double = {
        val scale = math.pow(10, digits)
        val frac = x * scale - math.floor(x * scale)
        math.abs(frac - 0.5) / scale
      }
      val checks = agg.toSeq.flatMap { r =>
        val n = r.getAs[Long]("n").toDouble
        val (s1, s2, s3, s4) = (r.getAs[Double]("s1"), r.getAs[Double]("s2"),
          r.getAs[Double]("s3"), r.getAs[Double]("s4"))
        val m = s1 / n
        val m2 = s2 / n - m * m
        val m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m
        val m4 = s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n) - 3.0 * m * m * m * m
        val g1 = m3 / (math.sqrt(m2) * m2)
        val g2 = m4 / (m2 * m2) - 3.0
        Seq(m -> 4, m2 -> 4) ++
          (if (m2 > 0)
             // q_jarque_bera rides the same chain — audit its rounded-2 jb here
             Seq(g1 -> 6, g2 -> 6,
               n / 6.0 * (g1 * g1 + g2 * g2 / 4.0) -> 2)
           else Nil)
      }
      assert(checks.nonEmpty)
      checks.foreach { case (v, digits) =>
        val mg = margin(v, digits)
        val driftBound = (math.abs(v) + 1.0) * 1e-13
        assert(mg > 1e3 * driftBound,
          f"$dir: unrounded moment $v%.10g sits $mg%.3e from its $digits-digit boundary")
      }
    }
  }

  // q_paired_t margin audit at 3 SFs (the cohens-d protocol on the
  // first→last diff grain)
  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"paired-t margin audit at $dir: unrounded mean/t clear of boundaries") {
      val diffs = Stats.pairedDiffsFromState(Stats.pairedMovementState(
        sources.Snapshot(spark, sf(dir)).orders,
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"))
      val r = diffs.agg(count(lit(1)),
        graft.functions.ExactMath.dsum(col("__d")),
        sum((col("__d").cast("decimal(18,6)") * col("__d").cast("decimal(18,6)"))
          .cast("decimal(18,6)")).cast("double"))
        .collect().head
      val n = r.getLong(0).toDouble
      val (s1, s2) = (r.getDouble(1), r.getDouble(2))
      val m = s1 / n
      val vr = (s2 - s1 * m) / (n - 1.0)
      val t = m / math.sqrt(vr / n)
      Seq("mean_diff" -> m, "t" -> t).foreach { case (name, v) =>
        val scale = 10000.0
        val frac = v * scale - math.floor(v * scale)
        val margin = math.abs(frac - 0.5) / scale
        val driftBound = (math.abs(v) + 1.0) * 1e-14
        assert(margin > 1e3 * driftBound,
          f"$dir: unrounded $name $v%.10g sits $margin%.3e from its 4-digit boundary")
      }
    }
  }

  test("pairedT: hand-derived mean/t via the operator's own IEEE sequence; degenerate NULL") {
    import spark.implicits._
    def hr(x: Double, d: Int): Double = {
      val sc = (1 to d).foldLeft(1L)((a, _) => a * 10L).toDouble
      math.floor(x * sc + 0.5) / sc
    }
    // diffs [2, -1, 3, 0]: zero diffs COUNT (unlike the sign/rank tests)
    val df0 = Seq(2.0, -1.0, 3.0, 0.0).toDF("__d")
    val r = Stats.pairedT(df0, "__d").collect().head
    val n = 4.0; val s1 = 4.0; val s2 = 14.0
    val m = s1 / n
    val vr = (s2 - s1 * m) / (n - 1.0)
    val t = m / math.sqrt(vr / n)
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == hr(m, 4) && r.getDouble(2) == hr(t, 4))
    assert(!r.getBoolean(3), "small-sample mean shift must not flag")
    // single pair or constant diffs degenerate to NULL t
    val r2 = Stats.pairedT(Seq(5.0).toDF("__d"), "__d").collect().head
    assert(r2.isNullAt(2) && r2.isNullAt(3))
    val r3 = Stats.pairedT(Seq(5.0, 5.0).toDF("__d"), "__d").collect().head
    assert(r3.isNullAt(2), "zero variance must NULL the statistic")
  }

  test("jarqueBera: hand-derived jb via the operator's own IEEE sequence; degenerate NULL") {
    import spark.implicits._
    def hr2(x: Double): Double = math.floor(x * 100.0 + 0.5) / 100.0
    // skewed group: [1,1,1,10]; constant group degenerates
    val df0 = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 10.0),
      ("c", 7.0), ("c", 7.0), ("c", 7.0)).toDF("g", "v")
    val rows = Stats.jarqueBera(df0, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val n = 4.0
    val (s1, s2, s3, s4) = (13.0, 103.0, 1003.0, 10003.0)
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m
    val m4 = s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n) - 3.0 * m * m * m * m
    val g1 = m3 / (math.sqrt(m2) * m2)
    val g2 = m4 / (m2 * m2) - 3.0
    val jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    assert(rows("a").getDouble(2) == hr2(jb))
    assert(rows("c").isNullAt(2) && rows("c").isNullAt(3),
      "zero-variance group must NULL jb")
  }

  test("welchT: hand-derived t/df via the operator's own IEEE sequence; degenerate NULL") {
    import spark.implicits._
    def hr(x: Double, d: Int): Double = {
      val sc = (1 to d).foldLeft(1L)((a, _) => a * 10L).toDouble
      math.floor(x * sc + 0.5) / sc
    }
    // A=[1,2,3]: s1=6, s2=14; B=[5,7]: s1=12, s2=74
    val df0 = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 5.0), ("B", 7.0))
      .toDF("g", "v")
    val r = Stats.welchT(df0, "g", "v", "A", "B").collect().head
    val (na, nb) = (3.0, 2.0)
    val ma = 6.0 / na; val mb = 12.0 / nb
    val sea = ((14.0 - 6.0 * ma) / (na - 1.0)) / na
    val seb = ((74.0 - 12.0 * mb) / (nb - 1.0)) / nb
    val t = (ma - mb) / math.sqrt(sea + seb)
    val dfw = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)))
    assert(r.getDouble(2) == hr(ma, 4) && r.getDouble(3) == hr(mb, 4))
    assert(r.getDouble(4) == hr(t, 4) && r.getDouble(5) == hr(dfw, 2))
    assert(r.getBoolean(6), "clearly separated groups are significant")
    // a 1-row side degenerates to NULL stats
    val r2 = Stats.welchT(
      Seq(("A", 1.0), ("B", 5.0), ("B", 7.0)).toDF("g", "v"), "g", "v", "A", "B")
      .collect().head
    assert(r2.isNullAt(4) && r2.isNullAt(5) && r2.isNullAt(6))
  }

  test("momentsByGroup: out-of-contract magnitude raises, never silently drops") {
    import spark.implicits._
    val df = Seq(("g", 2000.0), ("g", 1.0)).toDF("g", "v")
    val e = intercept[Exception] {
      Stats.momentsByGroup(df, "g", "v").collect()
    }
    assert(e.getMessage != null)
  }

  // ---------------------------------------------------------------- jsd

  test("jsdFromCategoryCounts: hand-derived contributions, zero-side guards") {
    import graft.operators.stats.Drift
    // base: a=3, b=1; cur: a=1, c=1 (c unseen in base -> OTHER)
    val baseC = Seq(("a", 3L), ("b", 1L)).toDF("category", "n")
    val curC = Seq(("a", 1L), ("__OTHER__", 1L)).toDF("category", "n")
    val rows = Drift.jsdFromCategoryCounts(baseC, curC)
      .orderBy("category").collect()
    def hr(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    def contrib(nb: Long, nc: Long, tb: Double, tc: Double): Double = {
      val p = nb.toDouble / tb; val q = nc.toDouble / tc
      val m = (p + q) / 2.0
      val tp = if (nb > 0) p * math.log(p / m) else 0.0
      val tq = if (nc > 0) q * math.log(q / m) else 0.0
      tp / 2.0 + tq / 2.0
    }
    // spine: __OTHER__, a, b (base categories + OTHER); tb=4, tc=2
    assert(rows.map(_.getString(0)).toSeq == Seq("__OTHER__", "a", "b"))
    val byCat = rows.map(r => r.getString(0) -> r).toMap
    assert(byCat("a").getDouble(3) == 0.75 && byCat("a").getDouble(4) == 0.5)
    assert(byCat("a").getDouble(5) == hr(contrib(3, 1, 4.0, 2.0)))
    // b: present only in base -> q=0, termQ guard contributes 0
    assert(byCat("b").getDouble(5) == hr(contrib(1, 0, 4.0, 2.0)))
    // OTHER: present only in cur
    assert(byCat("__OTHER__").getDouble(5) == hr(contrib(0, 1, 4.0, 2.0)))
    // identical distributions -> every contribution exactly 0
    val same = Drift.jsdFromCategoryCounts(baseC, baseC).collect()
    assert(same.forall(_.getDouble(5) == 0.0))
  }

  // q_levene's F rides the same drift class as q_anova over the
  // deviation column; margin-audit the PRE-rounding F at 3 SFs
  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"levene margin audit at $dir: unrounded F clear of its 4-digit boundary") {
      val o = sources.Snapshot(spark, sf(dir)).orders
        .where(col("o_orderpriority").isNotNull && col("o_totalprice").isNotNull)
      val med = o.groupBy("o_orderpriority")
        .agg(expr("percentile(o_totalprice, 0.5)").as("__med"))
      val dev = o.join(broadcast(med), "o_orderpriority")
        .select(col("o_orderpriority").as("g"),
          abs(col("o_totalprice") - col("__med")).as("v"))
      val agg = dev.groupBy("g").agg(
        count(lit(1)).as("n"),
        graft.functions.ExactMath.dsum(col("v")).as("sg"),
        sum((col("v").cast("decimal(18,6)") * col("v").cast("decimal(18,6)"))
          .cast("decimal(18,6)")).cast("double").as("qg"))
        .orderBy("g")
        .collect()
      val k = agg.length
      val n = agg.map(_.getAs[Long]("n")).sum
      val sTot = agg.map(_.getAs[Double]("sg")).foldLeft(0.0)(_ + _)
      val qTot = agg.map(_.getAs[Double]("qg")).foldLeft(0.0)(_ + _)
      val bTot = agg.map(r => r.getAs[Double]("sg") * r.getAs[Double]("sg")
        / r.getAs[Long]("n").toDouble).foldLeft(0.0)(_ + _)
      assert(k >= 2 && (qTot - bTot) > 0.0)
      val f = ((bTot - sTot * sTot / n.toDouble) / (k - 1).toDouble) /
        ((qTot - bTot) / (n - k).toDouble)
      val scale = 10000.0
      val frac = f * scale - math.floor(f * scale)
      val margin = math.abs(frac - 0.5) / scale
      val driftBound = (math.abs(f) + 1.0) * 1e-14
      assert(margin > 1e3 * driftBound,
        f"$dir: unrounded levene F $f%.10g sits $margin%.3e from its 4-digit boundary")
    }
  }

  // ------------------------------------------------------- kendall tau-b

  test("kendallTauByKey: hand-derived counts and tau_b; tie classes split") {
    // x=[1,2,3,4,4], y=[1,3,2,4,5]: nc=8, nd=1, tied-x=1, tied-y=0
    val df = Seq((1L, 1.0, 1.0), (2L, 2.0, 3.0), (3L, 3.0, 2.0),
      (4L, 4.0, 4.0), (5L, 4.0, 5.0))
      .map { case (t, x, y) => ("g", t, x, y) }.toDF("k", "t", "x", "y")
    val r = Stats.kendallTauByKey(df, Seq("k"), "x", "y", "t").collect().head
    assert(r.getAs[Long]("n_points") == 5L && r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Long]("n_concordant") == 8L && r.getAs[Long]("n_discordant") == 1L)
    assert(r.getAs[Long]("n_tied_x") == 1L && r.getAs[Long]("n_tied_y") == 0L)
    // the operator's own IEEE sequence
    assert(r.getAs[Double]("tau_b") == 7.0 / math.sqrt(9.0 * 10.0))
  }

  test("kendallTauByKey: a both-tied pair counts toward BOTH tie totals") {
    // (1,1),(1,1),(2,2): the (p1,p2) pair is tied in x AND y
    val df = Seq((1L, 1.0, 1.0), (2L, 1.0, 1.0), (3L, 2.0, 2.0))
      .map { case (t, x, y) => ("g", t, x, y) }.toDF("k", "t", "x", "y")
    val r = Stats.kendallTauByKey(df, Seq("k"), "x", "y", "t").collect().head
    assert(r.getAs[Long]("n_tied_x") == 1L && r.getAs[Long]("n_tied_y") == 1L)
    assert(r.getAs[Long]("n_concordant") == 2L)
    assert(r.getAs[Double]("tau_b") == 2.0 / math.sqrt(2.0 * 2.0))
  }

  test("kendallTauByKey: constant column yields NULL; 1-point keys drop") {
    val df = Seq(("c", 1L, 1.0, 7.0), ("c", 2L, 2.0, 7.0),
      ("solo", 1L, 1.0, 1.0)).toDF("k", "t", "x", "y")
    val rows = Stats.kendallTauByKey(df, Seq("k"), "x", "y", "t").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "c")
    assert(rows.head.isNullAt(rows.head.fieldIndex("tau_b")))
  }

  test("kendallTauByKey matches an O(n^2) brute force on seeded data") {
    val rnd = new scala.util.Random(42)
    val pts = (1 to 40).map(i =>
      ("g", i.toLong, rnd.nextInt(8).toDouble, rnd.nextInt(8).toDouble))
    val df = pts.toDF("k", "t", "x", "y")
    val r = Stats.kendallTauByKey(df, Seq("k"), "x", "y", "t").collect().head
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L
    for (i <- pts.indices; j <- pts.indices if i < j) {
      val cx = pts(i)._3.compare(pts(j)._3)
      val cy = pts(i)._4.compare(pts(j)._4)
      if (cx == 0) tx += 1
      if (cy == 0) ty += 1
      if (cx * cy > 0) nc += 1
      if (cx * cy < 0) nd += 1
    }
    val n0 = 40L * 39 / 2
    assert((r.getAs[Long]("n_concordant"), r.getAs[Long]("n_discordant"),
      r.getAs[Long]("n_tied_x"), r.getAs[Long]("n_tied_y")) == ((nc, nd, tx, ty)))
    assert(r.getAs[Double]("tau_b") ==
      (nc - nd).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble))
  }

  // ------------------------------------------------ wilcoxon signed-rank

  test("wilcoxonSignedRank: hand-derived W+ and z, untied and tied") {
    // d=[1,-2,3,-4,5]: W+ = 1+3+5 = 9; no ties
    val d1 = Seq(1.0, -2.0, 3.0, -4.0, 5.0).toDF("d")
    val r1 = Stats.wilcoxonSignedRank(d1, "d").collect().head
    assert((r1.getLong(0), r1.getLong(1)) == ((5L, 9L)))
    val var1 = 330.0 / 24.0 - 0.0 / 48.0
    assert(r1.getDouble(2) == (18.0 - 15.0) / (2.0 * math.sqrt(var1)))
    // ties: d=[2,-2,3]: W2 = 3+6 = 9 (w_plus truncates 4.5 -> 4),
    // ties term = 6, var = 84/24 - 6/48
    val d2 = Seq(2.0, -2.0, 3.0).toDF("d")
    val r2 = Stats.wilcoxonSignedRank(d2, "d").collect().head
    assert((r2.getLong(0), r2.getLong(1)) == ((3L, 4L)))
    val var2 = 84.0 / 24.0 - 6.0 / 48.0
    assert(r2.getDouble(2) == (9.0 - 6.0) / (2.0 * math.sqrt(var2)))
  }

  test("wilcoxonSignedRank: zero diffs drop; all-zero input degenerates to NULL") {
    val d1 = Seq(0.0, 0.0, 1.0).toDF("d")
    val r1 = Stats.wilcoxonSignedRank(d1, "d").collect().head
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 1L)
    val d2 = Seq(0.0, 0.0).toDF("d")
    val r2 = Stats.wilcoxonSignedRank(d2, "d").collect().head
    assert(r2.getLong(0) == 0L && r2.isNullAt(2))
  }

  // ----------------------------------------------------------- runs test

  test("runsTest: hand-derived runs, median drop, exact-zero and exact z") {
    // key a: values [5,6,1,2,7] by date — sorted [1,2,5,6,7], lower
    // median 5 drops; residue signs +,-,-,+ -> runs 3, n1=n2=2,
    // E = 3 exactly -> z = 0.0 exactly
    val a = Seq((1, 5.0), (2, 6.0), (3, 1.0), (4, 2.0), (5, 7.0))
      .map { case (d, v) => ("a", d, v) }
    // key b: monotone 1..6 — median 3 drops; signs -,-,+,+,+ -> runs 2
    val b = (1 to 6).map(i => ("b", i, i.toDouble))
    // key c: constant — every row equals the median, residue empties
    val c = (1 to 4).map(i => ("c", i, 9.0))
    val df = (a ++ b ++ c).toDF("k", "d", "v")
    val rows = Stats.runsTest(df, Seq("k"), "d", "d", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val ra = rows("a")
    assert(ra.getDouble(2) == 5.0 && (ra.getLong(3), ra.getLong(4), ra.getLong(5)) ==
      ((2L, 2L, 3L)))
    assert(ra.getDouble(6) == 0.0)
    val rb = rows("b")
    assert(rb.getDouble(2) == 3.0 && (rb.getLong(3), rb.getLong(4), rb.getLong(5)) ==
      ((3L, 2L, 2L)))
    val e = 12.0 / 5.0 + 1.0
    val v = (12L * 7L).toDouble / (5L * 5L * 4L).toDouble
    assert(rb.getDouble(6) == (2.0 - e) / math.sqrt(v))
    val rc = rows("c")
    assert((rc.getLong(3), rc.getLong(4), rc.getLong(5)) == ((0L, 0L, 0L)))
    assert(rc.isNullAt(6))
  }

  // ------------------------------------------------------ kruskal-wallis

  test("kruskalWallis: hand-derived H; tie correction; degenerate NULLs") {
    import graft.operators.stats.Stats
    // A=[1,2], B=[3,4]: doubled rank sums 6 and 14; H = 3*116/20 - 15
    val d1 = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)).toDF("g", "v")
    val r1 = Stats.kruskalWallis(d1, "g", "v").collect().head
    assert((r1.getLong(0), r1.getLong(1)) == ((4L, 2L)))
    val s0 = 0.0 + 36.0 / 2.0 + 196.0 / 2.0
    val h = 3.0 * s0 / 20.0 - 3.0 * 5.0
    assert(r1.getDouble(2) == h)
    // no ties: correction factor is exactly 1, H_c == H bit for bit
    assert(r1.getDouble(3) == h / 1.0)
    // all values tied: correction degenerates -> NULL H_c (H itself is
    // defined and equals its all-tied value)
    val d2 = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0)).toDF("g", "v")
    val r2 = Stats.kruskalWallis(d2, "g", "v").collect().head
    assert(r2.isNullAt(3))
    // one group -> NULL both
    val d3 = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v")
    val r3 = Stats.kruskalWallis(d3, "g", "v").collect().head
    assert(r3.isNullAt(2) && r3.isNullAt(3))
  }

  test("kruskalWallis: two groups reduces to the mann-whitney ordering signal") {
    import graft.operators.stats.Stats
    // clearly shifted groups: H large; overlapping groups: H near 0
    val shifted = ((1 to 20).map(i => ("lo", i.toDouble)) ++
      (21 to 40).map(i => ("hi", i.toDouble))).toDF("g", "v")
    val hS = Stats.kruskalWallis(shifted, "g", "v").collect().head.getDouble(3)
    val mixed = (1 to 40).map(i =>
      (if (i % 2 == 0) "a" else "b", i.toDouble)).toDF("g", "v")
    val hM = Stats.kruskalWallis(mixed, "g", "v").collect().head.getDouble(3)
    assert(hS > 20.0 && hM < 1.0)
  }

  // ------------------------------------------------------- poisson rates

  test("poissonRateTest: hand-derived rates and z; zero exposure yields NULL") {
    // A: 4 events over 2 days (rate 2), B: 1 event over 1 day (rate 1)
    val df = Seq(
      ("A", "d1"), ("A", "d1"), ("A", "d1"), ("A", "d2"),
      ("B", "d1")).toDF("g", "day")
    val r = Stats.poissonRateTest(df, "g", "day", "A", "B").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 1L, 1L)))
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 1.0)
    assert(r.getDouble(6) == (2.0 - 1.0) / math.sqrt(4.0 / 4.0 + 1.0 / 1.0))
    // a cohort with no rows: NULL rate/z, not NaN
    val r2 = Stats.poissonRateTest(df, "g", "day", "A", "C").collect().head
    assert(r2.getLong(2) == 0L && r2.getLong(3) == 0L)
    assert(r2.isNullAt(5) && r2.isNullAt(6))
  }
}
