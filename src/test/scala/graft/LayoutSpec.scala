package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, ZValue}
import graft.operators.layout.Layout

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed tables join with ZERO exchanges; the parquet control shuffles") {
    // SURVEY §4's co-located-join prescription made measurable: both
    // sides pre-bucketed on the key at the same count -> the sort-merge
    // join consumes the file layout, no Exchange on either side. The
    // plain-parquet control over the SAME data must shuffle both sides.
    val sn = graft.sources.Snapshot(spark, sf())
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucketed").toFile
    tmp.deleteOnExit()
    val orders = sn.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = sn.customer.select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    // a tiny side would broadcast (its own Exchange) and mask the layout
    // effect — force the sort-merge path both ways
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(orders, "b_orders", s"$tmp/orders", 8, Seq("o_custkey"))
      Layout.writeBucketed(cust, "b_cust", s"$tmp/cust", 8, Seq("o_custkey"))
      val joined = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      // control: identical data via plain parquet shuffles both sides
      orders.write.mode("overwrite").parquet(s"$tmp/po")
      cust.write.mode("overwrite").parquet(s"$tmp/pc")
      val control = spark.read.parquet(s"$tmp/po")
        .join(spark.read.parquet(s"$tmp/pc"), "o_custkey")
      val controlRows = control.collect()
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"),
        "the un-bucketed control should shuffle — plan-assert is vacuous otherwise")
      // same answer both ways (bucketing is layout, not semantics)
      assert(rows.nonEmpty && rows.map(_.toString).sorted.toSeq ==
        controlRows.map(_.toString).sorted.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }

  test("ZValue interleaves range-bucket bits (known boundaries)") {
    // 2 bits/col: boundaries (10, 20, 30) -> buckets 0..3
    val b = Seq(Seq(10.0, 20.0, 30.0), Seq(10.0, 20.0, 30.0))
    val df = Seq(
      (5.0, 5.0),   // buckets (0,0) -> z 0
      (35.0, 35.0), // buckets (3,3) -> z 0b1111 = 15
      (35.0, 5.0),  // buckets (3,0) -> bits of x at even positions: 0b0101 = 5
      (5.0, 35.0),  // buckets (0,3) -> 0b1010 = 10
      (15.0, 25.0)  // buckets (1,2) -> x bit0@0, y bit1@3: 0b1001 = 9
    ).toDF("x", "y")
    val z = df.select(GraftFunctions.zvalue(Seq(col("x"), col("y")), b).as("z"))
      .as[Long].collect().toSeq
    assert(z == Seq(0L, 15L, 5L, 10L, 9L))
    // boundary value itself goes to the LOWER bucket (bucket = #boundaries < v)
    val edge = Seq((10.0, 10.000001)).toDF("x", "y")
      .select(GraftFunctions.zvalue(Seq(col("x"), col("y")), b).as("z")).as[Long].head()
    assert(edge == 2L) // x bucket 0, y bucket 1 -> y bit0 at position 1
  }

  test("ZValue codegen equals interpreted eval; nulls and NaN bucket to 0") {
    val b = Seq(Seq.tabulate(15)(i => i * 10.0 + 10.0), Seq.tabulate(15)(i => i * 5.0 + 5.0))
    val rows = Seq[(java.lang.Double, java.lang.Double)](
      (3.0, 71.2), (159.9, 0.0), (null, 40.0), (Double.NaN, 33.3), (80.0, null), (200.0, 100.0))
    val df = rows.toDF("x", "y")
    val viaCodegen = df.select(GraftFunctions.zvalue(Seq(col("x"), col("y")), b).as("z"))
      .as[Long].collect().toSeq
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.DoubleType
    val viaEval = rows.map { case (x, y) =>
      ZValue(Seq(Literal.create(x, DoubleType), Literal.create(y, DoubleType)), b)
        .eval(null).asInstanceOf[Long]
    }
    assert(viaCodegen == viaEval)
    // null and NaN x -> x buckets 0: identical to x = min
    assert(viaEval(2) == ZValue(Seq(Literal.create(0.0, DoubleType),
      Literal.create(40.0, DoubleType)), b).eval(null).asInstanceOf[Long])
  }

  // dogfood the public audit operator: one distributed pass, one row per
  // file — exactly what a footer-stats pruning reader sees
  private def perFileSpans(dir: String, cols: Seq[String]): Seq[Map[String, (Double, Double)]] =
    Layout.fileStats(spark, dir, cols).collect().toSeq.map { r =>
      cols.map { c =>
        c -> (r.getAs[Double](s"${c}_min"), r.getAs[Double](s"${c}_max"))
      }.toMap
    }

  test("z-ordered files carry tight min/max on BOTH columns; linear sort only on one") {
    // 200x200 grid, 40k rows: 16 z-ordered files should tile ~4x4
    val grid = spark.range(40000).select(
      (col("id") % 200).cast("double").as("x"),
      floor(col("id") / 200).cast("double").as("y"))
    val base = java.nio.file.Files.createTempDirectory("layout").toString

    Layout.writeZOrdered(grid, Seq("x", "y"), s"$base/z", nFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/linear")

    val zs = perFileSpans(s"$base/z", Seq("x", "y"))
    val ls = perFileSpans(s"$base/linear", Seq("x", "y"))
    assert(zs.size == 16 && ls.size == 16)
    def avgSpan(s: Seq[Map[String, (Double, Double)]], c: String) =
      s.map { m => m(c)._2 - m(c)._1 }.sum / s.size
    // global span 199; ideal 4x4 tiling -> ~50 per dim. Allow slack for
    // quantile error and range-partition balance.
    assert(avgSpan(zs, "x") < 90, s"z avg x span ${avgSpan(zs, "x")}")
    assert(avgSpan(zs, "y") < 90, s"z avg y span ${avgSpan(zs, "y")}")
    // the linear layout prunes on x but is blind on y
    assert(avgSpan(ls, "x") < 30, s"linear avg x span ${avgSpan(ls, "x")}")
    assert(avgSpan(ls, "y") > 180, s"linear avg y span ${avgSpan(ls, "y")}")

    // what a footer-stats pruning reader would touch for `y < 25`:
    def touched(s: Seq[Map[String, (Double, Double)]]) =
      s.count { m => m("y")._1 < 25.0 }
    assert(touched(zs) <= 6, s"z files touched ${touched(zs)} of 16")
    assert(touched(ls) == 16, s"linear files touched ${touched(ls)} of 16")
  }

  test("compact collapses a many-small-files table to the target count, content-identical") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val df = spark.range(50000).select(col("id"), (col("id") % 97).as("k"))
    df.repartition(64).write.parquet(s"$base/small") // 64 tiny files
    def files(p: String) = new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files(s"$base/small") == 64)
    val smallBytes = new java.io.File(s"$base/small").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    Layout.compact(spark, s"$base/small", s"$base/big", targetFileBytes = smallBytes / 4)
    val got = files(s"$base/big")
    assert(got >= 3 && got <= 6, s"files $got") // ~4: sized from on-disk bytes
    assert(spark.read.parquet(s"$base/big").select("id").as[Long].collect().sorted.toSeq
      == (0L until 50000L))
    // refuses in-place rewrites
    intercept[IllegalArgumentException] {
      Layout.compact(spark, s"$base/big", s"$base/big")
    }
  }

  test("z-order survives skewed distributions via quantile boundaries") {
    // 90% of mass at x in [0,10), long tail to 10000: equal-width buckets
    // would put ~90% of rows in one bucket; quantile buckets keep files
    // balanced and tight around the hot range
    val skew = spark.range(20000).select(
      when(col("id") % 10 < 9, (col("id") % 100) / 10.0)
        .otherwise((col("id") % 1000).cast("double") * 10.0).as("x"),
      (col("id") % 128).cast("double").as("y"))
    val out = java.nio.file.Files.createTempDirectory("layoutskew").toString
    Layout.writeZOrdered(skew, Seq("x", "y"), s"$out/z", nFiles = 8)
    val spans = perFileSpans(s"$out/z", Seq("x", "y"))
    // the hot range [0,10) must not all land in a single file
    val hotFiles = spans.count { m => m("x")._1 < 10.0 }
    assert(hotFiles >= 2, s"hot-range files $hotFiles")
    // and y still prunes: average y span well under the global 127
    val avgY = spans.map { m => m("y")._2 - m("y")._1 }.sum / spans.size
    assert(avgY < 100, s"avg y span $avgY")
  }
}
