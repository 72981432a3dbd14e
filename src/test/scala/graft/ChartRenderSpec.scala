package graft

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.api.{ChartRender, Procurement}
import graft.sources.Snapshot

/** Pixel-level checks on the pure-JDK chart renderer: the PNGs decode
  * back at the requested size and actually contain the marks (bars /
  * lines / slices) at positions implied by the data.
  */
class ChartRenderSpec extends SparkSpecBase {
  import spark.implicits._

  private def decode(bytes: Array[Byte]) =
    ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def countColor(img: java.awt.image.BufferedImage, rgb: Int): Int = {
    var n = 0
    (0 until img.getHeight).foreach { y =>
      (0 until img.getWidth).foreach { x =>
        if ((img.getRGB(x, y) & 0xFFFFFF) == rgb) n += 1
      }
    }
    n
  }

  private val Blue = 31 << 16 | 119 << 8 | 180   // palette(0)
  private val Orange = 255 << 16 | 127 << 8 | 14 // palette(1)

  test("bar chart: a 2x value draws ~2x the bar pixels, left-to-right order kept") {
    val df = Seq(("alpha", 200.0), ("beta", 100.0)).toDF("unit", "total")
    val img = decode(ChartRender.barChartPng(df, "unit", "total", 400, 300, "t"))
    assert(img.getWidth == 400 && img.getHeight == 300)
    // alpha's bar lives in the left half, beta's in the right
    val left = (70 until 235).map(x => (30 until 240).count(
      y => (img.getRGB(x, y) & 0xFFFFFF) == Blue)).sum
    val right = (235 until 380).map(x => (30 until 240).count(
      y => (img.getRGB(x, y) & 0xFFFFFF) == Blue)).sum
    assert(left > 0 && right > 0)
    val ratio = left.toDouble / right
    assert(ratio > 1.6 && ratio < 2.4, s"bar area ratio $ratio, want ~2")
  }

  test("bar chart renders the real barAgg output end-to-end") {
    val sn = Snapshot(spark, sf())
    val joined = sn.orders.join(sn.customer, col("o_custkey") === col("c_custkey"))
      .join(sn.nation, col("c_nationkey") === col("n_nationkey"))
    val bytes = ChartRender.barChartPng(
      Procurement.barAgg(joined, "n_name", "o_totalprice"),
      "n_name", "total_budget", title = "budget by nation")
    val img = decode(bytes)
    assert(img.getWidth == 800 && img.getHeight == 500)
    assert(countColor(img, Blue) > 1000) // 25 real bars worth of pixels
  }

  test("line chart: every series gets its palette color on canvas") {
    val df = Seq(("2024-01", 10.0, 5.0), ("2024-02", 30.0, 2.0), ("2024-03", 20.0, 9.0))
      .toDF("month", "total_budget", "n_packages")
    val img = decode(ChartRender.lineChartPng(
      df, "month", Seq("total_budget", "n_packages"), 400, 300))
    assert(countColor(img, Blue) > 50)   // series 1 polyline + markers + legend
    assert(countColor(img, Orange) > 50) // series 2
  }

  test("pie chart: slice pixel areas track the shares") {
    val df = Seq(("a", 3L), ("b", 1L)).toDF("seg", "n")
    val img = decode(ChartRender.pieChartPng(df, "seg", "n", 400, 300))
    val blue = countColor(img, Blue); val orange = countColor(img, Orange)
    assert(blue > 0 && orange > 0)
    val ratio = blue.toDouble / orange
    assert(ratio > 2.0 && ratio < 4.0, s"slice area ratio $ratio, want ~3")
  }

  test("renderer refuses unaggregated input past the row cap") {
    val big = Snapshot(spark, sf()).orders
      .select(col("o_orderkey").cast("string").as("k"), col("o_totalprice").as("v"))
    val e = intercept[IllegalArgumentException] {
      ChartRender.barChartPng(big, "k", "v")
    }
    assert(e.getMessage.contains("aggregate before rendering"))
  }

  test("negative bar values fail loudly instead of rendering a blank bar") {
    val df = Seq(("jan", 50.0), ("feb", -30.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      ChartRender.barChartPng(df, "k", "v")
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("pie with one dominant and many hairline slices never overdraws the dominant one") {
    // 40 hairline slices used to get a 1-degree floor each while the
    // start angle advanced by the true sweep — cumulative overdraw ate
    // the first slice's area. Boundaries now come from rounded
    // cumulative angles: dominant share must survive pixel-accurately.
    val rows = ("big", 900L) +: (1 to 40).map(i => (s"s$i", 2L))
    val df = rows.toDF("seg", "n")
    val img = decode(ChartRender.pieChartPng(df, "seg", "n", 400, 300))
    val blue = countColor(img, Blue) // dominant slice, palette(0)
    // total colored pie pixels across the RENDERER'S palette — reuse it so
    // a palette edit can never silently skew this denominator
    val all = ChartRender.Palette
      .map(c => countColor(img, c.getRGB & 0xFFFFFF)).sum
    val share = blue.toDouble / all
    assert(share > 0.8 && share < 0.98, s"dominant share $share, want ~0.9")
  }

  test("histogram: bar pixel areas track bin counts, bins sorted numerically, gaps zero-filled") {
    // bins arrive unsorted and with bin 2 missing: the renderer must sort
    // 0,1,2,3 numerically, zero-fill bin 2, and draw contiguous bars
    val df = Seq((3L, 6L), (0L, 2L), (1L, 4L)).toDF("bin", "n")
    val img = decode(ChartRender.histogramPng(df, "bin", "n", 470, 300))
    assert(img.getWidth == 470 && img.getHeight == 300)
    // plot x range = 70..450 → 4 slots of 95px; count blue per slot
    val perSlot = (0 until 4).map { s =>
      (70 + s * 95 until 70 + (s + 1) * 95).map(x =>
        (30 until 240).count(y => (img.getRGB(x, y) & 0xFFFFFF) == Blue)).sum
    }
    assert(perSlot(2) == 0, s"missing bin must render empty, got ${perSlot(2)} px")
    assert(perSlot(0) > 0 && perSlot(1) > 0 && perSlot(3) > 0)
    val r10 = perSlot(1).toDouble / perSlot(0)
    val r30 = perSlot(3).toDouble / perSlot(0)
    assert(r10 > 1.6 && r10 < 2.4, s"bin1/bin0 area ratio $r10, want ~2")
    assert(r30 > 2.5 && r30 < 3.5, s"bin3/bin0 area ratio $r30, want ~3")
  }

  test("histogram bars are edge-to-edge (no slot gap), unlike bar charts") {
    val df = Seq((0L, 5L), (1L, 5L)).toDF("bin", "n")
    val img = decode(ChartRender.histogramPng(df, "bin", "n", 400, 300))
    // equal counts → one solid blue band across the whole plot width: every
    // column between the axes contains blue (a bar chart would leave the
    // 20% slot margins white)
    val holes = (71 until 379).count(x =>
      !(30 until 240).exists(y => (img.getRGB(x, y) & 0xFFFFFF) == Blue))
    assert(holes == 0, s"$holes empty columns inside the plot area")
  }

  test("histogram renders the real histogramMonth output end-to-end") {
    val sn = Snapshot(spark, sf())
    val bytes = ChartRender.histogramPng(
      Procurement.histogramMonth(sn.orders, "o_orderdate"),
      "month_num", "n_packages", title = "orders by month")
    val img = decode(bytes)
    assert(img.getWidth == 800 && img.getHeight == 500)
    assert(countColor(img, Blue) > 1000) // 12 contiguous bars worth of pixels
  }

  test("box plot: boxes span q1..q3, median and whisker render at exact rows") {
    val df = Seq(
      ("a", 10.0, 20.0, 30.0, 40.0, 50.0),
      ("b", 5.0, 25.0, 35.0, 65.0, 100.0))
      .toDF("g", "lo", "q1", "med", "q3", "hi")
    val img = decode(ChartRender.boxPlotPng(df, "g", "lo", "q1", "med", "q3", "hi",
      470, 300))
    assert(img.getWidth == 470 && img.getHeight == 300)
    // geometry: x0=70, x1=450, y0=30, y1=240, vMax=100
    // toY(v) = 240 - (v/100*210).toInt; slot=190
    def toY(v: Double): Int = 240 - (v / 100.0 * 210).toInt
    // group a box: x in [117, 212), y in [toY(40), toY(20)) = [156, 198)
    val aCols = 120 to 208
    def blueRows(x: Int): Seq[Int] =
      (31 until 240).filter(y => (img.getRGB(x, y) & 0xFFFFFF) == Blue)
    val aRows = blueRows(160)
    assert(aRows.nonEmpty && math.abs(aRows.min - toY(40)) <= 1 &&
      math.abs(aRows.max - (toY(20) - 1)) <= 1,
      s"group-a box rows ${aRows.min}..${aRows.max}, want ~${toY(40)}..${toY(20) - 1}")
    // group b box is taller: q3-q1 = 40 vs 20
    val bRows = blueRows(350)
    assert(bRows.size > aRows.size * 3 / 2,
      s"group-b box (${bRows.size}px) should be ~2x group-a (${aRows.size}px)")
    // median: a BLACK row across the box at toY(30)
    val medY = toY(30.0)
    val blackInBox = aCols.count(x => (img.getRGB(x, medY) & 0xFFFFFF) == 0)
    assert(blackInBox > 50, s"median line missing: $blackInBox black px at y=$medY")
    // whisker: dark-gray pixels on the center column ABOVE the box top
    val cx = 70 + 95
    val whisker = (toY(50.0) to toY(40.0) - 2)
      .count(y => (img.getRGB(cx, y) & 0xFFFFFF) == 0x404040)
    assert(whisker > 10, s"upper whisker missing: $whisker px on x=$cx")
  }

  test("box plot refuses unordered or negative stats") {
    val bad = Seq(("a", 10.0, 40.0, 30.0, 20.0, 50.0))
      .toDF("g", "lo", "q1", "med", "q3", "hi")
    assert(intercept[IllegalArgumentException] {
      ChartRender.boxPlotPng(bad, "g", "lo", "q1", "med", "q3", "hi")
    }.getMessage.contains("ordered"))
    val neg = Seq(("a", -1.0, 2.0, 3.0, 4.0, 5.0))
      .toDF("g", "lo", "q1", "med", "q3", "hi")
    assert(intercept[IllegalArgumentException] {
      ChartRender.boxPlotPng(neg, "g", "lo", "q1", "med", "q3", "hi")
    }.getMessage.contains("non-negative"))
  }

  test("box plot renders the real q_boxplot_stats output end-to-end") {
    val bytes = ChartRender.boxPlotPng(
      SparkEntry.queries("q_boxplot_stats")(spark, sf()),
      "o_orderpriority", "whisker_lo", "q1", "median", "q3", "whisker_hi",
      title = "order value by priority")
    val img = decode(bytes)
    assert(img.getWidth == 800 && img.getHeight == 500)
    assert(countColor(img, Blue) > 500)
  }

  test("histogram refuses negative counts") {
    val df = Seq((1L, 5L), (2L, -1L)).toDF("bin", "n")
    assert(intercept[IllegalArgumentException] {
      ChartRender.histogramPng(df, "bin", "n")
    }.getMessage.contains("non-negative"))
  }

  test("empty and non-numeric inputs fail loudly, not with a blank chart") {
    val empty = Seq.empty[(String, Double)].toDF("k", "v")
    assert(intercept[IllegalArgumentException] {
      ChartRender.barChartPng(empty, "k", "v")
    }.getMessage.contains("empty"))
    val text = Seq(("a", "not a number")).toDF("k", "v")
    assert(intercept[IllegalArgumentException] {
      ChartRender.pieChartPng(text, "k", "v")
    }.getMessage.contains("not numeric"))
  }
}
