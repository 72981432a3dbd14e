package graft.api

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage

import org.apache.spark.sql.DataFrame

/** Chart PNG rendering — the final step of the reference's chart tools
  * (`/root/reference/openai/list_of_tools.py:204-388` and
  * `/root/reference/langchain/my_toolkit.py:188` end every chart in a
  * matplotlib `savefig`). Pure-JDK `Graphics2D`, no plotting library.
  *
  * Rendering is a DRIVER-side presentation step over an already-aggregated,
  * driver-sized chart frame (a handful of bars/slices/points by
  * definition — `validateForChart` enforces suitability upstream); the
  * distributed work is the aggregation, which stays in
  * [[Procurement.barAgg]] / [[Procurement.pieAgg]] /
  * [[Procurement.monthlyTrend]]. A hard row cap makes the contract
  * explicit: this never becomes a collect() on unaggregated data.
  */
object ChartRender {

  /** matplotlib's default ("tab10") categorical palette — public knowledge,
    * used so output reads like the reference's charts. Package-visible so
    * pixel specs count exactly the colors the renderer draws.
    */
  private[graft] val Palette: Array[Color] = Array(
    new Color(31, 119, 180), new Color(255, 127, 14), new Color(44, 160, 44),
    new Color(214, 39, 40), new Color(148, 103, 189), new Color(140, 86, 75),
    new Color(227, 119, 194), new Color(127, 127, 127), new Color(188, 189, 34),
    new Color(23, 190, 207))

  private val MaxRows = 1000

  /** Collects a bounded (label, value...) chart frame. Fails loudly past
    * the row cap — charts are aggregates, never raw data.
    */
  private def frame(df: DataFrame, cols: Seq[String]): Seq[(String, Seq[Double])] = {
    val rows = df.select(cols.head, cols.tail: _*).limit(MaxRows + 1).collect()
    require(rows.nonEmpty, "chart input is empty")
    require(rows.length <= MaxRows,
      s"chart input exceeds $MaxRows rows — aggregate before rendering")
    rows.toSeq.map { r =>
      val label = Option(r.get(0)).map(_.toString).getOrElse("null")
      val values = (1 until cols.length).map { i =>
        r.get(i) match {
          case null      => 0.0
          case n: Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"value column ${cols(i)} is not numeric: ${other.getClass}")
        }
      }
      (label, values)
    }
  }

  private def canvas(w: Int, h: Int): (BufferedImage, Graphics2D) = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, w, h)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
    (img, g)
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def drawTitle(g: Graphics2D, title: String, w: Int): Unit =
    if (title.nonEmpty) {
      g.setColor(Color.BLACK)
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 14))
      val fm = g.getFontMetrics
      g.drawString(title, (w - fm.stringWidth(title)) / 2, 20)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
    }

  /** Value axis with ~5 ticks and gridlines; returns value→y mapping. */
  private def valueAxis(g: Graphics2D, vMax: Double, x0: Int, y0: Int, y1: Int,
      x1: Int): Double => Int = {
    val top = if (vMax <= 0) 1.0 else vMax
    val toY = (v: Double) => y1 - ((v / top) * (y1 - y0)).toInt
    g.setColor(new Color(220, 220, 220))
    (0 to 5).foreach { t =>
      val v = top * t / 5
      val y = toY(v)
      g.drawLine(x0, y, x1, y)
    }
    g.setColor(Color.DARK_GRAY)
    (0 to 5).foreach { t =>
      val v = top * t / 5
      val s = if (top >= 1000) f"${v}%.3g" else f"$v%.1f"
      g.drawString(s, 4, toY(v) + 4)
    }
    g.setColor(Color.BLACK)
    g.drawLine(x0, y0, x0, y1) // y axis
    g.drawLine(x0, y1, x1, y1) // x axis
    toY
  }

  /** Bar chart over a (label, value) frame — the reference's
    * `bar_chart_tool`. Input shape matches [[Procurement.barAgg]] /
    * [[Procurement.histogramMonth]] / [[Procurement.histogramNumeric]]
    * output (histograms are bar charts of bin counts).
    */
  def barChartPng(df: DataFrame, labelCol: String, valueCol: String,
      width: Int = 800, height: Int = 500, title: String = ""): Array[Byte] = {
    val data = frame(df, Seq(labelCol, valueCol))
    // a negative bar would silently render as nothing (negative-height
    // fillRect is a no-op) — fail loudly like the pie renderer does
    require(data.forall(_._2.head >= 0),
      "bar values must be non-negative — shift or transform signed series first")
    val (img, g) = canvas(width, height)
    drawTitle(g, title, width)
    val (x0, y0, y1, x1) = (70, 30, height - 60, width - 20)
    val toY = valueAxis(g, data.map(_._2.head).max, x0, y0, y1, x1)
    val n = data.length
    val slot = (x1 - x0).toDouble / n
    val barW = math.max(1, (slot * 0.8).toInt)
    data.zipWithIndex.foreach { case ((label, vs), i) =>
      val bx = x0 + (i * slot + slot * 0.1).toInt
      val by = toY(vs.head)
      g.setColor(Palette(0))
      g.fillRect(bx, by, barW, y1 - by)
      g.setColor(Color.DARK_GRAY)
      val fm = g.getFontMetrics
      val lab = if (label.length > 12) label.take(11) + "…" else label
      // draw a label only when it fits its slot; always label sparse charts
      if (fm.stringWidth(lab) <= slot || n <= 12)
        g.drawString(lab, bx + (barW - fm.stringWidth(lab)) / 2, y1 + 14)
    }
    g.dispose()
    png(img)
  }

  /** Histogram over a (bin, count) frame — the final presentation step of
    * the reference's `histogram_tool`
    * (`/root/reference/openai/list_of_tools.py:14`,
    * `/root/reference/langchain/my_toolkit.py:347` both end in a rendered
    * histogram), fed by [[Procurement.histogramMonth]] /
    * [[Procurement.histogramNumeric]]. Differs from [[barChartPng]] the
    * way a histogram differs from a bar chart: bins are sorted by their
    * NUMERIC key when every label parses as one (string labels sort
    * lexically), integer bin keys are made CONTIGUOUS — absent bins
    * render as zero-count gaps so the x axis is honest about empty
    * ranges — and bars are drawn edge-to-edge with no slot gap.
    */
  def histogramPng(df: DataFrame, binCol: String, countCol: String,
      width: Int = 800, height: Int = 500, title: String = ""): Array[Byte] = {
    val raw = frame(df, Seq(binCol, countCol))
    require(raw.forall(_._2.head >= 0), "histogram counts must be non-negative")
    val asNum = (s: String) => scala.util.Try(s.trim.toDouble).toOption
    val numeric = raw.forall(r => asNum(r._1).isDefined)
    val sorted =
      if (numeric) raw.sortBy(r => asNum(r._1).get) else raw.sortBy(_._1)
    val data: Seq[(String, Seq[Double])] =
      if (numeric && sorted.forall(r => { val v = asNum(r._1).get; v.isWhole })) {
        // integer bins: zero-fill the gaps (bounded by the same row cap —
        // a sparser range falls back to the observed bins only)
        val keys = sorted.map(r => asNum(r._1).get.toLong)
        val (lo, hi) = (keys.min, keys.max)
        // BigInt span: extreme bin keys must take the fallback, not wrap
        // Long and crash materializing a 2^63-element range
        if (BigInt(hi) - BigInt(lo) + 1 <= MaxRows) {
          val byKey = keys.zip(sorted.map(_._2)).toMap
          (lo to hi).map(k => (k.toString, byKey.getOrElse(k, Seq(0.0))))
        } else sorted
      } else sorted
    val (img, g) = canvas(width, height)
    drawTitle(g, title, width)
    val (x0, y0, y1, x1) = (70, 30, height - 60, width - 20)
    val toY = valueAxis(g, data.map(_._2.head).max, x0, y0, y1, x1)
    val n = data.length
    val slot = (x1 - x0).toDouble / n
    data.zipWithIndex.foreach { case ((_, vs), i) =>
      // edge-to-edge: each bar spans exactly its slot, rounded so
      // neighboring bars share a boundary pixel-exactly
      val bx = x0 + math.round(i * slot).toInt
      val bw = x0 + math.round((i + 1) * slot).toInt - bx
      val by = toY(vs.head)
      g.setColor(Palette(0))
      g.fillRect(bx, by, bw, y1 - by)
    }
    // sparse bin labels: at most ~8, always first and last
    g.setColor(Color.DARK_GRAY)
    val step = math.max(1, n / 8)
    (0 until n by step).toSet.union(Set(n - 1)).toSeq.sorted.foreach { i =>
      val lab = data(i)._1
      val short = if (lab.length > 10) lab.take(10) else lab
      val lx = x0 + math.round(i * slot + slot / 2).toInt
      g.drawString(short, lx - g.getFontMetrics.stringWidth(short) / 2, y1 + 14)
    }
    g.dispose()
    png(img)
  }

  /** Multi-series line chart over an (x, series...) frame — the
    * reference's dual-axis `line_chart_tool` (total budget + package
    * count per month). Each series is min-max scaled to the plot height
    * independently, mirroring the reference's twin-axis layout; series
    * colors follow the palette in column order.
    */
  def lineChartPng(df: DataFrame, xCol: String, seriesCols: Seq[String],
      width: Int = 800, height: Int = 500, title: String = ""): Array[Byte] = {
    require(seriesCols.nonEmpty, "need at least one series column")
    val data = frame(df, xCol +: seriesCols)
    val (img, g) = canvas(width, height)
    drawTitle(g, title, width)
    val (x0, y0, y1, x1) = (70, 30, height - 60, width - 20)
    g.setColor(Color.BLACK)
    g.drawLine(x0, y0, x0, y1)
    g.drawLine(x0, y1, x1, y1)
    val n = data.length
    val toX = (i: Int) => if (n == 1) (x0 + x1) / 2 else x0 + i * (x1 - x0) / (n - 1)
    seriesCols.indices.foreach { s =>
      val vs = data.map(_._2(s))
      val (lo, hi) = (vs.min, vs.max)
      val span = if (hi > lo) hi - lo else 1.0
      val toY = (v: Double) => y1 - (((v - lo) / span) * (y1 - y0 - 20)).toInt - 10
      g.setColor(Palette(s % Palette.length))
      g.setStroke(new BasicStroke(2f))
      (1 until n).foreach { i =>
        g.drawLine(toX(i - 1), toY(vs(i - 1)), toX(i), toY(vs(i)))
      }
      vs.zipWithIndex.foreach { case (v, i) => g.fillOval(toX(i) - 3, toY(v) - 3, 6, 6) }
      // legend swatch + name, top-left, one row per series
      g.fillRect(x0 + 8, y0 + 6 + s * 16, 10, 10)
      g.setColor(Color.DARK_GRAY)
      g.drawString(seriesCols(s), x0 + 22, y0 + 15 + s * 16)
    }
    // sparse x labels: at most ~8, always first and last
    g.setColor(Color.DARK_GRAY)
    val step = math.max(1, n / 8)
    (0 until n by step).toSet.union(Set(n - 1)).toSeq.sorted.foreach { i =>
      val lab = data(i)._1
      val short = if (lab.length > 10) lab.take(10) else lab
      g.drawString(short, toX(i) - g.getFontMetrics.stringWidth(short) / 2, y1 + 14)
    }
    g.dispose()
    png(img)
  }

  /** Box-and-whisker chart over a (label, lo, q1, median, q3, hi)
    * frame — the presentation step of `q_boxplot_stats`' five-number
    * summaries (whiskers at the Tukey-clamped extremes). Geometry
    * follows [[barChartPng]]'s slot layout: each group gets one slot,
    * the box spans the middle 50% of the slot from q1 to q3
    * (palette fill, dark outline), the median is a BLACK line across
    * the box, and the whisker is a dark-gray vertical line lo→hi with
    * end caps. Values must be non-negative and ordered
    * lo ≤ q1 ≤ median ≤ q3 ≤ hi (fail-loud, the bar/pie convention).
    */
  def boxPlotPng(df: DataFrame, labelCol: String, loCol: String, q1Col: String,
      medCol: String, q3Col: String, hiCol: String,
      width: Int = 800, height: Int = 500, title: String = ""): Array[Byte] = {
    val data = frame(df, Seq(labelCol, loCol, q1Col, medCol, q3Col, hiCol))
    require(data.forall(r => r._2(0) <= r._2(1) && r._2(1) <= r._2(2) &&
      r._2(2) <= r._2(3) && r._2(3) <= r._2(4)),
      "box stats must be ordered lo <= q1 <= median <= q3 <= hi")
    require(data.forall(_._2.forall(_ >= 0)),
      "box values must be non-negative — shift or transform signed series first")
    val (img, g) = canvas(width, height)
    drawTitle(g, title, width)
    val (x0, y0, y1, x1) = (70, 30, height - 60, width - 20)
    val toY = valueAxis(g, data.map(_._2(4)).max, x0, y0, y1, x1)
    val n = data.length
    val slot = (x1 - x0).toDouble / n
    data.zipWithIndex.foreach { case ((label, vs), i) =>
      val Seq(lo, q1, med, q3, hi) = vs
      val cx = x0 + (i * slot + slot * 0.5).toInt
      val bx = x0 + (i * slot + slot * 0.25).toInt
      val bw = math.max(1, (slot * 0.5).toInt)
      // whisker: vertical line + end caps
      g.setColor(Color.DARK_GRAY)
      g.drawLine(cx, toY(hi), cx, toY(lo))
      g.drawLine(cx - bw / 4, toY(hi), cx + bw / 4, toY(hi))
      g.drawLine(cx - bw / 4, toY(lo), cx + bw / 4, toY(lo))
      // box q1..q3
      g.setColor(Palette(0))
      g.fillRect(bx, toY(q3), bw, math.max(1, toY(q1) - toY(q3)))
      g.setColor(Color.DARK_GRAY)
      g.drawRect(bx, toY(q3), bw, math.max(1, toY(q1) - toY(q3)))
      // median line
      g.setColor(Color.BLACK)
      g.drawLine(bx, toY(med), bx + bw, toY(med))
      g.setColor(Color.DARK_GRAY)
      val fm = g.getFontMetrics
      val lab = if (label.length > 12) label.take(11) + "…" else label
      if (fm.stringWidth(lab) <= slot || n <= 12)
        g.drawString(lab, cx - fm.stringWidth(lab) / 2, y1 + 14)
    }
    g.dispose()
    png(img)
  }

  /** Pie chart over a (label, value) frame — the reference's
    * `pie_chart_tool` (category shares). Slice boundaries come from the
    * ROUNDED CUMULATIVE angle, so sweeps sum to exactly 360° and later
    * slices never overdraw earlier ones (hairline categories may round
    * to an invisible 0° slice — the legend still lists them).
    */
  def pieChartPng(df: DataFrame, labelCol: String, valueCol: String,
      width: Int = 600, height: Int = 500, title: String = ""): Array[Byte] = {
    val data = frame(df, Seq(labelCol, valueCol))
    require(data.forall(_._2.head >= 0), "pie values must be non-negative")
    val total = data.map(_._2.head).sum
    require(total > 0, "pie values sum to zero")
    val (img, g) = canvas(width, height)
    drawTitle(g, title, width)
    val d = math.min(width - 200, height - 80)
    val (cx, cy) = (40, (height - d) / 2 + 10)
    // cumulative degrees clockwise from noon (matplotlib-style)
    val cums = data.map(_._2.head).scanLeft(0.0)(_ + _)
    data.zipWithIndex.foreach { case ((label, vs), i) =>
      val a0 = math.round(cums(i) / total * 360.0).toInt
      val a1 = math.round(cums(i + 1) / total * 360.0).toInt
      g.setColor(Palette(i % Palette.length))
      g.fillArc(cx, cy, d, d, 90 - a0, -(a1 - a0))
      // legend: swatch + label + share
      val ly = 40 + i * 16
      if (ly < height - 10) {
        g.fillRect(cx + d + 20, ly - 9, 10, 10)
        g.setColor(Color.DARK_GRAY)
        g.drawString(f"$label (${vs.head / total * 100}%.1f%%)", cx + d + 34, ly)
      }
    }
    g.dispose()
    png(img)
  }
}
