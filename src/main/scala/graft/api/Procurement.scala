package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactMath.{davg, dsum}

/** The reference's procurement-analytics surface, re-expressed as
  * distributed DataFrame transforms.
  *
  * Reference mapping (all in /root/reference):
  *  - keywordSearch        ← keyword LIKE composition, openai/basic_functions.py step 5
  *  - filterRange          ← satuan_kerja / tanggal_umumkan_paket filters
  *  - intermediary         ← openai/list_of_tools.py:148 intermediary_dataframe_retrieval
  *  - barAgg / insights    ← openai/list_of_tools.py:203 bar_chart_tool
  *  - pieAgg               ← openai/list_of_tools.py:385 pie_chart_tool
  *  - monthlyTrend         ← openai/list_of_tools.py:271 line_chart_tool (dual series)
  *  - histogramMonth/Numeric ← openai/list_of_tools.py:14 histogram_tool
  *
  * Everything is declarative (groupBy/window/filter) so Catalyst handles
  * pushdown + partial aggregation; no collect() anywhere.
  */
object Procurement {

  /** OR-of-synonyms AND-of-concepts keyword filter. Each inner Seq is a
    * synonym group (OR); groups are combined with AND — exactly the
    * reference's prompt-mandated LIKE composition.
    */
  def keywordFilter(textCol: Column, concepts: Seq[Seq[String]]): Column =
    concepts
      .map(group => group.map(kw => textCol.contains(kw)).reduce(_ || _))
      .reduce(_ && _)

  def keywordSearch(df: DataFrame, textCol: String, concepts: Seq[Seq[String]]): DataFrame =
    df.where(keywordFilter(col(textCol), concepts))

  /** Date-range + categorical filter (half-open interval [from, until)). */
  def filterRange(
      df: DataFrame,
      tsCol: String,
      from: String,
      until: String,
      categorical: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val ts = col(tsCol) >= lit(from).cast("timestamp") && col(tsCol) < lit(until).cast("timestamp")
    val cat = categorical.foldLeft(lit(true)) { case (acc, (c, vs)) => acc && col(c).isin(vs: _*) }
    df.where(ts && cat)
  }

  /** The reference's intermediary table as a pure transform: returns the
    * DataFrame unchanged; view registration is the separate, explicit step
    * below. At scale this would be a parquet / Delta write; a temp view
    * keeps the plan lazy and re-optimizable.
    */
  def intermediary(df: DataFrame): DataFrame = df

  private val viewCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Registers `df` as a temp view and returns the view name. With no
    * explicit name, a session-unique one is generated — concurrent
    * queries in one session never overwrite each other's intermediary
    * (temp views are session-global state).
    */
  def registerIntermediary(df: DataFrame, name: Option[String] = None): String = {
    val n = name.getOrElse(s"intermediary_${viewCounter.incrementAndGet()}")
    df.createOrReplaceTempView(n)
    n
  }

  /** Bar-chart prep: total value per group, descending. */
  def barAgg(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(dsum(col(valueCol)).as("total_budget"), count(lit(1)).as("n_packages"))
      .orderBy(col("total_budget").desc, col(groupCol))

  /** Pie-chart prep: count + share per category. */
  def pieAgg(df: DataFrame, groupCol: String): DataFrame = {
    val w = Window.partitionBy()
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_packages"))
      .withColumn("share", col("n_packages").cast("double") / sum(col("n_packages")).over(w).cast("double"))
      .orderBy(col(groupCol))
  }

  /** Line-chart prep: month × (total value, package count) — the dual-series
    * monthly trend of the reference's line_chart_tool.
    */
  def monthlyTrend(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.groupBy(date_trunc("month", col(tsCol)).as("month"))
      .agg(dsum(col(valueCol)).as("total_budget"), count(lit(1)).as("n_packages"))
      .orderBy("month")

  /** Histogram prep: count per month-of-year (the reference's datetime
    * histogram binning).
    */
  def histogramMonth(df: DataFrame, tsCol: String): DataFrame =
    df.groupBy(month(col(tsCol)).cast("long").as("month_num"))
      .agg(count(lit(1)).as("n_packages"))
      .orderBy("month_num")

  /** Histogram prep: fixed-width numeric bins. */
  def histogramNumeric(df: DataFrame, valueCol: String, binWidth: Double): DataFrame =
    df.groupBy(floor(col(valueCol) / lit(binWidth)).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_packages"))
      .orderBy("bin")

  /** The insight stats every reference chart tool reports:
    * count / min / max / mean / sum.
    */
  def insights(df: DataFrame, valueCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_packages"),
      min(col(valueCol)).cast("double").as("min_budget"),
      max(col(valueCol)).cast("double").as("max_budget"),
      dsum(col(valueCol)).as("total_budget"),
      davg(col(valueCol)).as("mean_budget"))

  /** Chart-suitability validation — the deterministic core of the
    * reference's VisualizationValidatorTool
    * (/root/reference/langchain/my_toolkit.py:119), which executes the
    * query, samples it, and judges fitness for a chart type. The LLM
    * judgment is replaced by structural rules; the expensive part
    * (cardinality) is one bounded aggregation, never a collect of data.
    */
  sealed trait ChartType
  object ChartType {
    case object Bar extends ChartType
    case object Pie extends ChartType
    case object Line extends ChartType
    case object Histogram extends ChartType
  }

  final case class ChartValidation(suitable: Boolean, issues: Seq[String])

  def validateForChart(df: DataFrame, chart: ChartType, xCol: String, yCol: Option[String]): ChartValidation = {
    import org.apache.spark.sql.types._
    val issues = scala.collection.mutable.ArrayBuffer.empty[String]
    val schema = df.schema
    // case-insensitive lookup to match Spark's default column resolution
    def fieldType(c: String): Option[DataType] =
      schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
    def isNumeric(t: DataType) = t.isInstanceOf[NumericType]
    def isTemporal(t: DataType) = t == DateType || t == TimestampType

    fieldType(xCol) match {
      case None => issues += s"x column '$xCol' not in result"
      case Some(t) =>
        chart match {
          case ChartType.Line if !isTemporal(t) =>
            issues += s"line chart needs a temporal x axis, got ${t.simpleString}"
          case ChartType.Histogram if !isNumeric(t) && !isTemporal(t) =>
            issues += s"histogram needs numeric/temporal x, got ${t.simpleString}"
          case _ => ()
        }
    }
    yCol.foreach { y =>
      fieldType(y) match {
        case None => issues += s"y column '$y' not in result"
        case Some(t) if !isNumeric(t) => issues += s"y column '$y' must be numeric, got ${t.simpleString}"
        case _ => ()
      }
    }
    if (issues.isEmpty && df.isEmpty) issues += "result is empty"
    val maxCategories = chart match {
      case ChartType.Pie => Some(12L)
      case ChartType.Bar => Some(50L)
      case _ => None
    }
    maxCategories.foreach { cap =>
      if (issues.isEmpty) {
        val n = df.agg(countDistinct(col(xCol))).head().getLong(0)
        if (n > cap) issues += s"$n categories exceed the $cap readable for this chart"
      }
    }
    ChartValidation(issues.isEmpty, issues.toSeq)
  }

  /** Bounded result preview — the reference's intermediary tool returns
    * `{schema, first_rows(5)}` (openai/list_of_tools.py:148). Only `n`
    * rows ever reach the driver.
    */
  def preview(df: DataFrame, n: Int = 5): String = {
    val cols = df.columns.mkString("[", ", ", "]")
    val rows = df.limit(n).collect().map(_.toSeq.map(String.valueOf).mkString("(", ", ", ")"))
    s"schema: $cols\n" + rows.mkString("\n")
  }

  /** Cross-tab counts (pivot). `pivotValues` passed explicitly: at scale an
    * unlisted pivot triggers a distinct-scan of the whole column first.
    */
  def pivotTable(df: DataFrame, rowCol: String, pivotCol: String, pivotValues: Seq[String]): DataFrame =
    df.groupBy(col(rowCol))
      .pivot(pivotCol, pivotValues)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(rowCol)

  /** Month spine + zero fill for gap-free trend lines (the reference's
    * line charts assume contiguous months).
    */
  def monthlyTrendGapFilled(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val monthly = monthlyTrend(df, tsCol, valueCol)
    val spine = monthly
      .agg(min(col("month")).as("mn"), max(col("month")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 MONTH"))).as("month"))
    spine
      .join(monthly, Seq("month"), "left")
      .select(
        col("month"),
        coalesce(col("total_budget"), lit(0.0)).as("total_budget"),
        coalesce(col("n_packages"), lit(0L)).as("n_packages"))
      .orderBy("month")
  }

  /** Reference-style insight text for a grouped value metric (the prose
    * block each chart tool returns, e.g. bar_chart_tool's "Data Insights").
    * The aggregation is distributed; only the ≤`groups`-row summary is
    * collected for formatting.
    */
  def insightsText(df: DataFrame, groupCol: String, valueCol: String): String = {
    val agg = barAgg(df, groupCol, valueCol)
    val rows = agg.collect()
    if (rows.isEmpty) return "Data Insights: no rows."
    val totals = rows.map(_.getAs[Double]("total_budget"))
    val top = rows.head
    val bottom = rows.last
    f"""Data Insights:
       |- Total number of groups: ${rows.length}
       |- Highest total: ${top.getAs[Double]("total_budget")}%.2f (${top.getAs[String](groupCol)})
       |- Lowest total: ${bottom.getAs[Double]("total_budget")}%.2f (${bottom.getAs[String](groupCol)})
       |- Average total: ${totals.sum / totals.length}%.2f
       |- Grand total: ${totals.sum}%.2f""".stripMargin
  }
}
