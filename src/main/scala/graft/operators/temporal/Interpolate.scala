package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear interpolation of missing values in a keyed time series — the
  * fill-the-holes twin of the gap-fill spine (B17 adds missing ROWS;
  * this fills missing VALUES): for each NULL observation with a known
  * neighbor on both sides,
  *
  *   v = v_prev + (v_next − v_prev) · (t − t_prev) / (t_next − t_prev)
  *
  * Edge rows (no known predecessor or successor) stay NULL — honest
  * extrapolation is a different operator.
  *
  * Determinism contract: `tCol` is an integral index, unique within a
  * series (the window's total order); neighbor lookup is four
  * ignore-nulls window scalars over that order (prev/next value and
  * their times — the scalar-pair form mirrors directly in DuckDB's
  * IGNORE NULLS windows, unlike a struct carry); the fill arithmetic is
  * one exact integer-difference division, one multiply, one add —
  * IEEE-reproducible, hash-safe unrounded (SURVEY §5).
  *
  * Scale shape: one window partitioning per series (series-grain sort,
  * bounded by the series length like every B-block window); no spine
  * join, no self-join.
  */
object Interpolate {

  /** Adds `v_filled` (the interpolated value) and `interpolated`
    * (whether this row was filled) to the frame.
    */
  def linear(
      df: DataFrame,
      seriesCols: Seq[String],
      tCol: String,
      vCol: String): DataFrame = {
    require(seriesCols.nonEmpty, "linear interpolation needs at least one series column")
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(col(tCol))
    val prec = w.rowsBetween(Window.unboundedPreceding, -1)
    val foll = w.rowsBetween(1, Window.unboundedFollowing)
    val v = col(vCol)
    val knownT = when(v.isNotNull, col(tCol))
    val pv = last(v, ignoreNulls = true).over(prec)
    val pt = last(knownT, ignoreNulls = true).over(prec)
    val nv = first(v, ignoreNulls = true).over(foll)
    val nt = first(knownT, ignoreNulls = true).over(foll)
    df
      .withColumn("__pv", pv).withColumn("__pt", pt)
      .withColumn("__nv", nv).withColumn("__nt", nt)
      .withColumn("v_filled",
        when(v.isNotNull, v)
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              ((col(tCol) - col("__pt")).cast("double") /
                (col("__nt") - col("__pt")).cast("double"))))
      .withColumn("interpolated",
        v.isNull && col("__pv").isNotNull && col("__nv").isNotNull)
      .drop("__pv", "__pt", "__nv", "__nt")
  }
}
