package graft.operators.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass per-column data profiling — the "describe this snapshot"
  * operator every ingestion pipeline runs before trusting a feed
  * (row count, null count, exact distinct cardinality, min/max).
  *
  * Shape: ONE `agg` over the scan computes every column's statistics
  * together — Catalyst plans the multiple `count(DISTINCT cᵢ)` via a
  * single Expand (×(k+1) row replication, k = profiled columns) feeding
  * one partially-aggregated exchange, so the input is read once no
  * matter how many columns are profiled. The single aggregated row is
  * then unpivoted driver-free with `inline` (no shuffle). For 100 TB
  * feeds where exact distincts are too hot, `approx = true` swaps in
  * `approx_count_distinct` (HLL): no Expand at all, one ordinary
  * aggregation pass — the estimate path is spec-checked against the
  * exact path at small SF, while the exact path is the oracle-gated
  * default.
  *
  * min/max never do arithmetic (order-statistics are exactly
  * reproducible for every type), but their cross-engine RENDERING is
  * not: doubles stringify differently between engines, so min/max are
  * emitted in three typed column families instead of one string —
  * `min_int`/`max_int` (integral types, plus timestamps as epoch
  * micros and dates as epoch days — exact integers in any engine),
  * `min_dbl`/`max_dbl` (floating columns, the double passed through
  * untouched), `min_str`/`max_str` (strings). Families that don't
  * apply are NULL.
  */
object Profiling {

  def columnProfile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val schema = df.schema
    val nullInt = lit(null).cast("long")
    val nullDbl = lit(null).cast("double")
    val nullStr = lit(null).cast("string")
    val perCol = cols.map { name =>
      val dt = schema(name).dataType
      val c = col(name)
      val (mnI, mxI, mnD, mxD, mnS, mxS) = dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          (min(c).cast("long"), max(c).cast("long"), nullDbl, nullDbl, nullStr, nullStr)
        case TimestampType | TimestampNTZType =>
          // NTZ casts to instant under the UTC session, so epoch micros
          // are identical either way (Snapshot reads parquet as NTZ)
          (min(unix_micros(c.cast(TimestampType))),
            max(unix_micros(c.cast(TimestampType))), nullDbl, nullDbl, nullStr, nullStr)
        case DateType =>
          (min(unix_date(c)).cast("long"), max(unix_date(c)).cast("long"),
            nullDbl, nullDbl, nullStr, nullStr)
        case FloatType | DoubleType =>
          (nullInt, nullInt, min(c).cast("double"), max(c).cast("double"), nullStr, nullStr)
        case StringType =>
          (nullInt, nullInt, nullDbl, nullDbl, min(c), max(c))
        case other =>
          throw new IllegalArgumentException(
            s"columnProfile: unsupported type $other for column $name")
      }
      val nd =
        if (approx) approx_count_distinct(c).as(s"__nd_$name")
        else countDistinct(c).as(s"__nd_$name")
      Seq(
        count(c).as(s"__nn_$name"), nd,
        mnI.as(s"__mni_$name"), mxI.as(s"__mxi_$name"),
        mnD.as(s"__mnd_$name"), mxD.as(s"__mxd_$name"),
        mnS.as(s"__mns_$name"), mxS.as(s"__mxs_$name"))
    }
    val aggExprs = count(lit(1)).as("__n") +: perCol.flatten
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = cols.map { name =>
      struct(
        lit(name).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$name")).as("n_nulls"),
        col(s"__nd_$name").as("n_distinct"),
        col(s"__mni_$name").as("min_int"), col(s"__mxi_$name").as("max_int"),
        col(s"__mnd_$name").as("min_dbl"), col(s"__mxd_$name").as("max_dbl"),
        col(s"__mns_$name").as("min_str"), col(s"__mxs_$name").as("max_str"))
    }
    one.select(inline(array(rows: _*)))
  }
}
