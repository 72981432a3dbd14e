package graft.operators.quantile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tukey-fence outlier audit: per group, fences at
  * `p25 − k·IQR / p75 + k·IQR`, plus counts and the extreme outlier
  * values — the data-quality screen a curation pipeline runs before
  * trusting a numeric column (the distribution-shaped sibling of
  * `q_null_audit`'s presence checks).
  *
  * Two aggregation passes over the fact table: one slim per-group
  * quantile agg (group-cardinality rows, broadcast back), one
  * conditional agg against the fences — the fact table is never
  * sorted globally and never shuffled wider than its group key.
  *
  * Determinism: fences are ROUNDED to 4 digits and the flag compares
  * against the rounded fence in every engine (SURVEY §5 — the rounded
  * value is the contract, so an ulp of interpolation drift cannot flip
  * a row's flag unless a data value sits within 1e-4 of a fence, which
  * the margin convention treats like every other rounded float).
  * `min/max_outlier` are raw data values (order statistics — exact).
  * Exact per-group `percentile` is the B13 oracle-parity path; at
  * 100 TB swap in `Quantiles.approxPercentiles` (B28) for the fence
  * estimation — the audit semantics are unchanged.
  */
object Outliers {

  /** Returns one row per group: `<groupCol>, n, n_outliers, lo, hi,
    * min_outlier, max_outlier` (the last two null when a group has no
    * outliers).
    */
  def iqrAudit(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 1.5): DataFrame = {
    val v = col(valueCol)
    val fences = df
      .groupBy(col(groupCol))
      .agg(
        expr(s"percentile($valueCol, 0.25)").as("__p25"),
        expr(s"percentile($valueCol, 0.75)").as("__p75"))
      .select(
        col(groupCol),
        round(col("__p25") - lit(k) * (col("__p75") - col("__p25")), 4).as("lo"),
        round(col("__p75") + lit(k) * (col("__p75") - col("__p25")), 4).as("hi"))
    val flagged = df
      .join(broadcast(fences), groupCol)
      .withColumn("__out", v < col("lo") || v > col("hi"))
    flagged
      .groupBy(col(groupCol), col("lo"), col("hi"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__out"), 1L).otherwise(0L)).as("n_outliers"),
        min(when(col("__out"), v)).as("min_outlier"),
        max(when(col("__out"), v)).as("max_outlier"))
      .select(col(groupCol), col("n"), col("n_outliers"),
        col("lo"), col("hi"), col("min_outlier"), col("max_outlier"))
  }
}
