package graft.operators.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated on a
  * maximize-both objective — multi-objective top-k's classic cousin
  * (best price-for-size, best quality-for-length, ...).
  *
  * The naive formulation is a quadratic self-join ("no other row beats
  * me on both axes"). The distributed formulation used here exploits
  * the 2-D structure: group by `x` keeping `max(y)` (the only possible
  * frontier member per x — any same-x row with lower y is dominated by
  * it), then one running-max sweep over x DESCENDING: a candidate is on
  * the frontier iff its y strictly exceeds the best y seen at any
  * LARGER x. The heavy work is the partially-aggregated `groupBy`
  * (shuffles ≤ |distinct x| slim rows, never the corpus); the sweep
  * window runs on that aggregated table, which is small by construction
  * for discrete/bucketed x — the intended contract (for continuous x,
  * bucket first; a 1e9-cardinality raw-double x would serialize the
  * sweep into one partition, same contract note as
  * [[graft.operators.quantile.Quantiles.withNtileByGroup]]).
  *
  * Determinism: only order statistics (max) and a comparison — no
  * arithmetic, so doubles pass through bit-identical in any engine; the
  * DuckDB oracle derives the same frontier INDEPENDENTLY via the
  * quadratic NOT EXISTS definition over the per-x maxima.
  */
object Skyline {

  /** Frontier of (`x` maximize, `y` maximize): one row per frontier x,
    * with `best_y` = the per-x max of y. NULLs in either column are
    * dropped. Output sorted by caller.
    */
  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"))
      .agg(max(col(yCol)).as("best_y"))
    val aboveBest = max(col("best_y")).over(
      Window.orderBy(col("x").desc).rowsBetween(Window.unboundedPreceding, -1))
    perX
      .withColumn("__above", aboveBest)
      .where(col("__above").isNull || col("best_y") > col("__above"))
      .select(col("x").as(xCol), col("best_y"))
  }
}
