package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Holt linear-trend forecast (double exponential smoothing) — the
  * classic short-horizon projection of a bounded ordered series
  * (Holt 1957; the level/trend recursion every forecasting text opens
  * with):
  *
  *   l₀ = x₀,  b₀ = 0           (zero-trend init — documented variant;
  *                               the x₁−x₀ init needs lookahead)
  *   lₜ = α·xₜ + (1−α)·(lₜ₋₁ + bₜ₋₁)
  *   bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
  *   forecast(h) = lₙ + h·bₙ
  *
  * Determinism follows the [[Ema]] contract exactly: the series is
  * assembled as `array_sort(collect_list(struct(order, tie, value)))`
  * (tieCol unique within key) and folded sequentially with `aggregate`.
  * The state is a 2-element double ARRAY `[level, trend]`, not a
  * struct: DuckDB 1.0's `list_reduce` mis-evaluates struct accumulators
  * whose fields share the accumulator (fields observe a partially
  * updated `acc` — verified empirically), while list accumulators fold
  * correctly, so the array form is the one shape BOTH engines execute
  * bit-identically.
  *
  * The trend update is folded in the algebraically expanded form
  *
  *   bₜ = β·(α·(xₜ − lₜ₋₁) + (1−α)·bₜ₋₁) + (1−β)·bₜ₋₁
  *
  * (lₜ − lₜ₋₁ = α·(xₜ−lₜ₋₁) + (1−α)·bₜ₋₁ exactly in ℝ) so neither
  * field's expression textually contains the other — the same DuckDB
  * lambda bug also corrupts a compound subexpression duplicated across
  * fields. Both engines evaluate THIS op sequence, so unrounded doubles
  * hash-match (the EMA/cosine precedent). α, 1−α, β, 1−β are all passed
  * EXPLICITLY and should be dyadic (0.5/0.25/0.75 are exact; 1−0.3 is
  * not).
  *
  * Contract: BOUNDED series per key (one in-memory array per key on one
  * task — the Ema grain rule); plain hash groupBy, partials merge
  * map-side, nothing globally sorted.
  */
object Forecast {

  /** One row per key: `n_points`, final `level` and `trend`, and
    * `forecast` = level + horizon·trend. Rows with a NULL key, order,
    * tie, or value are dropped. A 1-point series returns its own value
    * (trend 0).
    */
  def perKeyHolt(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String,
      alpha: Double,
      oneMinusAlpha: Double,
      beta: Double,
      oneMinusBeta: Double,
      horizon: Int): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(beta > 0 && beta <= 1, s"beta must be in (0, 1], got $beta")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val keyRefs: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      keyRefs.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    val l = (acc: Column) => element_at(acc, 1)
    val b = (acc: Column) => element_at(acc, 2)
    clean
      .groupBy(keyRefs: _*)
      .agg(array_sort(collect_list(struct(
        col(orderCol).as("o"), col(tieCol).as("t"),
        col(valueCol).cast("double").as("v")))).as("series"))
      .select(
        keyRefs :+
          size(col("series")).as("n_points") :+
          aggregate(
            expr("slice(series, 2, size(series) - 1)"),
            array(col("series").getItem(0).getField("v"), lit(0.0)),
            (acc, x) => {
              val v = x.getField("v")
              array(
                lit(alpha) * v + lit(oneMinusAlpha) * (l(acc) + b(acc)),
                lit(beta) * (lit(alpha) * (v - l(acc)) + lit(oneMinusAlpha) * b(acc))
                  + lit(oneMinusBeta) * b(acc))
            }).as("state"): _*)
      .select(
        keyRefs :+
          col("n_points") :+
          l(col("state")).as("level") :+
          b(col("state")).as("trend") :+
          (l(col("state")) + lit(horizon.toDouble) * b(col("state"))).as("forecast"): _*)
  }
}
