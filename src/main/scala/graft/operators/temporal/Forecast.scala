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

  /** Additive Holt–Winters (triple exponential smoothing, B103) — the
    * seasonal extension of [[perKeyHolt]] (Winters 1960):
    *
    *   lₜ = α·(xₜ − s_{t−m}) + (1−α)·(lₜ₋₁ + bₜ₋₁)
    *   bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
    *   sₜ = γ·(xₜ − lₜ) + (1−γ)·s_{t−m}
    *   forecast(h) = lₙ + h·bₙ + s_{n+h−m}
    *
    * State = a (2+m)-double ARRAY `[level, trend, q₁..q_m]` where the
    * queue holds the next-to-use seasonal at q₁ and each step pushes
    * its updated seasonal to the back — the rotation re-aligns every m
    * steps, so phase is positional, no index arithmetic in the fold.
    * Init (documented variant, the perKeyHolt zero-init convention):
    * l₀ = x₀, b₀ = 0, seasonals 0 — seasonality is LEARNED from the
    * series, nothing needs lookahead.
    *
    * Both recursions referencing lₜ are folded algebraically expanded
    * (lₜ−lₜ₋₁ = α·(xₜ−s₁−lₜ₋₁) + (1−α)·bₜ₋₁ and xₜ−lₜ =
    * (1−α)·(xₜ−lₜ₋₁−bₜ₋₁) + α·s₁ exactly in ℝ) so no element's
    * expression contains another NEW value and no compound
    * subexpression repeats across elements — the DuckDB list_reduce
    * hazard (scaladoc above). α/β/γ and complements passed explicitly,
    * dyadic. Unrounded doubles hash (the EMA/cosine precedent).
    * Same bounded-series contract as [[perKeyHolt]].
    */
  def perKeyHoltWinters(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String,
      alpha: Double,
      oneMinusAlpha: Double,
      beta: Double,
      oneMinusBeta: Double,
      gamma: Double,
      oneMinusGamma: Double,
      period: Int,
      horizon: Int): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(period >= 2, s"period must be >= 2, got $period")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(beta > 0 && beta <= 1, s"beta must be in (0, 1], got $beta")
    require(gamma > 0 && gamma <= 1, s"gamma must be in (0, 1], got $gamma")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val keyRefs: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      keyRefs.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    val l = (acc: Column) => element_at(acc, 1)
    val b = (acc: Column) => element_at(acc, 2)
    val s1 = (acc: Column) => element_at(acc, 3)
    // the seasonal that applies to step n+h sits at queue slot
    // ((h-1) mod m) + 1, i.e. array index 3 + ((h-1) mod m)
    val hSlot = 3 + ((horizon - 1) % period)
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
            array(col("series").getItem(0).getField("v")
              +: Seq.fill(period + 1)(lit(0.0)): _*),
            (acc, x) => {
              val v = x.getField("v")
              val lNew = lit(alpha) * (v - s1(acc)) +
                lit(oneMinusAlpha) * (l(acc) + b(acc))
              val bNew = lit(beta) * (lit(alpha) * (v - s1(acc) - l(acc))
                + lit(oneMinusAlpha) * b(acc)) + lit(oneMinusBeta) * b(acc)
              val sNew = lit(gamma) * (lit(oneMinusAlpha) * (v - l(acc) - b(acc))
                + lit(alpha) * s1(acc)) + lit(oneMinusGamma) * s1(acc)
              array(Seq(lNew, bNew)
                ++ (4 to period + 2).map(i => element_at(acc, i))
                ++ Seq(sNew): _*)
            }).as("state"): _*)
      .select(
        keyRefs :+
          col("n_points") :+
          l(col("state")).as("level") :+
          b(col("state")).as("trend") :+
          element_at(col("state"), hSlot).as("seasonal") :+
          (l(col("state")) + lit(horizon.toDouble) * b(col("state"))
            + element_at(col("state"), hSlot)).as("forecast"): _*)
  }
}
