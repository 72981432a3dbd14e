package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key exponential moving average — the standard "current smoothed
  * level" of a bounded ordered series (a customer's spend trajectory, a
  * sensor's reading stream):
  *
  *   ema₀ = x₀;  emaₜ = α·xₜ + β·emaₜ₋₁   (β = 1−α, passed EXPLICITLY —
  *   never computed in-engine: 1−0.25 is exact, 1−0.3 is not)
  *
  * An EMA is inherently order-dependent (it is a weighted sum whose
  * weights depend on position), so there is no order-free reduction to
  * hide behind: determinism instead comes from forcing ONE canonical
  * fold order in every engine — the [[graft.functions.GraftFunctions]]
  * cosine precedent. The series is assembled as
  * `array_sort(collect_list(struct(order, tie, value)))` (tieCol must
  * be unique within key — SURVEY §5 ranking-ties rule) and folded with
  * `aggregate`, a strictly sequential left fold of IEEE ×/+ — the
  * identical operand sequence DuckDB's `list(x ORDER BY …)` +
  * `list_reduce` produces, so unrounded doubles hash-match bit for bit.
  *
  * Contract: BOUNDED series per key (the whole series is one in-memory
  * array on one task — orders-per-customer grain, not events-per-user at
  * corpus scale). The aggregation is a plain hash `groupBy` — partial
  * collect_lists merge map-side; nothing is ever globally sorted and no
  * window function appears (an unbounded running-state window would put
  * the whole KEY on one sorted task anyway; for truly unbounded streams
  * the streaming `mapGroupsWithState` sessionize grain is the right
  * tool, not a batch EMA).
  */
object Ema {

  /** One row per key: `n_points` and the final `ema` of `valueCol`
    * (cast to double) over the series ordered by (`orderCol`,
    * `tieCol`). Rows with a NULL key, order, tie, or value are dropped.
    */
  def perKeyEma(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String,
      alpha: Double,
      beta: Double): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val keyRefs: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      keyRefs.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
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
            col("series").getItem(0).getField("v"),
            (acc, x) => lit(alpha) * x.getField("v") + lit(beta) * acc).as("ema"): _*)
  }
}
