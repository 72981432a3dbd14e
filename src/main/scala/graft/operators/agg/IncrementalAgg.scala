package graft.operators.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a standing per-group
  * aggregate table up to date by MERGING each arriving delta batch —
  * the corpus is never rescanned. The reference recomputes its summary
  * from the whole table on every call
  * (`/root/reference/openai/list_of_tools.py` re-aggregates per
  * request); at 100 TB the rollup that answers those calls has to be
  * maintained, not recomputed: a daily merge costs O(delta + groups)
  * while a recompute costs O(corpus).
  *
  * The state row per group is `(n_rows, sum_value, min_value,
  * max_value)` — every field associatively mergeable, so
  * `merge(aggregate(a), b) == aggregate(a ∪ b)` EXACTLY:
  *  - `n_rows` adds; `sum_value` is DECIMAL(18,6)-cast before summing
  *    (ExactMath convention — decimal adds are associative, so the
  *    merged sum is bit-identical to the from-scratch sum, which is
  *    precisely what the driver oracle asserts);
  *  - `min/max` combine by min/max.
  * Mergeable sketches compose the same way for the non-exact
  * quantities (B7's HLL for distincts, B28's GK for quantiles) —
  * kept out of this state so it stays oracle-exact.
  *
  * Contract: APPEND-ONLY. min/max (and distinct sketches) are not
  * retractable — deletes/updates require a recompute of the affected
  * groups (partition the state by an upstream date column so a
  * late-arriving correction recomputes one partition, not the corpus).
  * Null group keys aggregate as their own group (SQL GROUP BY
  * semantics); null values count in `n_rows` and are ignored by
  * sum/min/max.
  *
  * Plan shape: `aggregate` is one partial-aggregated shuffle at group
  * grain; `merge` aggregates the delta the same way, unions the slim
  * state rows, and re-aggregates — the exchange carries group-grain
  * state rows only (2× groups), never raw data.
  */
object IncrementalAgg {

  /** Build the state table from raw rows: groupCols..., n_rows,
    * sum_value (decimal), min_value, max_value.
    */
  def aggregate(df: DataFrame, groupCols: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(valueCol.cast("decimal(18,6)")).as("sum_value"),
        min(valueCol).as("min_value"),
        max(valueCol).as("max_value"))

  /** Merge a RAW delta batch into an existing state table (as produced
    * by `aggregate` or a previous `merge`). New groups appear, existing
    * groups combine field-wise.
    */
  def merge(
      base: DataFrame,
      delta: DataFrame,
      groupCols: Seq[String],
      valueCol: Column): DataFrame = {
    val deltaState = aggregate(delta, groupCols, valueCol)
      // align sum_value's decimal precision with the (possibly wider)
      // re-aggregated base so unionByName never truncates
      .withColumn("sum_value", col("sum_value").cast(base.schema("sum_value").dataType))
    base.select(deltaState.columns.map(col): _*)
      .unionByName(deltaState)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_value")).as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
  }
}
