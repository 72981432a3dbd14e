package graft.operators.window

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cumulative `COUNT(DISTINCT v)` / `SUM(DISTINCT v)` over an ordered
  * axis, per partition key — the window-DISTINCT aggregate Spark's
  * window functions reject outright (`DISTINCT_WINDOW_FUNCTION_UNSUPPORTED`).
  *
  * Re-expresses the reference's running-uniques reporting shape
  * (reference: /root/reference/openai/list_of_tools.py:204 trend
  * aggregation surface) the way a distributed engine must: a naive
  * formulation — `collect_set` over an unbounded running window — puts
  * every partition key's FULL history on one sorted task and holds the
  * growing set in every frame; at 100 TB that is the canonical
  * scale-killer. The first-occurrence rewrite used here never windows
  * data grain at all:
  *
  *  1. `GROUP BY (part, value) → min(order)` — each value's first
  *     period. The ONLY data-grain shuffle, keyed by (part, value), so
  *     it partial-aggregates map-side and its output is bounded by the
  *     number of DISTINCT values, not rows.
  *  2. `GROUP BY (part, first_period)` — count + sum of values that
  *     first appear in each period (a value's first appearance is the
  *     exact moment it starts counting toward every later cumulative
  *     distinct aggregate).
  *  3. One running `sum` window over the PERIOD-grain table (bounded by
  *     periods × keys, the result's own size — the gaps-islands
  *     precedent: windows over aggregates, never over base data).
  *
  * The period axis is rebuilt from the input (distinct (part, period)
  * pairs) so periods whose values were all seen before still emit a row
  * (n_new = 0, cumulative carried forward).
  *
  * Determinism: count is order-free; the distinct-sum is exact for
  * integral/decimal `valueCol` (long addition is associative). For
  * doubles the merge order is engine-dependent — callers wanting a
  * hashed double sum must go through `ExactMath.dsum` semantics
  * (SURVEY §5) on the step-2 aggregate.
  */
object RunningDistinct {

  /** One row per (partCols, orderCol) present in `df`:
    * `n_new` (values first seen in that period), `countName`
    * (cumulative distinct count), and optionally `sumName` (cumulative
    * sum of distinct values). Rows with a NULL value or order are
    * dropped before counting.
    */
  def cumulativeDistinct(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: String,
      valueCol: String,
      countName: String,
      sumName: Option[String] = None): DataFrame = {
    val pc = partCols.map(col)
    val clean = df.where(col(valueCol).isNotNull && col(orderCol).isNotNull)

    // 1. first period of each distinct value within its partition
    val firsts = clean
      .groupBy(pc :+ col(valueCol): _*)
      .agg(min(col(orderCol)).as(orderCol))

    // 2. per-period news: how many values debut, and their sum
    val news = firsts
      .groupBy(pc :+ col(orderCol): _*)
      .agg(
        count(lit(1)).as("n_new"),
        sum(col(valueCol)).as("__new_sum"))

    // 3. full period axis (periods with zero debuts still emit)
    val axis = clean.select(pc :+ col(orderCol): _*).distinct()

    val w = Window
      .partitionBy(pc: _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = axis
      .join(news, partCols :+ orderCol, "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn(countName, sum(col("n_new")).over(w))
    sumName match {
      case Some(sn) =>
        joined
          .withColumn(sn, sum(coalesce(col("__new_sum"), lit(0L))).over(w))
          .drop("__new_sum")
      case None => joined.drop("__new_sum")
    }
  }

  /** High-cardinality scale twin of [[cumulativeDistinct]]: cumulative
    * APPROXIMATE distinct count per partition over an ordered axis, via
    * a per-period mergeable HLL sketch (the B7/C19 machinery applied to
    * the window axis).
    *
    * The exact rewrite's first shuffle is bounded by DISTINCT VALUES —
    * fine until distinct ≈ rows (user-id-grade axes at 100 TB), where
    * "bounded by distinct values" stops being a bound at all. This path
    * never keys by the value:
    *
    *  1. `GROUP BY (part, period) → hll_sketch_agg(value)` — the only
    *     data-grain aggregation, partial-aggregated map-side (sketches
    *     merge on the combiners), output one 2^lgConfigK-register
    *     sketch per (part, period) regardless of cardinality.
    *  2. One running `hll_union_agg` window over the PERIOD-grain
    *     sketch table (periods × keys rows — the result's own size),
    *     estimated per frame. Register-max union is commutative and
    *     associative, so the estimate is partition-order independent.
    *
    * Estimates carry the standard HLL_4 relative standard deviation
    * ~1.04/√2^lgConfigK (~1.6% at the default lgConfigK=12) and are
    * EXACT while a frame's union is still in sparse mode. Like the
    * other sketch outputs (B28/C23b), raw estimates are never
    * oracle-hashed — drivers gate them with a verdict-vs-exact audit;
    * rows with NULL value/order drop first, mirroring the exact
    * operator's axis contract.
    */
  def cumulativeDistinctApprox(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: String,
      valueCol: String,
      countName: String,
      lgConfigK: Int = 12): DataFrame = {
    val pc = partCols.map(col)
    val clean = df.where(col(valueCol).isNotNull && col(orderCol).isNotNull)
    val periodSketch = clean
      .groupBy(pc :+ col(orderCol): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("__sk"))
    val w = Window
      .partitionBy(pc: _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    periodSketch
      .withColumn(countName,
        hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)).over(w)))
      .drop("__sk")
  }

  /** Streaming distinct-count monitor building blocks (D19) — the
    * B7/D15 argument applied to cardinality: a monitor never keeps raw
    * ids, it keeps one mergeable HLL sketch per (key, period) and folds
    * each microbatch in by register-max union. Union is commutative and
    * associative, so the state after ANY microbatch partitioning equals
    * the one-shot batch sketch REGISTER FOR REGISTER — the estimate is
    * therefore exactly the batch estimate, not merely close (the same
    * reasoning D14 uses for min/max/sum state).
    *
    * `periodSketches` runs per microbatch (or over the full batch for
    * the oracle side); `mergeSketchStates` folds a new microbatch's
    * sketch table into the standing state; `estimateSketches` renders
    * the monitor report. Rows with NULL key/period/value drop first —
    * the cumulativeDistinctApprox axis contract.
    */
  def periodSketches(
      df: DataFrame,
      keyCols: Seq[String],
      periodCol: String,
      valueCol: String,
      lgConfigK: Int = 12): DataFrame = {
    val kc = keyCols.map(col)
    df.where(kc.map(_.isNotNull).reduce(_ && _) &&
        col(periodCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(kc :+ col(periodCol): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))
  }

  def mergeSketchStates(
      state: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      periodCol: String): DataFrame =
    state.unionByName(delta)
      .groupBy(keyCols.map(col) :+ col(periodCol): _*)
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))

  def estimateSketches(state: DataFrame, countName: String): DataFrame =
    state.withColumn(countName, hll_sketch_estimate(col("sketch"))).drop("sketch")
}
