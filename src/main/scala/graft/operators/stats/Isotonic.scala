package graft.operators.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactMath

/** Isotonic (monotone non-decreasing) calibration fit over a BINNED
  * score spine — the PAV answer to "what is the best monotone estimate
  * of P(label | score)?", the calibration step every scored-classifier
  * pipeline runs before thresholding (B144; complements q_calibration's
  * raw reliability table and q_ece's binned gap summary).
  *
  * Construction (merge-order-free, fully SQL-mirrorable): instead of the
  * sequential pool-adjacent-violators STACK — whose merge order is an
  * evaluation-strategy detail no oracle should have to reproduce — the
  * fit uses the minimax identity of isotonic regression:
  *
  *   iso(i) = max_{a ≤ i} min_{b ≥ i} mean(a..b)
  *
  * which DEFINES the (unique) isotonic fit pointwise. Over the
  * aggregated spine with exclusive prefix sums, mean(a..b) is ONE
  * division of exact LONGs (IEEE-identical in both engines), the inner
  * min is a running min per `a` over `b` DESC (a selection), and the
  * outer max is a selection per bin — so the fitted rates hash
  * UNROUNDED.
  *
  * Scale shape: the spine is bounded STRUCTURALLY by the digit grid
  * (scores in [0, 1] at `digits` digits ⇒ ≤ 10^digits + 1 cells), so
  * the pair table is ≤ half the grid squared (≤ ~500k rows at 3
  * digits) regardless of corpus size; prefix sums ride
  * [[RankedSpine.exclusivePrefix]]; the non-equi self-join is a
  * broadcast NLJ over two bounded aggregated spines (the q_range_join
  * precedent) and every window is partitioned. Nothing scales with the
  * corpus except the one binning aggregation.
  */
object Isotonic {

  /** One row per occupied score bin: (bin, n_docs, n_pos, rate_raw,
    * rate_iso). `posCol` must be a non-null boolean; rows where
    * `scoreCol` is null are dropped.
    */
  def fitBinned(
      df: DataFrame,
      scoreCol: org.apache.spark.sql.Column,
      posCol: org.apache.spark.sql.Column,
      digits: Int = 3): DataFrame = {
    val spine = df
      .where(scoreCol.isNotNull)
      .groupBy(ExactMath.hashRound(scoreCol, digits).as("bin"))
      .agg(
        sum(when(posCol, 1L).otherwise(0L)).as("pos"),
        count(lit(1)).as("cnt"))
    val pre = RankedSpine.exclusivePrefix(
      spine, Nil, "bin", Seq("pos" -> "bp", "cnt" -> "bc"))
    val a = pre.select(col("bin").as("sa"), col("bp").as("bpa"), col("bc").as("bca"))
    val b = pre.select(col("bin").as("sb"),
      (col("bp") + col("pos")).as("cpb"), (col("bc") + col("cnt")).as("ccb"))
    // the explicit broadcast pins the BroadcastNestedLoopJoin shape the
    // scale contract states — without it Spark plans an inner non-equi
    // join as CartesianProduct + filter (PlanSpec's no-cartesian sweep
    // caught exactly that); b is the digit-grid-bounded spine
    val pairs = a.join(broadcast(b), col("sa") <= col("sb"))
      .select(col("sa"), col("sb"),
        ((col("cpb") - col("bpa")).cast("double") /
          (col("ccb") - col("bca")).cast("double")).as("avgab"))
    val wMin = Window.partitionBy("sa").orderBy(col("sb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iso = pairs
      .withColumn("mab", min(col("avgab")).over(wMin))
      .groupBy(col("sb").as("bin"))
      .agg(max(col("mab")).as("rate_iso"))
    // join the prefix table (the spine PINNED by exclusivePrefix), not
    // the raw `spine` — referencing the unpinned aggregate here re-ran
    // the whole corpus scoring scan a second time (one of q_isotonic's
    // two ~0.65 s single-task stages; r16-opt, ProfileStages)
    pre.select(col("bin"), col("pos"), col("cnt")).join(iso, Seq("bin"))
      .select(col("bin"), col("cnt").as("n_docs"), col("pos").as("n_pos"),
        (col("pos").cast("double") / col("cnt").cast("double")).as("rate_raw"),
        col("rate_iso"))
  }
}
