package graft.operators.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ExactMath

/** Classifier-calibration metrics over the rounded score/label grain —
  * the eval-family companions of [[Isotonic]]: the 10-bin expected
  * calibration error (B145) and the binned-spine logistic loss (B149).
  * Both are derivations over MERGEABLE cells (exact counts + a
  * decimal-exact score sum / a bounded score spine), so a streaming
  * monitor maintains the cells per microbatch and derives the metric
  * from carried state == the one-shot batch bit-for-bit (D40, the
  * D25/D33 pattern).
  */
object Calibration {

  /** 10-equal-width-bin calibration cells — the mergeable state:
    * (bin, n_docs, n_pos, decimal-exact score sum). bin =
    * least(floor(score·10), 9): floor products of engine-identical
    * doubles, no cross-engine seam.
    */
  def calibrationCells(df: DataFrame, scoreCol: Column, posCol: Column): DataFrame =
    df.where(scoreCol.isNotNull)
      .select(least(floor(scoreCol * lit(10.0)), lit(9L)).cast("int").as("bin"),
        scoreCol.as("__sc"), posCol.as("__p"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__sc").cast(ExactMath.ValueDecimal)).as("__cs"))

  /** Field-wise associative merge of two [[calibrationCells]] states. */
  def mergeCalibrationCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bin"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_pos")).as("n_pos"),
        sum(col("__cs")).as("__cs"))

  /** ECE derivation over carried cells — ONE definition shared with the
    * batch path (state == one-shot structural): per-bin confidence
    * (decimal-exact sum, one division) vs accuracy (one exact-int
    * division), |gap|, and ECE = Σ n_b·gap_b / N folded in BIN order
    * (0.0-init sequential fold == init-less list_reduce). All IEEE
    * chains over engine-identical doubles, hashed UNROUNDED.
    */
  def eceFromCells(cells: DataFrame): DataFrame = {
    val enriched = cells
      .select(col("bin"), col("n_docs"), col("n_pos"),
        (col("__cs").cast("double") / col("n_docs").cast("double")).as("conf"),
        (col("n_pos").cast("double") / col("n_docs").cast("double")).as("acc"))
      .withColumn("gap", abs(col("acc") - col("conf")))
    val tot = enriched
      .agg(
        aggregate(
          transform(
            array_sort(collect_list(struct(col("bin"),
              (col("n_docs").cast("double") * col("gap")).as("w")))),
            e => e.getField("w")),
          lit(0.0), (acc2, x) => acc2 + x).as("__ws"),
        sum(col("n_docs")).as("__n"))
      .select((col("__ws") / col("__n").cast("double")).as("ece"))
    enriched.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        col("conf"), col("acc"), col("gap"), col("ece"))
  }

  def ece(df: DataFrame, scoreCol: Column, posCol: Column): DataFrame =
    eceFromCells(calibrationCells(df, scoreCol, posCol))

  /** Score-grid cells — the SECOND mergeable state of the score/label
    * grain (D41, the finer sibling of [[calibrationCells]]): (score, n,
    * pos) at the rounded-4 score grid, ≤ 10001 cells for scores in
    * [0, 1] at ANY corpus size. Exact LONG counts, merge = addition, so
    * a streaming monitor maintains the cells per microbatch and every
    * derivation over them ([[logLossFromCells]], [[prCurveFromCells]])
    * equals the one-shot batch bit-for-bit.
    */
  def scoreCells(df: DataFrame, scoreCol: Column, posCol: Column): DataFrame =
    df.where(scoreCol.isNotNull)
      .groupBy(scoreCol.as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(posCol, 1L).otherwise(0L)).as("__p"))

  /** Field-wise associative merge of two [[scoreCells]] states. */
  def mergeScoreCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("__s"))
      .agg(sum(col("__n")).as("__n"), sum(col("__p")).as("__p"))

  /** Precision/recall sweep over carried score cells — ONE definition
    * shared with the batch path (state == one-shot structural): the
    * bounded cell spine crosses the ≤ 9-row threshold spine (a
    * generator, never a shuffle of row-grain data), per-threshold
    * confusion counts are conditional EXACT sums, prec/recall one
    * exact-int division each (hash-safe UNROUNDED, the B56 rule), f1 a
    * fixed IEEE chain over them; zero denominators NULL. `prec` not
    * `precision` (reserved word — the check_name lesson).
    */
  def prCurveFromCells(
      cells: DataFrame,
      thresholds: Seq[Double] = (1 to 9).map(_ / 10.0)): DataFrame = {
    val above = col("__s") >= col("threshold")
    val withPr = cells
      .select(col("__s"), col("__n"), col("__p"),
        explode(array(thresholds.map(lit(_)): _*)).as("threshold"))
      .groupBy("threshold")
      .agg(sum(when(above, col("__p")).otherwise(0L)).as("tp"),
        sum(when(above, col("__n") - col("__p")).otherwise(0L)).as("fp"),
        sum(when(!above, col("__p")).otherwise(0L)).as("fn"),
        sum(when(!above, col("__n") - col("__p")).otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0L,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double")).as("prec"),
        when(col("tp") + col("fn") > 0L,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double")).as("recall"))
    withPr.withColumn("f1",
      when(col("prec").isNotNull && col("recall").isNotNull &&
        col("prec") + col("recall") > 0.0,
        lit(2.0) * col("prec") * col("recall") / (col("prec") + col("recall"))))
  }

  /** Batch PR curve (B150) = [[prCurveFromCells]] over [[scoreCells]]. */
  def prCurve(
      df: DataFrame,
      scoreCol: Column,
      posCol: Column,
      thresholds: Seq[Double] = (1 to 9).map(_ / 10.0)): DataFrame =
    prCurveFromCells(scoreCells(df, scoreCol, posCol), thresholds)

  /** Log-loss derivation over carried score cells — ONE definition
    * shared with the batch path (state == one-shot structural); see
    * [[logLoss]] for the numeric contract.
    */
  def logLossFromCells(cells: DataFrame, eps: Double = 1e-6): DataFrame = {
    val hi = 1.0 - eps
    val sc = greatest(least(col("__s"), lit(hi)), lit(eps))
    val term = -(col("__p").cast("double") * log(sc)
      + (col("__n") - col("__p")).cast("double") * log(lit(1.0) - sc))
    cells
      .select(col("__s"), col("__n"), col("__p"), term.as("__t"))
      .agg(sum(col("__n")).as("n_docs"), sum(col("__p")).as("n_pos"),
        aggregate(
          transform(array_sort(collect_list(struct(col("__s"), col("__t")))),
            e => e.getField("__t")),
          lit(0.0), (a, x) => a + x).as("__tt"))
      .select(col("n_docs"), col("n_pos"),
        when(col("n_docs") > 0L,
          ExactMath.hashRound(col("__tt") / col("n_docs").cast("double"), 4))
          .as("log_loss"))
  }

  /** Binned-spine logistic loss (B149, the 15th audited transcendental):
    * scores are GRID values (the rounded-4 sigmoid ⇒ ≤ 10001 distinct),
    * so the lns evaluate at the SPINE grain, never per row (the
    * theil/LangModel rule — dense per-row transcendentals can never
    * clear a margin audit; ≤ 2·spine of them can). Cells (score, n,
    * pos) aggregate exactly ([[scoreCells]], the D41 mergeable state);
    * each cell's term
    *   −(p·ln(clip(s)) + (n−p)·ln(1−clip(s)))
    * folds SEQUENTIALLY in score order (init-less list_reduce mirror),
    * ONE division by N, hashRound(4) under the MarginAuditSpec log-loss
    * audit. Clip bounds embed as shortest-repr literals both engines
    * (the NdcgGains precedent).
    */
  def logLoss(
      df: DataFrame,
      scoreCol: Column,
      posCol: Column,
      eps: Double = 1e-6): DataFrame =
    logLossFromCells(scoreCells(df, scoreCol, posCol), eps)
}
