package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Offline single change-point detection per key (B93) — AMOC ("at most
  * one change") via the scaled CUSUM deviation: for a per-key series
  * v_1..v_n in time order, the candidate split after position t scores
  *
  *   Q_t = | n·S_t − t·S_n |           (S_t = prefix sum, 1 ≤ t < n)
  *
  * which is n·|S_t − (t/n)·S_n| — the classic cumulative-deviation
  * statistic scaled by n so it stays EXACT: v quantizes to
  * DECIMAL(18,6) (the dsum cast), prefix/total sums are exact widened
  * decimals, and n·S_t / t·S_n are int×decimal products — every Q_t is
  * an exact decimal, so the argmax needs no float comparison at all.
  * Where [[Cusum]] ALARMS online against a known baseline, this finds
  * the single most likely break in a closed series (the "did this
  * customer's level shift, and when" question).
  *
  * Determinism: the winner picks by (Q_t DESC, t ASC) on exact decimal
  * comparisons — ties resolve to the EARLIEST split in both engines;
  * `cp_stat` converts once to double at ≤ ~n·Σ|v| scaled units (well
  * under 2^53 on bounded series — the exact-conversion envelope) so it
  * hashes UNROUNDED.
  *
  * Scale shape: per-key windows over the slim (key, order, value)
  * projection — the bounded-series contract (per-key history sorts in
  * one task, the sessionize bound); one clustering exchange, the
  * argmax is a partial-aggregated struct max, never a second sort.
  * `tieCol` must make (orderCol, tieCol) total per key (the §5 rule).
  */
object Changepoint {

  /** [[amocByKey]] recomputed from carried [[Trend.seriesState]] rows —
    * the D24 streaming-maintenance twin (the D22 shape verbatim: state
    * = the per-key (o, t, v) multiset, merge = multiset union, explode
    * + the identical computation, so state-maintained == one-shot
    * EXACTLY). Unordered microbatch arrival is fine — the window sort
    * inside amocByKey owns the order.
    */
  def amocFromState(state: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val rows = state
      .select(g :+ explode(col("series")).as("__e"): _*)
      .select(g ++ Seq(col("__e.o").as("__so"), col("__e.t").as("__st"),
        col("__e.v").as("__sv")): _*)
    amocByKey(rows, keyCols, "__so", "__st", "__sv")
  }

  /** One row per key with n ≥ 2 points: `n_points`, `cp_index` (the
    * 1-based position AFTER which the break fits best, 1 ≤ cp_index <
    * n), `cp_stat` (= max Q_t, exact-decimal-derived double, unrounded).
    * Rows with a NULL key, order, tie, or value are dropped.
    */
  def amocByKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val g = keyCols.map(col)
    val clean = df.where(
      (g.map(_.isNotNull) ++ Seq(col(orderCol).isNotNull,
        col(tieCol).isNotNull, col(valueCol).isNotNull)).reduce(_ && _))
      .select(g ++ Seq(col(orderCol).as("__o"), col(tieCol).as("__t"),
        col(valueCol).cast(DecimalType(18, 6)).as("__v")): _*)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("__o"), col("__t"))
    val wAll = Window.partitionBy(g: _*)
    val scored = clean
      .withColumn("__idx", row_number().over(wOrd).cast("long"))
      .withColumn("__pre",
        sum(col("__v")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__tot", sum(col("__v")).over(wAll))
      .where(col("__idx") < col("__n")) // t = n scores 0 by construction
      .withColumn("__q",
        abs(col("__n") * col("__pre") - col("__idx") * col("__tot")))
    scored
      .groupBy(g: _*)
      .agg(
        max(col("__n")).as("n_points"),
        // exact-decimal argmax: (Q DESC, t ASC) via struct max on
        // (__q, -t) — ties pick the earliest split in both engines
        max(struct(col("__q"), (lit(0L) - col("__idx")).as("__nt"))).as("__top"))
      .select(g ++ Seq(
        col("n_points"),
        (lit(0L) - col("__top").getField("__nt")).as("cp_index"),
        col("__top").getField("__q").cast("double").as("cp_stat")): _*)
  }
}
