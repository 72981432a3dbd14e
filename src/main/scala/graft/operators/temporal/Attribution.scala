package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear (equal-credit) marketing attribution — for every conversion
  * event, count the user's touch events inside a bounded lookback
  * window and split the conversion value evenly across them. Emitted at
  * CONVERSION grain, one row per conversion: per-touch credit is one
  * IEEE division per row, so no double is ever summed (a per-channel
  * rollup of credits would be an order-dependent double sum — the
  * consumer aggregates the exact (value, n_touch) pairs instead, or
  * sums value·n_type/n_tot in its own defined order).
  *
  * Join shape: equi-join on the user plus a bounded time-range filter —
  * Spark executes it as a hash/sort-merge join on `userCol` with the
  * range as a residual filter, so the intermediate is bounded by
  * touches-per-user within the lookback (the q_interval_join lesson:
  * window width, not corpus size, is the cost knob). Touches strictly
  * BEFORE the conversion and at/after `ts − lookback` qualify; ties at
  * the conversion instant are not touches (causality).
  */
object Attribution {

  /** One row per conversion event: `n_touches` total plus one count per
    * entry of `touchTypes`, and `credit_per_touch` = value / n_touches
    * (NULL when no touch qualified — the NULLIF x/0 guard). Conversions
    * with zero touches are KEPT (left join): unattributed conversions
    * are the signal a funnel report needs.
    *
    * @param lookback SQL interval literal body, e.g. "INTERVAL 7 DAYS"
    */
  def linearCredit(
      events: DataFrame,
      idCol: String,
      userCol: String,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      conversionType: String,
      touchTypes: Seq[String],
      lookback: String): DataFrame = {
    require(touchTypes.nonEmpty, "at least one touch type required")
    val conv = events
      .where(col(typeCol) === conversionType &&
        col(idCol).isNotNull && col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(
        col(idCol).as("conversion_id"),
        col(userCol).as("__u"),
        col(tsCol).as("__cts"),
        col(valueCol).as("__val"))
    val touch = events
      .where(col(typeCol).isInCollection(touchTypes) &&
        col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(
        col(userCol).as("__tu"),
        col(tsCol).as("__tts"),
        col(typeCol).as("__ttype"))
    val joined = conv.join(
      touch,
      col("__u") === col("__tu") &&
        col("__tts") < col("__cts") &&
        col("__tts") >= col("__cts") - expr(lookback),
      "left")
    val typeCounts: Seq[Column] = touchTypes.map { t =>
      count(when(col("__ttype") === t, lit(1))).as(s"n_$t")
    }
    val aggs: Seq[Column] =
      Seq(
        max(col("__u")).as("user_id"),
        max(col("__val")).as("value"),
        count(col("__ttype")).as("n_touches")) ++ typeCounts
    joined
      .groupBy(col("conversion_id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("credit_per_touch",
        col("value").cast("double") / nullif(col("n_touches").cast("double"), lit(0.0)))
  }
}
