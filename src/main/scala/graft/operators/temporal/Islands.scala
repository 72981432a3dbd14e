package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands: collapse a per-key event stream into maximal runs
  * of consecutive active calendar days ("islands"), with per-island
  * start/end/length/event-count. The calendar-grain batch twin of
  * sessionization (D2 sessionizes on inter-event gaps; this operator
  * works on day grain, the shape retention and engagement analyses use —
  * the reference's monthly-trend/histogram tools bin by month, this is
  * the run-length analysis those bins can't express).
  *
  * Classic anchor construction: within a key, `day - row_number` is
  * constant exactly over a run of consecutive days, so grouping by the
  * anchor recovers the islands without any self-join.
  *
  * Plan shape (scale-first): the raw event stream collapses to (key,
  * day) grain in ONE partial-aggregated shuffle — the window then runs
  * over the slim day table, never over raw events. Per-key window cost
  * is bounded by active days per key (calendar-bounded, e.g. ≤ 3 650 for
  * a decade), so there is no hot-key wall at any corpus size: 100 TB of
  * events with a million-event key still window over ≤ days rows for
  * that key. Two exchanges total (day-grain hash agg, then the key
  * window's clustering); output cardinality = island count ≤ key·days.
  */
object Islands {

  /** One row per (key, island): `island_start`, `island_end` (inclusive
    * DATEs), `n_days` (island length), `n_events` (events inside it).
    * Null keys/timestamps are dropped (no calendar position).
    */
  def activityIslands(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val days = df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), to_date(col(tsCol)).as("__day"))
      .groupBy(col(keyCol), col("__day"))
      .agg(count(lit(1)).as("__day_events"))
    // __day is unique within the key after the day-grain agg, so the
    // row_number order is total — no tiebreak needed (§5 rule satisfied
    // structurally).
    val w = Window.partitionBy(keyCol).orderBy(col("__day"))
    days
      .withColumn("__anchor", date_sub(col("__day"), row_number().over(w)))
      .groupBy(col(keyCol), col("__anchor"))
      .agg(
        min(col("__day")).as("island_start"),
        max(col("__day")).as("island_end"),
        count(lit(1)).cast("long").as("n_days"),
        sum(col("__day_events")).as("n_events"))
      .drop("__anchor")
  }
}
