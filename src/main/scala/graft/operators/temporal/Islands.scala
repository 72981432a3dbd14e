package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Merge overlapping-or-touching intervals per key — the generic
    * (arbitrary-endpoint) sibling of `activityIslands`' day-grain runs:
    * coverage windows, maintenance blackouts, validity ranges collapse
    * to their union. `[a,b]` and `[b,c]` merge (closed-interval touch);
    * a gap strictly wider than zero splits.
    *
    * Sweep construction (no self-join): within a key, ordered by
    * (start, end, tie), an interval OPENS a new merged group iff its
    * start exceeds the running max of all PRECEDING ends; the running
    * sum of open flags is the group id. Both windows share one (key,
    * start, end, tie) sort — a single clustering exchange, per-key cost
    * linear in that key's intervals (the sessionize/as-of per-key
    * bound; interval counts per real-world key are production-bounded).
    *
    * Output: keyCols..., `merged_start`, `merged_end`, `n_intervals`.
    * Endpoint comparisons are native orderings (dates, timestamps,
    * numerics — exact in any engine). Rows with a null key, null
    * endpoint, or end < start are dropped (no position on the line).
    * `tieCol` must be unique within a key (§5 rule).
    */
  def mergeIntervals(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String,
      tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mergeIntervals needs at least one key column")
    val s = col(startCol); val e = col(endCol)
    val clean = df.where(
      keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        s.isNotNull && e.isNotNull && e >= s)
    mergeSweep(clean, keyCols, s, e,
      Seq(s.asc, e.asc, col(tieCol).asc), lit(1L))
  }

  /** Fold a batch of RAW intervals into carried merged-interval state
    * (D26) — the standing coverage monitor (user activity spans, sensor
    * uptime, crawl-window coverage) maintained under streaming
    * ingestion: state rows are `(key…, merged_start, merged_end,
    * n_intervals)` and the result is the SAME shape, so the fold
    * composes. Batch rows enter with weight 1, state rows with their
    * carried counts, and the whole union re-merges through the same
    * sweep [[mergeIntervals]] runs — one shared construction, so
    * state-maintained == one-shot is structural (D26 spec). Interval
    * union is associative and commutative (any batch arrival order
    * converges to the same disjoint set) but NOT replay-idempotent —
    * n_intervals double-counts a replayed batch (the D20 contract:
    * batches must PARTITION the input). State size is bounded by the
    * number of disjoint merged spans per key, not by row count.
    */
  def foldIntervalState(
      state: DataFrame,
      batch: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "foldIntervalState needs at least one key column")
    val keyCs = keyCols.map(col)
    val b = batch.where(
      keyCs.map(_.isNotNull).reduce(_ && _) &&
        col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .select(keyCs ++ Seq(
        col(startCol).as("merged_start"), col(endCol).as("merged_end"),
        lit(1L).as("n_intervals")): _*)
    val all = state.select(keyCs ++ Seq(
      col("merged_start"), col("merged_end"), col("n_intervals")): _*)
      .unionByName(b)
    val s = col("merged_start"); val e = col("merged_end")
    // order among identical (s, e) rows cannot change the sweep's groups
    // (e >= s means a duplicate never re-opens); n_intervals just fixes
    // a total order for the window
    mergeSweep(all, keyCols, s, e,
      Seq(s.asc, e.asc, col("n_intervals").asc), col("n_intervals"))
  }

  /** The shared running-max-of-preceding-ends sweep: one clustering
    * exchange, group open on `s > max(prev ends)`, weighted counts.
    */
  private def mergeSweep(
      clean: DataFrame,
      keyCols: Seq[String],
      s: Column,
      e: Column,
      order: Seq[Column],
      weight: Column): DataFrame = {
    val wPrev = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clean
      .withColumn("__opens",
        when(s > max(e).over(wPrev), 1L).otherwise(
          when(max(e).over(wPrev).isNull, 1L).otherwise(0L)))
      .withColumn("__grp", sum(col("__opens")).over(wRun))
      .groupBy(keyCols.map(col) :+ col("__grp"): _*)
      .agg(
        min(s).as("merged_start"),
        max(e).as("merged_end"),
        sum(weight).as("n_intervals"))
      .drop("__grp")
  }
}
