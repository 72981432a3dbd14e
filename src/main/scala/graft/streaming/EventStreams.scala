package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.ExactMath.dsum

/** Event-stream operators, each in a batch form (oracle-checkable) and a
  * Structured Streaming form (watermarked state, the 100 TB-stream path).
  */
object EventStreams {

  /** Batch twin of the streaming hourly window aggregation. */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy("window_start", "event_type")

  /** Streaming form: watermark bounds state; tumbling 1h windows. */
  def hourlyAggStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"), col("total_value"))

  /** Batch twin of [[windowedHeavyHittersStream]]: EXACT per-window term
    * counts (the reference answer the sketch's guarantees are audited
    * against — at 100 TB this side's shuffle is vocabulary-sized per
    * window, which is exactly why the stream carries the sketch).
    */
  def windowedHeavyHittersBatch(events: DataFrame, termCol: String,
      windowDur: String = "1 hour"): DataFrame =
    events
      .where(col(termCol).isNotNull)
      .groupBy(window(col("ts"), windowDur).as("w"), col(termCol).as("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("term"), col("n"))

  /** Streaming windowed heavy hitters: one Misra–Gries sketch per
    * event-time window — the C23b mergeable summary lifted onto the
    * stream. The `Aggregator` plugs in through `udaf`, so the per-window
    * state is ≤ k counters however many distinct terms the window sees
    * (a per-(window, term) count aggregation would hold vocabulary-sized
    * state per open window); partials merge associatively across
    * microbatches, the PODS'12 property the batch audit already pins.
    * Append mode emits each window's sketch once, when the watermark
    * closes it. Guarantees per window (merge-order independent): no
    * over-count, under-count ≤ n_window/(k+1), every term with
    * true > n_window/(k+1) present — and k ≥ window vocabulary makes the
    * sketch EXACT (no evictions ever fire).
    */
  def windowedHeavyHittersStream(events: DataFrame, termCol: String, k: Int,
      windowDur: String = "1 hour", delay: String = "10 minutes"): DataFrame = {
    val mg = udaf(new graft.operators.sketch.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    events
      .where(col(termCol).isNotNull)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(mg(col(termCol)).as("sketch"))
      .select(col("w.start").as("window_start"), col("sketch.entries").as("entries"))
  }

  /** Streaming exact dedup by id. `dropDuplicatesWithinWatermark` is the
    * state-bounded form: plain dropDuplicates(id) would keep every id ever
    * seen (the watermark only evicts when the event-time column is part of
    * the key) — the classic streaming-pipeline OOM at scale.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream join: each purchase joined to signups of the same user
    * within the preceding hour. Watermarks on both sides + a time-range
    * condition bound both join states.
    */
  def purchaseAttributionStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val signups = events.where(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "10 minutes")
    purchases.join(
      signups,
      col("p_user") === col("s_user") &&
        expr("s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 HOUR"))
  }

  /** Sliding-window event rates (1h windows every 15min) — each event lands
    * in 4 overlapping windows. Same code shape works batch and streaming.
    */
  def slidingRates(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  def slidingRatesStream(events: DataFrame): DataFrame =
    slidingRates(events.withWatermark("ts", "10 minutes"))

  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  /** Batch sessionization: gap > 30 min starts a new session. Window
    * functions only — one shuffle on user_id, linear per partition.
    */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    val isNew = when(gap.isNull || gap > SessionGapUs, 1).otherwise(0)
    events
      .withColumn("__new", isNew)
      .withColumn(
        "session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(lastTs: java.sql.Timestamp, start: java.sql.Timestamp,
      n: Long, sessionId: Long)
  final case class Session(user_id: Long, session_id: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp)

  /** Microseconds since epoch — Timestamp.getTime alone is ms and would
    * truncate the sub-ms part the batch twin keeps.
    */
  private def us(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming sessionization via per-key state. Sessions close when the
    * gap is exceeded within a batch, or — via event-time timeout — when
    * the watermark passes the open session's gap horizon, which both
    * flushes the final session and EVICTS the key's state (unbounded
    * per-user state is the alternative, and it leaks).
    *
    * Session identity: `session_id` is the session-start time in epoch
    * micros — stable under state eviction (an ordinal counter would
    * restart at 1 when an evicted user returns, colliding with their
    * earlier sessions). The batch form keeps ordinal ids; key downstream
    * joins on (user_id, session_start).
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[Event],
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Session(user, us(st.start), st.n, st.start, st.lastTs))
          } else {
            val sorted = it.toSeq.sortBy(e => (us(e.ts), e.event_id))
            var st = state.getOption.orNull
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              if (st == null) {
                st = SessionState(e.ts, e.ts, 1L, 0L)
              } else if (us(e.ts) - us(st.lastTs) > SessionGapUs) {
                closed += Session(user, us(st.start), st.n, st.start, st.lastTs)
                st = SessionState(e.ts, e.ts, 1L, 0L)
              } else {
                st = st.copy(lastTs = e.ts, n = st.n + 1L)
              }
            }
            if (st != null) {
              state.update(st)
              // close the open session once the watermark passes its gap
              state.setTimeoutTimestamp(st.lastTs.getTime + SessionGapUs / 1000L)
            }
            closed.iterator
          }
      }
  }
}
