package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the unbounded-stream twin of
  * [[graft.operators.asof.AsOfJoin.latestPriorTs]]: for each left row,
  * the greatest right timestamp ≤ the left timestamp within the same
  * key, over two live streams.
  *
  * Structured Streaming's built-in stream-stream join cannot express
  * "latest prior" (it produces ALL matches in a time range, and an
  * aggregation on top of an append-mode join emits only at window
  * close; there is no native as-of). This is the
  * `flatMapGroupsWithState` formulation:
  *
  *  - Both sides arrive as one watermarked, key-tagged stream (the
  *    union shape the batch operator also uses).
  *  - A left row is emitted only once the WATERMARK passes its event
  *    time: any right row that could still change its answer (ts ≤
  *    left.ts < watermark) would now be late and dropped, so the match
  *    is final — correctness does not depend on arrival order.
  *  - Per-key state is bounded: unemitted left rows and right
  *    timestamps above the watermark horizon are buffered (both drain
  *    as the watermark advances), and every right timestamp at/below
  *    the horizon collapses into ONE carry value — only the maximum
  *    can ever be "latest prior" for a future left row (future rows
  *    are never late, so their ts is ≥ the horizon). This is the
  *    segmented-scan carry of `latestPriorTsBucketed`, replayed in
  *    time: O(in-flight rows) per key while live, O(1) at rest.
  *  - Event-time timeouts flush pending lefts on no-data microbatches;
  *    a key at rest keeps only its carry (the streaming as-of
  *    contract: the last quote per key must outlive any gap — the
  *    same O(keys) floor a stream-stream join with an unexpired
  *    dimension side has).
  *
  * Determinism: emission content is watermark-independent (a left row's
  * match is fixed by the data, not by which microbatch emitted it);
  * right-timestamp ties are value-equal so buffer order cannot matter;
  * equality matches (right.ts == left.ts) follow the batch operator.
  */
object StreamingAsOf {

  /** One row of either side: `is_left = false` rows are the quote/right
    * side and produce no output of their own.
    */
  final case class AsOfEvent(key: Long, ts: java.sql.Timestamp, id: Long, is_left: Boolean)

  final case class AsOfMatched(id: Long, key: Long, ts: java.sql.Timestamp,
      matched_ts: Option[java.sql.Timestamp])

  /** Parallel lists (not nested products) keep the state encoder flat.
    * Timestamps are epoch MICROS — ms would truncate what the batch twin
    * keeps. `carry = Long.MinValue` means "no prior right yet".
    */
  final case class AsOfState(pendingIds: List[Long], pendingTs: List[Long],
      rights: List[Long], carry: Long)

  private def us(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  private def toTs(usv: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(usv, 1000L))
    t.setNanos((Math.floorMod(usv, 1000000L)).toInt * 1000)
    t
  }

  /** Emit every pending left finalized by `wmMs`, fold finalized rights
    * into the carry, and return the surviving state (None = evict).
    */
  private def flush(key: Long, st: AsOfState, wmMs: Long): (List[AsOfMatched], Option[AsOfState]) = {
    val wmUs = wmMs * 1000L
    // a future row of EITHER side is never late, so its ts (ms grain) is
    // ≥ wmMs: a left row with tsMs strictly below is final
    val (doneIdx, keepIdx) = st.pendingIds.indices.toList
      .partition(i => st.pendingTs(i) / 1000L < wmMs)
    val allRights = st.rights
    val emits = doneIdx.sortBy(i => (st.pendingTs(i), st.pendingIds(i))).map { i =>
      val ts = st.pendingTs(i)
      val m = (allRights.filter(_ <= ts) ++ (if (st.carry != Long.MinValue) List(st.carry) else Nil))
        .reduceOption(_ max _)
      AsOfMatched(st.pendingIds(i), key, toTs(ts), m.map(toTs))
    }
    // rights at/below the horizon: only their max can ever answer a
    // future (non-late) left row — collapse into the carry
    val (folded, liveRights) = allRights.partition(_ <= wmUs)
    val carry = (folded ++ (if (st.carry != Long.MinValue) List(st.carry) else Nil))
      .reduceOption(_ max _).getOrElse(Long.MinValue)
    val kept = AsOfState(keepIdx.map(st.pendingIds), keepIdx.map(st.pendingTs), liveRights, carry)
    val empty = kept.pendingIds.isEmpty && kept.rights.isEmpty && kept.carry == Long.MinValue
    (emits, if (empty) None else Some(kept))
  }

  /** The watermark delay bounds how long lefts buffer before
    * finalizing (and how late a right row may arrive and still count).
    */
  def asOfStream(spark: SparkSession, events: Dataset[AsOfEvent],
      watermarkDelay: String = "10 minutes"): Dataset[AsOfMatched] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfMatched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[AsOfEvent], state: GroupState[AsOfState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val prior = state.getOption.getOrElse(
            AsOfState(Nil, Nil, Nil, Long.MinValue))
          val merged = if (state.hasTimedOut) prior else {
            val batch = it.toSeq
            val lefts = batch.filter(_.is_left)
            val rights = batch.filterNot(_.is_left)
            AsOfState(
              prior.pendingIds ++ lefts.map(_.id),
              prior.pendingTs ++ lefts.map(e => us(e.ts)),
              prior.rights ++ rights.map(e => us(e.ts)),
              prior.carry)
          }
          val (emits, next) = flush(key, merged, wmMs)
          next match {
            case Some(st) =>
              state.update(st)
              if (st.pendingIds.nonEmpty)
                // fires once the watermark passes the earliest pending
                // left — a no-data microbatch then finalizes it. +1 ms:
                // kept rows satisfy tsMs >= wm, and a timeout timestamp
                // at the watermark itself is rejected
                state.setTimeoutTimestamp(st.pendingTs.min / 1000L + 1L)
            case None =>
              if (state.exists) state.remove()
          }
          emits.iterator
      }
  }
}
