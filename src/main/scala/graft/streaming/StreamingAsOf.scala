package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the unbounded-stream twin of
  * [[graft.operators.asof.AsOfJoin.latestPriorRow]]: for each left row,
  * the right row with the greatest timestamp ≤ the left timestamp within
  * the same key, over two live streams — surfacing the matched row (its
  * timestamp AND its id), not just the matched timestamp, so the stream
  * output schema equals the batch operator's.
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
  *  - Per-key state is bounded: unemitted left rows and right rows
  *    above the watermark horizon are buffered (both drain as the
  *    watermark advances), and every right row at/below the horizon
  *    collapses into ONE carry (ts, id) pair — only the maximum can
  *    ever be "latest prior" for a future left row (future rows are
  *    never late, so their ts is ≥ the horizon). This is the
  *    segmented-scan carry of `latestPriorTsBucketed`, replayed in
  *    time: O(in-flight rows) per key while live, O(1) at rest.
  *  - Event-time timeouts fire while ANYTHING is buffered — pending
  *    lefts (so they flush on no-data microbatches) and buffered
  *    rights (so an idle key's rights compact into the single carry
  *    instead of lingering until the key's next data). A key at rest
  *    keeps only its carry (the streaming as-of contract: the last
  *    quote per key must outlive any gap — the same O(keys) floor a
  *    stream-stream join with an unexpired dimension side has).
  *
  * Determinism: emission content is watermark-independent (a left row's
  * match is fixed by the data, not by which microbatch emitted it);
  * right rows tied on timestamp resolve to the GREATEST id — the same
  * tie rule `latestPriorRow`'s window order pins, so buffer order cannot
  * matter; equality matches (right.ts == left.ts) follow the batch
  * operator.
  */
object StreamingAsOf {

  /** One row of either side: `is_left = false` rows are the quote/right
    * side and produce no output of their own.
    */
  final case class AsOfEvent(key: Long, ts: java.sql.Timestamp, id: Long, is_left: Boolean)

  final case class AsOfMatched(id: Long, key: Long, ts: java.sql.Timestamp,
      matched_ts: Option[java.sql.Timestamp], matched_id: Option[Long])

  /** Parallel lists (not nested products) keep the state encoder flat.
    * Timestamps are epoch MICROS — ms would truncate what the batch twin
    * keeps. `carryTs = Long.MinValue` means "no prior right yet"
    * (`carryId` is meaningless then).
    *
    * STATE SCHEMA v2 (rightsIds/carryId added for the full-row carry):
    * a checkpoint written by the v1 four-field state does NOT restore
    * onto this schema — Spark fails the query at state restore with a
    * state-schema incompatibility, the standard Structured Streaming
    * contract for stateful-operator upgrades. Restart such a pipeline
    * with a fresh checkpoint directory (and a data replay window
    * covering the watermark delay); there is no silent migration path.
    */
  final case class AsOfState(pendingIds: List[Long], pendingTs: List[Long],
      rightsTs: List[Long], rightsIds: List[Long], carryTs: Long, carryId: Long)

  // floorDiv/floorMod, not truncating '/': getTime < 0 truncates toward
  // zero while getNanos is always non-negative — a pre-epoch timestamp
  // would not round-trip otherwise (mirrors toTs exactly). private[graft]
  // for the round-trip spec: Spark's initial watermark is epoch 0, so a
  // pre-1970 row can never traverse the watermarked stream itself.
  private[graft] def us(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private[graft] def toTs(usv: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(usv, 1000L))
    t.setNanos((Math.floorMod(usv, 1000000L)).toInt * 1000)
    t
  }

  /** (ts, id) pairs ordered by ts, then id — the batch tie rule. */
  private def later(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    if (a._1 > b._1 || (a._1 == b._1 && a._2 >= b._2)) a else b

  /** Emit every pending left finalized by `wmMs`, fold finalized rights
    * into the carry, and return the surviving state (None = evict).
    */
  private def flush(key: Long, st: AsOfState, wmMs: Long): (List[AsOfMatched], Option[AsOfState]) = {
    val wmUs = wmMs * 1000L
    // zipped pairs, not positional List.apply over indices: the pair walk
    // is linear where pendingTs(i) inside a map over indices is O(n²)
    val (done, keep) = st.pendingIds.zip(st.pendingTs)
      // a future row of EITHER side is never late, so its ts (ms grain) is
      // ≥ wmMs: a left row with tsMs strictly below is final
      .partition { case (_, ts) => ts / 1000L < wmMs }
    val rights = st.rightsTs.zip(st.rightsIds)
    val carry0 = if (st.carryTs != Long.MinValue) List((st.carryTs, st.carryId)) else Nil
    val emits = done.sortBy { case (id, ts) => (ts, id) }.map { case (id, ts) =>
      val m = (rights.filter(_._1 <= ts) ++ carry0).reduceOption(later)
      AsOfMatched(id, key, toTs(ts), m.map(p => toTs(p._1)), m.map(_._2))
    }
    // rights at/below the horizon: only their max can ever answer a
    // future (non-late) left row — collapse into the carry
    val (folded, live) = rights.partition(_._1 <= wmUs)
    val carry = (folded ++ carry0).reduceOption(later)
    val kept = AsOfState(keep.map(_._1), keep.map(_._2), live.map(_._1), live.map(_._2),
      carry.map(_._1).getOrElse(Long.MinValue), carry.map(_._2).getOrElse(0L))
    val empty = kept.pendingIds.isEmpty && kept.rightsTs.isEmpty && kept.carryTs == Long.MinValue
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
            AsOfState(Nil, Nil, Nil, Nil, Long.MinValue, 0L))
          val merged = if (state.hasTimedOut) prior else {
            val batch = it.toSeq
            val lefts = batch.filter(_.is_left)
            val rights = batch.filterNot(_.is_left)
            AsOfState(
              prior.pendingIds ++ lefts.map(_.id),
              prior.pendingTs ++ lefts.map(e => us(e.ts)),
              prior.rightsTs ++ rights.map(e => us(e.ts)),
              prior.rightsIds ++ rights.map(_.id),
              prior.carryTs, prior.carryId)
          }
          val (emits, next) = flush(key, merged, wmMs)
          next match {
            case Some(st) =>
              state.update(st)
              // fire once the watermark passes the earliest BUFFERED
              // timestamp of either kind: a no-data microbatch then
              // finalizes pending lefts AND compacts idle rights into
              // the carry (a rights-only key would otherwise hold its
              // full list until new data arrived for that key). +1 ms:
              // surviving rows satisfy tsMs >= wm, and a timeout
              // timestamp at the watermark itself is rejected
              val cands = (if (st.pendingTs.nonEmpty) List(st.pendingTs.min) else Nil) ++
                (if (st.rightsTs.nonEmpty) List(st.rightsTs.min) else Nil)
              if (cands.nonEmpty)
                state.setTimeoutTimestamp(cands.min / 1000L + 1L)
            case None =>
              if (state.exists) state.remove()
          }
          emits.iterator
      }
  }
}
