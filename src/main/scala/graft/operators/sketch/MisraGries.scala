package graft.operators.sketch

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The sketch result: surviving counters, `est` ≤ true frequency with
  * `true − est ≤ n / (maxCounters + 1)` however the stream was
  * partitioned and merged.
  */
final case class MGSketch(entries: Map[String, Long])

/** Misra–Gries frequent-items summary as a typed `Aggregator` — the
  * bounded-memory, mergeable twin of the exact `q_heavy_hitters`
  * groupBy (the same relationship `approxPercentiles` has to the exact
  * percentile, and HLL to COUNT(DISTINCT)). At 100 TB the exact
  * (term, count) aggregation's shuffle is vocabulary-sized; this
  * summary is ≤ `maxCounters` entries PER PARTITION partial, merged
  * associatively — the canonical "mergeable summaries" shape
  * (Agarwal et al., PODS'12).
  *
  * Guarantees (mathematical, independent of partitioning and merge
  * order — which is what makes the verdict-style oracle deterministic
  * even though the surviving counter SET is order-sensitive):
  *   - no over-count: `est ≤ true` for every surviving entry;
  *   - bounded under-count: `true − est ≤ n/(k+1)` for every term
  *     (surviving or evicted, est = 0 for evicted), n = stream size;
  *   - hence every term with `true > n/(k+1)` survives.
  *
  * Buffer is kryo-encoded (a sketch, not a row — same trade as any
  * ObjectHashAggregate sketch; the per-row path is a hash-map probe).
  */
final class MisraGries(maxCounters: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], MGSketch] {
  require(maxCounters >= 1, "maxCounters must be >= 1")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(
      buf: mutable.HashMap[String, Long], term: String): mutable.HashMap[String, Long] = {
    if (term == null) return buf
    buf.get(term) match {
      case Some(c) => buf.update(term, c + 1)
      case None if buf.size < maxCounters => buf.update(term, 1L)
      case None =>
        // classic MG step: the new item and every tracked counter give up
        // one unit (the new item's unit vanishes with it)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size > maxCounters) {
      // subtract the (k+1)-th largest counter from all; ≤ k survive and
      // every counter's total decrement stays ≤ n/(k+1) (PODS'12 merge)
      val values = b1.values.toArray
      java.util.Arrays.sort(values)
      val cut = values(values.length - maxCounters - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def finish(buf: mutable.HashMap[String, Long]): MGSketch =
    MGSketch(buf.toMap)

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[MGSketch] = Encoders.product[MGSketch]
}
