package graft.operators.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-large temporal joins without a broadcast assumption.
  *
  * `q_range_join`'s BroadcastNestedLoopJoin is the right plan when the
  * range side is a handful of tiers; it is the WRONG plan when both
  * sides are fact-sized (every executor would stream the whole corpus
  * against every interval). The classic scale formulation is bucketing:
  * quantize time into fixed-width buckets, explode each interval into
  * the buckets it covers, and equi-join on the bucket — Spark plans an
  * ordinary shuffled hash/sort-merge join, AQE manages skew, and the
  * exact predicate filters inside the matched bucket.
  *
  * A point lives in exactly ONE bucket and an interval covers each of
  * its buckets exactly once, so a qualifying (point, interval) pair
  * meets in exactly one bucket: no duplicate elimination is needed and
  * the result is row-identical to the plain non-equi join (spec- and
  * oracle-proven).
  */
object IntervalJoin {

  /** Inner join of `points` (a DATE or timestamp column) to `intervals`
    * (`[startCol, endCol)`, end exclusive, DATE or timestamp) —
    * equi-bucketed on `bucketDays`-wide windows of the value's DATE.
    * Pick `bucketDays` near the typical interval length: wider buckets
    * replicate intervals less but match more non-qualifying pairs; the
    * exact predicate keeps the RESULT identical either way, only the
    * intermediate size moves. (The interval's bucket range includes
    * `date(end)`'s bucket even when midnight-exclusive would not need
    * it — over-coverage only adds candidates the predicate discards.)
    *
    * Degenerate intervals (end <= start) match nothing and are dropped
    * up front — Spark's `sequence` would otherwise generate a
    * DESCENDING bucket range for them and resurrect phantom matches.
    */
  def pointInInterval(
      points: DataFrame,
      pointDateCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketDays: Int = 7): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1, got $bucketDays")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_date(c.cast("date")) / bucketDays)
    val pb = points
      .where(col(pointDateCol).isNotNull)
      .withColumn("__bucket", bucketOf(col(pointDateCol)))
    val ib = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull && col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(startCol)), bucketOf(col(endCol)))))
    pb.join(ib, Seq("__bucket"))
      .where(col(pointDateCol) >= col(startCol) && col(pointDateCol) < col(endCol))
      .drop("__bucket")
  }
}
