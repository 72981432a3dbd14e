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

  /** Interval×interval OVERLAP join (`a.start < b.end && b.start <
    * a.end`, ends exclusive), equi-bucketed like [[pointInInterval]].
    * Overlapping intervals can share MANY buckets; the join stays
    * duplicate-free without a dropDuplicates pass via the textbook
    * first-common-bucket condition: a qualifying pair is emitted only
    * in bucket `max(bucket(a.start), bucket(b.start))` — the first
    * bucket both cover (the later start lies inside both intervals, so
    * its bucket is in both bucket ranges) — which identifies exactly
    * one meeting point per pair. Column names must be disjoint across
    * the two sides (alias before calling); degenerate intervals drop
    * up front as in [[pointInInterval]].
    */
  def overlapJoin(
      left: DataFrame,
      lStartCol: String,
      lEndCol: String,
      right: DataFrame,
      rStartCol: String,
      rEndCol: String,
      bucketDays: Int = 7): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1, got $bucketDays")
    require(Seq(lStartCol, lEndCol, rStartCol, rEndCol).distinct.size == 4,
      "start/end column names must be disjoint across the two sides — alias first")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_date(c.cast("date")) / bucketDays)
    def explodeBuckets(df: DataFrame, s: String, e: String) = df
      .where(col(s).isNotNull && col(e).isNotNull && col(e) > col(s))
      .withColumn("__bucket", explode(sequence(bucketOf(col(s)), bucketOf(col(e)))))
    explodeBuckets(left, lStartCol, lEndCol)
      .join(explodeBuckets(right, rStartCol, rEndCol), Seq("__bucket"))
      .where(col(lStartCol) < col(rEndCol) && col(rStartCol) < col(lEndCol)
        && col("__bucket") === greatest(bucketOf(col(lStartCol)), bucketOf(col(rStartCol))))
      .drop("__bucket")
  }
}
