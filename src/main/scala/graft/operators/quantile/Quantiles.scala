package graft.operators.quantile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact and approximate quantile machinery that survives 100 TB.
  *
  * The naive exact formulations are both single-point funnels:
  * `ntile(n) OVER (ORDER BY v)` moves every row into ONE task, and the
  * exact `percentile` aggregate buffers every value of a group in the
  * aggregation state. The operators here replace them:
  *
  *  - [[withNtile]] — exact ntile assignment with no global window:
  *    boundary-then-broadcast over a TeraSort-style range partitioning.
  *  - [[approxPercentiles]] — the mergeable bounded-memory scale twin of
  *    the exact `percentile` aggregate (Greenwald-Khanna sketch via
  *    `approx_percentile`), with a rank-error contract.
  *
  * Re-expresses the reference's quantile/summary statistics surface
  * (reference: /root/reference/openai/list_of_tools.py:204 chart binning,
  * pandas `describe`-style summaries) as distributed operators.
  */
object Quantiles {

  /** Input contract shared by [[orderStatistics]] and [[withNtile]]:
    * both columns must be orderable ATOMIC types (numeric, string,
    * timestamp, date, boolean — not arrays/structs/maps) and non-null
    * (the map-side bucket predicate and the boundary fetch cannot
    * represent SQL null ordering — filter nulls first; null presence is
    * detected and rejected, not silently misbucketed). `tieCol` must be
    * a unique key: it is what makes the composite ordering total.
    */
  private def checkTypes(df: DataFrame, valueCol: String, tieCol: String): Unit = {
    import org.apache.spark.sql.types._
    def orderable(name: String): Unit = df.schema(name).dataType match {
      case _: NumericType | StringType | TimestampType | TimestampNTZType |
          DateType | BooleanType => ()
      case other => throw new IllegalArgumentException(
        s"$name must be an orderable atomic type (got $other)")
    }
    orderable(valueCol)
    orderable(tieCol)
  }

  /** Exact order statistics of the composite ordering (valueCol, tieCol)
    * at 1-based global ranks, computed WITHOUT a global sort funnel:
    *
    *  1. range-partition the slim (value, tie) projection (TeraSort
    *     shape: the only full-data movement, and it carries two columns,
    *     not whole rows);
    *  2. per-partition counts → driver (numPartitions longs) → exclusive
    *     prefix offsets;
    *  3. each requested global rank lands in exactly one partition at a
    *     known local rank; only THOSE partitions are sorted (a window
    *     partitioned by partition id — each task sees one partition's
    *     rows, never the table).
    *
    * `ranksOf` receives the exact total row count (already known from
    * step 2 — callers never need a separate count() pass) and returns
    * the ranks to fetch. Returns the (value, tie) pairs in rank order,
    * in the columns' NATIVE types (usable as comparison literals); ranks
    * beyond the row count are clamped to the maximum (empty-bucket
    * degeneracy when n_rows < n_buckets).
    *
    * Determinism: ranks are exact, so the result is independent of how
    * the range partitioner happened to split — the partitioning only has
    * to be internally consistent, which the persist guarantees.
    */
  def orderStatisticsBy(
      df: DataFrame,
      valueCol: String,
      tieCol: String)(ranksOf: Long => Seq[Long]): Seq[(Any, Any)] = {
    checkTypes(df, valueCol, tieCol)
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val slim = df.select(col(valueCol).as("__v"), col(tieCol).as("__k"))
    // persisted so the count job and the boundary-fetch job see the SAME
    // partitioning (the range partitioner samples; two independent
    // evaluations could split differently)
    val ranged = slim
      .repartitionByRange(parts, col("__v"), col("__k"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // null detection piggybacks on the counts job — no extra pass
      val counts0 = ranged.groupBy("__pid")
        .agg(count(lit(1)).as("c"),
          sum(when(col("__v").isNull || col("__k").isNull, 1L).otherwise(0L)).as("nulls"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      require(counts0.map(_._3).sum == 0L,
        s"$valueCol/$tieCol contain NULLs — filter them before calling " +
          "(the boundary-broadcast formulation cannot represent null ordering)")
      val counts = counts0.map(t => t._1 -> t._2)
      val total = counts.map(_._2).sum
      require(total > 0, "orderStatistics on an empty input")
      val ranks = ranksOf(total)
      require(ranks.nonEmpty && ranks.forall(_ >= 1L), s"ranks must be >= 1: $ranks")
      val clamped = ranks.map(r => math.min(r, total))
      // exclusive prefix offsets, in partition-id (= range) order
      val offsets = counts.scanLeft(0L)(_ + _._2)
      // rank -> (pid, local rank) via the offsets
      val located: Seq[(Long, Int, Long)] = clamped.map { r =>
        val i = counts.indices.find(i => r <= offsets(i) + counts(i)._2).get
        (r, counts(i)._1, r - offsets(i))
      }
      val targetPids = located.map(_._2).distinct
      val perPid: Map[Int, Seq[Long]] =
        located.groupBy(_._2).map { case (p, xs) => p -> xs.map(_._3).distinct }
      val w = Window.partitionBy("__pid").orderBy("__v", "__k")
      val hit = perPid
        .map { case (p, lrs) => col("__pid") === p && col("__lr").isin(lrs: _*) }
        .reduce(_ || _)
      val fetched = ranged
        .where(col("__pid").isin(targetPids: _*))
        .withColumn("__lr", row_number().over(w).cast("long"))
        .where(hit)
        .select("__pid", "__lr", "__v", "__k")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> ((r.get(2), r.get(3))))
        .toMap
      located.map { case (_, p, lr) => fetched((p, lr)) }
    } finally { ranged.unpersist(false); () }
  }

  /** Fixed-rank convenience form of [[orderStatisticsBy]]. */
  def orderStatistics(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      ranks: Seq[Long]): Seq[(Any, Any)] =
    orderStatisticsBy(df, valueCol, tieCol)(_ => ranks)

  /** Exact `ntile(n) OVER (ORDER BY valueCol, tieCol)` without the
    * single-partition window: the n-1 bucket boundaries (the last
    * (value, tie) of each bucket, from [[orderStatisticsBy]]) are driver
    * literals, and each row's bucket is `1 + #(boundaries below it)` —
    * a map-side when-chain fused into the scan. Identical output to the
    * window formulation for any non-null atomic-typed input with a
    * unique tieCol (see [[checkTypes]] for the contract; comparisons use
    * the columns' native types, so strings and timestamps order exactly
    * as the window would).
    */
  def withNtile(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      n: Int,
      outputCol: String): DataFrame = {
    require(n >= 1, s"ntile buckets must be >= 1, got $n")
    if (n == 1) return df.withColumn(outputCol, lit(1L))
    // boundary ranks derive from the exact total the counts pass already
    // produces — no separate count() scan
    val bounds = orderStatisticsBy(df, valueCol, tieCol) { total =>
      // ntile sizes: first (total % n) buckets get one extra row
      val base = total / n
      val extra = (total % n).toInt
      (1 until n)
        .scanLeft(0L) { case (acc, i) => acc + base + (if (i <= extra) 1L else 0L) }
        .tail
        .filter(_ >= 1L)
    }
    val v = col(valueCol)
    val k = col(tieCol)
    val bucket = bounds.foldLeft(lit(1L)) { case (acc, (bv, bk)) =>
      acc + when(v > lit(bv) || (v === lit(bv) && k > lit(bk)), 1L).otherwise(0L)
    }
    df.withColumn(outputCol, bucket)
  }

  /** Exact `ntile(n) OVER (PARTITION BY groupCol ORDER BY valueCol,
    * tieCol)` for FEW, HUGE groups — the shape a curation pipeline asks
    * for (deciles within each org unit / language) where a plain
    * per-group window still funnels one 4 TB group into one task.
    *
    * The boundary-broadcast machinery generalizes: ONE composite-key
    * range shuffle of the slim (group, value, tie) projection, per-
    * (partition, group) counts aggregated into per-group exclusive
    * prefix offsets (a window over the partition×group-sized count
    * table, never the data), boundary rows fetched by joining their
    * (partition, local-rank) locations, and each row's bucket assigned
    * MAP-SIDE as `1 + #(group boundaries below it)` via a broadcast
    * join on the group plus a codegen'd higher-order filter over the
    * group's boundary array.
    *
    * Contract: [[checkTypes]] applies to all three columns (orderable
    * atomic, non-null — nulls rejected, not misbucketed; `tieCol`
    * unique WITHIN each group). Group cardinality must be
    * driver-modest: the boundary table is groups×(n−1) rows and is
    * broadcast. That is the right trade — a HIGH-cardinality groupCol
    * means small groups, where the ordinary per-group window ntile
    * already scales (many groups = parallelism) and this operator is
    * unnecessary.
    */
  def withNtileByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String,
      n: Int,
      outputCol: String): DataFrame = {
    require(n >= 1, s"ntile buckets must be >= 1, got $n")
    if (n == 1) return df.withColumn(outputCol, lit(1L))
    checkTypes(df, valueCol, tieCol)
    checkTypes(df, groupCol, tieCol)
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val slim = df.select(col(groupCol).as("__g"), col(valueCol).as("__v"), col(tieCol).as("__k"))
    // persisted: counts, locations and the boundary fetch must all see the
    // SAME range split (the partitioner samples — see orderStatisticsBy)
    val ranged = slim
      .repartitionByRange(parts, col("__g"), col("__v"), col("__k"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // (pid, group)-grain counts: partitions×groups rows — the ONLY
      // thing the whole boundary computation ever aggregates or windows.
      // Materialized once (tiny): three consumers (null check, offsets,
      // totals) would otherwise each re-aggregate the persisted corpus
      val counts = ranged.groupBy("__pid", "__g")
        .agg(count(lit(1)).as("__c"),
          sum(when(col("__g").isNull || col("__v").isNull || col("__k").isNull, 1L)
            .otherwise(0L)).as("__nulls"))
        .localCheckpoint(true)
      val nullRow = counts.agg(sum("__nulls").as("s")).head()
      require(!nullRow.isNullAt(0), "withNtileByGroup on an empty input")
      require(nullRow.getLong(0) == 0L,
        s"$groupCol/$valueCol/$tieCol contain NULLs — filter them before calling " +
          "(the boundary-broadcast formulation cannot represent null ordering)")
      // exclusive prefix offset of each (pid, group) slice within its
      // group, and the group total — windows over the tiny count table
      val wOff = Window.partitionBy("__g").orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val withOff = counts.select(col("__pid"), col("__g"), col("__c"),
        coalesce(sum("__c").over(wOff), lit(0L)).as("__off"))
      // per-group boundary ranks b=1..n-1: cumulative ntile bucket sizes
      // b·(tot/n) + min(b, tot%n) — duplicate ranks in the tot<n
      // degenerate case are harmless (nothing orders strictly above the
      // max-rank row, same as withNtile's clamping)
      val bounds = counts.groupBy("__g").agg(sum("__c").as("__tot"))
        .select(col("__g"), col("__tot"),
          explode(sequence(lit(1L), lit(n.toLong - 1L))).as("__b"))
        .select(col("__g"),
          (col("__b") * floor(col("__tot") / n).cast("long")
            + least(col("__b"), pmod(col("__tot"), lit(n.toLong)))).as("__rank"))
        .where(col("__rank") >= 1L)
      // each boundary rank lives in exactly one (pid, group) slice at a
      // known local rank; fetch those rows with a per-slice row_number
      // over ONLY the partitions that hold a boundary
      val locs = bounds.join(withOff, Seq("__g"))
        .where(col("__rank") > col("__off") && col("__rank") <= col("__off") + col("__c"))
        .select(col("__pid"), col("__g"), (col("__rank") - col("__off")).as("__lr"))
      val targetPids = locs.select("__pid").distinct()
      val wLr = Window.partitionBy("__pid", "__g").orderBy("__v", "__k")
      // localCheckpoint(eager): the assign plan below must not re-derive
      // the range split after the finally-unpersist — the boundary set is
      // groups×(n-1) rows, materializing it is free
      val fetched = ranged
        .join(broadcast(targetPids), Seq("__pid"), "left_semi")
        .withColumn("__lr", row_number().over(wLr).cast("long"))
        .join(broadcast(locs), Seq("__pid", "__g", "__lr"))
        .select(col("__g"), col("__v").as("__bv"), col("__k").as("__bk"))
        .localCheckpoint(true)
      val barr = fetched.groupBy("__g")
        .agg(sort_array(collect_list(struct(col("__bv"), col("__bk")))).as("__bnds"))
      val v = col(valueCol)
      val k = col(tieCol)
      val bucket = lit(1L) + size(filter(col("__bnds"),
        b => v > b("__bv") || (v === b("__bv") && k > b("__bk")))).cast("long")
      df.join(broadcast(barr), df(groupCol) === barr("__g"))
        .withColumn(outputCol, bucket)
        .drop("__g", "__bnds")
    } finally { ranged.unpersist(false); () }
  }

  /** Bounded-memory percentiles per group — the 100 TB twin of the exact
    * `percentile` aggregate (which buffers every value of a group in its
    * aggregation buffer). `approx_percentile` keeps a fixed-size
    * mergeable sketch per group; the returned value is an actual element
    * of the group whose RANK error is at most 1/accuracy of the group
    * size (so with the default 10000, a p50 lands between the true p49.99
    * and p50.01). QuantilesSpec pins that contract against the exact path.
    */
  def approxPercentiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      percentiles: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1))
    val aggs = percentiles.zipWithIndex.map { case (p, i) =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .as(s"p${(p * 100).round}")
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
