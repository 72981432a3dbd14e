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

  /** Exact per-group percentiles — the values the exact `percentile()`
    * aggregate returns, BIT-FOR-BIT, without its per-group value buffer
    * (optimization guide §2.3/§2.5: the aggregate ships every value of a
    * group through one exchange into ONE reducer that sorts it — a
    * 600k-row group at sf0.1 is already a 1.3 s single task and 30+ MiB
    * of ObjectHashAggregate state for a 3-row result; at 100 TB it is
    * the canonical single-key funnel).
    *
    * Plan: the [[orderStatisticsBy]]/[[withNtileByGroup]] machinery —
    * ONE range shuffle of the slim (group, value) projection (TeraSort
    * shape, fully distributed), per-(partition, group) counts collected
    * (group slices are contiguous under the range split, so ≤
    * partitions + groups − 1 rows), selection ranks located on the
    * driver, and only the boundary rows fetched via an in-partition
    * sort + linear rank scan. `Percentile.getPercentile`'s selection and
    * interpolation arithmetic is replicated on the driver with the SAME
    * JVM double ops (position = (N−1)·p; keys at floor/ceil of the
    * position; `(higher − pos)·lowerKey + (pos − lower)·higherKey`), so
    * outputs are bit-identical — GroupPercentilesSpec pins equality
    * against the `percentile()` aggregate itself.
    *
    * Contract: `valueCol` numeric, `groupCol` orderable atomic; rows
    * with a NULL group or NULL value are excluded (the aggregate skips
    * null values too; a null GROUP's percentile row — which a plain
    * `groupBy` would emit — is not produced: callers here never feed
    * null groups, and the range partitioner cannot represent null
    * ordering). Group cardinality must be driver-modest (the result is
    * a driver-built local table — same contract as
    * [[withNtileByGroup]]'s boundary table). `nCol` optionally emits the
    * group's non-null row count (free — job 1 already knows it).
    */
  def groupPercentilesExact(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      outNames: Seq[String],
      nCol: Option[String] = None): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentages must be in [0,1], got $ps")
    require(outNames.size == ps.size, "one output name per percentage")
    import org.apache.spark.sql.types._
    df.schema(valueCol).dataType match {
      case _: NumericType => ()
      case other => throw new IllegalArgumentException(
        s"$valueCol must be numeric for percentile interpolation (got $other)")
    }
    checkTypes(df, groupCol, groupCol)
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val outSchema = StructType(
      StructField(groupCol, df.schema(groupCol).dataType) +:
        (outNames.map(StructField(_, DoubleType)) ++
          nCol.map(StructField(_, LongType))))
    val slim = df
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .where(col("__g").isNotNull && col("__v").isNotNull)
    // persisted: counts and the boundary fetch must see the SAME range
    // split (the partitioner samples — see orderStatisticsBy)
    val ranged = slim
      .repartitionByRange(parts, col("__g"), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      import org.apache.spark.sql.{Encoders, Row}
      import scala.jdk.CollectionConverters._
      // job 1: (pid, group) counts, collected (contiguous slices — the
      // withNtileByGroup driver-size argument)
      val counts = ranged.groupBy("__pid", "__g")
        .agg(count(lit(1)).as("__c"))
        .collect()
      if (counts.isEmpty)
        return spark.createDataFrame(
          java.util.Collections.emptyList[Row](), outSchema)
      // per-group slices in pid (= range) order with exclusive prefix
      // offsets; a 1-based global rank locates to (pid, local rank)
      val slicesByGroup: Seq[(Any, Seq[(Int, Long, Long)])] = counts
        .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
        .groupBy(_._2).toSeq
        .map { case (g, arr) =>
          val sorted = arr.sortBy(_._1).toSeq
          val offs = sorted.scanLeft(0L)(_ + _._3)
          g -> sorted.zip(offs).map { case ((p, _, c), o) => (p, c, o) }
        }
      def locate(slices: Seq[(Int, Long, Long)], r: Long): (Int, Long) = {
        val (p, _, o) = slices.find(s => r > s._3 && r <= s._3 + s._2).get
        (p, r - o)
      }
      // Percentile's selection ranks: position = (N−1)·p (double);
      // the keys at 0-based ranks floor(position) and ceil(position)
      val ranksByGroup: Seq[(Any, Seq[(Int, Long)])] = slicesByGroup.map {
        case (g, slices) =>
          val maxPos = (slices.map(_._2).sum - 1).toDouble
          val oneBased = ps.flatMap { p =>
            val pos = maxPos * p
            Seq(math.floor(pos).toLong + 1L, math.ceil(pos).toLong + 1L)
          }.distinct
          g -> oneBased.map(locate(slices, _))
      }
      val wanted: Map[Int, Map[Any, Set[Long]]] = ranksByGroup
        .flatMap { case (g, ls) => ls.map { case (p, lr) => (p, g, lr) } }
        .groupBy(_._1)
        .map { case (p, xs) =>
          p -> xs.groupBy(_._2).map { case (g, ys) => g -> ys.map(_._3).toSet }
        }
      val bWanted = spark.sparkContext.broadcast(wanted)
      // job 2: fetch only the selection rows — in-partition sort + one
      // linear rank scan over only the partitions holding a target (the
      // pid filter is partition-grain, so retained slices stay intact)
      val fetchSchema = StructType(ranged.schema.fields :+ StructField("__lr", LongType))
      val fetched: Map[(Int, Any, Long), Any] = ranged
        .where(col("__pid").isin(wanted.keys.toSeq: _*))
        .sortWithinPartitions("__g", "__v")
        .mapPartitions { it =>
          val w = bWanted.value
          var curG: Any = null
          var started = false
          var rank = 0L
          it.flatMap { row =>
            w.get(row.getInt(2)) match {
              case None => Iterator.empty
              case Some(byG) =>
                val g = row.get(0)
                if (!started || g != curG) { curG = g; started = true; rank = 1L }
                else rank += 1L
                if (byG.get(g).exists(_.contains(rank)))
                  Iterator.single(Row.fromSeq(row.toSeq :+ rank))
                else Iterator.empty
            }
          }
        }(Encoders.row(fetchSchema))
        .collect()
        .map(r => ((r.getInt(2), r.get(0), r.getLong(3)), r.get(1)))
        .toMap
      // Percentile.toDoubleValue: Decimal.toDouble == BigDecimal.doubleValue
      def toDoubleValue(a: Any): Double = a match {
        case d: java.math.BigDecimal => d.doubleValue
        case n: java.lang.Number => n.doubleValue
        case other => throw new IllegalStateException(
          s"non-numeric percentile key: $other")
      }
      val rows: Seq[Row] = slicesByGroup.map { case (g, slices) =>
        val n = slices.map(_._2).sum
        val maxPos = (n - 1).toDouble
        val vals = ps.map { p =>
          val pos = maxPos * p
          val lower = math.floor(pos).toLong
          val higher = math.ceil(pos).toLong
          val (lp, llr) = locate(slices, lower + 1L)
          val lowerKey = toDoubleValue(fetched((lp, g, llr)))
          if (higher == lower) lowerKey
          else {
            val (hp, hlr) = locate(slices, higher + 1L)
            val higherKey = toDoubleValue(fetched((hp, g, hlr)))
            if (higherKey == lowerKey) lowerKey
            else (higher - pos) * lowerKey + (pos - lower) * higherKey
          }
        }
        Row.fromSeq(g +: (vals ++ nCol.map(_ => n)))
      }
      spark.createDataFrame(rows.asJava, outSchema)
    } finally { ranged.unpersist(false); () }
  }

  /** Exact `ntile(n) OVER (PARTITION BY groupCol ORDER BY valueCol,
    * tieCol)` for FEW, HUGE groups — the shape a curation pipeline asks
    * for (deciles within each org unit / language) where a plain
    * per-group window still funnels one 4 TB group into one task.
    *
    * The boundary-broadcast machinery generalizes, in the same THREE
    * jobs as [[withNtile]] (round 5 — the previous shape paid ~2× in
    * serialized tiny jobs: two broadcast-plan evaluations, a checkpoint
    * and a rank-window exchange):
    *
    *  1. ONE composite-key range shuffle of the slim (group, value,
    *     tie) projection, persisted; (partition, group) counts + null
    *     piggyback collected — range partitioning by (group, …) makes
    *     group slices CONTIGUOUS, so the count table is at most
    *     partitions + groups − 1 rows, the same driver-size class as
    *     [[orderStatisticsBy]]'s per-partition longs;
    *  2. boundary ranks per group located on the driver (exclusive
    *     prefix offsets over each group's slices), then fetched with
    *     `sortWithinPartitions` + a LINEAR per-partition rank scan over
    *     only the partitions holding a boundary — no exchange, no
    *     window, ranks read off the already-range-partitioned cache;
    *  3. each row's bucket assigned MAP-SIDE as `1 + #(group boundaries
    *     below it)`: the groups×(n−1) boundary rows become a driver-built
    *     LocalRelation broadcast-joined on the group, with a codegen'd
    *     higher-order filter over the group's boundary array.
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
      import org.apache.spark.sql.{Encoders, Row}
      import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
      import scala.jdk.CollectionConverters._
      // job 1: (pid, group) counts + null piggyback, collected. Group
      // slices are CONTIGUOUS under the (group, …) range partitioning,
      // so this is at most partitions + groups − 1 rows — the same
      // driver-size class as orderStatisticsBy's per-partition longs
      val counts = ranged.groupBy("__pid", "__g")
        .agg(count(lit(1)).as("__c"),
          sum(when(col("__g").isNull || col("__v").isNull || col("__k").isNull, 1L)
            .otherwise(0L)).as("__nulls"))
        .collect()
      require(counts.nonEmpty, "withNtileByGroup on an empty input")
      require(counts.map(_.getLong(3)).sum == 0L,
        s"$groupCol/$valueCol/$tieCol contain NULLs — filter them before calling " +
          "(the boundary-broadcast formulation cannot represent null ordering)")
      // driver: per-group slices in pid (= range) order with exclusive
      // prefix offsets; boundary ranks b·(tot/n) + min(b, tot%n) for
      // b=1..n-1 located to (pid, local rank). Duplicate ranks in the
      // tot<n degenerate case stay duplicated — the boundary list is a
      // MULTISET whose duplicates are always the group maximum, and
      // nothing orders strictly above it (same clamping as withNtile)
      val slicesByGroup: Seq[(Any, Seq[(Int, Long, Long)])] = counts
        .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
        .groupBy(_._2).toSeq
        .map { case (g, arr) =>
          val sorted = arr.sortBy(_._1).toSeq
          val offs = sorted.scanLeft(0L)(_ + _._3)
          g -> sorted.zip(offs).map { case ((p, _, c), o) => (p, c, o) }
        }
      val locsByGroup: Seq[(Any, Seq[(Int, Long)])] = slicesByGroup.map {
        case (g, slices) =>
          val tot = slices.map(_._2).sum
          val base = tot / n
          val extra = tot % n
          g -> (1 until n).map(b => b * base + math.min(b.toLong, extra))
            .filter(_ >= 1L)
            .map { r =>
              val (p, _, o) = slices.find(s => r > s._3 && r <= s._3 + s._2).get
              (p, r - o)
            }
      }
      // job 2: fetch the boundary rows with an in-partition sort + one
      // linear rank scan over only the partitions holding a boundary.
      // The cache is already range-partitioned, so there is no exchange
      // and no window; the filter is partition-grain, so every retained
      // partition's slices stay intact and local ranks are exact
      val wanted: Map[Int, Map[Any, Set[Long]]] = locsByGroup
        .flatMap { case (g, ls) => ls.map { case (p, lr) => (p, g, lr) } }
        .groupBy(_._1)
        .map { case (p, xs) =>
          p -> xs.groupBy(_._2).map { case (g, ys) => g -> ys.map(_._3).toSet }
        }
      val bWanted = spark.sparkContext.broadcast(wanted)
      val outSchema = StructType(ranged.schema.fields :+ StructField("__lr", LongType))
      val fetched: Map[(Int, Any, Long), (Any, Any)] = ranged
        .where(col("__pid").isin(wanted.keys.toSeq: _*))
        .sortWithinPartitions("__g", "__v", "__k")
        .mapPartitions { it =>
          val w = bWanted.value
          var curG: Any = null
          var started = false
          var rank = 0L
          it.flatMap { row =>
            w.get(row.getInt(3)) match {
              case None => Iterator.empty
              case Some(byG) =>
                val g = row.get(0)
                if (!started || g != curG) { curG = g; started = true; rank = 1L }
                else rank += 1L
                if (byG.get(g).exists(_.contains(rank)))
                  Iterator.single(Row.fromSeq(row.toSeq :+ rank))
                else Iterator.empty
            }
          }
        }(Encoders.row(outSchema))
        .collect()
        .map(r => ((r.getInt(3), r.get(0), r.getLong(4)), (r.get(1), r.get(2))))
        .toMap
      // job 3: assign map-side. The groups×(n−1) boundary multiset (in
      // rank = ascending (value, tie) order) becomes a driver-built
      // LocalRelation — broadcasting it launches no cluster job
      val barrSchema = StructType(Seq(
        StructField("__g", df.schema(groupCol).dataType),
        StructField("__bnds", ArrayType(StructType(Seq(
          StructField("__bv", df.schema(valueCol).dataType),
          StructField("__bk", df.schema(tieCol).dataType)))))))
      val barrRows: java.util.List[Row] = locsByGroup.map { case (g, ls) =>
        Row(g, ls.map { case (p, lr) =>
          val (bv, bk) = fetched((p, g, lr))
          Row(bv, bk)
        })
      }.asJava
      val barr = spark.createDataFrame(barrRows, barrSchema)
      val v = col(valueCol)
      val k = col(tieCol)
      val bucket = lit(1L) + size(filter(col("__bnds"),
        b => v > b("__bv") || (v === b("__bv") && k > b("__bk")))).cast("long")
      df.join(broadcast(barr), df(groupCol) === barr("__g"))
        .withColumn(outputCol, bucket)
        .drop("__g", "__bnds")
    } finally { ranged.unpersist(false); () }
  }

  /** Exact weighted quantile per group: the smallest value whose running
    * weight share reaches `qPct`% of the group's total weight (weighted
    * median = `qPct = 50`). The inventory-skew primitive plain
    * percentiles miss: the median ORDER is not the median UNIT when line
    * sizes differ.
    *
    * Scale shape (the B48 first-occurrence trick): the data-grain shuffle
    * aggregates to (group, value) FIRST — the running weight then rides
    * [[graft.operators.stats.RankedSpine.exclusivePrefix]] over the
    * value-grain spine (distributed; auto-degrades to the legacy pinned
    * per-group window below the small-spine threshold), bounded by
    * distinct values, never raw rows. Weights accumulate as
    * DECIMAL(18,6) = exact integer MICROS, and the threshold test
    * `cum * 100 >= qPct * tot` is pure integer arithmetic in
    * DECIMAL(38,0) — no division, no float, so the same comparison is
    * exact in any engine (hash-safe without rounding; the returned value
    * is an actual data element).
    *
    * Contract: weights must be positive (non-positive or NULL weights
    * and NULL values are dropped — a zero-weight value cannot be "the
    * median element" and a negative weight makes the running share
    * non-monotone); `qPct` in (0, 100]; any single (group, value)
    * cell's weight mass beyond ~9.2e12 units raises (micros must fit a
    * LONG — beyond that use [[weightedQuantileApprox]]).
    */
  def weightedQuantile(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      qPct: Int,
      outCol: String = "weighted_quantile"): DataFrame = {
    require(qPct > 0 && qPct <= 100, s"qPct must be in (0, 100], got $qPct")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    // r16-opt: the running weight rides RankedSpine.exclusivePrefix
    // instead of a per-group window over the value spine (which sorts a
    // whole group's distinct values in ONE task — ~590k spine rows in 3
    // tasks at sf0.1, unbounded at scale). Weights are DECIMAL(18,6), so
    // integer MICROS are exact (×1e6 on a scale-6 decimal): the prefix
    // sums satisfy exclusivePrefix's integral contract, and the
    // division-free threshold `cum·100 ≥ qPct·tot` scaled by 1e6 on both
    // sides is the SAME comparison — decided in DECIMAL(38,0) so no
    // group total can wrap the ×100. Below the small-spine threshold the
    // prefix auto-degrades to the legacy pinned window (bit-identical
    // both paths — the RankedSpine contract).
    // fan out the grain aggregation (r16-opt): the corpus scan is 3
    // tasks at sf0.1 and the decimal partial agg fused into it ran
    // near-serially (ProfileStages: 3-task stage, maxTask ~1.0 s of the
    // 4.1 s total); gate no-ops at scale, keys are near-unique
    val grain = graft.operators.FanOut.byKey(
      df
        .where(col(valueCol).isNotNull && col(weightCol).isNotNull && col(weightCol) > 0)
        .select((groupCols :+ valueCol :+ weightCol).distinct.map(col): _*),
      (groupCols :+ valueCol).map(col): _*)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(sum(col(weightCol).cast("decimal(18,6)")).as("__wdec"))
      // ANSI is off, so a wrapping micros cast would NULL the cell out
      // of the prefix SILENTLY (the hhi lesson) — raise instead; a
      // per-value weight mass beyond ~9.2e12 units needs the sketch path
      .select((groupCols :+ valueCol).map(col) :+
        when(col("__wdec") <= lit(new java.math.BigDecimal("9223372036854")),
          (col("__wdec") * lit(1000000)).cast("long"))
          .otherwise(expr(
            "raise_error('weightedQuantile: per-value weight mass exceeds LONG micros')")
            .cast("long"))
          .as("__wl"): _*)
    // pin the spine once: BOTH consumers below (the prefix machinery and
    // the per-group total) would otherwise re-run the corpus-grain
    // aggregation lineage (the q_rfm re-derivation lesson)
    val pinned = grain.localCheckpoint(true)
    val pre = graft.operators.stats.RankedSpine
      .exclusivePrefix(pinned, groupCols, valueCol, Seq("__wl" -> "__before"))
    val tot = pinned.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__wl")).as("__totl"))
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    pre
      .join(tot, groupCols)
      .where((col("__before") + col("__wl")).cast(d38) * 100 >=
        col("__totl").cast(d38) * qPct)
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(valueCol)).as(outCol))
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

  /** The 100 TB twin of [[weightedQuantile]] (VERDICT r11 item 6) —
    * sketch-bucketed split-point refinement instead of a window over
    * the per-group distinct-VALUE spine (which sorts one group's whole
    * value set in one task at high cardinality):
    *
    *  1. `nSplits` candidate split points per group from the GK sketch
    *     over the (unweighted) value column — bounded state, mergeable.
    *  2. ONE partial agg of EXACT decimal weight per (group, bucket),
    *     bucket = count of splits strictly below the value (an O(nSplits)
    *     map-side scan per row; ≤ nSplits+1 spine rows per group).
    *  3. Cumulative weight over that AGGREGATED spine; the answer is the
    *     chosen bucket's upper split (an actual data element), or the
    *     group's exact max when the crossing sits above the top split.
    *
    * The output is the exact-rank AUDIT of the sketch-derived selection
    * (the B28 static-verdict convention — split values themselves are
    * merge-order-sensitive in their last ulps and are NOT hashed):
    * `reached` = the returned value's exact at-or-below weight mass
    * covers qPct of the exact total; `prev_short` = the previous
    * split's mass does NOT (bucket-grain minimality). Both are theorems
    * for a correct implementation — a selection/threshold/weight-
    * handling bug or a non-monotone sketch turns the driver row red.
    * `tot_w` is the sketch-independent exact decimal total (hashable).
    * The answer's VALUE error is the chosen bucket's realized weight
    * mass — data-dependent by nature (weights carry no a-priori rank
    * bound); callers needing a tighter answer raise `nSplits`.
    * Same weight contract as [[weightedQuantile]].
    */
  def weightedQuantileApprox(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      qPct: Int,
      nSplits: Int = 100,
      accuracy: Int = 10000): DataFrame = {
    require(qPct > 0 && qPct <= 100, s"qPct must be in (0, 100], got $qPct")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(nSplits >= 1, s"nSplits must be >= 1, got $nSplits")
    val g = groupCols.map(col)
    val v = col(valueCol)
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    // fan out the slim projection once for all three passes (r16-opt):
    // on a single-split input the GK sketch build, the O(nSplits)
    // per-row bucket scan and the final conditional agg each ran in ONE
    // scan task. Fan-out changes the sketch's split PLACEMENT (partial
    // merge boundaries move — the documented merge-order sensitivity of
    // sketch values, which are never hashed) but not the audited row:
    // n/tot_w are exact and the bracket booleans are theorems against
    // whichever splits were chosen.
    val clean = graft.operators.FanOut.byKey(
      df.where(v.isNotNull && col(weightCol).isNotNull && col(weightCol) > 0)
        .select((groupCols :+ valueCol :+ weightCol).distinct.map(col): _*),
      v)
    val ps = (1 to nSplits).map(j => j.toDouble / nSplits)
    // localCheckpoint pins the k-row split table: it feeds BOTH the
    // bucket pass and the answer projection, and without the pin each
    // reference re-runs the full GK sketch scan (the q_rfm lesson)
    val splits = clean
      .groupBy(g: _*)
      .agg(
        percentile_approx(v, lit(ps.toArray), lit(accuracy)).as("__splits"),
        max(v).as("__vmax"))
      .localCheckpoint(true)
    val bucketed = clean
      .join(broadcast(splits), groupCols)
      .withColumn("__b", size(filter(col("__splits"), sp => sp < v)))
      .groupBy(g :+ col("__b"): _*)
      .agg(sum(col(weightCol).cast(dec)).as("__w"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy(g: _*)
    val chosen = bucketed
      .withColumn("__cum", sum(col("__w")).over(wCum))
      .withColumn("__tot", sum(col("__w")).over(wTot))
      .where(col("__cum") * 100 >= col("__tot") * qPct)
      .groupBy(g: _*)
      .agg(min(col("__b")).as("__bstar"))
      .join(broadcast(splits), groupCols)
      .select(g ++ Seq(
        when(col("__bstar") < nSplits,
          element_at(col("__splits"), col("__bstar") + 1))
          .otherwise(col("__vmax")).as("__ans"),
        when(col("__bstar") >= 1,
          element_at(col("__splits"),
            least(col("__bstar"), lit(nSplits)))).as("__prev")): _*)
    clean
      .join(broadcast(chosen), groupCols)
      .groupBy(g :+ col("__ans") :+ col("__prev"): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(weightCol).cast(dec)).as("__totw"),
        sum(when(v <= col("__ans"), col(weightCol).cast(dec))
          .otherwise(lit(0).cast(dec))).as("__wle"),
        sum(when(col("__prev").isNotNull && v <= col("__prev"),
          col(weightCol).cast(dec)).otherwise(lit(0).cast(dec))).as("__wprev"))
      .select(g ++ Seq(
        // the selected value rides along for API callers; driver rows
        // project it away (a sketch element — never hashed)
        col("__ans").as("approx_value"),
        col("n"),
        col("__totw").cast("double").as("tot_w"),
        (col("__wle") * 100 >= col("__totw") * qPct).as("reached"),
        (col("__prev").isNull || col("__wprev") * 100 < col("__totw") * qPct)
          .as("prev_short")): _*)
  }

  /** Two-cohort QQ table (B154) — type-1 (SELECTION) quantiles of two
    * groups side by side at the given percentage points: per cohort,
    * the r-th smallest value with r = (q·n + 99) div 100 (exact-int
    * ceiling of q·n/100), found as min value whose cumulative spine
    * count reaches r. The cumulative counts ride
    * [[graft.operators.stats.RankedSpine.exclusivePrefix]] over the
    * grouped value spine (never an unpartitioned row-grain window —
    * the B23 scale rule); the q fan-out is a 9-row generator against
    * the AGGREGATED spine. Selections are actual elements (no
    * interpolation), so `v_a`/`v_b` cast to double exactly and
    * `qq_ratio` is ONE division — everything hashes UNROUNDED.
    * `valueCol` must be orderable-exact (decimal/int/date — the
    * Quantiles atomic-type contract).
    */
  def qqTable(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String,
      qs: Seq[Int] = (1 to 9).map(_ * 10)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 99),
      s"qs must be in [1,99], got $qs")
    val c = df
      .where(col(groupCol).isInCollection(Seq(groupA, groupB)) &&
        col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
    val sp = c.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val pre = graft.operators.stats.RankedSpine
      .exclusivePrefix(sp, Seq("g"), "v", Seq("cnt" -> "bc"))
      .withColumn("cum", col("bc") + col("cnt"))
    val n = sp.groupBy("g").agg(sum(col("cnt")).as("n"))
    val sel = pre.join(n, "g")
      .select(col("g"), col("v"), col("cum"), col("n"),
        explode(array(qs.map(q => lit(q)): _*)).as("q"))
      .where(col("cum") >= expr("(q * n + 99) div 100"))
      .groupBy("g", "q").agg(min(col("v")).as("sel_v"))
    sel.groupBy("q").agg(
        max(when(col("g") === groupA, col("sel_v"))).as("__va"),
        max(when(col("g") === groupB, col("sel_v"))).as("__vb"))
      .select(col("q"),
        col("__va").cast("double").as("v_a"),
        col("__vb").cast("double").as("v_b"),
        (col("__va").cast("double") / col("__vb").cast("double")).as("qq_ratio"))
  }
}
