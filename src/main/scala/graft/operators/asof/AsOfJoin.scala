package graft.operators.asof

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, the greatest right timestamp ≤ the left
  * timestamp within the same key.
  *
  * Spark-first formulation: no custom physical operator is needed — union
  * both sides, sort within key by (ts, side) with the right side first on
  * ties (so "at or before" includes equality), and carry the last non-null
  * right timestamp forward with `last(ignoreNulls)`. One shuffle on the
  * key, linear per partition — same asymptotics as a dedicated merge-join
  * implementation, and AQE-managed.
  */
object AsOfJoin {

  /** Returns `left.* + <outCol timestamp>` (null when no prior right row).
    *
    * NULL keys follow JOIN semantics, not window semantics: a NULL-key
    * right row matches nothing (filtered before the union — a window
    * partition would otherwise group NULL with NULL and attribute a
    * NULL-key left row to a NULL-key right row, which no equi-join
    * oracle would reproduce), and a NULL-key left row passes through
    * with a NULL match.
    */
  def latestPriorTs(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      outCol: String): DataFrame = {
    val payloadType = StructType(left.schema.fields)
    val lSide = left.select(
      col(keyCol).as("__k"),
      col(leftTsCol).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast("timestamp").as("__rts"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__payload"))
    val rSide = right.where(col(keyCol).isNotNull).select(
      col(keyCol).as("__k"),
      col(rightTsCol).as("__ts"),
      lit(0).as("__side"),
      col(rightTsCol).as("__rts"),
      lit(null).cast(payloadType).as("__payload"))

    val w = Window
      .partitionBy("__k")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)

    lSide
      .unionByName(rSide)
      .withColumn("__matched", last(col("__rts"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__payload.*"), col("__matched").as(outCol))
  }

  /** [[latestPriorTs]] that also surfaces WHICH right row matched: the
    * matched right timestamp plus that row's `rightIdCol` value. Ties
    * (several right rows at the matched timestamp) are broken
    * deterministically by the GREATEST `rightIdCol` — `rightIdCol` must
    * be unique within (key, ts) for the id to be well-defined, and the
    * window orders by it so the result is reproducible either way.
    *
    * Same plan as [[latestPriorTs]] (one shuffle on the key, running
    * `last(ignoreNulls)` per partition) — the carried value is a 2-field
    * struct instead of a bare timestamp, so the scale contract is
    * unchanged. NULL-key/NULL-ts semantics are identical — NULL-ts
    * right rows are filtered explicitly (the bare-timestamp variant
    * gets this for free from `ignoreNulls`; here the carried struct
    * would be non-null even with a null ts inside and would wrongly
    * surface as a match).
    */
  def latestPriorRow(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightIdCol: String,
      outTsCol: String,
      outIdCol: String): DataFrame = {
    val payloadType = StructType(left.schema.fields)
    val matchType = StructType(
      right.select(col(rightTsCol).as("ts"), col(rightIdCol).as("id")).schema.fields)
    val lSide = left.select(
      col(keyCol).as("__k"),
      col(leftTsCol).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(matchType).as("__r"),
      lit(null).cast(right.schema(rightIdCol).dataType).as("__rid"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__payload"))
    val rSide = right
      .where(col(keyCol).isNotNull && col(rightTsCol).isNotNull)
      .select(
        col(keyCol).as("__k"),
        col(rightTsCol).as("__ts"),
        lit(0).as("__side"),
        struct(col(rightTsCol).as("ts"), col(rightIdCol).as("id")).as("__r"),
        col(rightIdCol).as("__rid"),
        lit(null).cast(payloadType).as("__payload"))

    // rights before lefts on tied ts (equality matches), rights on tied
    // ts ordered by id so `last` picks the greatest id deterministically
    val w = Window
      .partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, 0)

    lSide
      .unionByName(rSide)
      .withColumn("__matched", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__payload.*"),
        col("__matched.ts").as(outTsCol), col("__matched.id").as(outIdCol))
  }

  /** Hot-key scale path for [[latestPriorTs]]: identical result, but a
    * single key's rows parallelize across `nBuckets` time ranges instead
    * of funneling into one window task.
    *
    * [[latestPriorTs]]'s per-key window is the right plan when keys are
    * many and individually bounded (it parallelizes across keys with one
    * shuffle and no join). Its documented bound is that ONE key's entire
    * history sorts in ONE task — a hot key (one symbol carrying half the
    * quote stream) becomes a single-task wall at scale. This variant is
    * the segmented-scan rewrite of the same running-`last`:
    *
    *  1. bucket every row by time range (global µs bounds from one slim
    *     agg — a 2-value driver collect, same pattern as the quantile
    *     boundary collect);
    *  2. the running last-right-ts within each (key, bucket) window —
    *     the hot key now sorts as `nBuckets` independent tasks;
    *  3. a slim (key, bucket, max right ts) table, prefix-maxed over
    *     strictly-earlier buckets per key — right timestamps equal the
    *     rows' own order key, so the carry into a bucket is exactly the
    *     max right ts before it;
    *  4. broadcast the carry back and `coalesce(local, carry)`.
    *
    * Contract (mirrors `Quantiles.withNtileByGroup`): intended for the
    * FEW/HOT-key regime — the carry table is ≤ keys×nBuckets rows and is
    * broadcast. High-cardinality keys should stay on [[latestPriorTs]],
    * which already parallelizes. Tie semantics, NULL-key and NULL-ts
    * behavior are identical to [[latestPriorTs]] (a right row at the
    * same ts as a left row shares its bucket, so equality still matches
    * locally; the carry covers strictly-earlier buckets only).
    */
  def latestPriorTsBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      outCol: String,
      nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val payloadType = StructType(left.schema.fields)
    val lSide = left.select(
      col(keyCol).as("__k"),
      col(leftTsCol).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast("timestamp").as("__rts"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__payload"))
    val rSide = right.where(col(keyCol).isNotNull).select(
      col(keyCol).as("__k"),
      col(rightTsCol).as("__ts"),
      lit(0).as("__side"),
      col(rightTsCol).as("__rts"),
      lit(null).cast(payloadType).as("__payload"))
    val unioned = lSide.unionByName(rSide)

    val bounds = unioned
      .agg(min(unix_micros(col("__ts"))).as("lo"), max(unix_micros(col("__ts"))).as("hi"))
      .head()
    if (bounds.isNullAt(0)) {
      // no non-null timestamp anywhere: every match is NULL by definition
      lSide.select(col("__payload.*"), lit(null).cast("timestamp").as(outCol))
    } else {
      val lo = bounds.getLong(0)
      val width = math.max(1L, (bounds.getLong(1) - lo) / nBuckets + 1L)
      // NULL ts stays NULL: those rows form their own (k, NULL) window,
      // exactly as they sort together first in the unbucketed window
      val bucketed = unioned.withColumn(
        "__b", ((unix_micros(col("__ts")) - lit(lo)) / lit(width)).cast("long"))

      val wLocal = Window
        .partitionBy("__k", "__b")
        .orderBy(col("__ts"), col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val localized =
        bucketed.withColumn("__local", last(col("__rts"), ignoreNulls = true).over(wLocal))

      val wCarry = Window
        .partitionBy("__k")
        .orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // over BOTH sides: a bucket occupied only by left rows still needs
      // its carry row (its __bmax is NULL and prefix-max skips it)
      val carry = bucketed
        .groupBy(col("__k"), col("__b"))
        .agg(max(col("__rts")).as("__bmax"))
        .withColumn("__carry", max(col("__bmax")).over(wCarry))
        .select(col("__k"), col("__b"), col("__carry"))

      localized
        .join(broadcast(carry), Seq("__k", "__b"), "left")
        .where(col("__side") === 1)
        .select(col("__payload.*"),
          coalesce(col("__local"), col("__carry")).as(outCol))
    }
  }

  /** Forward as-of join: for each left row, the SMALLEST right timestamp
    * at-or-after the left timestamp within the same key — `merge_asof
    * direction='forward'`. The time-to-next-event primitive (signup →
    * first purchase, quote → next trade).
    *
    * Mirror image of [[latestPriorTs]]: union both sides, sort within key
    * by (ts, side) with the LEFT side first on ties (so "at or after"
    * includes equality — a right row at the same instant sorts after the
    * left row and lands inside its following frame), and take the first
    * non-null right timestamp over `[currentRow, unboundedFollowing)`.
    * Same scale contract: one shuffle on the key, linear per partition,
    * one key's history in one task (B8c's bucketed rewrite applies
    * symmetrically if a hot key ever needs it).
    *
    * NULL semantics mirror [[latestPriorTs]]: NULL-key right rows are
    * filtered (join, not window, semantics), NULL-key left rows pass
    * through unmatched. NULL-ts rights are filtered and NULL-ts lefts
    * are explicitly unmatched — in ascending NULLS-FIRST order a NULL-ts
    * left row's following frame would otherwise span the whole partition
    * and "match" the globally earliest right.
    */
  def earliestFollowingTs(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      outCol: String): DataFrame = {
    val payloadType = StructType(left.schema.fields)
    val lSide = left.select(
      col(keyCol).as("__k"),
      col(leftTsCol).as("__ts"),
      lit(0).as("__side"),
      lit(null).cast("timestamp").as("__rts"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__payload"))
    val rSide = right.where(col(keyCol).isNotNull && col(rightTsCol).isNotNull).select(
      col(keyCol).as("__k"),
      col(rightTsCol).as("__ts"),
      lit(1).as("__side"),
      col(rightTsCol).as("__rts"),
      lit(null).cast(payloadType).as("__payload"))

    val w = Window
      .partitionBy("__k")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    lSide
      .unionByName(rSide)
      .withColumn("__matched",
        when(col("__ts").isNotNull, first(col("__rts"), ignoreNulls = true).over(w)))
      .where(col("__side") === 0)
      .select(col("__payload.*"), col("__matched").as(outCol))
  }

  /** Nearest as-of join: for each left row, the right timestamp with the
    * smallest absolute time distance within the same key —
    * `merge_asof direction='nearest'`. A tie in distance (prior and
    * following equally far) resolves to the PRIOR match, so an exact-ts
    * right row (distance 0) is always a prior match.
    *
    * One union, ONE shuffle and ONE sort: rights sort before lefts on
    * tied timestamps (equality belongs to the prior side, exactly
    * [[latestPriorTs]]'s rule), the running `last(ignoreNulls)` over the
    * preceding frame gives the prior candidate and `first(ignoreNulls)`
    * over the following frame gives the strictly-later candidate — both
    * window functions share the partitioning and ordering, so Spark
    * evaluates them in a single Window exec. The winner is picked
    * map-side on exact µs arithmetic.
    *
    * NULL semantics: as [[earliestFollowingTs]] (NULL-key/NULL-ts rights
    * filtered; NULL-key or NULL-ts lefts pass through unmatched).
    */
  def nearestTs(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      outCol: String): DataFrame = {
    val payloadType = StructType(left.schema.fields)
    val lSide = left.select(
      col(keyCol).as("__k"),
      col(leftTsCol).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast("timestamp").as("__rts"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__payload"))
    val rSide = right.where(col(keyCol).isNotNull && col(rightTsCol).isNotNull).select(
      col(keyCol).as("__k"),
      col(rightTsCol).as("__ts"),
      lit(0).as("__side"),
      col(rightTsCol).as("__rts"),
      lit(null).cast(payloadType).as("__payload"))

    val base = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
    val wPrior = base.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    lSide
      .unionByName(rSide)
      .withColumn("__prior", last(col("__rts"), ignoreNulls = true).over(wPrior))
      .withColumn("__next",
        when(col("__ts").isNotNull, first(col("__rts"), ignoreNulls = true).over(wNext)))
      .where(col("__side") === 1)
      .withColumn("__nearest",
        when(col("__prior").isNull, col("__next"))
          .when(col("__next").isNull, col("__prior"))
          .when(
            unix_micros(col("__ts")) - unix_micros(col("__prior"))
              <= unix_micros(col("__next")) - unix_micros(col("__ts")),
            col("__prior"))
          .otherwise(col("__next")))
      .select(col("__payload.*"), col("__nearest").as(outCol))
  }

  /** [[latestPriorTs]] with a bounded lookback: a match older than
    * `toleranceSec` before the left timestamp comes back NULL — the
    * batch twin of the streaming attribution join's time-range bound
    * (an unbounded as-of would attribute a purchase to a years-old
    * signup; production attribution never wants that). Same plan plus
    * one map-side filter on the matched column.
    */
  def latestPriorTsWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      outCol: String,
      toleranceSec: Long): DataFrame = {
    // upper bound keeps toleranceSec * 1e6 inside Long — an "effectively
    // unbounded" Long.MaxValue would wrap negative and null EVERY match
    require(toleranceSec >= 0 && toleranceSec <= Long.MaxValue / 1000000L,
      s"toleranceSec must be in [0, ${Long.MaxValue / 1000000L}], got $toleranceSec " +
        "(use latestPriorTs for an unbounded lookback)")
    latestPriorTs(left, right, keyCol, leftTsCol, rightTsCol, outCol)
      .withColumn(outCol,
        when(unix_micros(col(leftTsCol)) - unix_micros(col(outCol))
          <= toleranceSec * 1000000L, col(outCol)))
  }
}
