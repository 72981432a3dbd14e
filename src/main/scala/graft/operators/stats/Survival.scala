package graft.operators.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier product-limit survival estimator (Kaplan & Meier 1958)
  * — the standard right-censored time-to-event curve (churn, time to
  * conversion, hardware lifetime):
  *
  *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)
  *
  * over the distinct event times tᵢ, with dᵢ events and nᵢ subjects
  * at risk at tᵢ. Subjects censored at tᵢ are still at risk AT tᵢ
  * (the standard events-before-censoring tie convention) and leave
  * the risk set after it; rows exist at censoring-only times too
  * (survival unchanged there — the factor is exactly 1 − 0/n = 1).
  *
  * Scale shape: input is SUBJECT grain (one row per subject with its
  * duration and observed flag — the caller aggregates raw events down
  * to subjects first). The estimator aggregates subjects to the
  * (group, duration) spine in one partial agg; risk sets are window
  * sums over that AGGREGATED spine (bounded by distinct durations —
  * the q_drift_ks shape); the survival prefix product is the
  * [[graft.operators.temporal.Cusum]] bounded-series contract: a
  * per-group sorted array fold, O(k²) in distinct durations via
  * slice-prefix folds, fine for day/hour-grain durations and
  * documented as the contract (a µs-grain duration column should be
  * bucketed first).
  *
  * Determinism: counts and risk sets are exact BIGINTs. `survival` is
  * a product of IEEE factors (1 − d/n): division, subtraction from
  * 1.0, and multiplication are all exactly-rounded deterministic ops,
  * and both engines fold the factors in duration order (Spark's
  * `aggregate` over the sorted slice starts at init 1.0; DuckDB's
  * init-less `list_reduce` starts at the first factor — equal because
  * 1.0·x is exact), so `survival` hashes UNROUNDED.
  */
object Survival {

  /** Subject-grain time-to-event state from a raw event log: one row
    * per subject with (`subject`, `t0` first-seen, `tp` first
    * qualifying event or NULL, `tl` last-seen, `fs` the first event's
    * (order, tie, label) struct). Every field is an ASSOCIATIVE
    * min/max (conditional min included: min ignores NULLs, and a NULL
    * `tp` means "no qualifying event yet"), so
    * `mergeSubjects(subjects(a), subjects(b)) == subjects(a ∪ b)`
    * EXACTLY — the IncrementalAgg argument — and the state maintains
    * incrementally under streaming ingestion (D21) without rescanning
    * the corpus.
    */
  def subjects(
      events: DataFrame,
      subjectCol: String,
      orderCol: String,
      tieCol: String,
      labelCol: String,
      qualifying: Column): DataFrame =
    events
      .where(col(subjectCol).isNotNull && col(orderCol).isNotNull)
      .groupBy(col(subjectCol))
      .agg(
        min(col(orderCol)).as("t0"),
        min(when(qualifying, col(orderCol))).as("tp"),
        max(col(orderCol)).as("tl"),
        min(struct(col(orderCol), col(tieCol), col(labelCol).as("label"))).as("fs"))

  /** Field-wise merge of two [[subjects]] states (associative,
    * commutative — see [[subjects]]). */
  def mergeSubjects(a: DataFrame, b: DataFrame): DataFrame = {
    val subjectCol = a.columns.head
    a.unionByName(b)
      .groupBy(col(subjectCol))
      .agg(
        min(col("t0")).as("t0"),
        min(col("tp")).as("tp"),
        max(col("tl")).as("tl"),
        min(col("fs")).as("fs"))
  }

  /** One row per (group, duration): `n_risk`, `n_event`, `n_censored`,
    * `survival` (the product-limit estimate through that duration).
    * Input at subject grain; rows with a NULL group, duration, or
    * observed flag are dropped. `durationCol` must be integral
    * (bucketed — see the grain contract above); `observedCol` boolean
    * (true = event, false = right-censored).
    */
  /** Log-rank test (Mantel 1966) — "do these cohorts' survival curves
    * differ?", the standard hypothesis test on the [[kaplanMeier]]
    * curves. Each group g is tested against the REST of the population:
    * at every distinct duration t (the combined spine),
    *
    *   U_g = Σ_t (d_gt − d_t·n_gt/n_t)
    *   V_g = Σ_t d_t·(n_gt/n_t)·(1 − n_gt/n_t)·(n_t − d_t)/(n_t − 1)
    *   z   = U_g / sqrt(V_g)        (NULL when V_g = 0)
    *
    * with d/n the events/at-risk counts. Same subject-grain input and
    * tie convention as [[kaplanMeier]].
    *
    * Scale shape: one partial agg to the (group, duration) spine, a
    * groups × durations GRID for the risk sets (bounded — the KM
    * bucketed-duration contract; risk sets and totals are window sums
    * over the grid, never the subjects), and two per-group array folds
    * in duration order. Times with no events contribute an exact +0.0
    * to both folds, so the grid needs no event filter.
    *
    * Determinism: every count is an exact BIGINT; each fold term is a
    * PINNED IEEE sequence of exact-int→double conversions, products,
    * and divisions mirrored verbatim in the oracle; folds run in
    * duration order (Spark's 0.0-init `aggregate` == DuckDB's
    * init-less `list_reduce` because 0.0+x is exact); z adds one
    * correctly-rounded sqrt and one division — so u/v/z/chi2 all hash
    * UNROUNDED. Two SEPARATE folds, never one struct accumulator (the
    * probed DuckDB in-place struct-lambda hazard, Forecast scaladoc).
    */
  def logRank(
      df: DataFrame,
      groupCol: String,
      durationCol: String,
      observedCol: String): DataFrame = {
    val g = col(groupCol)
    val clean = df.where(
      g.isNotNull && col(durationCol).isNotNull && col(observedCol).isNotNull)
    val perGT = clean
      .groupBy(g, col(durationCol).cast("long").as("__t"))
      .agg(
        sum(when(col(observedCol), 1L).otherwise(0L)).as("__d"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("__c"))
    val times = perGT.select(col("__t")).distinct()
    val groups = perGT.select(g).distinct()
    val cells = groups.crossJoin(broadcast(times))
      .join(perGT, Seq(groupCol, "__t"), "left")
      .na.fill(0L, Seq("__d", "__c"))
    val wG = Window.partitionBy(g)
    val wPrev = wG.orderBy(col("__t")).rowsBetween(Window.unboundedPreceding, -1)
    val wT = Window.partitionBy(col("__t"))
    val leaving = col("__d") + col("__c")
    val grid = cells
      .withColumn("__n1",
        sum(leaving).over(wG) - coalesce(sum(leaving).over(wPrev), lit(0L)))
      .withColumn("__dall", sum(col("__d")).over(wT))
      .withColumn("__nall", sum(col("__n1")).over(wT))
    val folded = grid
      .groupBy(g)
      .agg(
        array_sort(collect_list(struct(
          col("__t").as("t"), col("__d").as("d1"), col("__n1").as("n1"),
          col("__dall").as("da"), col("__nall").as("na")))).as("__sp"),
        sum(leaving).as("n_subjects"),
        sum(col("__d")).as("n_events"))
    def D(c: Column): Column = c.cast("double")
    val u = aggregate(col("__sp"), lit(0.0), (acc, e) =>
      acc + (D(e.getField("d1"))
        - D(e.getField("da")) * D(e.getField("n1")) / D(e.getField("na"))))
    val v = aggregate(col("__sp"), lit(0.0), (acc, e) => {
      val na = D(e.getField("na"))
      val n1 = D(e.getField("n1"))
      val da = D(e.getField("da"))
      acc + when(e.getField("na") > 1L,
        da * (n1 / na) * (lit(1.0) - n1 / na) * ((na - da) / (na - lit(1.0))))
        .otherwise(lit(0.0))
    })
    val z = when(col("v_stat") > 0.0, col("u_stat") / sqrt(col("v_stat")))
    folded
      .withColumn("u_stat", u)
      .withColumn("v_stat", v)
      .withColumn("z", z)
      .select(g, col("n_subjects"), col("n_events"),
        col("u_stat"), col("v_stat"), col("z"),
        (col("z") * col("z")).as("chi2"))
  }

  def kaplanMeier(
      df: DataFrame,
      groupCols: Seq[String],
      durationCol: String,
      observedCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    val g: Seq[Column] = groupCols.map(col)
    val clean = df.where(
      g.map(_.isNotNull).reduce(_ && _) &&
        col(durationCol).isNotNull && col(observedCol).isNotNull)
    val spine = clean
      .groupBy(g :+ col(durationCol).cast("long").as("__t"): _*)
      .agg(
        sum(when(col(observedCol), 1L).otherwise(0L)).as("n_event"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("n_censored"))
    val perGroup = Window.partitionBy(g: _*)
    val upToPrev = perGroup.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val leaving = col("n_event") + col("n_censored")
    val withRisk = spine.withColumn(
      "n_risk",
      sum(leaving).over(perGroup) - coalesce(sum(leaving).over(upToPrev), lit(0L)))
    // prefix product over the per-group sorted spine: the array fold is
    // the one evaluation order both engines reproduce exactly
    val folded = withRisk
      .groupBy(g: _*)
      .agg(array_sort(collect_list(struct(
        col("__t").as("t"), col("n_event").as("d"),
        col("n_censored").as("c"), col("n_risk").as("n")))).as("__sp"))
      .select(g :+ col("__sp") :+ posexplode(col("__sp")).as(Seq("__i", "__x")): _*)
    folded.select(
      g ++ Seq(
        col("__x.t").as("t"),
        col("__x.n").as("n_risk"),
        col("__x.d").as("n_event"),
        col("__x.c").as("n_censored"),
        aggregate(
          slice(col("__sp"), lit(1), col("__i") + lit(1)),
          lit(1.0),
          (acc, e) => acc * (lit(1.0)
            - e.getField("d").cast("double") / e.getField("n").cast("double")))
          .as("survival")): _*)
  }
}
