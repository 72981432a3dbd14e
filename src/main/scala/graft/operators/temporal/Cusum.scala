package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-sided CUSUM change detection (Page 1954) — the classic
  * sequential drift alarm over a bounded ordered series:
  *
  *   s₀ = 0;  sₜ = max(0, sₜ₋₁ + (xₜ − k));  alarm ⇔ max_t sₜ > h
  *
  * where `k` is the reference level (target plus allowance: drifts
  * smaller than k self-absorb) and `h` the decision threshold. A
  * CUSUM accumulates small persistent excursions a point-wise anomaly
  * screen (B53) never sees, and resets the moment the signal returns
  * below the reference — the max excursion, not the final state, is
  * what alarms.
  *
  * Determinism is the [[Ema]]/[[Forecast]] contract: one canonical
  * sequential fold over `array_sort(collect_list(struct(order, tie,
  * value)))` with a 2-double ARRAY state `[s, max of s over PREVIOUS
  * steps]`. The max is carried DELAYED by one step on purpose: the
  * direct form `[s', max(smax, s')]` duplicates the compound s'
  * expression across elements, the shape DuckDB 1.0's list_reduce
  * mis-evaluates for structs — the delayed form reads only `acc` in
  * its second slot and closes the gap with one final
  * `greatest(slot2, slot1)`. Array elements all evaluate against the
  * OLD accumulator in both engines (probed; struct FIELDS do not —
  * see [[Forecast]]); max/+/− are exact IEEE ops, so s/max hash
  * UNROUNDED, and the alarm comparison agrees bit-for-bit.
  *
  * Contract: BOUNDED series per key (the Ema grain rule); plain hash
  * groupBy, partials merge map-side, nothing globally sorted.
  */
object Cusum {

  /** One row per key: `n_points`, `cusum_final` (the current excursion),
    * `cusum_max` (the peak — what alarms), `alarm`. Rows with a NULL
    * key, order, tie, or value are dropped.
    */
  def perKeyCusum(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String,
      k: Double,
      h: Double): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(h > 0, s"decision threshold h must be > 0, got $h")
    val keyRefs: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      keyRefs.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    clean
      .groupBy(keyRefs: _*)
      .agg(array_sort(collect_list(struct(
        col(orderCol).as("o"), col(tieCol).as("t"),
        col(valueCol).cast("double").as("v")))).as("series"))
      .select(
        keyRefs :+
          size(col("series")).as("n_points") :+
          aggregate(
            expr("slice(series, 2, size(series) - 1)"),
            array(
              greatest(lit(0.0), col("series").getItem(0).getField("v") - lit(k)),
              lit(0.0)),
            (acc, x) => array(
              greatest(lit(0.0), element_at(acc, 1) + (x.getField("v") - lit(k))),
              greatest(element_at(acc, 2), element_at(acc, 1)))).as("st"): _*)
      .select(
        keyRefs :+
          col("n_points") :+
          element_at(col("st"), 1).as("cusum_final") :+
          greatest(element_at(col("st"), 2), element_at(col("st"), 1)).as("cusum_max"): _*)
      .withColumn("alarm", col("cusum_max") > lit(h))
  }

  /** Fold a new TIME-ORDERED batch into carried per-key CUSUM state —
    * the streaming monitor step (D20): `state` is a previous output of
    * [[perKeyCusum]]/[[resume]] (keys, n_points, cusum_final,
    * cusum_max, alarm). Because the recursion is a sequential fold,
    * resuming from `[s, smax]` and folding the whole batch series is
    * EXACTLY the one-shot fold over the concatenated series — provided
    * batches are time-partitioned per key (a (order, tie) value never
    * arrives after a later one; the D14 append-only analogue for
    * non-associative sequential state). Resuming from zero state
    * reproduces [[perKeyCusum]] bit for bit: max(0, 0 + (x₁−k)) ==
    * max(0, x₁−k).
    *
    * Keys present only in `state` carry through unchanged; keys new in
    * the batch start from zero.
    */
  def resume(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String,
      k: Double,
      h: Double,
      state: DataFrame): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val keyRefs: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      keyRefs.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    val grouped = clean
      .groupBy(keyRefs: _*)
      .agg(array_sort(collect_list(struct(
        col(orderCol).as("o"), col(tieCol).as("t"),
        col(valueCol).cast("double").as("v")))).as("series"))
    val st = state.select(
      keyRefs :+ col("n_points").as("__n0") :+
        col("cusum_final").as("__s0") :+ col("cusum_max").as("__m0"): _*)
    grouped.join(st, keyCols, "full")
      .select(
        keyRefs :+
          // when-guarded, not coalesce(size(...)): legacy size(NULL) is
          // -1 (the r8 corpus-report footgun), which silently shrank
          // counts for keys absent from a batch
          (coalesce(col("__n0"), lit(0))
            + when(col("series").isNull, lit(0))
            .otherwise(size(col("series")))).cast("int").as("n_points") :+
          when(col("series").isNull,
            array(coalesce(col("__s0"), lit(0.0)), coalesce(col("__m0"), lit(0.0))))
            .otherwise(aggregate(
              col("series"),
              array(coalesce(col("__s0"), lit(0.0)), coalesce(col("__m0"), lit(0.0))),
              (acc, x) => array(
                greatest(lit(0.0), element_at(acc, 1) + (x.getField("v") - lit(k))),
                greatest(element_at(acc, 2), element_at(acc, 1))))).as("st"): _*)
      .select(
        keyRefs :+
          col("n_points") :+
          element_at(col("st"), 1).as("cusum_final") :+
          greatest(element_at(col("st"), 2), element_at(col("st"), 1)).as("cusum_max"): _*)
      .withColumn("alarm", col("cusum_max") > lit(h))
  }

  /** Page–Hinkley drift detector per key (B155) — the RUNNING-MEAN
    * sibling of [[perKeyCusum]] (Page 1954; the standard concept-drift
    * monitor in streaming-ML libraries): m_t = m_{t−1} + (x_t − x̄_t −
    * δ) with x̄_t the running mean, alarming when m_T − min_t m_t > λ
    * (a sustained upward shift drives m away from its historical
    * minimum). Same bounded-series contract and fold shape as CUSUM.
    *
    * Determinism: the 4-slot array state [m, min_m, Σx, n] updates
    * every slot from the OLD accumulator only (the array-vs-struct
    * probe in this file's scaladoc) — the running mean uses (Σx_old +
    * x)/(n_old + 1), and min_m is carried one step DELAYED and closed
    * with a final least (the perKeyCusum slot trick). The oracle's
    * init-less list_reduce maps the FIRST element to the
    * state-after-step-1 array [0, 0, x₁, 1], which the Spark fold
    * reproduces EXACTLY from the zero init (x − (0+x)/(0+1) − 0 is an
    * exact +0.0). Every output hashes UNROUNDED.
    */
  def pageHinkley(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String,
      delta: Double,
      lambda: Double): DataFrame =
    pageHinkleyReport(
      pageHinkleyState(df, keyCols, orderCol, tieCol, valueCol, delta), lambda)

  /** The carried PH state per key — (keys, n_points, __m, __mmin, __s):
    * the raw fold slots BEFORE the final min close ([[pageHinkleyReport]]
    * closes them). [[pageHinkleyResume]] folds a LATER time-partitioned
    * batch from this state and equals the one-shot over the
    * concatenation EXACTLY (sequential fold, same op sequence — the
    * D20 resume contract: a (order, tie) value never arrives after a
    * later one). The batch row (B155) is DEFINED as report(state(df)),
    * making streamed == one-shot structural (D43).
    */
  def pageHinkleyState(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String,
      delta: Double): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val keyRefs: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      keyRefs.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    clean
      .groupBy(keyRefs: _*)
      .agg(array_sort(collect_list(struct(
        col(orderCol).as("o"), col(tieCol).as("t"),
        col(valueCol).cast("double").as("v")))).as("series"))
      .select(
        keyRefs :+
          size(col("series")).as("n_points") :+
          aggregate(
            transform(col("series"), e => e.getField("v")),
            array(lit(0.0), lit(0.0), lit(0.0), lit(0.0)),
            (acc, x) => phStep(acc, x, delta)).as("__st"): _*)
      .select(
        keyRefs :+
          col("n_points") :+
          element_at(col("__st"), 1).as("__m") :+
          element_at(col("__st"), 2).as("__mmin") :+
          element_at(col("__st"), 3).as("__s"): _*)
  }

  /** One PH fold step — every slot reads the OLD accumulator only; the
    * running count is re-derivable but carried in slot 4 during a fold
    * (resume seeds it from the state's n_points).
    */
  private def phStep(acc: Column, x: Column, delta: Double): Column = array(
    element_at(acc, 1) +
      (x - (element_at(acc, 3) + x) / (element_at(acc, 4) + lit(1.0))
        - lit(delta)),
    least(element_at(acc, 2), element_at(acc, 1)),
    element_at(acc, 3) + x,
    element_at(acc, 4) + lit(1.0))

  /** Fold a new TIME-ORDERED batch into carried [[pageHinkleyState]] —
    * the D43 streaming monitor step (same contract as [[resume]]):
    * keys new in the batch start from zero state, state-only keys carry
    * through unchanged.
    */
  def pageHinkleyResume(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String,
      delta: Double,
      state: DataFrame): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val keyRefs: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      keyRefs.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    val grouped = clean
      .groupBy(keyRefs: _*)
      .agg(array_sort(collect_list(struct(
        col(orderCol).as("o"), col(tieCol).as("t"),
        col(valueCol).cast("double").as("v")))).as("series"))
    val st = state.select(
      keyRefs :+ col("n_points").as("__n0") :+
        col("__m").as("__m0") :+ col("__mmin").as("__mm0") :+
        col("__s").as("__s0"): _*)
    grouped.join(st, keyCols, "full")
      .select(
        keyRefs :+
          // when-guarded (legacy size(NULL) is -1 — the D20 lesson)
          (coalesce(col("__n0"), lit(0))
            + when(col("series").isNull, lit(0))
            .otherwise(size(col("series")))).cast("int").as("n_points") :+
          when(col("series").isNull,
            array(coalesce(col("__m0"), lit(0.0)), coalesce(col("__mm0"), lit(0.0)),
              coalesce(col("__s0"), lit(0.0)), coalesce(col("__n0"), lit(0)).cast("double")))
            .otherwise(aggregate(
              transform(col("series"), e => e.getField("v")),
              array(coalesce(col("__m0"), lit(0.0)), coalesce(col("__mm0"), lit(0.0)),
                coalesce(col("__s0"), lit(0.0)), coalesce(col("__n0"), lit(0)).cast("double")),
              (acc, x) => phStep(acc, x, delta))).as("__st"): _*)
      .select(
        keyRefs :+
          col("n_points") :+
          element_at(col("__st"), 1).as("__m") :+
          element_at(col("__st"), 2).as("__mmin") :+
          element_at(col("__st"), 3).as("__s"): _*)
  }

  /** Close carried [[pageHinkleyState]] into the published report —
    * ONE definition shared by the batch row and the streaming monitor:
    * the delayed min slot closes with a final least, ph_stat = m − min,
    * alarm on ph_stat > λ.
    */
  def pageHinkleyReport(state: DataFrame, lambda: Double): DataFrame = {
    require(lambda > 0, s"alarm threshold lambda must be > 0, got $lambda")
    state
      .withColumn("ph_final", col("__m"))
      .withColumn("ph_min", least(col("__mmin"), col("__m")))
      .withColumn("ph_stat", col("ph_final") - col("ph_min"))
      .withColumn("alarm", col("ph_stat") > lit(lambda))
      .drop("__m", "__mmin", "__s")
  }

  /** (key…, order, exact DECIMAL sum) period cells — the mergeable
    * MONITORING STATE behind [[ewmaChart]] (D42, the D25/D33 shape):
    * decimal sums add ([[mergeCellState]]), associative and exact, so a
    * streaming monitor folds microbatches into the standing cell table
    * and re-derives the chart on demand; ewmaChart's decimal→double
    * cast happens AFTER the merge, making state == one-shot structural.
    * NOT idempotent (the D20 partition contract).
    */
  def cellState(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: Column,
      valueCol: Column): DataFrame = {
    val g: Seq[Column] = keyCols.map(col)
    df.where(g.map(_.isNotNull).reduce(_ && _) &&
        orderCol.isNotNull && valueCol.isNotNull)
      .groupBy(g :+ orderCol.as("__ord"): _*)
      .agg(sum(valueCol.cast(graft.functions.ExactMath.ValueDecimal)).as("__cell"))
  }

  /** Merge two [[cellState]] tables by exact decimal addition. */
  def mergeCellState(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols.map(col) :+ col("__ord")): _*)
      .agg(sum(col("__cell")).as("__cell"))

  /** EWMA control chart per key (B152) — Page CUSUM's smoother sibling
    * (Roberts 1959): z_t = λ·x_t + (1−λ)·z_{t−1} with z_1 = x_1,
    * time-varying limits μ ± L·σ·√(λ/(2−λ)·(1−(1−λ)^{2t})). The input
    * is an already-AGGREGATED (key, order, value) cell grain (monthly
    * totals etc. — the caller owns that one corpus-scale aggregation);
    * everything here runs on the ≤ bounded per-key spine.
    *
    * Determinism (every output hashes UNROUNDED): μ and σ come from
    * order-SORTED sequential folds of the cell values (0.0-init
    * aggregate == init-less list_reduce — bounded spine, the ljung-box
    * running-statistic rule: never a cumulative window over doubles);
    * z_t re-folds the recursion over the first t cells per t (O(T²)
    * lambda steps on a ≤ T-cell spine — cheap, and each fold is the
    * SAME op sequence in both engines: init = x_1, step
    * λ·x + (1−λ)·acc); the power term folds t steps of
    * acc·(1−λ)·(1−λ) (two multiplies per step — mirrored literally;
    * (1−λ)² as a literal would be a DIFFERENT double). σ's variance is
    * clamped at 0 via greatest (a tiny negative from IEEE cancellation
    * would NaN the sqrt); sqrt is correctly-rounded IEEE, not libm.
    * The alarm compares engine-identical doubles. λ and L embed as
    * plain literals — the oracle writes them with e0 suffixes (DuckDB
    * bare decimal literals are DECIMAL and silently truncate inside
    * lambda arithmetic — measured).
    */
  def ewmaChart(
      cells: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      lambda: Double = 0.2,
      limitL: Double = 3.0): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda in (0,1), got $lambda")
    val g: Seq[Column] = keyCols.map(col)
    val om = lit(1.0) - lit(lambda)
    val spine = cells
      .where(g.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g: _*)
      .agg(array_sort(collect_list(struct(
        col(orderCol).as("m"), col(valueCol).cast("double").as("x")))).as("xs"))
      .where(size(col("xs")) >= 2)
    val xv = transform(col("xs"), e => e.getField("x"))
    val n = size(col("xs")).cast("double")
    val s1 = aggregate(xv, lit(0.0), (a, x) => a + x)
    val s2 = aggregate(transform(col("xs"),
      e => e.getField("x") * e.getField("x")), lit(0.0), (a, x) => a + x)
    val mu = s1 / n
    val sigma = sqrt(greatest((s2 - s1 * s1 / n) / (n - lit(1.0)), lit(0.0)))
    val rows = transform(sequence(lit(1), size(col("xs"))), t => {
      val z = aggregate(slice(xv, lit(2), t - 1), element_at(xv, 1),
        (a, x) => lit(lambda) * x + om * a)
      val pw = aggregate(sequence(lit(1), t), lit(1.0), (a, _) => a * om * om)
      struct(element_at(col("xs"), t).getField("m").as("m"),
        element_at(xv, t).as("x"), z.as("z"), pw.as("pw"))
    })
    val band = lit(limitL) * col("sigma") *
      sqrt(lit(lambda) / (lit(2.0) - lit(lambda)) * (lit(1.0) - col("__u.pw")))
    spine
      .select(g ++ Seq(mu.as("mu"), sigma.as("sigma"),
        explode(rows).as("__u")): _*)
      .select(g ++ Seq(
        col("__u.m").as(orderCol), col("__u.x").as("cell_value"),
        col("__u.z").as("ewma"),
        col("mu"), col("sigma"),
        (col("mu") + band).as("ucl"), (col("mu") - band).as("lcl")): _*)
      .withColumn("alarm", col("ewma") > col("ucl") || col("ewma") < col("lcl"))
  }
}
