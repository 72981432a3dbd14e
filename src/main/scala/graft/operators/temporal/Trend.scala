package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mann–Kendall trend test (Mann 1945, Kendall 1975) — the standard
  * nonparametric monotone-trend detector for short per-key series
  * (is this customer's monthly revenue drifting up?):
  *
  *   S    = Σ_{i<j} sign(xⱼ − xᵢ)
  *   Var·18 = n(n−1)(2n+5) − Σₖ tₖ(tₖ−1)(2tₖ+5)   (tie-corrected)
  *   z    = (S − sign(S)) / sqrt(Var)
  *
  * It needs no distributional assumption and tolerates the tiny n a
  * per-key monthly rollup produces — exactly where a fitted slope's
  * t-test is untrustworthy. Complements [[Forecast]] (which projects)
  * and [[Cusum]] (which alarms on level shifts): MK answers "is there
  * a monotone trend at all".
  *
  * Determinism: S and the ×18 variance numerator are EXACT BIGINTs
  * (pair signs and tie counts are integers; n ≤ the bounded-series
  * grain so no overflow); `z` passes only through proven-deterministic
  * IEEE ops — exact-int→double conversion, one division by 18.0, one
  * correctly-rounded sqrt, one final division (the q_gini/q_roc_auc
  * class) — so it hashes UNROUNDED and the trend label's comparison
  * against 1.96 bit-agrees across engines. Pair signs compare the
  * caller's doubles directly; feed decimal-exact-sum values (dsum) so
  * both engines see identical inputs.
  *
  * Scale shape: the O(k²) pair walk runs inside one nested HOF over
  * the per-key sorted array — the [[Cusum]]/[[graft.operators.stats.Survival]]
  * BOUNDED-series contract (monthly grains: k ≤ a few dozen); ties
  * aggregate on the slim (key, value) spine. Plain hash groupBys,
  * partials merge map-side, nothing globally sorted.
  */
object Trend {

  /** One row per key with n >= 3 points: `n_points`, `s_stat`,
    * `var_s18` (the exact ×18 variance numerator), `z` (NULL when the
    * variance is 0 — a fully-tied series has no rankable trend), and
    * `trend` ('inc' / 'dec' / 'none' at the two-sided 5% bar |z| >
    * 1.96). `tieCol` must be unique within (key, order) — S depends on
    * the sequence position of time-tied points, so the sort must be
    * total (the Cusum/Ema tiebreak rule). Rows with a NULL key, order,
    * tie, or value are dropped.
    */
  /** Per-key bounded-series state for streaming maintenance (D22, the
    * D21 shape): one row per key carrying the collected (o, t, v)
    * array. Merging is MULTISET union — [[mannKendallFromState]] sorts
    * before computing, so microbatch arrival order is immaterial
    * (unordered contract, unlike D20's time-partitioned CUSUM). State
    * size is the series itself: the bounded-series contract bounds it.
    */
  def seriesState(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val g = keyCols.map(col)
    df.where(
      (g.map(_.isNotNull) ++ Seq(col(orderCol).isNotNull,
        col(tieCol).isNotNull, col(valueCol).isNotNull)).reduce(_ && _))
      .groupBy(g: _*)
      .agg(collect_list(struct(
        col(orderCol).as("o"), col(tieCol).as("t"),
        col(valueCol).cast("double").as("v"))).as("series"))
  }

  /** Multiset merge of two [[seriesState]]s (associative, commutative). */
  def mergeSeriesState(a: DataFrame, b: DataFrame): DataFrame = {
    val keys = a.columns.filterNot(_ == "series")
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(flatten(collect_list(col("series"))).as("series"))
  }

  /** [[mannKendall]] recomputed from carried state — explodes the
    * series back to rows and runs the identical computation, so
    * state-maintained == one-shot EXACTLY (D22 spec). */
  def mannKendallFromState(state: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val rows = state
      .select(g :+ explode(col("series")).as("__e"): _*)
      .select(g ++ Seq(col("__e.o").as("__o"), col("__e.t").as("__t"),
        col("__e.v").as("__v")): _*)
    mannKendall(rows, keyCols, "__o", "__t", "__v")
  }

  def mannKendall(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val g: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      g.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    // S over the order-sorted value array: nested index HOF, exact ints.
    // The n >= 3 filter sits BETWEEN the Aggregate and the Project that
    // computes s_stat — sequence(1, size-1) DESCENDS to [1, 0] for a
    // 1-point key (Spark's step defaults to -1 when start > stop) and
    // element_at(sp, 0) is an unconditional INVALID_INDEX_OF_ZERO not
    // gated by ANSI-off; correctness must not depend on the optimizer
    // pushing a later filter below this projection (TrendSpec pins the
    // 1-point case with predicate pushdown disabled).
    // mannKendall/theilSen/hodgesLehmann are deliberately NOT
    // FanOut-gated (r16-opt A/B, warm medians at sf0.1: 1.072/0.810/0.448
    // fanned vs 0.868/0.638/0.351 plain): the bounded-series pair walks
    // are cheap per key and the gate's overhead dominates
    val sPart = clean
      .groupBy(g: _*)
      .agg(array_sort(collect_list(struct(
        col(orderCol).as("o"), col(tieCol).as("t"),
        col(valueCol).cast("double").as("v")))).as("sp"))
      .where(size(col("sp")) >= 3)
      .select(g ++ Seq(
        size(col("sp")).cast("long").as("n_points"),
        aggregate(
          flatten(transform(
            sequence(lit(1), size(col("sp")) - 1),
            i => transform(
              sequence(i + 1, size(col("sp"))),
              j => {
                val vi = element_at(col("sp"), i).getField("v")
                val vj = element_at(col("sp"), j).getField("v")
                when(vj > vi, 1L).when(vj < vi, -1L).otherwise(0L)
              }))),
          lit(0L), (acc, x) => acc + x).as("s_stat")): _*)
    // tie correction over the (key, value) spine: Σ t(t-1)(2t+5)
    val tiePart = clean
      .groupBy(g :+ col(valueCol).cast("double").as("__v"): _*)
      .agg(count(lit(1)).as("t"))
      .groupBy(g: _*)
      .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L)).as("__ties"))
    val n = col("n_points")
    val var18 = n * (n - 1L) * (lit(2L) * n + 5L) - col("__ties")
    val sd = sqrt(col("var_s18").cast("double") / lit(18.0))
    val z = when(col("var_s18") > 0L,
      when(col("s_stat") > 0L, (col("s_stat") - 1L).cast("double") / sd)
        .when(col("s_stat") < 0L, (col("s_stat") + 1L).cast("double") / sd)
        .otherwise(lit(0.0)))
    sPart.join(tiePart, keyCols)
      .where(n >= 3L)
      .withColumn("var_s18", var18)
      .withColumn("z", z)
      .withColumn("trend",
        when(col("z").isNull, "none")
          .when(col("z") > 1.96, "inc")
          .when(col("z") < -1.96, "dec")
          .otherwise("none"))
      .select(g ++ Seq(col("n_points"), col("s_stat"), col("var_s18"),
        col("z"), col("trend")): _*)
  }

  /** Theil–Sen robust slope per key (B92) — the median of all pairwise
    * slopes (Theil 1950, Sen 1968): the estimator [[mannKendall]]'s
    * direction test pairs with when the caller wants a MAGNITUDE that a
    * single outlier cannot drag (29% breakdown point; OLS has 0%).
    *
    * Same bounded-series shape as MK: the pair walk is a nested HOF
    * over the per-key (x, tie, v)-sorted array — plain hash groupBy,
    * map-side fold, nothing globally sorted. Pairs with EQUAL x are
    * skipped (no defined slope; the MK tie class); the estimate is the
    * LOWER median — element (n+1)/2 of the ascending slope array — an
    * actual computed element, never an interpolation.
    *
    * Determinism: each slope is ONE IEEE division (vj−vi)/(xj−xi) of
    * exact operands (+ 0.0 collapses −0.0 so the sort is identical in
    * both engines); array_sort of finite doubles is a total order and
    * element SELECTION preserves exactness — `ts_slope` hashes
    * UNROUNDED. `xCol` must be numeric-exact (e.g. epoch days — never
    * raw timestamps through an engine-dependent conversion). The
    * size >= 2 guard sits BELOW the projection (the mannKendall
    * sequence(1, size−1) descent lesson); keys with no distinct-x pair
    * are dropped on both sides.
    */
  def theilSen(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val g: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      g.map(_.isNotNull).reduce(_ && _) &&
        col(xCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    clean
      .groupBy(g: _*)
      .agg(array_sort(collect_list(struct(
        col(xCol).cast("double").as("x"), col(tieCol).as("t"),
        col(valueCol).cast("double").as("v")))).as("sp"))
      .where(size(col("sp")) >= 2)
      .select(g ++ Seq(
        size(col("sp")).cast("long").as("n_points"),
        array_sort(filter(
          flatten(transform(
            sequence(lit(1), size(col("sp")) - 1),
            i => transform(
              sequence(i + 1, size(col("sp"))),
              j => {
                val xi = element_at(col("sp"), i).getField("x")
                val xj = element_at(col("sp"), j).getField("x")
                val vi = element_at(col("sp"), i).getField("v")
                val vj = element_at(col("sp"), j).getField("v")
                when(xj =!= xi, (vj - vi) / (xj - xi) + lit(0.0))
              }))),
          s => s.isNotNull)).as("__sl")): _*)
      .where(size(col("__sl")) >= 1)
      .select(g ++ Seq(
        col("n_points"),
        size(col("__sl")).cast("long").as("n_slopes"),
        element_at(col("__sl"),
          ((size(col("__sl")) + 1) / 2).cast("int")).as("ts_slope")): _*)
  }

  /** Hodges–Lehmann pseudo-median per key (B153) — the location twin of
    * [[theilSen]]'s slope (Hodges & Lehmann 1963): the lower median of
    * the n(n+1)/2 Walsh averages (v_i + v_j)/2 over all i ≤ j
    * (including i = j), the estimator behind the Wilcoxon signed-rank
    * confidence interval — ~29% breakdown where the mean has 0%, more
    * efficient than the raw median under near-normal noise.
    *
    * Same bounded-series shape as theilSen: the Walsh enumeration is a
    * nested HOF over the per-key collected array — plain hash groupBy,
    * nothing globally sorted. The Walsh MULTISET is invariant under
    * permutation of equal values, so no tiebreak column is needed
    * (collect order does not matter; the final array_sort makes the
    * selection deterministic). Each average is ONE IEEE add and one
    * halving of engine-identical doubles (+ 0.0 collapses −0.0 before
    * the sort); the lower-median is an actual element SELECTION —
    * `hl_location` hashes UNROUNDED.
    */
  def hodgesLehmann(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val g: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      g.map(_.isNotNull).reduce(_ && _) && col(valueCol).isNotNull)
    clean
      .groupBy(g: _*)
      .agg(collect_list(col(valueCol).cast("double")).as("vs"))
      .where(size(col("vs")) >= 1)
      .select(g ++ Seq(
        size(col("vs")).cast("long").as("n_points"),
        array_sort(flatten(transform(
          sequence(lit(1), size(col("vs"))),
          i => transform(
            sequence(i, size(col("vs"))),
            j => (element_at(col("vs"), i) + element_at(col("vs"), j))
              / lit(2.0) + lit(0.0))))).as("__w")): _*)
      .select(g ++ Seq(
        col("n_points"),
        size(col("__w")).cast("long").as("n_walsh"),
        element_at(col("__w"),
          ((size(col("__w")) + 1) / 2).cast("int")).as("hl_location")): _*)
  }
}
