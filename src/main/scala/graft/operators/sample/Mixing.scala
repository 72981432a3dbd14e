package graft.operators.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic training-mix construction: downsample groups (source,
  * language, domain …) to hit a target composition. The per-group keep
  * rates derive from distributed group counts — never a driver-side
  * collect — and each row's keep/drop decision is a pure function of its
  * key (the same 24-bit md5 uniform [[Sampling]] uses), so the mix is
  * reproducible across runs, cluster sizes and engines.
  *
  * Scale shape: one slim groupBy(count) over the corpus (group-cardinality
  * sized output), the per-group integer bounds broadcast back, and the
  * keep decision evaluated map-side at the scan — the corpus itself is
  * never shuffled. Rows with a NULL group are DROPPED (a null group has
  * no share in any mix; tag unknowns with a sentinel group first to keep
  * them). Bound contract (mirrors [[Sampling.assignSplit]]):
  * a row is kept iff `u24 < floor(2^24 · rate)` where the floor is taken
  * over the IEEE-double product/quotient written below, left-associated —
  * an engine re-deriving bounds must evaluate the same expression shape.
  */
object Mixing {

  private def u24(keyCol: String) =
    conv(substring(md5(col(keyCol).cast("string")), 1, 6), 16, 10).cast("long")

  /** Downsample every group to (in expectation) the size of the smallest
    * group — the balanced mix. The smallest group's bound is exactly 2^24,
    * so it is kept in full (deterministically, not just in expectation).
    */
  def balancedSample(df: DataFrame, keyCol: String, groupCol: String): DataFrame = {
    // materialize the group-cardinality-sized counts once: both consumers
    // (per-group bounds, global min) would otherwise re-run the corpus
    // count scan — plan-audited, the two agg subtrees don't share a stage
    // NULL-group rows are out of the mix entirely: they must not reach the
    // min() either, or a handful of stray nulls would collapse every real
    // group to that tiny size (the bounds join below drops them anyway)
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n")).localCheckpoint(true)
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val bounds = counts.crossJoin(broadcast(nmin))
      .select(col(groupCol), floor(lit(16777216.0) * col("__nmin") / col("__n")).as("__bound"))
    df.join(broadcast(bounds), Seq(groupCol))
      .where(u24(keyCol) < col("__bound"))
      .drop("__bound")
  }

  /** Downsample to target composition `weights` (shares summing to ~1),
    * keeping as many rows as possible: the largest feasible total is
    * `T = min_g(n_g / w_g)` and each group keeps `rate_g = w_g · T / n_g`
    * (the binding group keeps everything). Groups absent from `weights`
    * are dropped — an explicit zero share.
    */
  def targetMix(df: DataFrame, keyCol: String, groupCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive shares, got $weights")
    // a duplicate key would fan out the bounds join and emit every kept
    // row of that group once per duplicate — silent row duplication
    require(weights.map(_._1).distinct.length == weights.length,
      s"duplicate group keys in weights: ${weights.map(_._1)}")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toDF(groupCol, "__w")
    // materialized once for the same two-consumer reason as balancedSample
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n")).localCheckpoint(true)
    val cw = counts.join(broadcast(w), Seq(groupCol))
    val t = cw.agg(min(col("__n") / col("__w")).as("__t"))
    val bounds = cw.crossJoin(broadcast(t))
      .select(col(groupCol),
        floor(lit(16777216.0) * col("__w") * col("__t") / col("__n")).as("__bound"))
    df.join(broadcast(bounds), Seq(groupCol))
      .where(u24(keyCol) < col("__bound"))
      .drop("__bound")
  }

  /** Temperature-scaled source weights — the multilingual-training
    * alpha-sampling knob (mT5 / XLM-R: sample source s with probability
    * ∝ n_s^alpha, flattening the head so low-resource sources are not
    * drowned). This operator FIXES alpha = 1/2: sqrt is the one
    * exponent in the family that is IEEE-exact (correctly rounded —
    * SURVEY §5's cosine rule; a general pow is a transcendental and
    * would need the margin-audit protocol). Σ sqrt(n_s) folds over the
    * SOURCE-SORTED count list (the C5 sequential-fold convention — a
    * groupBy double-sum would be partial-aggregation-order dependent),
    * so `weight` and the floor-of-IEEE-product `target_n` (the
    * assignSplit bound contract) hash unrounded.
    *
    * Scale shape: one count aggregation at source grain; the fold runs
    * over the (vocabulary-bounded) source list inside a 1-row aggregate
    * broadcast back — never a collect.
    */
  def temperatureWeights(df: DataFrame, groupCol: String, targetTotal: Long): DataFrame = {
    require(targetTotal > 0, s"targetTotal must be > 0, got $targetTotal")
    // NULL-group rows drop (the module contract) — and a NULL group
    // would also order differently between Spark's NULLS-FIRST struct
    // sort and DuckDB's NULLS-LAST, skewing the fold order.
    // localCheckpoint: counts feeds both the 1-row total and the final
    // select (the balancedSample two-consumer rule).
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n")).localCheckpoint(true)
    val totDf = counts.agg(
      aggregate(
        transform(
          array_sort(collect_list(struct(col(groupCol).as("g"), col("__n").as("n")))),
          x => sqrt(x.getField("n").cast("double"))),
        lit(0.0), (acc, v) => acc + v).as("__tot"))
    val weight = sqrt(col("__n").cast("double")) / col("__tot")
    counts.crossJoin(broadcast(totDf))
      .select(col(groupCol),
        col("__n").as("n_docs"),
        weight.as("weight"),
        floor(lit(targetTotal.toDouble) * weight).cast("long").as("target_n"))
  }
}
