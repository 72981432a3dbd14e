package graft.operators.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pearson correlation matrix over the leading dimensions of an
  * embedding column — the feature-redundancy screen a pipeline runs
  * before dropping or decorrelating inputs (two dimensions at |r| ≈ 1
  * carry one signal).
  *
  * One pass, no joins: each vector emits its upper-triangle (i ≤ j)
  * coordinate pairs through a nested HOF that fuses into the scan, and
  * a single partial agg keyed by (i, j) — m(m+1)/2 groups — carries
  * the five sufficient statistics (n, Σx, Σy, Σx², Σxy as it happens
  * Σy² too). The [[Standardize]] determinism protocol verbatim: x is
  * float→double EXACT, x·y is an exact ≤48-bit product of 24-bit
  * mantissas, each cast to DECIMAL(28,12) once before the order-free
  * decimal sum; the only engine-sensitive step is that cast's 1e-12
  * rounding tail, which cannot reach the 5e-5 round-4 grid (the
  * TimeWeighted margin argument) — so `cov` and `corr` round at 4.
  * The covariance/variance chain is ONE fixed IEEE sequence mirrored
  * exactly in the oracle (sxy/n − (sx/n)(sy/n); variances clamp at 0
  * before the single sqrt of their PRODUCT — sqrt(a·b), never
  * sqrt(a)·sqrt(b), the sequences differ in IEEE); a zero variance on
  * either side yields NULL (a constant dimension has no correlation).
  *
  * `maxDim` caps the pair fan-out (m²/2 slim rows per vector): 16 of
  * 64 dims = 136 pairs/vector. The full matrix at scale would raise
  * maxDim — the fan-out is the documented cost knob, linear in rows.
  */
object CorrMatrix {

  /** The five sufficient statistics per dimension pair, exposed so the
    * MarginAuditSpec boundary audit can re-derive the pre-rounding
    * cov/corr doubles from the exact decimal sums (the B38/q_regression
    * protocol): (dim_i, dim_j, n_vec, __sx, __sy, __sxx, __syy, __sxy).
    */
  def sufficientStats(
      df: DataFrame,
      embCol: String,
      dim: Int,
      maxDim: Int): DataFrame = {
    require(dim >= 1 && maxDim >= 1 && maxDim <= dim,
      s"need 1 <= maxDim <= dim, got dim=$dim maxDim=$maxDim")
    val d2812 = DecimalType(28, 12)
    val e = col(embCol)
    val pairs = flatten(transform(
      sequence(lit(1), lit(maxDim)),
      i => transform(
        sequence(i, lit(maxDim)),
        j => struct(
          i.as("i"), j.as("j"),
          element_at(e, i).cast("double").as("x"),
          element_at(e, j).cast("double").as("y")))))
    val x = col("__p.x")
    val y = col("__p.y")
    // fan out before the m²/2 pair explode (r16-opt): on a single-split
    // input the explode + 6 decimal-product partials all fused into ONE
    // scan task (1.67 s of a 1.86 s query, ProfileStages); the decimal
    // sums are order-free, so the repartition is bit-neutral. Hash key =
    // the vector itself (near-unique); gate no-ops on multi-split inputs
    graft.operators.FanOut.byKey(
      df.where(e.isNotNull && size(e) === dim).select(e.as(embCol)),
      e)
      .select(explode(pairs).as("__p"))
      .groupBy(col("__p.i").as("dim_i"), col("__p.j").as("dim_j"))
      .agg(
        count(lit(1)).as("n_vec"),
        sum(x.cast(d2812)).as("__sx"),
        sum(y.cast(d2812)).as("__sy"),
        sum((x * x).cast(d2812)).as("__sxx"),
        sum((y * y).cast(d2812)).as("__syy"),
        sum((x * y).cast(d2812)).as("__sxy"))
  }

  /** One row per 1-based dimension pair i ≤ j of `embCol`'s first
    * `maxDim` coordinates: (dim_i, dim_j, n_vec, cov, corr). Vectors
    * not exactly `dim` long, or NULL, are dropped (the embedding-audit
    * contract counts them).
    *
    * Rounding is [[graft.functions.ExactMath.hashRound]] (floor-based),
    * NOT `round()`: this row went driver-red in round 10 with rows and
    * schema matching and every boundary margin > 1.3e-7 (audited), so
    * the divergence was a DuckDB-build behavior, not a boundary-sitter —
    * the floor formula and the lambda/struct-free oracle mirror remove
    * every build-sensitive construct this query used.
    */
  def pearsonByDimPair(
      df: DataFrame,
      embCol: String,
      dim: Int,
      maxDim: Int): DataFrame = {
    val agg = sufficientStats(df, embCol, dim, maxDim)
    val n = col("n_vec").cast("double")
    def m(c: String) = col(c).cast("double") / n
    val cxy = col("__sxy").cast("double") / n - m("__sx") * m("__sy")
    val cxx = greatest(col("__sxx").cast("double") / n - m("__sx") * m("__sx"), lit(0.0))
    val cyy = greatest(col("__syy").cast("double") / n - m("__sy") * m("__sy"), lit(0.0))
    agg.select(
      col("dim_i"), col("dim_j"), col("n_vec"),
      graft.functions.ExactMath.hashRound(cxy, 4).as("cov"),
      graft.functions.ExactMath
        .hashRound(when(cxx > 0.0 && cyy > 0.0, cxy / sqrt(cxx * cyy)), 4)
        .as("corr"))
  }
}
