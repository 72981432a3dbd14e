package graft.operators.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-dimension feature standardization over an embedding column — the
  * fit half of the classic z-score scaler every training pipeline runs
  * before distance-based models (and before quantization, whose int8
  * grid assumes roughly centered coordinates).
  *
  * `fit` emits one row per dimension: n, min, max (exact SELECTIONS —
  * float values pass through untouched, so they hash unrounded), and
  * mean/std ROUNDED at 4. The moment sums are DECIMAL(28,12)-exact and
  * order-free: v is float→double (exact), v² is a ≤48-bit product of a
  * 24-bit mantissa (EXACT in double), and each is cast to decimal once
  * before summing. The only engine-sensitive step is that double→decimal
  * cast's rounding at the 12th digit — a tie there needs a coordinate
  * that is an exact multiple of 2⁻¹³ AND a mean within 10⁻¹² of the
  * 5·10⁻⁵ rounding grid, two independent negligibilities (the
  * TimeWeighted rounding-margin argument); mean/std round at 4 so the
  * 10⁻¹² tail can never surface. Variance clamps at 0 before the sqrt
  * (IEEE cancellation can dip an exactly-zero variance a hair negative;
  * sqrt(-ε) would be NaN/error — engine-dependent).
  *
  * `transform` z-scores every coordinate against a fit table — a
  * broadcast of 64 rows joined map-side; per-coordinate arithmetic
  * only, no shuffle beyond the broadcast.
  *
  * Scale: `fit` is one partial agg keyed by dimension (64 groups) over
  * the exploded (id, dim, v) slim rows — no wide arrays shuffle (the
  * explode-slim rule); min/max/count/sums all merge map-side.
  */
object Standardize {

  /** One row per 1-based dimension of `embCol` (vectors not exactly
    * `dim` long, or NULL, are dropped — the embedding-audit contract
    * counts them; this operator standardizes the clean ones).
    */
  def fit(df: DataFrame, embCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val d2812 = DecimalType(28, 12)
    val v = col("__v").cast("double")
    df.where(col(embCol).isNotNull && size(col(embCol)) === dim)
      .select(posexplode(col(embCol)).as(Seq("__p", "__v")))
      .groupBy((col("__p") + lit(1)).as("dim"))
      .agg(
        count(lit(1)).as("n"),
        min(v).as("dim_min"),
        max(v).as("dim_max"),
        sum(v.cast(d2812)).as("__sx"),
        sum((v * v).cast(d2812)).as("__sxx"))
      .select(
        col("dim"), col("n"), col("dim_min"), col("dim_max"),
        graft.functions.ExactMath.hashRound(col("__sx").cast("double") / col("n").cast("double"), 4).as("mean"),
        graft.functions.ExactMath.hashRound(
          sqrt(greatest(
            col("__sxx").cast("double") / col("n").cast("double")
              - (col("__sx").cast("double") / col("n").cast("double"))
              * (col("__sx").cast("double") / col("n").cast("double")),
            lit(0.0))), 4).as("std"))
  }

  /** Z-score every coordinate against a `fit` table (NULL where a
    * dimension's std is 0 — a constant feature carries no signal and an
    * engine-dependent x/0 must never escape). The fit table is tiny by
    * construction (one row per dimension) and broadcast.
    */
  def transform(df: DataFrame, embCol: String, fitTable: DataFrame): DataFrame = {
    // driver-side collect of one row per DIMENSION (64ish) — the
    // documented tiny-table exception, embedded as literals so the
    // transform is a pure map with no join at all
    val stats = fitTable.select(col("dim"), col("mean"), col("std"))
      .collect().sortBy(_.getInt(0))
    require(stats.nonEmpty, "empty fit table")
    val means = stats.map(_.getAs[Double]("mean"))
    val stds = stats.map(_.getAs[Double]("std"))
    val meanArr = array(means.map(lit(_)): _*)
    val stdArr = array(stds.map(lit(_)): _*)
    df.withColumn("standardized",
      zip_with(col(embCol).cast("array<double>"),
        sequence(lit(1), lit(stats.length)),
        (x, i) => {
          val m = element_at(meanArr, i)
          val s = element_at(stdArr, i)
          when(s =!= 0.0, (x - m) / s)
        }))
  }
}
