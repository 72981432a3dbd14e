package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-weighted average — the integral mean of a step signal sampled
  * at irregular times (the standard TWAP/sensor-average shape):
  *
  *   twa = Σᵢ vᵢ·(tᵢ₊₁ − tᵢ) / Σᵢ (tᵢ₊₁ − tᵢ)
  *
  * over consecutive observations per key (value held constant until the
  * next sample — a left-continuous step function; the final observation
  * has no successor and bounds the integration span).
  *
  * Determinism: Δt is EXACT integer microseconds (`unix_micros`), the
  * weighted sum is exact DECIMAL — value at DECIMAL(18,6) × Δt at
  * DECIMAL(18,0) → DECIMAL(37,6), summed at (38,6), order-free. The
  * average itself is ROUNDED to 4 digits (the B35 fence convention):
  * the exact weighted sum exceeds 2⁵³ in millionths at corpus scale, so
  * its decimal→double conversion is engine-rounding territory (measured
  * 1-ulp Spark-vs-DuckDB divergence at sf0.001) — the hashable exact
  * companions are `n_intervals` and `span_us`, and the rounded mean
  * carries ~10⁹× more margin at the 5·10⁻⁵ grid than the ulp noise.
  * Same-timestamp samples weigh zero (Δt = 0) but stay deterministic
  * via the unique tiebreak in the window ordering; a key whose whole
  * span is zero yields NULL via the NULLIF guard (never an
  * engine-dependent x/0).
  *
  * Scale: one partitioned window (lead) + one partial agg — both keyed
  * by `keyCols`, a single shuffle reused across the two; no global sort.
  * DECIMAL(18,0) Δt covers ~9000 years of microseconds.
  */
object TimeWeighted {

  /** One row per key: `n_intervals` (consecutive pairs), `span_us`
    * (total covered microseconds) and `twa_value`. Rows with NULL key,
    * ts, tie, or value are dropped; keys with a single observation have
    * no interval and are absent from the result.
    */
  def avgByKey(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val keyRefs = keyCols.map(col)
    val clean = df.where(
      keyRefs.map(_.isNotNull).reduce(_ && _) &&
        col(tsCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    val withNext = clean
      // cast: NTZ parquet reads resolve to TIMESTAMP_NTZ, which
      // unix_micros rejects; the session-TZ reinterpretation is a
      // constant offset and offsets cancel in the lead-difference
      .select(keyRefs :+ unix_micros(col(tsCol).cast("timestamp")).as("__t") :+
        col(tieCol).as("__tie") :+
        col(valueCol).cast(DecimalType(18, 6)).as("__v"): _*)
      .withColumn("__dt", lead(col("__t"), 1).over(
        Window.partitionBy(keyRefs: _*).orderBy(col("__t"), col("__tie"))) - col("__t"))
      .where(col("__dt").isNotNull)
    withNext
      .groupBy(keyRefs: _*)
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("__dt")).as("span_us"),
        graft.functions.ExactMath.hashRound(
          sum(col("__v") * col("__dt").cast(DecimalType(18, 0))).cast("double")
            / nullif(sum(col("__dt")).cast("double"), lit(0.0)),
          4).as("twa_value"))
  }
}
