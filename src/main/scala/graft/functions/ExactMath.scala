package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bit-exact aggregation helpers.
  *
  * Double sums are order-dependent, so a Spark partial-aggregate sum and a
  * single-threaded oracle sum can disagree in the last ulp. Routing every
  * value sum through DECIMAL(18,6) makes the aggregation exact (and
  * associative), then one exact decimal→double conversion at the end gives
  * identical doubles in any engine.
  */
object ExactMath {
  val ValueDecimal: DecimalType = DecimalType(18, 6)

  /** Exact sum of a double-ish column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(ValueDecimal)).cast("double")

  /** Exact mean: decimal-exact sum divided by count, in double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** High-precision decimal for unit-scale components (e.g. embedding
    * coordinates in [-1, 1]): 16 integer digits of headroom for the sum.
    */
  val ComponentDecimal: DecimalType = DecimalType(28, 12)

  /** Order-independent mean of a unit-scale double column (decimal-exact
    * sum, one division) — stable across partitionings/AQE re-plans, unlike
    * `avg` over raw doubles whose partial-aggregation order varies.
    */
  def dmean(c: Column): Column =
    (sum(c.cast(ComponentDecimal)) / count(lit(1))).cast("double")

  /** Build-portable fixed-digit rounding for oracle-hashed doubles:
    * floor(x·10^d + 0.5) / 10^d. Every step is a correctly-rounded IEEE
    * op, so two engines holding the SAME double produce the same rounded
    * double on ANY build. Spark's `round()` (HALF_UP on the shortest
    * decimal repr) and DuckDB's `round()` (round-on-binary-value, and
    * build-dependent) can disagree when a value's shortest repr lands
    * exactly on a half boundary — the q_cohort_ltv incident class; this
    * formula has no such seam (exact binary midpoints round toward +inf,
    * identically in both engines). Mirror in SQL as
    * `floor(x * 1e<d> + 0.5) / 1e<d>`. Requires |x|·10^d < 2^53 and a
    * FINITE, non-NaN input: Spark's `floor` on a double returns LongType,
    * so NaN/±Inf would become 0 while the SQL mirror propagates them —
    * callers must clamp or when-guard non-finite values first (every
    * current caller does). The residual risk — the engines arriving with
    * doubles an ulp apart that straddle an integer boundary of
    * x·10^d + 0.5 — is what the MarginAuditSpec boundary audits guard.
    */
  def hashRound(c: Column, digits: Int): Column = {
    require(digits >= 1 && digits <= 9, s"hashRound digits out of range: $digits")
    // exact integer power — math.pow is only 1-ulp-accurate by spec, and
    // an inexact scale vs the SQL literal 1e<d> would shift every hashed
    // value off the oracle's grid (the hazard this helper exists to remove)
    val s = (1 to digits).foldLeft(1L)((a, _) => a * 10L).toDouble
    floor(c * lit(s) + lit(0.5)).cast("double") / lit(s)
  }
}
