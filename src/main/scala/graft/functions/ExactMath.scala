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
}
