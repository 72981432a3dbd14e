package graft.operators.join

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.{Literal => CatalystLiteral}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join prefiltering — the semi-join reduction Spark's own
  * runtime row-level filtering applies when AQE can prove it profitable,
  * exposed as an explicit operator for when the planner can't see the
  * selectivity (a pre-filtered dimension, a key list from another
  * system). The fact side is filtered AT THE SCAN by a fixed-size bloom
  * probe before any exchange, so at 100 TB the shuffle moves only rows
  * whose key *might* join; false positives are removed by the exact join
  * that follows, so results are bit-identical to the plain join.
  *
  * Both sides hash through `xxhash64` (same shape as Spark's injected
  * `BloomFilterAggregate(XxHash64(key))` runtime filters), so any
  * key type works and insert/probe hashing always agree.
  */
object BloomJoin {

  /** Aggregates a serialized bloom filter over `xxhash64(keyCol)` of
    * `keys` (distributed partial sketches OR-merged by the aggregate; the
    * driver receives one fixed-size byte array — driver-sized by
    * construction, like a broadcast relation's key set but far smaller).
    * Returns null iff `keys` is empty.
    */
  def buildKeyBloom(keys: DataFrame, keyCol: String, expectedItems: Long, fpp: Double): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      GraftPlanBridge.expression(xxhash64(col(keyCol))),
      CatalystLiteral(expectedItems), CatalystLiteral(numBits)).toAggregateExpression()
    keys.select(GraftPlanBridge.column(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** Probe column: true when `keyCol`'s hash might be in the bloom.
    * Null-safe: a null bloom (empty build side) or null key yields null,
    * which `where` treats as drop — exactly the inner-join semantics.
    */
  def mightContain(bloom: Array[Byte], keyCol: Column): Column =
    GraftPlanBridge.column(BloomFilterMightContain(
      CatalystLiteral(bloom, BinaryType),
      GraftPlanBridge.expression(xxhash64(keyCol))))

  /** Inner equi-join with the fact side bloom-prefiltered at the scan.
    * Result equals `fact.join(dim, factKey === dimKey)` exactly; the
    * bloom only sheds non-joining fact rows before they reach an
    * exchange. Size the filter with `expectedItems` ≈ distinct dim keys.
    */
  def prefilteredJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bloom = buildKeyBloom(dim, dimKey, expectedItems, fpp)
    fact.where(mightContain(bloom, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
