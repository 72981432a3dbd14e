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
    *
    * Sizing contract: optimal bits ≈ 1.44·log2(1/fpp) bits/key, so at
    * fpp=0.01 the sketch is ~1.2 bytes/key — 1M keys ≈ 1.2 MB, 100M ≈
    * 120 MB, 10^9 keys ≈ 1.2 GB and this single sketch stops being the
    * right shape: raise fpp (the exact join downstream absorbs extra
    * false positives linearly) or range-partition the key space into
    * per-range sketches before reaching for one giant filter. NOTE
    * `BloomFilterAggregate` silently `Math.min`-clamps its bit count to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 2^26
    * bits = 8 MB ≈ 56M keys at fpp 0.01) — a clamped sketch still never
    * loses rows, it just sheds fewer, so this method raises the conf to
    * the requested size rather than let the filter silently degrade to
    * fpp ≈ 1. The sketch is then embedded as a plan literal (shipped in
    * each stage's task binary, like Spark's own runtime filters after
    * subquery evaluation); for sketches near the GB range prefer the
    * per-range decomposition above.
    */
  def buildKeyBloom(keys: DataFrame, keyCol: String, expectedItems: Long, fpp: Double): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // the aggregate Math.min-clamps BOTH sizing inputs against session
    // confs (bits -> 8 MB, items -> 4M by default). Raise them on an
    // ISOLATED session (own SQLConf, shared SparkContext) instead of
    // toggling the caller's: a raise-then-restore on the shared session
    // is not atomic w.r.t. other threads — AQE could inject oversized
    // runtime blooms into queries planned while raised, and two
    // concurrent builders could clobber each other's restore. The key
    // plan is re-bound from its analyzed form; the session copies the
    // caller's runtime SQL confs so scans (e.g. nanosAsLong parquet
    // reads) behave identically.
    val src = keys.sparkSession
    val iso = src.newSession()
    src.conf.getAll.foreach { case (k, v) =>
      if (k.startsWith("spark.sql.") && iso.conf.isModifiable(k)) iso.conf.set(k, v)
    }
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    if (iso.conf.get(bitsKey).toLong < numBits) iso.conf.set(bitsKey, numBits.toString)
    if (iso.conf.get(itemsKey).toLong < expectedItems)
      iso.conf.set(itemsKey, expectedItems.toString)
    val agg = new BloomFilterAggregate(
      GraftPlanBridge.expression(xxhash64(col(keyCol))),
      CatalystLiteral(expectedItems), CatalystLiteral(numBits)).toAggregateExpression()
    GraftPlanBridge.ofRows(iso, keys.queryExecution.analyzed)
      .select(GraftPlanBridge.column(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** Probe column: true when `keyCol`'s hash might be in the bloom.
    * A null bloom (empty build side) yields null, which `where` treats
    * as drop. A null KEY is not null-propagated: `xxhash64` folds null
    * to its seed, so null-key rows probe like any value and may return
    * true — harmless under [[prefilteredJoin]] (the exact join drops
    * null keys anyway), but do not use a bare probe to COUNT joinable
    * rows when keys can be null.
    *
    * Probe and build must hash the SAME key type: Spark's xxhash64 of
    * `1` (int) and `1L` differ, so a type mismatch silently sheds true
    * matches. [[prefilteredJoin]] enforces this; direct callers pairing
    * this with [[buildKeyBloom]] must cast both sides to one type.
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
    // xxhash64(1: int) != xxhash64(1L): a type mismatch would make the
    // bloom shed TRUE matches (the exact join up-casts and would have
    // matched them) — fail loudly instead of silently losing rows
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    require(ft == dt,
      s"fact key $factKey: $ft and dim key $dimKey: $dt must have the same type " +
        "(xxhash64 hashes types differently — cast one side first)")
    val bloom = buildKeyBloom(dim, dimKey, expectedItems, fpp)
    fact.where(mightContain(bloom, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
