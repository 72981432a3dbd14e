package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshot

/** Mergeable-sketch distinct counting (Apache DataSketches HLL via Spark
  * 4 built-ins): the pattern that replaces exact COUNT(DISTINCT) at
  * 100 TB — partial sketches merge associatively across partitions,
  * days, or tables without re-scanning.
  */
class SketchSpec extends SparkSpecBase {

  test("hll sketch estimate tracks exact distinct within tolerance") {
    val li = Snapshot(spark, sf()).lineitem
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val est = li.select(hll_sketch_estimate(hll_sketch_agg(col("l_partkey")))).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est $est vs exact $exact")
  }

  test("sketches merge: union of per-group sketches equals global estimate") {
    val li = Snapshot(spark, sf()).lineitem
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    val merged = perGroup.select(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val global = li.select(hll_sketch_estimate(hll_sketch_agg(col("l_partkey")))).head().getLong(0)
    assert(merged == global, s"merged $merged != global $global")
  }
}
