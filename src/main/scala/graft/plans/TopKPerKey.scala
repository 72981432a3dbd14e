package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.functions.{approx_count_distinct, col, row_number, struct}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Top-k rows per key as a first-class physical operator.
  *
  * The window formulation (`row_number().over(partitionBy(k).orderBy(o))`
  * + filter) must fully sort every partition's rows before it can rank —
  * O(n log n) per key and the whole input flows through the sort. This
  * operator keeps a bounded k-heap per key instead: O(n log k), memory
  * O(keys·k), and rows beyond the heap are dropped on the spot. At 100 TB
  * with small k that is the difference between sorting the corpus and
  * streaming over it once after one clustering shuffle.
  *
  * Wiring: logical node → strategy (injected via
  * `spark.experimental.extraStrategies`, no session rebuild needed) →
  * exec node that declares `ClusteredDistribution` so Spark plans the
  * single shuffle.
  */
final case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    maxRetainedPerPartition: Long,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    maxRetainedPerPartition: Long,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val limit = k
    val maxRetained = maxRetainedPerPartition
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering: Ordering[InternalRow] =
        new org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering(
          sortOrder, childOutput)
      // per key: bounded heap holding the current top-k (max of kept set at
      // the root so the worst kept row is evicted first)
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      val reverse = rowOrdering.reverse.asInstanceOf[java.util.Comparator[InternalRow]]
      // explicit memory contract: the operator retains at most keys·k rows
      // per partition on heap; past the bound it fails fast with guidance
      // instead of OOMing the executor (the sort-based window formulation
      // spills and has no such bound)
      var retained = 0L
      rows.foreach { r =>
        val key = keyProj(r)
        // copy the key only on first insertion — getOrElseUpdate's by-value
        // key argument would copy once per input row
        var heap = heaps.getOrElse(key, null)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, reverse)
          heaps.put(key.copy(), heap)
        }
        // SparkPlan contract is InternalRow, not UnsafeRow — no cast
        if (heap.size < limit) {
          retained += 1L
          if (retained > maxRetained) {
            throw new org.apache.spark.SparkException(
              s"TopKPerKey retained more than maxRetainedPerPartition=$maxRetained rows " +
                s"in one partition (keys x k exceeds the bounded-heap memory contract). " +
                s"Use a row_number() window (sort-based, spillable) for unbounded key " +
                s"cardinality, or raise maxRetainedPerPartition.")
          }
          heap.add(r.copy())
        } else if (rowOrdering.compare(r, heap.peek()) < 0) {
          heap.poll()
          heap.add(r.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        while (!heap.isEmpty) buf += heap.poll()
        buf.sortInPlace()(rowOrdering).iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, maxRetained, child) =>
      TopKPerKeyExec(keys, order, k, maxRetained, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Default per-partition retained-row bound: 4M rows x (say) 100 B/row
    * ≈ 400 MB of heap — comfortably under a typical executor's share, and
    * far above any sane keys·k workload for this operator.
    */
  val DefaultMaxRetainedPerPartition: Long = 4000000L

  /** Registers the strategy on the session (idempotent) and returns the
    * top-k rows per key, ordered within each key by `order`.
    *
    * Memory contract: each partition retains at most keys·k rows on heap,
    * hard-capped at `maxRetainedPerPartition` (clear failure, not an OOM).
    *
    * Auto-degrade (default): a cheap preflight `approx_count_distinct`
    * over the keys estimates the retained-row footprint; when the
    * bounded-heap contract cannot hold (keys·k within skew margin of the
    * cap), the call falls back to the equivalent `row_number` window —
    * sort-based and spillable, same rows for any total per-key order.
    * `strict = true` skips the preflight job and keeps the fail-fast
    * contract — the right mode when key cardinality is known-bounded
    * (a dimension, a language code) and an extra job per call is waste.
    */
  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[Column],
      k: Int,
      maxRetainedPerPartition: Long = DefaultMaxRetainedPerPartition,
      strict: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k (the exec would NPE on an empty heap)")
    require(maxRetainedPerPartition >= 1, "maxRetainedPerPartition must be >= 1")
    val spark = df.sparkSession
    if (!strict && !heapFits(df, keyCols, k, maxRetainedPerPartition))
      return windowFallback(df, keyCols, orderBy, k)
    register(spark)
    val plan = df.queryExecution.analyzed
    val keyExprs = keyCols.map(n => plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"key column $n not in ${plan.output.map(_.name)}")))
    val orderExprs = orderBy.map { c =>
      GraftPlanBridge.expression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    GraftPlanBridge.ofRows(spark,
      TopKPerKeyNode(keyExprs, orderExprs, k, maxRetainedPerPartition, plan))
  }

  /** Preflight estimate: does keys·k fit the per-partition bound?
    * Deliberately assumes the WORST-CASE placement — every key in one
    * partition — so the answer stays valid however AQE coalesces the
    * clustering shuffle or however skewed the key distribution is (a
    * partitions-divided estimate would pass preflight and then hit the
    * runtime cap the fallback exists to avoid). approx_count_distinct is
    * one partial-agg job over the key columns only; worst-case placement
    * covers DISTRIBUTION but not the estimate's direction — the HLL can
    * UNDERcount by its relative error, so the estimate is inflated by a
    * 5% margin (above the default rsd ≈ 2.3%) before the comparison.
    * A borderline pass that would have hit the executor-side hard cap
    * now degrades to the window fallback instead.
    */
  private def heapFits(
      df: DataFrame, keyCols: Seq[String], k: Int, maxRetained: Long): Boolean = {
    val estKeys = df
      .select(approx_count_distinct(struct(keyCols.map(col): _*)).as("n"))
      .head().getLong(0)
    math.ceil(estKeys * 1.05).toLong * k <= maxRetained
  }

  /** The sort-based plan the operator degrades to: identical rows (given
    * a total per-key order), O(n log n) per partition but spillable —
    * no retained-row bound to violate.
    */
  private def windowFallback(
      df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__graft_topk_rn", row_number().over(w))
      .where(col("__graft_topk_rn") <= k)
      .drop("__graft_topk_rn")
  }

  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
}
