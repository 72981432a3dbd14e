package graft.operators.mining

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — the "customers who bought X also
  * bought Y" mining pass (support / confidence / lift over item
  * co-occurrence), the classic next step after the co-occurrence GRAPH
  * ([[graft.operators.graph.Graph.coOccurrenceEdges]] keeps the pairs;
  * this scores them as directional rules).
  *
  * Reference scope: the reference's agent surface answers association
  * questions by composing pandas groupbys over the same order/line
  * tables (`openai/my_toolkit.py` query blocks); this packages the
  * canonical A-priori pair grain as one operator.
  *
  * Plan shape (all shuffles keyed, nothing row-quadratic):
  *   1. `distinct(basket, item)` — presence semantics (a basket counts
  *      one support regardless of quantity), partial-aggregated.
  *   2. pair counts: self-join co-partitioned ON THE BASKET KEY (one
  *      exchange per side; per-basket quadratic in DISTINCT items per
  *      basket, bounded by basket width, never corpus size), then a
  *      partial-aggregated `groupBy(pair)`.
  *   3. `HAVING count >= minPairCount` BEFORE anything re-joins — the
  *      frequency-cap lesson: the long tail of once-seen pairs drops
  *      inside the aggregation, so the rule table that flows onward is
  *      support-bounded (≤ pairs/minPairCount of the co-occurrence
  *      volume).
  *   4. item supports attach via plain equi-joins (AQE broadcasts the
  *      item-cardinality table while it fits; a forced broadcast would
  *      be wrong at catalog-scale item counts) and the 1-row basket
  *      total via an explicit broadcast (the Mixing bound pattern).
  *
  * Determinism (SURVEY §5): every metric is a single IEEE-exact double
  * division of two BIGINT counts (counts < 2^53 are exactly
  * representable; `lift`'s `pc·N` and `ca·cb` products stay integral in
  * LONG before the one division) — bit-identical across engines, so the
  * DuckDB oracle mirrors the formulas verbatim on unrounded doubles.
  *
  * Emits BOTH directions of each frequent pair (a rule is directional:
  * confidence(a→b) ≠ confidence(b→a)). Output: `antecedent`,
  * `consequent`, `pair_count`, `support`, `confidence`, `lift`.
  */
object AssocRules {

  def rules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val b = df.select(col(basketCol).as("bk"), col(itemCol).as("item"))
      .where(col("bk").isNotNull && col("item").isNotNull)
      .distinct()
    val n = b.select(col("bk")).distinct().agg(count(lit(1)).as("n_baskets"))
    val itemCounts = b.groupBy("item").agg(count(lit(1)).as("ic"))
    // NOT FanOut.byJoinKey-pinned (r16-opt A/B: 2.22 s pinned vs 1.89 s
    // unpinned at sf0.1 — the Graph.coOccurrenceEdges verdict; per-task
    // overhead on the pinned layout exceeds the fat-stage saving)
    val pairs = b.join(b.select(col("bk"), col("item").as("item_b")), "bk")
      .where(col("item") < col("item_b"))
      .groupBy(col("item").as("ia"), col("item_b").as("ib"))
      .agg(count(lit(1)).as("pc"))
      .where(col("pc") >= minPairCount)
    val directional = pairs.select(col("ia").as("antecedent"), col("ib").as("consequent"), col("pc"))
      .unionAll(pairs.select(col("ib").as("antecedent"), col("ia").as("consequent"), col("pc")))
    directional
      .join(itemCounts.withColumnRenamed("item", "antecedent").withColumnRenamed("ic", "ca"), "antecedent")
      .join(itemCounts.withColumnRenamed("item", "consequent").withColumnRenamed("ic", "cb"), "consequent")
      .crossJoin(broadcast(n))
      .select(
        col("antecedent"), col("consequent"),
        col("pc").as("pair_count"),
        (col("pc").cast("double") / col("n_baskets")).as("support"),
        (col("pc").cast("double") / col("ca")).as("confidence"),
        ((col("pc") * col("n_baskets")).cast("double") / (col("ca") * col("cb"))).as("lift"))
  }
}
