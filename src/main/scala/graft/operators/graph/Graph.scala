package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph traversal over edge-list DataFrames. [[graft.operators.dedup.TransitiveDedup]]
  * answers "which nodes are connected" (components); this answers "how
  * far" (min-hop distances) — the reachability/radius grain of
  * co-occurrence analysis (parts bought together, docs sharing shingles,
  * users sharing sessions).
  *
  * Frontier BFS, one shuffle join per hop: `frontier ⋈ edges → next`,
  * minus already-visited nodes (anti-join against the slim visited
  * table). First discovery IS the min-hop distance, so no min-agg over
  * path enumerations is ever materialized — the frontier is bounded by
  * node cardinality, never by path count (a recursive path-expansion
  * formulation explodes combinatorially on dense graphs; the visited
  * anti-join is what keeps this linear in nodes × hops).
  *
  * Iterative-Spark hygiene (the TransitiveDedup pattern): every frontier
  * is `localCheckpoint`ed so plans don't grow with hops; the symmetrized
  * edge table persists for the loop and unpersists before return (the
  * result only references checkpointed frontiers). Early hops have tiny
  * frontiers — AQE broadcasts them against the big edge table at
  * runtime; later hops degrade gracefully to shuffled joins.
  */
object Graph {

  /** Min-hop distance from `source` to every node reachable within
    * `maxHops` over the UNDIRECTED graph given by `edges(srcCol,
    * dstCol)`. `source` is a 1-row DataFrame with column `node` (keeps
    * the operator collect-free — pass an aggregate like
    * `df.agg(min(key).as("node"))` or a literal via `spark.range(1)
    * .select(lit(v).as("node"))`). Returns (`node`, `hops`) including
    * the source at hops 0; unreachable-within-maxHops nodes are absent.
    *
    * Duplicate edges NEVER affect the result (each hop's frontier is
    * `distinct` before the visited anti-join) — the symmetrized-edge
    * dedupe below is purely a size optimization for the per-hop join
    * input. When the caller's edge table is already deduped undirected
    * half-edges (one row per pair, `src < dst` — what
    * [[coOccurrenceEdges]] emits), the symmetrized union is dup-free by
    * construction and that dedupe is a wasted full-table exchange of
    * the query's largest intermediate: pass `dedupEdges = false` to
    * skip it (measured at sf0.1: removes a 2.4M-row shuffle+agg, ~10%
    * of q_graph_bfs end to end, bit-identical result).
    */
  def bfsHops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      source: DataFrame,
      maxHops: Int,
      dedupEdges: Boolean = true): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .where(col("s").isNotNull && col("d").isNotNull)
    val symRaw = e.unionAll(e.select(col("d").as("s"), col("s").as("d")))
    val sym = (if (dedupEdges) symRaw.distinct() else symRaw)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var frontier = source.select(col("node")).distinct()
        .withColumn("hops", lit(0))
        .localCheckpoint(true)
      var visited = frontier
      var h = 1
      var exhausted = false
      while (h <= maxHops && !exhausted) {
        val next = frontier
          .join(sym, frontier("node") === sym("s"))
          .select(sym("d").as("node"))
          .distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("hops", lit(h))
          .localCheckpoint(true)
        exhausted = next.isEmpty
        if (!exhausted) visited = visited.unionAll(next)
        frontier = next
        h += 1
      }
      visited
    } finally sym.unpersist()
  }

  /** Undirected co-occurrence edges: nodes sharing a group (parts in the
    * same order, docs with the same shingle). One ordinary equi
    * self-join on the group key — co-partitioned, so a single exchange
    * per side; per-group cost is quadratic in group size (bounded by
    * lines-per-order-style group cardinality, NOT corpus size).
    * Emits each undirected edge once (`node_a < node_b`), deduped.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, nodeCol: String): DataFrame = {
    val slim = df.select(col(groupCol).as("__g"), col(nodeCol).as("__n"))
      .where(col("__g").isNotNull && col("__n").isNotNull)
    slim.join(slim.withColumnRenamed("__n", "__m"), "__g")
      .where(col("__n") < col("__m"))
      .select(col("__n").as("node_a"), col("__m").as("node_b"))
      .distinct()
  }
}
