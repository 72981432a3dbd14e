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
    // deliberately NOT pre-partitioned by "s" (r16-opt A/B): unlike
    // pageRank's rank table, the per-hop frontier is tiny, so AQE
    // broadcast-joins it and sym is probed straight from the cache —
    // never re-shuffled; a pageRank-style repartition(col("s")) here
    // measured as a wash-to-loss (warm medians 5.5-6.2 s both ways,
    // paying an extra 4.8M-row exchange up front for nothing)
    val sym = (if (dedupEdges) symRaw.distinct() else symRaw)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var frontier = source.select(col("node")).distinct()
        .withColumn("hops", lit(0))
        .localCheckpoint(true)
      // On an UNDIRECTED graph a neighbor of a hop-(h-1) node is at
      // distance h-2, h-1, or h, so excluding the last TWO frontiers
      // excludes everything visited. The anti-join right side stays
      // bounded by frontier width instead of growing with the whole
      // reachable set — the difference between a broadcastable exclusion
      // table and a full visited shuffle on a 100 TB graph. (BfsSpec
      // pins parity against a full-visited reference implementation.)
      var prev = frontier.limit(0)
      var visited = frontier
      var h = 1
      var exhausted = false
      while (h <= maxHops && !exhausted) {
        val next = frontier
          .join(sym, frontier("node") === sym("s"))
          .select(sym("d").as("node"))
          .distinct()
          .join(frontier.unionAll(prev).select("node"), Seq("node"), "left_anti")
          .withColumn("hops", lit(h))
          .localCheckpoint(true)
        exhausted = next.isEmpty
        if (!exhausted) visited = visited.unionAll(next)
        prev = frontier
        frontier = next
        h += 1
      }
      visited
    } finally sym.unpersist()
  }

  /** PageRank over the UNDIRECTED multigraph given by `edges(srcCol,
    * dstCol)` — the classic "which nodes matter" centrality every
    * catalog/lineage/co-purchase analysis wants next to BFS distances
    * and components. Fixed `iterations` of the power method:
    *
    *   rank'(v) = teleport/N + damping · Σ_{u∈nbr(v)} rank(u)/deg(u)
    *
    * Duplicate edges weight the walk (multigraph semantics: `deg` counts
    * edge multiplicity); no dangling-node mass correction is needed
    * because symmetrization gives every node deg ≥ 1.
    *
    * Determinism (SURVEY §5): the neighbor sum is the ONLY reduction,
    * and float sums are order-dependent — so each contribution
    * `rank(u)/deg(u)` (an IEEE-exact double ÷) is quantized onto the
    * 1e-15 grid as `floor(c·1e15 + 0.5)` LONG and summed exactly
    * (order-independent integers), then divided back. Every op in that
    * chain (×, +, floor, integral-long→double, ÷) is IEEE-exact and
    * identical across engines, so the whole iteration is
    * bit-reproducible and a DuckDB oracle re-derives it verbatim with
    * unrolled CTEs — unrounded doubles hash-match (the Projection
    * precedent). NOT decimal quantization: DuckDB's double→DECIMAL(38,18)
    * cast rounds a double×10¹⁸ PRODUCT while Spark rounds the exact
    * binary expansion — measured 1–2 ulp drift; the scaled-integer
    * floor form is the cross-engine-safe quantizer. `teleport` and
    * `damping` are BOTH explicit (never compute 1−d: 1−0.85 ≠ 0.15 in
    * binary).
    *
    * Plan shape: edges symmetrize + persist once; per iteration ONE
    * map-side join of the slim (node, rank, deg) table against the
    * cached edges (rank table is node-cardinality — AQE broadcasts it
    * while it fits; at graphs where it doesn't, the same plan degrades
    * to a co-partitioned shuffle join, the standard Pregel shape) and
    * ONE partial-aggregated shuffle of (dst, decimal) pairs. Rank
    * tables are localCheckpointed so plans don't grow with iterations.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      damping: Double = 0.85,
      teleport: Double = 0.15): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .where(col("s").isNotNull && col("d").isNotNull)
    // hash-partition by the join key ONCE before the persist (r16-opt,
    // guide §2.4): each power iteration joins sym("s") === ranks("node")
    // where ranks is a localCheckpointed LogicalRDD with unknown stats,
    // so without this the planner co-partitioned both sides and the FULL
    // edge table re-shuffled every iteration (ProfileStages: five
    // 64-task stages of 16-22 s summed task time). With the cached
    // partitioning only the slim rank table moves per iteration — the
    // Pregel shape, and the same one a 100 TB deployment wants. The deg
    // aggregation below shares the same exchange for free.
    val sym = e.unionAll(e.select(col("d").as("s"), col("s").as("d")))
      .repartition(col("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val deg = sym.groupBy(col("s").as("node"))
        .agg(count(lit(1)).as("deg"))
      val n = deg.agg(count(lit(1)).as("n"))
      // 1-row N attaches via broadcast (the Mixing bound pattern)
      var ranks = deg.crossJoin(broadcast(n))
        .select(col("node"), (lit(1.0) / col("n")).as("rank"), col("deg"))
        .localCheckpoint(true)
      for (_ <- 1 to iterations) {
        val contribs = sym
          .join(ranks, sym("s") === ranks("node"))
          .select(sym("d").as("node"),
            floor(col("rank") / col("deg") * lit(1.0e15) + lit(0.5)).as("c"))
          .groupBy("node").agg(sum(col("c")).as("sc"))
        ranks = ranks.select(col("node"), col("deg"))
          .join(contribs, Seq("node"), "left")
          .crossJoin(broadcast(n))
          .select(col("node"),
            (lit(teleport) / col("n") +
              lit(damping) * (coalesce(col("sc"), lit(0L)).cast("double") / lit(1.0e15)))
              .as("rank"),
            col("deg"))
          .localCheckpoint(true)
      }
      ranks.select(col("node"), col("rank"))
    } finally sym.unpersist()
  }

  /** Per-node triangle counts over the UNDIRECTED simple graph given by
    * `edges(srcCol, dstCol)` (self-loops dropped, duplicate edges
    * deduped) — the local clustering signal behind community detection
    * and "tightly-bound cluster" curation. Returns (`node`, `triangles`)
    * for every node in ≥ 1 triangle.
    *
    * Degree-oriented wedge join (the node-iterator bound from
    * Schank/Wagner and Cohen's MapReduce formulation): orient each edge
    * from its lower endpoint under the total order ≺ = (degree, id).
    * Every triangle then has EXACTLY one node with out-edges to the
    * other two, so wedges = pairs of out-edges joined on their apex,
    * closed by one semi-check against the oriented edge set. The
    * orientation caps out-degree at O(√m) — a hub with a million
    * neighbors contributes wedges only through its ≺-smaller endpoints,
    * never the quadratic fan of a naive `a < b` orientation (id order
    * leaves low-id hubs quadratic; DEGREE order is the scale fix). Both
    * joins are plain equi-joins: apex-join co-partitioned on the apex
    * id, closure an equi-join on (lo, hi) — no broadcast of anything
    * node-cardinality-sized required.
    *
    * Determinism: pure integer counts — no float anywhere.
    */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val half = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
    val deg = half.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient a—b from its (deg, id)-smaller endpoint; carry the head's
    // degree so wedge pairs can re-derive ≺ without another deg join
    val withDegs = half
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "adeg"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "bdeg"), "b")
    val aFirst = col("adeg") < col("bdeg") ||
      (col("adeg") === col("bdeg") && col("a") < col("b"))
    // NOT byJoinKey-pinned (r16-opt A/B: 2.16 s pinned vs 1.52 s
    // unpinned at sf0.1 — see coOccurrenceEdges)
    val oriented = withDegs.select(
      when(aFirst, col("a")).otherwise(col("b")).as("s"),
      when(aFirst, col("b")).otherwise(col("a")).as("d"),
      when(aFirst, col("bdeg")).otherwise(col("adeg")).as("ddeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val e1 = oriented.select(col("s"), col("d").as("v"), col("ddeg").as("vdeg"))
      val e2 = oriented.select(col("s"), col("d").as("w"), col("ddeg").as("wdeg"))
      val vFirst = col("vdeg") < col("wdeg") ||
        (col("vdeg") === col("wdeg") && col("v") < col("w"))
      val wedges = e1.join(e2, "s")
        // take each unordered out-pair once, ≺-oriented to match `oriented`
        .where(vFirst)
        .select(col("s").as("u"),
          col("v").as("lo"),
          col("w").as("hi"))
      val tri = wedges.join(
        oriented.select(col("s").as("lo"), col("d").as("hi")),
        Seq("lo", "hi"), "left_semi")
      tri.select(explode(array(col("u"), col("lo"), col("hi"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("triangles"))
    } finally oriented.unpersist()
  }

  /** Neighbor-set Jaccard similarity for node pairs sharing at least
    * `minCommon` neighbors (B94) — "customers/parts with the same
    * neighborhood are substitutes" (structural equivalence), the graph
    * twin of C4's set-similarity dedup. Common-neighbor counts come
    * from apex-pair enumeration (each shared neighbor c contributes its
    * (a, b) pair once), the `minCommon` frequency cap applies INSIDE
    * the pair aggregation (the B46 lesson: the singleton long tail
    * never reaches the degree join), degrees attach via two slim joins,
    * and jaccard = n_common / (deg_a + deg_b − n_common) — ONE IEEE
    * division of exact BIGINTs, hash-safe UNROUNDED; the global top-k
    * is TakeOrderedAndProject (never a full sort), ties broken by
    * (node_a, node_b).
    *
    * Scale contract: apex enumeration is Σ deg(c)² — fine on
    * bounded-degree co-occurrence graphs (this catalog's shape); for
    * power-law hubs the honest path is minhash over adjacency SETS
    * (the C2 machinery on neighbor lists), not this exact join.
    */
  def neighborJaccard(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      minCommon: Long,
      k: Int): DataFrame = {
    val half = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
    val adj = half.select(col("a").as("c"), col("b").as("n"))
      .unionAll(half.select(col("b").as("c"), col("a").as("n")))
    val deg = adj.groupBy(col("n").as("node")).agg(count(lit(1)).as("deg"))
    // pin the apex join's parallelism — Σdeg² fan-out defeats AQE's
    // bytes-based coalescing (2-task 1.5 s stage measured; r16-opt).
    // The ONE byJoinKey call site that A/B-measured as a win (2.32 vs
    // 2.56 s): the pair table is consumed once, so the pinned layout's
    // per-task overhead is paid once and the fat-stage saving dominates
    val adjK = graft.operators.FanOut.byJoinKey(adj, col("c"))
    val pairs = adjK.join(adjK.withColumnRenamed("n", "m"), "c")
      .where(col("n") < col("m"))
      .groupBy(col("n").as("node_a"), col("m").as("node_b"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCommon)
    pairs
      .join(deg.withColumnRenamed("node", "node_a").withColumnRenamed("deg", "deg_a"), "node_a")
      .join(deg.withColumnRenamed("node", "node_b").withColumnRenamed("deg", "deg_b"), "node_b")
      .select(col("node_a"), col("node_b"), col("n_common"),
        col("deg_a"), col("deg_b"),
        (col("n_common").cast("double")
          / (col("deg_a") + col("deg_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("node_a"), col("node_b"))
      .limit(k)
  }

  /** Undirected co-occurrence edges: nodes sharing a group (parts in the
    * same order, docs with the same shingle). One ordinary equi
    * self-join on the group key — co-partitioned, so a single exchange
    * per side; per-group cost is quadratic in group size (bounded by
    * lines-per-order-style group cardinality, NOT corpus size).
    * Emits each undirected edge once (`node_a < node_b`), deduped.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, nodeCol: String): DataFrame = {
    // NOT FanOut.byJoinKey-pinned (r16-opt A/B): AQE's bytes-based
    // coalescing does shrink the pair stage to ~3 tasks at sf0.1, but
    // pinning it at 32 was a measured WASH for bfs (4.25 vs 4.29 s) and
    // a net LOSS for pagerank (4.22 vs 3.88) and triangles (2.16 vs
    // 1.52) — every downstream iteration re-reads the wider layout and
    // pays per-task overhead that exceeds the fat-stage saving. The
    // undersizing is a small-bytes × big-fan-out regime that vanishes
    // at scale (a 100 TB slim shuffle is already wide by bytes).
    val slim = df.select(col(groupCol).as("__g"), col(nodeCol).as("__n"))
      .where(col("__g").isNotNull && col("__n").isNotNull)
    slim.join(slim.withColumnRenamed("__n", "__m"), "__g")
      .where(col("__n") < col("__m"))
      .select(col("__n").as("node_a"), col("__m").as("node_b"))
      .distinct()
  }
}
