package graft

import org.apache.spark.sql.functions._
import graft.operators.graph.Graph

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def src(v: Long) = spark.range(1).select(lit(v).as("node"))

  private def hops(edges: Seq[(Long, Long)], from: Long, maxHops: Int) =
    Graph.bfsHops(edges.toDF("a", "b"), "a", "b", src(from), maxHops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("chain graph: hops count up; beyond maxHops is absent") {
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(hops(chain, 1L, 3) == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("first discovery wins: diamond graph yields min-hop, not path-dependent values") {
    // 1-2, 1-3, 2-4, 3-4, 4-5 plus a long detour 2-6, 6-5: node 5 is
    // reachable in 3 via the diamond and in 3 via the detour; node 4 must
    // be 2 (never 3 via 1-2-6-...), node 6 must be 2
    val g = Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 5L, 2L -> 6L, 6L -> 5L)
    assert(hops(g, 1L, 4) ==
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3, 6L -> 2))
  }

  test("edges are undirected regardless of stored orientation") {
    // all edges stored pointing AT the source; traversal must still leave it
    assert(hops(Seq(2L -> 1L, 3L -> 2L), 1L, 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("maxHops 0 returns just the source; disconnected components stay absent") {
    val g = Seq(1L -> 2L, 8L -> 9L)
    assert(hops(g, 1L, 0) == Map(1L -> 0))
    assert(hops(g, 1L, 5) == Map(1L -> 0, 2L -> 1))
  }

  test("cycles terminate: BFS on a ring visits each node once at min distance") {
    val ring = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    assert(hops(ring, 1L, 10) == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1))
  }

  test("coOccurrenceEdges: one deduped a<b edge per node pair sharing a group") {
    val df = Seq(
      ("g1", 1L), ("g1", 2L), ("g1", 3L),
      ("g2", 2L), ("g2", 3L), // duplicate pair (2,3) across groups
      ("g3", 5L), // singleton group: no edges
      (null.asInstanceOf[String], 7L) // null group dropped
    ).toDF("g", "n")
    val got = Graph.coOccurrenceEdges(df, "g", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("dedupEdges=false is result-identical, even on inputs WITH duplicate edges") {
    // duplicates + both orientations of the same pair: the per-hop
    // frontier distinct must absorb them, so skipping the symmetrized
    // dedupe can never change the answer — only the join input size
    val noisy = Seq(1L -> 2L, 1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 3L -> 4L)
    val clean = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val expected = Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)
    for (edges <- Seq(noisy, clean)) {
      val got = Graph
        .bfsHops(edges.toDF("a", "b"), "a", "b", src(1L), 3, dedupEdges = false)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected)
    }
  }

  test("two-frontier exclusion parity: random graphs match an in-memory reference BFS") {
    // the per-hop anti-join excludes only the last TWO frontiers (valid
    // on undirected graphs); parity with a classic full-visited BFS on
    // seeded random graphs guards that bound — including re-reachable
    // nodes via odd/even cycles, multiple components, self-loops
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(140)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val maxHops = 4
      // reference: queue BFS with a full visited set
      val expected = scala.collection.mutable.Map(0L -> 0)
      var ring = Set(0L)
      for (h <- 1 to maxHops) {
        ring = ring.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(expected.contains)
        ring.foreach(v => expected(v) = h)
      }
      val got = Graph
        .bfsHops(edges.toDF("a", "b"), "a", "b", src(0L), maxHops)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected.toMap, s"trial $trial")
    }
  }

  test("pageRank: bit-exact parity with an in-memory quantized reference") {
    // reference runs the IDENTICAL recurrence (contributions quantized
    // to the 1e-15 grid as floor(c*1e15 + 0.5) Long, IEEE double
    // everything else) — equality is EXACT, proving the distributed sum
    // is order-free
    def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
      val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size }
      val n = deg.size
      var rank: Map[Long, Double] = deg.map { case (k, _) => k -> 1.0 / n }
      for (_ <- 1 to iters) {
        val contribs = sym.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (u, _) =>
            math.floor(rank(u) / deg(u) * 1.0e15 + 0.5).toLong
          }.sum
        }
        rank = deg.map { case (v, _) =>
          v -> (0.15 / n + 0.85 * (contribs.getOrElse(v, 0L).toDouble / 1.0e15))
        }
      }
      rank
    }
    val rnd = new scala.util.Random(7)
    // includes duplicate edges (multigraph weights) and a self-loop
    val edges = Seq.fill(60)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong)) ++
      Seq(3L -> 5L, 3L -> 5L, 9L -> 9L)
    for (iters <- Seq(1, 3)) {
      val got = Graph.pageRank(edges.toDF("a", "b"), "a", "b", iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expected = ref(edges, iters)
      assert(got.keySet == expected.keySet)
      got.foreach { case (k, v) =>
        assert(v == expected(k), s"node $k iters $iters: $v != ${expected(k)}")
      }
    }
  }

  test("triangleCounts: parity with an in-memory reference on random multigraphs") {
    // reference: per node, count adjacent neighbor pairs — dup edges and
    // self-loops in the input must not matter (simple-graph semantics)
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(160)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
        Seq(2L -> 2L, 5L -> 7L, 7L -> 5L, 5L -> 7L) // self-loop + dup + both orientations
      val adj = edges.filter(e => e._1 != e._2)
        .flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val expected = adj.map { case (u, nbrs) =>
        u -> nbrs.toSeq.combinations(2).count { case Seq(v, w) =>
          adj.getOrElse(v, Set.empty).contains(w)
        }.toLong
      }.filter(_._2 > 0)
      val got = Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("triangleCounts: hub graph — star alone has none, closing rim edges creates them") {
    // star 0—{1..10}: zero triangles (no rim edges); then close 1—2 and
    // 3—4: exactly two triangles, hub in both, rim nodes in one each.
    // Also pins the degree orientation: the hub (max degree) is always
    // the ≺-largest endpoint, so it emits NO wedges itself.
    val star = (1L to 10L).map(0L -> _)
    assert(Graph.triangleCounts(star.toDF("a", "b"), "a", "b").count() == 0)
    val closed = star ++ Seq(1L -> 2L, 3L -> 4L)
    val got = Graph.triangleCounts(closed.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("pageRank: mass conserves and degree orders centrality on a star") {
    // star: center 0 with 8 leaves; center must outrank every leaf,
    // leaves (structurally identical) must tie exactly; total mass ~ 1
    val star = (1L to 8L).map(0L -> _)
    val got = Graph.pageRank(star.toDF("a", "b"), "a", "b", 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val leafRanks = (1L to 8L).map(got)
    assert(leafRanks.distinct.size == 1)
    assert(got(0L) > leafRanks.head)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("co-purchase hop 1 equals the directly computed neighbor set (sf0.001)") {
    val li = sources.Snapshot(spark, sf()).lineitem
    val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    val s = li.agg(min(col("l_partkey")).as("node"))
    val got = Graph.bfsHops(edges, "node_a", "node_b", s, 1)
    val srcKey = s.collect().head.getLong(0)
    // independent derivation: partners of any order containing srcKey
    val orders = li.where(col("l_partkey") === srcKey)
      .select(col("l_orderkey")).distinct()
    val expected = li.join(orders, "l_orderkey")
      .where(col("l_partkey") =!= srcKey)
      .select(col("l_partkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val gotHop1 = got.where(col("hops") === 1).collect().map(_.getLong(0)).toSet
    assert(gotHop1 == expected)
    assert(got.where(col("hops") === 0).collect().map(_.getLong(0)).toSeq == Seq(srcKey))
  }

  test("neighborJaccard: hand-derived similarities; minCommon cap; ordering") {
    // edges 1-2, 1-3, 2-3, 2-4, 3-4:
    // N(1)={2,3} N(2)={1,3,4} N(3)={1,2,4} N(4)={2,3}
    // (1,4): common {2,3} -> j = 2/(2+2-2) = 1.0
    // (2,3): common {1,4} -> j = 2/(3+3-2) = 0.5; all others share < 2
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("node_a", "node_b")
    val got = graft.operators.graph.Graph
      .neighborJaccard(edges, "node_a", "node_b", 2L, 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq((1L, 4L, 2L, 2L, 2L, 1.0), (2L, 3L, 2L, 3L, 3L, 0.5)))
  }
}
