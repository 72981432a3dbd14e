package graft


import graft.operators.dedup.TransitiveDedup

class TransitiveDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("components merge chains transitively") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = TransitiveDedup.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
  }

  test("dedupe keeps one doc per component plus untouched docs") {
    val docs = (1L to 12L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val survivors = TransitiveDedup.dedupe(docs, "doc_id", pairs)
      .as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 12L))
  }

  test("dedupeKeepBest keeps the highest-scored member of each component") {
    import org.apache.spark.sql.functions.col
    // component {1,2,3}: doc 2 has the best score and must survive even
    // though keep-first would pick doc 1; component {10,11}: tie on score
    // -> lowest id 10; docs 4,5 have no edges and are untouched
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5), (4L, 0.1), (5L, 0.8),
      (10L, 0.7), (11L, 0.7)
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val survivors = TransitiveDedup
      .dedupeKeepBest(docs, "doc_id", pairs, col("score"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(2L, 4L, 5L, 10L))
  }

  test("100-node chain closes in O(log n) rounds, not O(n)") {
    // the pathological shape for min-label propagation (one hop per
    // round => 99 rounds); large/small-star contraction must close it in
    // ~log2(100) — the round count is the pinned contract
    val chain = (1L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = TransitiveDedup.componentsWithRounds(chain)
    val comp = labels.as[(Long, Long)].collect().toMap
    assert(comp.size == 100 && comp.values.toSet == Set(1L))
    assert(rounds <= 10, s"a 100-chain took $rounds rounds — the O(log n) contract is broken")
  }

  test("adversarial shapes: descending chain, star onto max id, self-pairs, duplicate edges") {
    // descending ids (the min sits at the chain's far end), a star whose
    // hub is the LARGEST id (every spoke must relabel the hub), a
    // self-pair-only node (must still emit a row), duplicated +
    // mirrored edges (must not double anything)
    val pairs = (
      (100L to 109L).sliding(2).map(s => (s(1), s(0))).toSeq // 109~108 … 101~100
        ++ Seq((50L, 20L), (50L, 21L), (50L, 22L), (50L, 23L)) // hub 50 > spokes
        ++ Seq((7L, 7L)) // self-pair only
        ++ Seq((20L, 50L), (20L, 50L)) // mirror + duplicate
      ).toDF("id_a", "id_b")
    val comp = TransitiveDedup.components(pairs).as[(Long, Long)].collect()
    assert(comp.length == comp.map(_._1).distinct.length, "one row per id")
    val m = comp.toMap
    assert((100L to 109L).forall(m(_) == 100L))
    assert(Seq(50L, 20L, 21L, 22L, 23L).forall(m(_) == 20L))
    assert(m(7L) == 7L)
  }
}
