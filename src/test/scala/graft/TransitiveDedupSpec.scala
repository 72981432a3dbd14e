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

  test("long chain converges within iteration budget") {
    // propagation is one hop per round: a 12-chain needs 11 rounds
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = TransitiveDedup.components(chain, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
  }
}
