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

  test("long chain converges within iteration budget") {
    // propagation is one hop per round: a 12-chain needs 11 rounds
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = TransitiveDedup.components(chain, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
  }
}
