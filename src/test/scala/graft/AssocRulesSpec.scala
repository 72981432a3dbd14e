package graft

import graft.operators.mining.AssocRules

class AssocRulesSpec extends SparkSpecBase {
  import spark.implicits._

  // baskets: {A,B,C}, {A,B}, {A,B}, {B,C}, {A} → N=5,
  // counts A=4 B=4 C=2, pairs (A,B)=3 (A,C)=1 (B,C)=2
  private val rows = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "B"), (3L, "B"), // dup (basket, item) row: presence semantics
    (4L, "B"), (4L, "C"),
    (5L, "A")
  )

  private def run(minPair: Long) =
    AssocRules.rules(rows.toDF("bk", "item"), "bk", "item", minPair)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

  test("hand-computed support/confidence/lift, both rule directions, exact doubles") {
    val got = run(2)
    // (A,C) pair_count 1 < 2 drops; both directions of (A,B) and (B,C) survive
    assert(got.keySet == Set("A" -> "B", "B" -> "A", "B" -> "C", "C" -> "B"))
    assert(got("A" -> "B") == ((3L, 3.0 / 5, 3.0 / 4, 15.0 / 16)))
    assert(got("B" -> "A") == ((3L, 3.0 / 5, 3.0 / 4, 15.0 / 16)))
    assert(got("B" -> "C") == ((2L, 2.0 / 5, 2.0 / 4, 10.0 / 8)))
    // C appears in 2 baskets, both with B: confidence(C→B) = 2/2 = 1
    assert(got("C" -> "B") == ((2L, 2.0 / 5, 2.0 / 2, 10.0 / 8)))
  }

  test("minPairCount=1 admits the rare pair; confidence is directional there") {
    val got = run(1)
    assert(got.keySet.size == 6)
    // A→C: 1/4 vs C→A: 1/2 — direction matters
    assert(got("A" -> "C")._3 == 1.0 / 4)
    assert(got("C" -> "A")._3 == 1.0 / 2)
    // lift symmetric and < 1 for the anti-correlated pair
    assert(got("A" -> "C")._4 == got("C" -> "A")._4)
    assert(got("A" -> "C")._4 == 5.0 / 8)
  }

  test("null basket and null item rows are dropped") {
    val noisy = rows.map { case (b, i) => (Option(b), i) } ++
      Seq((None: Option[Long], "A"), (Some(9L), null: String))
    val got = AssocRules.rules(noisy.toDF("bk", "item"), "bk", "item", 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "B") -> 3L, ("B", "A") -> 3L, ("B", "C") -> 2L, ("C", "B") -> 2L))
  }
}
