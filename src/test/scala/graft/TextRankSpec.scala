package graft

import graft.operators.text.TextStats

class TextRankSpec extends SparkSpecBase {
  import spark.implicits._

  test("bm25: more matched terms beat fewer at equal length; rarity raises idf weight") {
    val docs = Seq(
      (1L, "spark join stream pad1 pad2"), // all three terms
      (2L, "spark join pad1 pad2 pad3"), // two
      (3L, "spark pad1 pad2 pad3 pad4"), // one, common term
      (4L, "rare1 pad1 pad2 pad3 pad4"), // the rare term (df=1)
      (5L, "filler pad1 pad2 pad3 pad4"),
      (6L, "filler pad1 pad2 pad3 pad4")
    ).toDF("doc_id", "text")
    val got = TextStats.bm25Scored(docs, "doc_id", "text", Seq("spark", "join", "stream", "rare1"))
      .collect().map(r => r.getLong(1) -> ((r.getLong(0), r.getLong(2), r.getDouble(3)))).toMap
    // identical doc lengths: more matched terms strictly dominates
    assert(got(1L)._1 < got(2L)._1 && got(2L)._1 < got(3L)._1)
    assert(got(1L)._2 == 3L && got(2L)._2 == 2L && got(3L)._2 == 1L)
    // df('rare1')=1 < df('spark')=3 => higher idf => doc 4 outranks doc 3
    assert(got(4L)._1 < got(3L)._1, s"rare-term doc must outrank common-term doc: $got")
    // docs with no query term never appear
    assert(!got.contains(5L) && !got.contains(6L) && got.size == 4)
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    val docs = Seq(
      (1L, "spark a b"),
      (2L, "spark a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val got = TextStats.bm25Scored(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got(1L) > got(2L), s"shorter doc must score higher at equal tf: $got")
  }

  test("bm25 synonyms: AND-of-concepts filters, max-within-group scores, absent synonyms are inert") {
    val docs = Seq(
      (1L, "join stream pad1 pad2 pad3"), // both concepts, one synonym each
      (2L, "merge batch pad1 pad2 pad3"), // both concepts, other synonyms
      (3L, "join merge stream pad1 pad2"), // two synonyms of concept 1 -> MAX, not sum
      (4L, "join pad1 pad2 pad3 pad4"), // concept 2 unmatched -> filtered out
      (5L, "stream pad1 pad2 pad3 pad4") // concept 1 unmatched -> filtered out
    ).toDF("doc_id", "text")
    val concepts = Seq(Seq("join", "merge"), Seq("stream", "batch", "ghostterm"))
    val syn = TextStats.bm25SynonymScored(docs, "doc_id", "text", concepts)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(syn.keySet == Set(1L, 2L, 3L), s"AND-of-concepts must filter docs 4 and 5: $syn")
    assert(syn(3L)._1 == 3L, "all matched synonyms count in n_terms_matched")
    // max-within-group: doc 3's concept-1 score is max(join, merge), not
    // their sum — its total must stay BELOW doc 1's + the margin a sum
    // would add (equal lengths, same concept-2 term). Per-term scores
    // derive from the same corpus stats, so compare against the
    // flat-query scorer which SUMS: sum(join, merge, stream) > synonym
    // score for doc 3, while doc 1 (one synonym per concept) is equal.
    val flat = TextStats.bm25Scored(docs, "doc_id", "text",
      Seq("join", "merge", "stream", "batch", "ghostterm"))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(syn(3L)._2 < flat(3L), "doc 3: group max must be strictly below the flat sum")
    assert(syn(1L)._2 == flat(1L), "doc 1: one synonym per concept — max == sum == flat")
  }

  test("ngram counts: exact bigrams, doc frequency, deterministic top-k ties; short docs yield none") {
    val docs = Seq(
      (1L, "a b a b"), // "a b" x2, "b a" x1
      (2L, "a b c"), // "a b", "b c"
      (3L, "z"), // 1 token -> no bigrams
      (4L, "b c")
    ).toDF("doc_id", "text")
    val got = TextStats.ngramCounts(docs, "doc_id", "text", 2, 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "a b", 3L, 2L), // ties on count=3? no: "a b" 3 occurrences over docs 1,2
      (2L, "b c", 2L, 2L),
      (3L, "b a", 1L, 1L)))
  }

  test("ngram counts: trigram arity and the n>size guard") {
    val docs = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextStats.ngramCounts(docs, "doc_id", "text", 3, 10)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a b c", 1L), ("b c d", 1L)))
  }
}
