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
