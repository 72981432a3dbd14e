package graft

import graft.operators.text.FuzzyMatch

class FuzzyMatchSpec extends SparkSpecBase {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def pairsOf(words: Seq[String]) =
    FuzzyMatch.editDistance1Pairs(
      words.zipWithIndex.map { case (w, i) => (w, i.toLong + 1) }.toDF("word", "n"),
      "word", "n")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("each edit kind is found: deletion, insertion, substitution") {
    val got = pairsOf(Seq("hello", "hell", "cat", "cut", "cart", "dog"))
    assert(got.contains(("hell", "hello")), "deletion pair")
    assert(got.contains(("cart", "cat")), "insertion pair")
    assert(got.contains(("cat", "cut")), "substitution pair")
    assert(!got.exists(p => p._1 == "dog" || p._2 == "dog"), "dog matches nothing")
  }

  test("shared-deletion-key candidates beyond distance 1 are verified away") {
    // "ab" and "ba" share deletion keys {a, b} but lev = 2 (no
    // transposition in plain Levenshtein) — the verify must reject
    val got = pairsOf(Seq("ab", "ba", "abc"))
    assert(!got.contains(("ab", "ba")))
    assert(got.contains(("ab", "abc")))
  }

  test("exhaustive equality on a seeded random vocab (completeness proof in practice)") {
    val rnd = new scala.util.Random(42)
    val words = Iterator.continually(
      (0 until (3 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      .take(400).toSeq.distinct
    assert(words.size > 50, s"vocab collapsed to ${words.size}")
    val expected = (for {
      a <- words; b <- words
      if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "small-alphabet vocab must have near pairs")
    assert(pairsOf(words) == expected)
  }

  test("counts ride the pair; dist is exactly 1") {
    val df = Seq(("word", 70L), ("ward", 7L)).toDF("word", "n")
    val got = FuzzyMatch.editDistance1Pairs(df, "word", "n").collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4))
      == (("ward", "word", 7L, 70L, 1)))
  }

  test("transitive spelling-variant clusters: chains collapse to the lexicographic min") {
    // cat—cab—cob chain (cat~cob is distance 2, only transitivity
    // links them); dog is a singleton and must be absent
    import org.apache.spark.sql.functions.{col, count, lit}
    val vocab = Seq(("cat", 3L), ("cab", 1L), ("cob", 2L), ("dog", 9L))
      .toDF("word", "n")
    val pairs = FuzzyMatch.editDistance1Pairs(vocab, "word", "n")
      .select(col("w1").as("id_a"), col("w2").as("id_b"))
    val comp = graft.operators.dedup.TransitiveDedup.components(pairs)
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("n_members"))
    val got = comp.join(sizes, "component")
      .collect().map(r => (r.getString(1), r.getString(0), r.getLong(2))).toSet
    assert(got == Set(
      ("cat", "cab", 3L), ("cab", "cab", 3L), ("cob", "cab", 3L)))
  }

  test("sf0.001 catalog q_vocab_clusters: every cluster has >= 2 members sharing one canonical") {
    val rows = SparkEntry.queries("q_vocab_clusters")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val byCanon = rows.groupBy(_.getString(1))
    byCanon.foreach { case (canon, members) =>
      assert(members.length >= 2, s"cluster $canon has ${members.length} members")
      assert(members.forall(_.getLong(2) == members.length.toLong))
      assert(members.map(_.getString(0)).min == canon, "canonical is the min member")
    }
  }

  test("sf0.001 catalog query: planted typos surface as pairs") {
    val rows = SparkEntry.queries("q_fuzzy_vocab")(spark, sf()).collect()
    assert(rows.nonEmpty, "planted doc_id%7 typos must produce pairs at sf0.001")
    assert(rows.forall(_.getInt(4) == 1))
    // every emitted pair really is distance 1
    assert(rows.forall(r => lev(r.getString(0), r.getString(1)) == 1))
  }
}
