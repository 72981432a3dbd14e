package graft

import graft.operators.text.Collocations

class CollocationsSpec extends SparkSpecBase {
  import spark.implicits._

  private def round4(x: Double): Double =
  // the operator rounds with the hashRound floor formula (r12)
    math.floor(x * 10000.0 + 0.5) / 10000.0

  test("analytic corpus: exclusive pair tops independent pairs; exact ties break on (w1, w2)") {
    // five 2-word templates x6 docs each => N = 30 bigrams, all counts known:
    // (epsilon zeta) is EXCLUSIVE (margins 6/6): pmi = ln(6*30/36) = ln(5)
    // the four alpha/gamma x beta/delta pairs all have margins 12/12:
    // pmi = ln(6*30/144) = ln(1.25), an exact 4-way tie -> (w1, w2) order
    val docs = Seq("alpha beta", "gamma delta", "alpha delta", "gamma beta",
      "epsilon zeta").flatMap(t => Seq.fill(6)(t))
    val df = (docs :+ "solo").map(Option(_)).:+(None).toDF("text")
    val got = Collocations.topPmi(df, "text", minCount = 2L, k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    val pmiTop = round4(math.log((6.0 * 30.0) / (6.0 * 6.0)))
    val pmiTie = round4(math.log((6.0 * 30.0) / (12.0 * 12.0)))
    assert(got(0) == ((1, "epsilon", "zeta", 6L, 6L, 6L, 30L, pmiTop)))
    assert(got.drop(1).map(r => (r._1, r._2, r._3, r._8)).toSeq == Seq(
      (2, "alpha", "beta", pmiTie),
      (3, "alpha", "delta", pmiTie),
      (4, "gamma", "beta", pmiTie),
      (5, "gamma", "delta", pmiTie)))
  }

  test("multi-word docs emit every adjacent pair; minCount prunes the tail") {
    // "x y z" x3 => pairs (x,y) and (y,z) each 3 times; "p q" once is
    // below minCount=3 but still counts toward N and margins
    val df = (Seq.fill(3)("x y z") :+ "p q").toDF("text")
    val got = Collocations.topPmi(df, "text", minCount = 3L, k = 10)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(6)))
    assert(got.toSet == Set(("x", "y", 3L, 7L), ("y", "z", 3L, 7L)))
  }

  test("rake: hand-derived degree/freq scores, position-ordered fold, phrase tiebreak") {
    import graft.operators.text.Rake
    // phrases: "big data" x2, "quick fox", "data"
    // freq: big 2, data 3, quick 1, fox 1; deg: big 4, data 5, quick 2, fox 2
    // scores: big data = 2.0 + 5.0/3.0; quick fox = 2.0 + 2.0; data = 5.0/3.0
    val df = Seq(
      (1L, "big data is big data"),
      (2L, "the quick fox"),
      (3L, "a data"))
      .toDF("doc_id", "text")
    val got = Rake.topPhrases(df, "doc_id", "text", 10)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, "quick fox", 2L, 1L, 2.0 + 2.0),
      (2L, "big data", 2L, 2L, 2.0 + 5.0 / 3.0),
      (3L, "data", 1L, 1L, 5.0 / 3.0)))
    // exact-score tie breaks on the phrase string
    val tie = Seq((1L, "alpha beta is gamma delta")).toDF("doc_id", "text")
    val t = Rake.topPhrases(tie, "doc_id", "text", 10).collect()
    assert(t.map(_.getString(1)).toSeq == Seq("alpha beta", "gamma delta"))
    assert(t.map(_.getDouble(4)).distinct.length == 1)
  }
}
