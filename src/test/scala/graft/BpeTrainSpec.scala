package graft

import org.apache.spark.sql.functions._

import graft.operators.text.{Bpe, BpeTable}

/** Distributed BPE merge-table TRAINING (Sennrich et al., ACL 2016,
  * learn_bpe): the gates are analytic — the planted corpus's pair
  * frequencies are hand-countable, so the expected merge sequence is
  * derived on paper from the (count DESC, pair ASC) rule, independent of
  * the training loop's implementation. Tie rounds are exercised on
  * purpose (rounds 1, 3, 5, 6 of the classic corpus each tie).
  */
class BpeTrainSpec extends SparkSpecBase {
  import spark.implicits._

  // the classic BPE teaching corpus: low:5 lower:2 newest:6 widest:3,
  // each occurrence its own doc so every pre-token is the bare word
  private def sennrich = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  // hand derivation (adjacent-position pair counts, count DESC / pair ASC):
  //  r0: es=9 ties st=9  -> (e,s)   ["e"<"s"]
  //  r1: (es,t)=9        -> (es,t)
  //  r2: lo=7 ties ow=7  -> (l,o)   ["l"<"o"]
  //  r3: (lo,w)=7        -> (lo,w)
  //  r4: ew=ne=(w,est)=6 -> (e,w)   ["e"<"n"<"w"]
  //  r5: (ew,est) ties (n,ew) at 6 -> (ew,est) ["ew"<"n"]
  private val expected6 = Vector(
    "e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w", "e" -> "w", "ew" -> "est")

  test("recovers the hand-derived merge sequence, ties included") {
    assert(Bpe.train(sennrich, "text", 6) == expected6)
  }

  test("runs to exhaustion and stops when no pair reaches minPairCount") {
    // continuing the derivation by hand: r6 (n,ewest)=6; r7 (d,est)=3;
    // r8 (i,dest)=3; r9 (w,idest)=3; r10 (e,r)=2 [ties (low,e),
    // "e"<"low"]; r11 (low,er)=2; then every word is a single token
    val all = Bpe.train(sennrich, "text", 50)
    assert(all.size == 12)
    assert(all.take(6) == expected6)
    assert(all.drop(6) == Vector(
      "n" -> "ewest", "d" -> "est", "i" -> "dest", "w" -> "idest",
      "e" -> "r", "low" -> "er"))
    // with the exhausted table every corpus word is ONE learned token
    val t = new BpeTable(all)
    assert(t.encode("low").toSeq == Seq(256 + 3))
    assert(t.encode("newest").toSeq == Seq(256 + 6))
    assert(t.encode("widest").toSeq == Seq(256 + 9))
    assert(t.encode("lower").toSeq == Seq(256 + 11))
  }

  test("minPairCount prunes the singleton tail") {
    // raising the floor to 3 cuts training before the count-2 merges
    val m = Bpe.train(sennrich, "text", 50, minPairCount = 3L)
    assert(m.size == 10 && m.take(6) == expected6)
  }

  test("trained table round-trips arbitrary text (byte-level theorem)") {
    val t = new BpeTable(Bpe.train(sennrich, "text", 8))
    val tricky = Seq(
      "lowest newest widow", "the quick brown fox", "naïve café — résumé",
      "tabs\tand\nnewlines  double  spaces", "emoji 😀 and 中文",
      "", "w", "'s contraction's")
    tricky.foreach(s => assert(t.decode(t.encode(s)) == s, s"roundtrip '$s'"))
  }

  test("training on real corpus text is deterministic and self-consistent") {
    val docs = graft.sources.Snapshot(spark, sf()).documents
      .where(col("text").isNotNull)
    val a = Bpe.train(docs, "text", 10)
    val b = Bpe.train(docs, "text", 10)
    assert(a == b && a.size == 10)
    // the learned table validates (formable sides, unique products) and
    // compresses the corpus it was trained on
    val t = new BpeTable(a)
    val sample = docs.orderBy("doc_id").limit(30).select("text").collect().map(_.getString(0))
    sample.foreach(s => assert(t.decode(t.encode(s)) == s))
    val toks = sample.map(s => t.encode(s).length.toLong).sum
    val bytes = sample.map(_.getBytes("UTF-8").length.toLong).sum
    assert(toks < bytes, s"learned merges never fire: $toks tokens vs $bytes bytes")
  }

  test("pre-token expression is lossless (concat of pre-tokens == input)") {
    val df = Seq("the  spark   table", " leading space", "tab\there", "a'sb")
      .toDF("text")
    val bad = df.where(
      concat_ws("", Bpe.preTokens(col("text"))) =!= col("text")).count()
    assert(bad == 0)
  }
}
