package graft

import org.apache.spark.sql.functions._

import graft.operators.dedup.{PrefixFilter, Shingling}
import graft.sources.Snapshot

/** Prefix-filtered set-similarity join: completeness is the theorem the
  * operator rests on (Bayardo WWW'07 — a J >= tau pair shares a token in
  * BOTH rarest-first prefixes), so the spec's core gate is exact
  * equality with the exhaustive shared-shingle derivation on the REAL
  * corpus, plus analytic boundary plants at J = 0.6 exactly.
  */
class PrefixFilterSpec extends SparkSpecBase {
  import spark.implicits._

  private def exhaustive(df: org.apache.spark.sql.DataFrame, tau: Double) = {
    val exploded = df.where(col("text").isNotNull)
      .select(col("doc_id").as("id"),
        explode(array_distinct(Shingling.shingleHashes(col("text"), 3))).as("s"))
    val pairs = exploded.select(col("s"), col("id").as("id_a"))
      .join(exploded.select(col("s"), col("id").as("id_b")), Seq("s"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    Shingling.verifyJaccard(pairs, df, "doc_id", "text", 3)
      .where(col("jaccard") >= tau)
  }

  test("equals the exhaustive shared-shingle derivation on the real corpus") {
    val docs = Snapshot(spark, sf()).documents.localCheckpoint(true)
    for (tau <- Seq(0.5, 0.6, 0.9)) {
      val got = PrefixFilter.duplicatePairs(docs, "doc_id", "text", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = exhaustive(docs, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want && got.nonEmpty, s"tau=$tau: ${got.size} vs ${want.size}")
    }
  }

  test("analytic boundary: J = 30/50 = 0.6 exactly is kept, 29/51 is dropped") {
    // m distinct words, twin shares t-word prefix => J = (t-2)/(2(m-2)-(t-2))
    def pair(flavor: String, m: Int, t: Int): Seq[(Long, String)] = {
      val base = if (flavor == "x") 7000L else 8000L
      val w = (1 to m).map(i => s"zp$flavor-w$i")
      val twin = w.take(t) ++ ((t + 1) to m).map(i => s"zp$flavor-f$i")
      Seq((base, w.mkString(" ")), (base + 1, twin.mkString(" ")))
    }
    val docs = (pair("x", m = 42, t = 32) ++ pair("y", m = 42, t = 31))
      .toDF("doc_id", "text")
    val got = PrefixFilter.duplicatePairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((7000L, 7001L, 30.0 / 50.0)), got) // 29/51 < 0.6 excluded
  }

  test("prefix-length bound never exceeds the exact ceil (IEEE overshoot guard)") {
    // ceil(n*tau) on raw doubles overshoots the exact integer for 530
    // (tau, n) pairs under n=200 (e.g. tau=0.28, n=25: exact 7, IEEE 8),
    // which would SHORTEN the prefix and break completeness; the
    // deflated form must sit in [exact-1, exact] — never above (lost
    // pairs), at most one below (one extra prefix element, harmless)
    val taus = Seq(0.07, 0.14, 0.28, 0.33, 0.5, 0.56, 0.6, 0.66, 0.9, 1.0)
    val ns = (1 to 200).map(_.toLong)
    val df = ns.toDF("n")
    for (tau <- taus) {
      val got = df.select(col("n"),
        ceil(col("n").cast("double") * lit(tau) * lit(1.0 - 1e-12)).as("alpha"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ns.foreach { n =>
        val exact = (BigDecimal(tau) * BigDecimal(n))
          .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
        assert(got(n) <= exact, s"tau=$tau n=$n alpha=${got(n)} > exact $exact")
        assert(got(n) >= exact - 1, s"tau=$tau n=$n alpha=${got(n)} << exact $exact")
      }
    }
  }

  test("tau = 1 reduces to exact duplicates; candidates shrink vs exhaustive") {
    val docs = Snapshot(spark, sf()).documents.limit(200)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val twin = docs.limit(5)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val corpus = docs.unionByName(twin).where(col("text").isNotNull)
    val exact = PrefixFilter.duplicatePairs(corpus, "doc_id", "text", 1.0)
      .where(col("id_b") >= 100000L && col("id_a") === col("id_b") - 100000L)
    assert(exact.count() == 5L)
    // the reduction the filter buys: strictly fewer candidate pairs than
    // the shared-ANY-shingle rule on the same corpus
    val (pref, exh) = PrefixFilter.candidateCounts(corpus, "doc_id", "text", 0.6)
    assert(pref < exh, s"prefix $pref vs exhaustive $exh")
  }
}
