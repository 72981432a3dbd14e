package graft

import org.apache.spark.sql.functions._

import graft.operators.text.LangModel
import graft.sources.Snapshot

/** LM quality signal: the ln-based `avg_nll` is gated here by ANALYTIC
  * planted cases (hand-computed count tables ⇒ closed-form NLL), per the
  * q_text_entropy protocol — the oracle hashes only the IEEE-exact
  * companions (counts, oov_rate, model_sig).
  */
class LangModelSpec extends SparkSpecBase {
  import spark.implicits._

  private val Tol = 2e-9 // 9-digit per-token rounding ⇒ avg error < 1e-9

  test("planted analytic scores: interpolated bigram, OOV, model_sig") {
    // train "a b a b a": c(a)=3 c(b)=2 N=5 V=2; cb(a,b)=cb(b,a)=2, cc=2
    val train = Seq((0L, "a b a b a")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "zz qq")).toDF("doc_id", "text")
    val out = LangModel.scoreNll(docs, train, "doc_id", "text")
      .orderBy("doc_id").collect()

    // doc 1: p(a)=4/8=0.5; p(b|a)=0.7·(2/2)+0.3·(3/8)=0.8125
    val exp1 = (math.log(2.0) - math.log(0.8125)) / 2.0
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 0L)
    assert(out(0).getDouble(3) == 0.0)
    assert(math.abs(out(0).getDouble(5) - exp1) < Tol, out(0).getDouble(5))

    // doc 2 (all OOV): every p = 1/8 ⇒ avg_nll = ln 8
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 2L)
    assert(out(1).getDouble(3) == 1.0)
    assert(math.abs(out(1).getDouble(5) - math.log(8.0)) < Tol, out(1).getDouble(5))

    // model_sig = md5 of the position-ordered cb:cc:cu triples
    def sig(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out(0).getString(4) == sig("0:0:3,2:2:2"))
    assert(out(1).getString(4) == sig("0:0:0,0:0:0"))
  }

  test("uniform vocab: closed-form NLL (the planted judge case)") {
    // 5 one-word train docs, no bigrams anywhere: every scored token gets
    // p = (1+1)/(5+5+1) ⇒ avg_nll = ln(11/2) exactly
    val train = (1 to 5).map(i => (i.toLong, s"u$i")).toDF("doc_id", "text")
    val docs = Seq((100L, "u1 u2 u3")).toDF("doc_id", "text")
    val r = LangModel.scoreNll(docs, train, "doc_id", "text").head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 0L)
    assert(math.abs(r.getDouble(5) - math.log(5.5)) < Tol, r.getDouble(5))
  }

  test("train == corpus: zero OOV by construction, deterministic sig") {
    val docs = Snapshot(spark, sf()).documents.where(col("text").isNotNull)
    val a = LangModel.scoreNll(docs, docs, "doc_id", "text")
    assert(a.where(col("n_oov") =!= 0L).count() == 0L)
    assert(a.where(col("avg_nll") <= 0.0 || col("avg_nll").isNull).count() == 0L)
    val b = LangModel.scoreNll(docs, docs, "doc_id", "text")
    assert(a.orderBy("doc_id").collect().toSeq == b.orderBy("doc_id").collect().toSeq)
  }

  test("held-out scoring: scores stay finite, oov_rate is the exact ratio") {
    val docs = Snapshot(spark, sf()).documents.where(col("text").isNotNull)
    val out = LangModel.scoreNll(docs, docs.where(col("doc_id") % 4 === 0),
      "doc_id", "text")
    assert(out.count() == docs.count())
    assert(out.where(col("avg_nll").isNull || isnan(col("avg_nll"))).count() == 0L)
    // NOTE: the synthetic corpus's 25% slice can cover the whole
    // vocabulary (measured: it does at sf0.001), so corpus-level OOV > 0
    // is NOT asserted — the OOV path is gated by the all-OOV plant above
    val bad = out.where(
      col("oov_rate") =!= col("n_oov").cast("double") / col("n_tokens").cast("double"))
    assert(bad.count() == 0L)
    intercept[IllegalArgumentException] {
      LangModel.scoreNll(docs, docs, "doc_id", "text", lambda = 1.0)
    }
  }
}
