package graft

import graft.operators.text.QualityClassifier
import org.apache.spark.sql.functions._

/** Gates for the learned quality classifier (VERDICT r14 #3, the
  * Bpe.train gate pattern): feature-hash parity between the expression
  * and its driver-side twin, scorer fold parity against a hand fold,
  * FIRST-STEP exactness from the zero model (σ(0) = 0.5 exactly, so
  * the gradient is hand-computable through the decimal quantization),
  * planted-separable-corpus recovery, and bit-determinism of training
  * across runs.
  */
class QualityClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketOf expression == driver-side twin over a token sample") {
    val toks = Seq("the", "quick", "brown", "fox", "alpha", "beta", "gamma",
      "delta", "epsilon", "zeta", "的", "straße", "x", "")
      .filter(_.nonEmpty)
    val got = toks.toDF("t")
      .select(col("t"), QualityClassifier.bucketOf(col("t"), 64).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    toks.foreach { t =>
      assert(got(t) == QualityClassifier.bucketOfLocal(t, 64), s"token $t")
    }
  }

  test("scoreWithModel: logit == hand fold in token order; empty-token rows drop") {
    val dim = 8
    val w = Seq(0.5, -0.25, 0.125, 1.0, -1.0, 0.75, -0.5, 0.0625)
    val bias = 0.375
    val df = Seq((1L, "The Quick  brown fox"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = QualityClassifier.scoreWithModel(df, "doc_id", "text", w, bias).collect()
    assert(got.length == 1) // blank and null drop
    val r = got.head
    val toks = "the quick brown fox".split(" ").filter(_.nonEmpty)
    val fold8 = toks.foldLeft(0.0)((a, t) => a + w(QualityClassifier.bucketOfLocal(t, dim)))
    val logit = bias + fold8 / 4.0 // MEAN features: fold, ONE division, one add
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == logit, s"logit ${r.getDouble(2)} vs $logit")
    assert(r.getBoolean(4) == (logit > 0))
    val sig = 1.0 / (1.0 + math.exp(-logit))
    assert(r.getDouble(3) == math.floor(sig * 10000.0 + 0.5) / 10000.0)
  }

  test("first training step from the zero model is exactly the hand-derived gradient") {
    // σ(0) = 0.5 EXACTLY (exp(0) = 1), residuals are ±0.5, per-token
    // contributions are ±0.5/n_tokens (exact at decimal scale 6 for the
    // token counts below), so grad_j = Σ ±0.5/m over token occurrences
    // and grad_bias = 0.5·(n_pos − n_neg) — hand-computable through the
    // decimal quantization (the sums below are exact decimals)
    val dim = 16
    val docs = Seq(
      ("alpha beta", true), ("alpha", true), ("gamma gamma", false))
      .toDF("text", "lbl")
    val (w, b) = QualityClassifier.train(docs, "text", "lbl", dim, epochs = 1, lr = 1.0)
    val grad = Array.fill(dim)(0.0)
    var gb = 0.0
    Seq(("alpha beta", 0.5), ("alpha", 0.5), ("gamma gamma", -0.5)).foreach {
      case (txt, r) =>
        gb += r
        val toks = txt.split(" ")
        toks.foreach(t =>
          grad(QualityClassifier.bucketOfLocal(t, dim)) += r / toks.length)
    }
    assert(b == 1.0 * gb / 3, s"bias $b vs ${gb / 3}")
    (0 until dim).foreach { j =>
      assert(w(j) == 1.0 * grad(j) / 3, s"w($j) = ${w(j)} vs ${grad(j) / 3}")
    }
  }

  test("planted separable corpus: training recovers the split; runs are bit-deterministic") {
    val dim = 64
    val pos = Seq("alpha", "beta", "gamma")
    val neg = Seq("delta", "epsilon", "zeta")
    // the planted signal must not collide across classes in the hash
    // space (deterministic — md5 buckets are fixed)
    val pb = pos.map(QualityClassifier.bucketOfLocal(_, dim)).toSet
    val nb = neg.map(QualityClassifier.bucketOfLocal(_, dim)).toSet
    assert(pb.intersect(nb).isEmpty, s"planted tokens collide: $pb vs $nb")
    val rows = (0 until 30).flatMap { i =>
      Seq((s"${pos(i % 3)} ${pos((i + 1) % 3)} filler$i", true),
        (s"${neg(i % 3)} ${neg((i + 1) % 3)} filler$i", false))
    }.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }
    val docs = rows.toDF("id", "text", "lbl").repartition(7)
    val (w, b) = QualityClassifier.train(docs, "text", "lbl", dim, epochs = 40, lr = 2.0)
    val scored = QualityClassifier.scoreWithModel(docs, "id", "text", w, b)
      .join(docs, "id")
      .select("is_quality", "lbl").collect()
    assert(scored.nonEmpty)
    scored.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1),
      "trained model must separate the planted corpus"))
    // determinism: an independent run on a different partitioning gives
    // the SAME doubles (decimal-quantized gradients are partition-free)
    val (w2, b2) = QualityClassifier.train(docs.repartition(13), "text", "lbl",
      dim, epochs = 40, lr = 2.0)
    assert(b2 == b && w2 == w, "training must be bit-deterministic")
  }

  test("evaluate: hand confusion counts, exact rates, zero-denominator NULLs") {
    val df = Seq(
      (true, true), (true, true), (true, false), // tp tp fp
      (false, true), (false, false), (false, false)) // fn tn tn
      .toDF("p", "y")
    val r = QualityClassifier.evaluate(df, "p", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((6L, 2L, 1L, 1L, 2L)))
    assert(r.getDouble(5) == 4.0 / 6.0) // accuracy
    assert(r.getDouble(6) == 2.0 / 3.0) // prec
    assert(r.getDouble(7) == 2.0 / 3.0) // recall
    val pr = 2.0 / 3.0
    assert(r.getDouble(8) == 2.0 * pr * pr / (pr + pr)) // f1, the operator's own chain
    // never-positive predictor: prec NULL, f1 NULL, recall 0
    val never = Seq((false, true), (false, false)).toDF("p", "y")
    val n = QualityClassifier.evaluate(never, "p", "y").collect().head
    assert(n.isNullAt(6) && n.isNullAt(8) && n.getDouble(7) == 0.0)
  }

  test("embedded catalog model: both classes present on the synthetic corpus at sf0.001") {
    // the q_boilerplate vacuity lesson: a flag nobody trips is not
    // evidence — the shipped model must split THIS corpus
    val docs = graft.sources.Snapshot(spark, sf()).documents
    val scored = QualityClassifier.scoreWithModel(docs, "doc_id", "text",
      SparkEntry.qualityModelWeights, SparkEntry.qualityModelBias)
    val byFlag = scored.groupBy("is_quality").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byFlag.getOrElse(true, 0L) > 0, "no positive docs at sf0.001")
    assert(byFlag.getOrElse(false, 0L) > 0, "no negative docs at sf0.001")
  }
}
