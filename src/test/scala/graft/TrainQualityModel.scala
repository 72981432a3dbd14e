package graft

import org.apache.spark.sql.functions._

// One-shot generator for the embedded q_quality_classifier model
// (SparkEntry.qualityModelWeights/Bias): trains the hashed-ngram
// logistic scorer on the synthetic corpus against the STOPWORD-DENSITY
// screen (en-marker ratio >= 0.05 — the CCNet/Gopher LM-quality proxy,
// and the one label on THIS corpus that is both token-derived and
// non-constant: `lang` is pure metadata here — every language shares
// one tech vocabulary, measured unlearnable at any dim — and the rule
// langid consequently predicts 'en' for every doc). Distilling a rule
// screen into a hashed-feature classifier is exactly how fastText
// quality/langid models are produced. Prints the Scala literals to
// embed and reports the is_quality split + label agreement at each SF
// (the q_boilerplate vacuity lesson, checked at generation time).
//
// With a 4th arg `holdout`, trains on the 80% SOURCE slice of the
// leakage-guarded Sampling.groupSplit (md5-deterministic, so the DuckDB
// oracle reproduces the predicate) and reports held-out agreement on
// the 20% complement — the q_classifier_eval_holdout model (VERDICT
// r15 #3).
//
//   sbt "Test/runMain graft.TrainQualityModel [sfDir] [epochs] [lr] [holdout]"
object TrainQualityModel {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val epochs = if (args.length > 1) args(1).toInt else 1000
    val lr = if (args.length > 2) args(2).toDouble else 8.0
    val holdout = args.length > 3 && args(3) == "holdout"
    val spark = GraftSession.local(32)
    val allDocs = graft.sources.Snapshot(spark, sfDir).documents
    val docs =
      if (!holdout) allDocs
      else allDocs.where(graft.operators.sample.Sampling.assignSplit(
        col("source"), Seq("train" -> 0.8, "heldout" -> 0.2)) === "train")
    def srLabel(d: org.apache.spark.sql.DataFrame) = {
      val ws = graft.operators.text.QualityClassifier.tokens(col("text"))
      val stops = size(filter(ws, w =>
        w.isInCollection(graft.operators.text.TextStats.Markers.head._2)))
      d.where(col("text").isNotNull)
        .select(col("doc_id"), col("text"),
          (stops.cast("double") / size(ws).cast("double") >= 0.05).as("lbl"))
        .where(col("lbl").isNotNull)
    }
    val labeled = srLabel(docs)
    val nPos = labeled.where(col("lbl")).count()
    val nAll = labeled.count()
    println(s"[train] corpus $sfDir: $nAll docs, $nPos stopword-dense")
    val (w, b) = graft.operators.text.QualityClassifier
      .train(labeled, "text", "lbl", dim = 64, epochs = epochs, lr = lr)
    println(s"[train] bias = $b")
    println(w.grouped(4).map(_.mkString(", ")).mkString("Seq(\n    ", ",\n    ", ")"))
    // agreement + flag split with the trained model at all three SFs
    // (holdout mode restricts to the held-out source slice: the number
    // a pipeline actually publishes — generalization, not memorization)
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dd0 = graft.sources.Snapshot(spark, s"/root/testdata/$d").documents
      val dd =
        if (!holdout) dd0
        else dd0.where(graft.operators.sample.Sampling.assignSplit(
          col("source"), Seq("train" -> 0.8, "heldout" -> 0.2)) === "heldout")
      val scored = graft.operators.text.QualityClassifier
        .scoreWithModel(dd, "doc_id", "text", w, b)
      val lab = srLabel(dd).select("doc_id", "lbl")
      val j = scored.join(lab, "doc_id")
      val n = j.count()
      val agree = j.where(col("is_quality") === col("lbl")).count()
      val flagged = j.where(col("is_quality")).count()
      val tag = if (holdout) "held-out" else "in-sample"
      println(f"[train] $d ($tag): n=$n flagged=$flagged agree=${agree.toDouble / n}%.3f")
    }
    spark.stop()
  }
}
