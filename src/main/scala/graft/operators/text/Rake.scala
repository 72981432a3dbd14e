package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al. 2010) over a document corpus
  * (C69): candidate phrases are maximal runs of non-stopword tokens;
  * each word scores degree/frequency over the phrase-instance corpus
  * (freq = occurrences in phrases, degree = Σ length of the phrases it
  * occurs in — words that live in long multi-word phrases outrank
  * isolated frequent words), and a phrase scores the sum of its member
  * word scores. The classic unsupervised key-phrase pass of a
  * training-data pipeline (topic surfacing, dataset cards).
  *
  * Determinism contract (SURVEY §5): freq/degree are exact BIGINTs;
  * each word score is ONE IEEE division of exact ints; a phrase score
  * folds its member scores in POSITION order (0.0-init sequential
  * fold == DuckDB's init-less `list_reduce` over the position-ordered
  * list — 0.0 + x is exact, the cosine convention), so identical
  * doubles arise in both engines and the top-k order (score DESC,
  * phrase ASC) needs no margin audit — exact-double ties break on the
  * phrase string. Scores hash UNROUNDED.
  *
  * The stopword set is the SHARED langid EN marker list
  * ([[TextStats]]'s `the/a/is/of/and`) — one definition with the
  * quality/langid oracles, deliberately tiny (the contract is
  * mirror-ability, not linguistic coverage; callers pass a richer
  * list at will, and the oracle re-derives with the same literal set).
  *
  * Scale shape: one token explode fused into the scan; the islands
  * anchor (pos − row_number over non-stop tokens) is a per-DOC window
  * (bounded by document length — the sessionize per-key bound); word
  * stats are partial-aggregated on the slim (word) spine; the phrase
  * fold joins word scores back through one phrase-word explode; the
  * global top-k is TakeOrderedAndProject, never a full sort.
  */
object Rake {

  val DefaultStopwords: Seq[String] = Seq("the", "a", "is", "of", "and")

  /** Top-k phrase types: (rank, phrase, n_words, n_occurrences, score).
    * NULL texts drop; tokens split on single spaces of the lowercased
    * text (the corpus convention); empty tokens count as boundaries.
    */
  def topPhrases(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = df
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("__pos", "__w")))
    val content = toks
      .where(!col("__w").isInCollection(stopwords) && col("__w") =!= "")
    // gaps-islands anchor: consecutive content positions share one id
    val wDoc = Window.partitionBy(col("__doc")).orderBy(col("__pos"))
    val phrases = content
      .withColumn("__isl", col("__pos") - row_number().over(wDoc))
      .groupBy(col("__doc"), col("__isl"))
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__w")))),
        e => e.getField("__w")).as("__ws"))
      .select(col("__ws"), size(col("__ws")).as("__len"),
        array_join(col("__ws"), " ").as("phrase"))
    // word stats over phrase INSTANCES: freq = occurrences, degree =
    // Σ phrase length (a word twice in one phrase contributes twice)
    val wordStats = phrases
      .select(explode(col("__ws")).as("__w"), col("__len"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .withColumn("__score",
        col("__deg").cast("double") / col("__freq").cast("double"))
    // phrase TYPE grain: occurrences collapse, the score folds member
    // word scores in position order (deterministic sequential sum)
    val typed = phrases
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        first(col("__ws")).as("__ws"),
        first(col("__len")).as("__len"))
    val scored = typed
      .select(col("phrase"), col("n_occurrences"), col("__len"),
        posexplode(col("__ws")).as(Seq("__wpos", "__w")))
      .join(wordStats.select(col("__w"), col("__score")), "__w")
      .groupBy(col("phrase"), col("n_occurrences"), col("__len"))
      .agg(aggregate(
        transform(
          array_sort(collect_list(struct(col("__wpos"), col("__score")))),
          e => e.getField("__score")),
        lit(0.0), (acc, x) => acc + x).as("score"))
    val ranked = scored
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
    val wRank = Window.orderBy(col("score").desc, col("phrase"))
    ranked
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .select(col("rank"), col("phrase"), col("__len").cast("long").as("n_words"),
        col("n_occurrences"), col("score"))
      .orderBy("rank")
  }
}
