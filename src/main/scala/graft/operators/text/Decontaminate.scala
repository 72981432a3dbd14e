package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.dedup.Shingling

/** Benchmark decontamination: flags corpus documents that share any word
  * n-gram with an evaluation/benchmark set — the standard guard against
  * test-set leakage into LLM training data (no single reference tool does
  * this; it belongs to the large-scale training-pipeline surface the
  * engine adds, like the dedup family).
  *
  * Scale shape: eval suites are small, so the benchmark's distinct
  * shingle-hash set is broadcast; the corpus side streams as slim
  * (id, hash) rows into a broadcast join — the 100 TB corpus is never
  * shuffled, and only matching (id) rows reach the per-doc aggregation.
  */
object Decontaminate {

  /** Per-corpus-doc overlap report: (id, n_overlap, contaminated), one row
    * per corpus doc. `n_overlap` counts DISTINCT shingles of the doc that
    * appear anywhere in the benchmark.
    */
  def overlap(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      shingle: Int = 5): DataFrame = {
    val corpusShingles = corpus.select(
      col(idCol).as("id"),
      explode(array_distinct(Shingling.shingleHashes(col(textCol), shingle))).as("s"))
    val benchShingles = benchmark
      .select(explode(array_distinct(
        Shingling.shingleHashes(col(benchTextCol), shingle))).as("s"))
      .distinct()
    val hits = corpusShingles
      .join(broadcast(benchShingles), Seq("s"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  /** Corpus with contaminated docs removed (anti-join on the overlap
    * report) — the shape a training-data pipeline actually ships.
    */
  def clean(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      shingle: Int = 5): DataFrame = {
    val dirty = overlap(corpus, idCol, textCol, benchmark, benchTextCol, shingle)
      .where(col("contaminated"))
      .select(col(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }
}
