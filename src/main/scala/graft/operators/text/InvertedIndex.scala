package graft.operators.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted-index build + exact-token boolean search — the search-engine
  * layout for the keyword workloads A1/C37 serve by scanning: at 100 TB a
  * `LIKE`/token scan reads the whole corpus per query, while a posting-list
  * index reads only the files holding the query's terms.
  *
  * Layout: postings are `(term, doc_id)` pairs (distinct — boolean search
  * needs membership, not positions), written partitioned by
  * `bucket = pmod(xxhash64(term), nBuckets)`. Term-hash bucketing (not
  * term-value partitioning) keeps the directory fan-out fixed and
  * balanced regardless of vocabulary size — a raw `partitionBy(term)`
  * over a 100 M-term vocabulary would melt the metastore/listing. A query
  * computes its terms' buckets DRIVER-SIDE (same xxhash64, evaluated
  * eagerly) and the scan prunes to those partitions via PartitionFilters
  * — the IvfKNN cell_id pattern, spec-measured.
  *
  * Tokenization matches the BM25/C37 surface exactly (`lower` + single-
  * space split) so index-backed results are comparable with the scoring
  * stack's. Search semantics: AND of all terms (a doc must contain every
  * one); term frequencies do not matter, duplicates in the query are
  * rejected. One aggregation on the pruned postings — `count == nTerms`
  * replaces an nTerms-way self-join.
  *
  * Reference: the keyword filter surface of
  * /root/reference/openai/basic_functions.py (step 5) — re-expressed as
  * an index artifact instead of a per-query scan.
  */
object InvertedIndex {

  /** Distinct `(term, bucket, doc_id)` postings for `df`. NULL ids and
    * NULL/empty texts contribute nothing; empty tokens (from repeated
    * spaces) are dropped.
    */
  def build(df: DataFrame, idCol: String, textCol: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    df.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .where(col("term") =!= "")
      .distinct()
      .select(col("term"), pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("bucket"),
        col("doc_id"))
  }

  /** Writes [[build]]'s postings partitioned by bucket. The artifact is
    * self-describing for pruning: readers recover `nBuckets` from the
    * partition values, but callers must pass the SAME `nBuckets` to
    * [[openPostings]] — the bucket function is part of the layout.
    */
  def writeIndex(df: DataFrame, idCol: String, textCol: String,
      dir: String, nBuckets: Int = 64): Unit =
    build(df, idCol, textCol, nBuckets)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  /** Driver-side bucket of a term — the same xxhash64 the build fuses
    * into the scan, evaluated eagerly on a literal.
    */
  def bucketOf(term: String, nBuckets: Int): Long = {
    // seed 42L = the default the sql.functions.xxhash64 column uses
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(term,
        org.apache.spark.sql.types.StringType)), 42L)
      .eval(null).asInstanceOf[Long]
    val m = h % nBuckets
    if (m < 0) m + nBuckets else m
  }

  /** Postings for `terms` read from a written index: the scan carries a
    * PartitionFilter on the terms' buckets (touching only those
    * directories) plus the pushed term filter inside them.
    */
  def openPostings(spark: SparkSession, dir: String,
      terms: Seq[String], nBuckets: Int = 64): DataFrame = {
    val buckets = terms.map(bucketOf(_, nBuckets)).distinct
    spark.read.parquet(dir)
      .where(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .select(col("term"), col("doc_id"))
  }

  /** POSITIONAL postings: `(term, bucket, doc_id, positions)` with the
    * sorted 1-based token positions of each term per doc — the layout
    * phrase/proximity search needs ([[searchPhrase]]); ~one array cell
    * per token instead of [[build]]'s distinct pair, the standard
    * positional-index cost. Same bucket function and write/prune story
    * as [[build]].
    */
  def buildPositional(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    df.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "term")))
      .where(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos") + 1)).as("positions"))
      .select(col("term"), pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("bucket"),
        col("doc_id"), col("positions"))
  }

  /** Docs containing the EXACT consecutive phrase, with the occurrence
    * count: terms intersect by doc (k slim joins, k = phrase length),
    * then positions verify adjacency — an occurrence is a position p of
    * the first term with p+i in term i's list for every i (array
    * membership over the per-doc positional lists; no explode of the
    * corpus). Repeated words in the phrase are fine — each slot joins
    * its own filtered copy.
    */
  def searchPhrase(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.size >= 2, "a phrase needs at least 2 terms (use searchAnd for 1)")
    val slots = terms.zipWithIndex.map { case (t, i) =>
      postings.where(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"__p$i"))
    }
    val joined = slots.reduce(_.join(_, Seq("doc_id")))
    val adjacent = filter(col("__p0"), p =>
      (1 until terms.size).map(i => array_contains(col(s"__p$i"), p + i))
        .reduce(_ && _))
    joined
      .withColumn("n_matches", size(adjacent).cast("long"))
      .where(col("n_matches") > 0)
      .select(col("doc_id"), col("n_matches"))
  }

  /** Doc ids containing EVERY query term, from any postings relation
    * ([[build]] output or [[openPostings]]). Postings are (term, doc)
    * distinct, so `count == nTerms` is exact AND semantics.
    */
  def searchAnd(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "terms must be non-empty and distinct (AND of duplicates is the single term)")
    postings
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"))
      .where(col("n_terms") === terms.size)
      .select(col("doc_id"))
  }
}
