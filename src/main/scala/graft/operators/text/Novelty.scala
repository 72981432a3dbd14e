package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-occurrence n-gram novelty — the memorization/staleness signal
  * a curation pipeline scores ingestion batches with: what fraction of
  * a document's shingles has the corpus (in id order) never seen
  * before? A near-1 score is fresh content; near-0 is a reshuffle of
  * existing text that exact and near dedup may both miss (C1 needs
  * byte equality, C2 needs high WHOLE-document Jaccard — a collage of
  * old paragraphs defeats both).
  *
  * Shingles are the C36 convention VERBATIM (word 5-grams of the
  * lowercased text, whole text when shorter, distinct per doc), so the
  * oracle reuses the proven fullsets CTE. "First" = the minimum doc id
  * carrying the shingle — deterministic and incremental (a standing
  * (shingle, first_doc) table maintains under appends by min-merge,
  * the IncrementalAgg argument).
  *
  * Scale shape: the shingle strings cross an exchange exactly ONCE —
  * the partial agg to the (shingle → min id) spine; `n_novel` then
  * reduces that spine by its min id (a doc-keyed count, no shingle
  * re-shuffle), and `n_shingles` is computed MAP-SIDE as the size of
  * the per-doc distinct-shingle array before the explode, so the only
  * join is doc-keyed and slim. (The original shape joined the full
  * exploded table back to the spine on the shingle string — a second
  * corpus-scale string shuffle; measured 4.7 s → this plan at sf0.1.)
  * The STRING-keyed form is the oracle-able one; at corpus scale the
  * shuffle key slims to
  * [[graft.functions.GraftFunctions.shingleHashes]] (the C2 path) with
  * identical semantics modulo hash collisions.
  *
  * `novelty` = ONE division of exact BIGINTs — unrounded (q_gini rule).
  */
object Novelty {

  /** One row per document: (idCol, n_shingles, n_novel, novelty).
    * NULL-text rows drop; `idCol` must be unique (it is the tiebreak
    * that decides which of two equal-content docs is "first").
    */
  def firstOccurrenceNovelty(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val ws = split(lower(col(textCol)), " ")
    val shingles = array_distinct(
      when(size(ws) >= 5,
        transform(sequence(lit(1), size(ws) - 4),
          i => array_join(slice(ws, i, lit(5)), " ")))
        .otherwise(array(array_join(ws, " "))))
    // fan the slim (id, text) projection out before the interpreted
    // shingle transform: with a single-split input BOTH consumers below
    // ran the shingling inside 1-task scan stages (measured 2.3 s +
    // 1.65 s of q_novelty's 4.4 s — the spine exchange itself was only
    // 0.33 s; ProfileStages, r16-opt). The two consumers share the
    // identical exchange subtree, so ReuseExchange also makes the corpus
    // scan happen once. Gated no-op on multi-split inputs — the 100 TB
    // plan is unchanged (and the hashed twin, whose exchanges must stay
    // string-free, is deliberately NOT fanned).
    val base = graft.operators.FanOut.byKey(
      df.where(col(textCol).isNotNull).select(col(idCol), col(textCol)),
      col(idCol))
    val perDoc = base.select(col(idCol),
      size(shingles).cast("long").as("n_shingles"))
    val novel = base.select(col(idCol), explode(shingles).as("__s"))
      .groupBy(col("__s")).agg(min(col(idCol)).as("__first"))
      .groupBy(col("__first").as(idCol))
      .agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq(idCol), "left")
      .select(
        col(idCol), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (coalesce(col("n_novel"), lit(0L)).cast("double")
          / col("n_shingles").cast("double")).as("novelty"))
  }

  /** The corpus-scale twin of [[firstOccurrenceNovelty]]: the identical
    * plan with the shuffle key slimmed to the 64-bit xxhash shingle
    * ([[graft.functions.GraftFunctions.shingleHashes]], the C2 path) —
    * the spine agg's exchange carries (long, long) rows instead of
    * ~30-byte shingle strings, the biggest single perf knob the
    * string-keyed form left on the table (the string payload dominated
    * its remaining cost; at 100 TB the spine agg IS the operator).
    *
    * Collision-accepting contract, documented: a 64-bit collision can
    * only MERGE two distinct shingles into one spine row, so a doc's
    * `n_novel` can undercount by at most the number of colliding
    * shingles it owns — by the birthday bound, ~3 expected collisions
    * per 10^10 distinct shingles corpus-wide (p ≈ k²/2^65). n_shingles
    * counts distinct HASHES map-side so the novelty ratio stays
    * internally consistent (n_novel ≤ n_shingles always). NoveltySpec
    * pins full-output parity with the string-keyed form on the
    * collision-free testdata and that no string-typed attribute crosses
    * any exchange in this plan.
    */
  def firstOccurrenceNoveltyHashed(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.GraftFunctions
    val ws = split(lower(col(textCol)), " ")
    // shingleHashes keeps duplicates (minhash multiset contract) and
    // hashes the whole word array when shorter than n — the same
    // fallback as the string form's whole-text shingle
    val shingles = array_distinct(GraftFunctions.shingleHashes(ws, 5))
    val base = df.where(col(textCol).isNotNull)
    val perDoc = base.select(col(idCol),
      size(shingles).cast("long").as("n_shingles"))
    val novel = base.select(col(idCol), explode(shingles).as("__s"))
      .groupBy(col("__s")).agg(min(col(idCol)).as("__first"))
      .groupBy(col("__first").as(idCol))
      .agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq(idCol), "left")
      .select(
        col(idCol), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (coalesce(col("n_novel"), lit(0L)).cast("double")
          / col("n_shingles").cast("double")).as("novelty"))
  }
}
