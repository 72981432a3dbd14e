package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window exact-substring dedup (C72) — the window-grain member of
  * the dedup family (C1 = whole doc, C1c = line spans, C2/C3 = token-set
  * near-dup): flag documents that repeat VERBATIM character windows an
  * earlier document already owns, the "exact substring" contamination/
  * boilerplate signal of Lee et al. 2021 ("Deduplicating Training Data
  * Makes Language Models Better", arXiv:2107.06499) re-expressed at a
  * strided-window grain instead of a suffix array (the suffix array is a
  * single-machine construction; strided windows shard trivially).
  *
  * Shape: one generator pass explodes each doc into its FULL windows
  * (`winLen` chars every `stride` — docs shorter than one window carry
  * no windows and drop; distinct per doc so in-doc repetition does not
  * inflate sharing), a window-grain groupBy assigns each window its MIN
  * doc id as owner, and a doc-grain re-aggregation counts windows whose
  * owner precedes the doc. `dup_ratio` = n_shared/n_windows is ONE exact
  * division (hash-safe unrounded, the q_gini rule); `is_dup` compares
  * exact integers.
  *
  * Ownership is FIRST-OCCURRENCE (min doc id — the C36/C66 convention),
  * so the earliest copy of any repeated span stays clean and later
  * copies are charged — exactly the "keep the first, drop the rest"
  * curation rule.
  *
  * 100 TB: both exchanges carry slim rows; the window-grain one carries
  * `winLen`-char strings — the q_novelty lesson applies: the declared
  * slim path shuffles `xxhash64(win)` keys instead (collision-accepting
  * contract, 64-bit keys at corpus scale), keeping this string-keyed
  * form as the oracle-mirrorable reference. Window count per doc is
  * len/stride — the generator output is a constant factor of corpus
  * size, never quadratic; the self-comparison is the groupBy, never a
  * join of docs against docs.
  */
object WindowDedup {

  def windowDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      winLen: Int = 40,
      stride: Int = 20): DataFrame = {
    require(winLen >= 1 && stride >= 1, "winLen and stride must be >= 1")
    val t = col(textCol)
    // full windows only: nwin = (len - winLen) div stride + 1 for
    // len >= winLen (the guard keeps sequence() ascending — the
    // mannKendall descent lesson). Spark's `/` on ints is DOUBLE
    // division; floor of the correctly-rounded ratio of small ints is
    // the exact integer quotient (mirrored by DuckDB `//`).
    val nwin = floor((length(t) - lit(winLen)).cast("double") / lit(stride.toDouble))
      .cast("int") + lit(1)
    val wins = df
      .where(col(idCol).isNotNull && t.isNotNull && length(t) >= winLen)
      .select(col(idCol).as("doc_id"),
        explode(transform(sequence(lit(0), nwin - 1),
          i => t.substr(i * lit(stride) + 1, lit(winLen)))).as("win"))
      .distinct()
    val owners = wins.groupBy(col("win"))
      .agg(min(col("doc_id")).as("__owner"))
    wins.join(owners, "win")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("__owner") < col("doc_id"), 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_windows"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_windows").cast("double"))
          .as("dup_ratio"),
        (col("n_shared") > 0L).as("is_dup"))
  }
}
