package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity self-join over a name/string
  * column — the entity-resolution member of the near-dup family (C2/C3
  * catch token-level rewrites; this catches typo-level variants:
  * "old bolt" ~ "cold bolt"). Pairs feed [[TransitiveDedup]] exactly
  * like the other dup-pair producers.
  *
  * Scale design (PassJoin-style segment signatures, Li et al. ICDE'11 —
  * public literature): a naive edit-distance join is a quadratic cross
  * product, and even length-band blocking collapses into a handful of
  * giant join keys (real name corpora concentrate on a few lengths —
  * one task would do the whole cross product). Instead, pigeonhole: if
  * `ed(a,b) <= k` and `a` is split into `k+1` disjoint segments, then
  * `b` contains at least one segment EXACTLY, shifted by at most `k`
  * positions. So:
  *
  *   - the shorter-role side emits its `k+1` segments,
  *   - the longer-role side emits every substring that could equal a
  *     segment of a partner of length `la ∈ [lb-k, lb]` at a position
  *     within `±k` of that segment's home position
  *     (≤ `(k+1)²·(2k+1)` slim rows per name — 45 for k=2),
  *   - candidates meet on the high-cardinality key `(la, segment_idx,
  *     segment_text)` — an ordinary shuffled equi-join, no giant keys —
  *     and only candidates pay the exact Levenshtein verify (Spark's
  *     thresholded `levenshtein(l, r, k)` early-exits above `k`).
  *
  * The blocking is LOSSLESS: the result equals the plain quadratic
  * join, which is exactly what the DuckDB oracle computes (the
  * q_salted_join gate shape — oracle equality proves no pair escapes
  * the signature scheme). Contract: runs over the DISTINCT name table,
  * assumed ≪ corpus (entity-resolution names, vocab terms); worst case
  * is quadratic in names sharing one (length, segment) signature.
  */
object FuzzyMatch {

  /** All unordered pairs of distinct non-null values of `nameCol` with
    * `levenshtein <= maxDist`, oriented shorter-first (ties: lexicographic).
    * Columns: `name_a`, `name_b`, `dist` (int).
    */
  def nearNames(df: DataFrame, nameCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val k = maxDist
    val names = df
      .select(col(nameCol).as("name"))
      .where(col("name").isNotNull && length(col("name")) >= 1)
      .distinct()
      .withColumn("len", length(col("name")))

    // ---- short-string path: shorter side has len <= k, so segments
    // would be empty; the whole regime fits in a broadcast (strings of
    // length <= 2k on the longer side — a few dozen distinct values).
    val shortA = names.where(col("len") <= k)
      .select(col("name").as("name_a"), col("len").as("len_a"))
    val shortB = names.where(col("len") <= 2 * k)
      .select(col("name").as("name_b"), col("len").as("len_b"))
    val shortPairs = broadcast(shortA).join(
        shortB,
        col("len_b") - col("len_a") <= k &&
          (col("len_a") < col("len_b") ||
            (col("len_a") === col("len_b") && col("name_a") < col("name_b"))))
      .select(col("name_a"), col("name_b"))

    // ---- segment path: shorter side len >= k+1 (every segment non-empty).
    // PassJoin even split of a length-la string into k+1 segments:
    // base = la/(k+1), rem = la%(k+1); the first (k+1-rem) segments have
    // length base, the last rem have base+1. 1-based start of segment i:
    //   i < m:  i*base + 1                 where m = (k+1) - rem
    //   else:   m*base + (i-m)*(base+1) + 1
    def segLen(la: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) = {
      val base = la.cast("int") / (k + 1)
      val m = lit(k + 1) - (la.cast("int") % (k + 1))
      when(i < m, base.cast("int")).otherwise(base.cast("int") + 1)
    }
    def segStart(la: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) = {
      val base = la.cast("int") / (k + 1)
      val m = lit(k + 1) - (la.cast("int") % (k + 1))
      when(i < m, i * base.cast("int") + 1)
        .otherwise(m * base.cast("int") + (i - m) * (base.cast("int") + 1) + 1)
    }

    val aSegs = names.where(col("len") >= k + 1)
      .select(col("name").as("name_a"), col("len").as("la"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("sub", col("name_a").substr(segStart(col("la"), col("i")), segLen(col("la"), col("i"))))

    // longer role: for each feasible partner length la, each segment i,
    // every start within ±k of the segment's home position (clamped to
    // the string); the position window is what keeps the scheme lossless
    // — net indels before a preserved segment shift it by at most k.
    val bSubs = names.where(col("len") >= k + 1)
      .select(col("name").as("name_b"), col("len").as("lb"),
        explode(sequence(greatest(lit(k + 1), col("len") - k), col("len"))).as("la"))
      .select(col("name_b"), col("lb"), col("la"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("__li", segLen(col("la"), col("i")))
      .withColumn("__pi", segStart(col("la"), col("i")))
      .select(col("name_b"), col("lb"), col("la"), col("i"), col("__li"),
        explode(sequence(
          greatest(lit(1), col("__pi") - k),
          least(col("lb") - col("__li") + 1, col("__pi") + k))).as("p"))
      .withColumn("sub", col("name_b").substr(col("p"), col("__li")))

    val segPairs = aSegs.join(bSubs, Seq("la", "i", "sub"))
      .where(col("la") < col("lb") ||
        (col("la") === col("lb") && col("name_a") < col("name_b")))
      .select(col("name_a"), col("name_b"))

    shortPairs.unionByName(segPairs)
      .dropDuplicates("name_a", "name_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), k))
      .where(col("dist") =!= -1)
  }
}
