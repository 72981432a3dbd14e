package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy vocabulary matching via deletion neighborhoods (the SymSpell
  * blocking scheme): two words are within Levenshtein distance 1 iff
  * their {self} ∪ {all 1-deletions} sets intersect —
  *
  *   deletion:     the shorter word IS a 1-deletion of the longer;
  *   insertion:    symmetric;
  *   substitution: deleting the substituted position from both sides
  *                 yields the same string;
  *
  * so an equi-join on deletion keys is a PROVABLY COMPLETE candidate
  * generator for distance ≤ 1, and the exact `levenshtein` verify
  * makes the output exact (candidate-then-verify, the C2/C40
  * protocol — which also makes the whole operator SQL-expressible:
  * both engines ship a native edit distance).
  *
  * Scale shape: the posting table is VOCAB grain × (len+1) keys per
  * word — never document grain; the self-join fans out only within a
  * deletion-key bucket (bounded by words per key in natural-language
  * vocabularies; a pathologically hot short key would take the salted
  * join, the B29 knob). `array_distinct` dedups repeated-character
  * deletions ("aab" drops to "ab" twice) so a pair is generated once
  * per shared key, and the final `dropDuplicates` makes candidates a
  * set before the verify. Spelling-variant clustering over a corpus
  * vocabulary is exactly SymSpell's use case; distance-2 would use
  * 2-deletion neighborhoods at (len choose 2) keys per word — not
  * implemented until something needs it (declared fence).
  */
object FuzzyMatch {

  /** All unordered vocabulary pairs at Levenshtein distance exactly 1
    * (distance 0 cannot occur — the vocab is distinct and w1 < w2):
    * (w1, w2, n1, n2, dist). `vocab` must be one row per distinct
    * word with a count column; NULL words are dropped.
    */
  def editDistance1Pairs(
      vocab: DataFrame,
      wordCol: String,
      countCol: String): DataFrame = {
    val w = col(wordCol)
    val keys = array_distinct(concat(
      array(w),
      transform(
        sequence(lit(1), length(w)),
        i => concat(w.substr(lit(1), i - lit(1)), w.substr(i + lit(1), length(w))))))
    val posting = vocab.where(w.isNotNull)
      .select(w.as("__w"), explode(keys).as("__k"))
    val cand = posting.as("a")
      .join(posting.as("b"),
        col("a.__k") === col("b.__k") && col("a.__w") < col("b.__w"))
      .select(col("a.__w").as("w1"), col("b.__w").as("w2"))
      .dropDuplicates("w1", "w2")
      .where(levenshtein(col("w1"), col("w2")) <= 1)
    val counts = vocab.where(w.isNotNull)
      .select(w.as("__w"), col(countCol).as("__n"))
    cand
      .join(counts.as("ca"), col("w1") === col("ca.__w"))
      .join(counts.as("cb"), col("w2") === col("cb.__w"))
      .select(
        col("w1"), col("w2"),
        col("ca.__n").as("n1"), col("cb.__n").as("n2"),
        levenshtein(col("w1"), col("w2")).as("dist"))
  }
}
