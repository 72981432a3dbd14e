package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PMI collocation mining — the classic "words that belong together"
  * signal (Church & Hanks 1990): for an adjacent word pair (x, y),
  *
  *   pmi = ln( p(x,y) / (p(x)·p(y)) )
  *       = ln( c_xy · N / (c_x · c_y) )
  *
  * with every probability estimated from the BIGRAM table itself
  * (c_x/c_y are left/right margins, N the bigram total) so the formula
  * is self-consistent on exact integers.
  *
  * Scale shape: tokenization and pair-zipping fuse into the scan
  * (split + slice + arrays_zip + explode — no UDF); the only data-grain
  * shuffle is the (w1, w2) partial-aggregated count. Margins and the
  * total are window sums over the AGGREGATED bigram spine (bounded by
  * distinct bigrams — the q_drift_ks shape), and the final global
  * rank window sees only the `minCount`-filtered spine.
  *
  * Determinism: counts are exact BIGINTs and hash as-is. `pmi` is the
  * catalog's 6th audited transcendental (SURVEY §5): `ln` may differ
  * by an ulp between libms, so the hashed value is ROUNDED to 4 and
  * MarginAuditSpec proves every hashed pmi sits > 1e-9 from its
  * rounding boundary AND every adjacent unrounded gap through the
  * k/k+1 rank cut exceeds 1e-6 at all three SFs (the tfidf protocol —
  * rank and membership both ride the same audited gaps; ties in
  * pmi_raw break on (w1, w2)).
  */
object Collocations {

  /** Top-k collocations by PMI among pairs with `c_xy >= minCount`:
    * (rank, w1, w2, c_xy, c_w1, c_w2, n_bigrams, pmi). NULL texts drop;
    * single-word docs contribute no pair.
    */
  def topPmi(
      df: DataFrame,
      textCol: String,
      minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val ws = split(lower(col(textCol)), " ")
    val pairs = df.where(col(textCol).isNotNull)
      .select(ws.as("__ws"))
      .where(size(col("__ws")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__ws"), lit(1), size(col("__ws")) - 1).as("w1"),
        slice(col("__ws"), lit(2), size(col("__ws")) - 1).as("w2"))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val counts = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
    val withMargins = counts
      .withColumn("c_w1", sum(col("c_xy")).over(Window.partitionBy(col("w1"))))
      .withColumn("c_w2", sum(col("c_xy")).over(Window.partitionBy(col("w2"))))
      .withColumn("n_bigrams", sum(col("c_xy")).over(Window.partitionBy()))
    val pmiRaw = log(
      (col("c_xy").cast("double") * col("n_bigrams").cast("double"))
        / (col("c_w1").cast("double") * col("c_w2").cast("double")))
    withMargins
      .where(col("c_xy") >= minCount)
      .withColumn("__pmi_raw", pmiRaw)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__pmi_raw").desc, col("w1"), col("w2"))))
      .where(col("rank") <= k)
      .select(col("rank"), col("w1"), col("w2"), col("c_xy"),
        col("c_w1"), col("c_w2"), col("n_bigrams"),
        graft.functions.ExactMath.hashRound(col("__pmi_raw"), 4).as("pmi"))
  }
}
