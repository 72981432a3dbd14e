package graft.operators.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-drift audit between two snapshots of one numeric
  * column — the check a training-data pipeline runs before trusting a
  * new crawl/batch against the distribution its models were tuned on
  * (and the monitoring twin of `Reconcile`: diff answers "which rows
  * changed", drift answers "did the SHAPE change").
  *
  * Population Stability Index over equal-width bins derived from the
  * BASELINE's min/max: `PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)`; the
  * conventional read is <0.1 stable, 0.1–0.25 moderate, >0.25 shifted.
  * Out-of-range current values clamp to the edge bins (a range
  * excursion IS drift and must land in a bin, not vanish); rates are
  * Laplace-smoothed `(cnt + 1) / (n + nBins)` so an empty bin keeps
  * `ln` finite — both documented contracts, mirrored in the oracle.
  *
  * Determinism: bin edges, rates, and the ln argument derive through
  * identical IEEE arithmetic in both engines; `ln` itself is the one
  * libm-dependent step, so hashed `psi_contrib` values fall under the
  * standing transcendental margin audit (MarginAuditSpec — the
  * BM25/tfidf convention, SURVEY §5). Counts are exact BIGINTs.
  *
  * Plan shape: one slim min/max agg over the baseline (1-row broadcast
  * — never a collect), one bin-grain partial-aggregated count per
  * side, a generated bin spine joined to both count tables, 1-row
  * total broadcasts. The snapshots stream through scan-fused bin
  * assignment; nothing wider than (bin, count) shuffles.
  *
  * Degenerate baseline (min == max) puts every value in bin 0 —
  * documented, mirrored.
  */
object Drift {

  /** One row per bin: `bin, n_base, n_cur, p_base, p_cur, psi_contrib`
    * (rates and contribution rounded to 4; `Σ psi_contrib` is the PSI).
    */
  def psiByBins(
      base: DataFrame,
      cur: DataFrame,
      valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val spark: SparkSession = base.sparkSession
    val v = col(valueCol)
    val bounds = base.where(v.isNotNull)
      .agg(min(v).cast("double").as("__lo"), max(v).cast("double").as("__hi"))

    def binned(df: DataFrame): DataFrame =
      df.where(v.isNotNull)
        .crossJoin(broadcast(bounds))
        .select(
          when(col("__hi") === col("__lo"), 0L)
            .otherwise(least(
              greatest(
                floor((v.cast("double") - col("__lo")) /
                  ((col("__hi") - col("__lo")) / nBins)), lit(0L)),
              lit(nBins - 1L))).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))

    val bc = binned(base).select(col("bin"), col("n").as("n_base"))
    val cc = binned(cur).select(col("bin"), col("n").as("n_cur"))
    val spine = spark.range(nBins).select(col("id").as("bin"))
    val joined = spine
      .join(bc, Seq("bin"), "left")
      .join(cc, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      sum(col("n_base")).as("__tb"), sum(col("n_cur")).as("__tc"))
    val p = (col("n_base") + 1).cast("double") / (col("__tb") + nBins).cast("double")
    val q = (col("n_cur") + 1).cast("double") / (col("__tc") + nBins).cast("double")
    joined
      .crossJoin(broadcast(totals))
      .select(col("bin"), col("n_base"), col("n_cur"),
        round(p, 4).as("p_base"), round(q, 4).as("p_cur"),
        round((p - q) * log(p / q), 4).as("psi_contrib"))
  }
}
