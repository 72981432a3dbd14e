package graft.operators.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise set-overlap audit between categories of one id space — the
  * audience-overlap / decontamination question ("how many users click
  * AND purchase", "how much of the eval set leaked into train") asked
  * two ways at once:
  *
  *   - EXACTLY, from the distinct (category, id) spine: per-category
  *     distinct counts and per-pair intersection counts — these hash.
  *   - By MERGEABLE HLL sketches with the inclusion–exclusion identity
  *     |A∩B| = |A|+|B|−|A∪B| — the 100 TB path, where the exact spine
  *     self-join is replaced by unioning two 4 KB sketches. Sketch
  *     estimates are never oracle-hashed (the B28/B48b static-verdict
  *     protocol): the hashed column is the always-true AUDIT that the
  *     sketch intersection lands within 3·rsd·(|A|+|B|+|A∪B|) of exact
  *     (rsd = 1.04/√2^lgConfigK; inclusion–exclusion compounds the
  *     three estimates' errors, hence the summed bound — at test SFs
  *     the sketches stay sparse and the estimates are exact).
  *
  * Contract: FEW categories (the withNtileByGroup rule) — the pair
  * spine is categories², built by a crossJoin of one-row-per-category
  * aggregates; the id space is unbounded. The only data-grain work is
  * one distinct + two partial aggs over the slim (cat, id) projection;
  * the exact pair intersection joins the distinct spine to itself on
  * id, bounded per id by categories-per-id, never corpus².
  */
object OverlapSketch {

  /** One row per unordered category pair (cat_a < cat_b): exact
    * per-side distinct counts, exact intersection (0 for disjoint pairs
    * — every pair is emitted), and the sketch-audit verdict.
    */
  def overlapAudit(
      df: DataFrame,
      catCol: String,
      idCol: String,
      lgConfigK: Int = 12): DataFrame = {
    val rsd = 1.04 / math.sqrt(math.pow(2.0, lgConfigK.toDouble))
    val d = df.where(col(catCol).isNotNull && col(idCol).isNotNull)
      .select(col(catCol).as("cat"), col(idCol).as("id"))
      .distinct()
    val perCat = d.groupBy(col("cat")).agg(
      count(lit(1)).as("nd"),
      hll_sketch_agg(col("id"), lit(lgConfigK)).as("sk"))
    val inter = d.select(col("cat").as("cat_a"), col("id"))
      .join(d.select(col("cat").as("cat_b"), col("id")), "id")
      .where(col("cat_a") < col("cat_b"))
      .groupBy(col("cat_a"), col("cat_b"))
      .agg(count(lit(1)).as("__xint"))
    val a = perCat.select(col("cat").as("cat_a"),
      col("nd").as("exact_a"), col("sk").as("__ska"))
    val b = perCat.select(col("cat").as("cat_b"),
      col("nd").as("exact_b"), col("sk").as("__skb"))
    val estU = hll_sketch_estimate(hll_union(col("__ska"), col("__skb")))
    val estA = hll_sketch_estimate(col("__ska"))
    val estB = hll_sketch_estimate(col("__skb"))
    a.crossJoin(b)
      .where(col("cat_a") < col("cat_b"))
      .join(inter, Seq("cat_a", "cat_b"), "left")
      .select(
        col("cat_a"), col("cat_b"), col("exact_a"), col("exact_b"),
        coalesce(col("__xint"), lit(0L)).as("exact_intersection"),
        (abs((estA + estB - estU).cast("double")
          - coalesce(col("__xint"), lit(0L)).cast("double"))
          <= lit(3.0 * rsd) * (estA + estB + estU).cast("double"))
          .as("sketch_within_tolerance"))
  }
}
