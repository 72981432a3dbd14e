package graft.operators.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Everything here is a
  * pure function of the row key — stable across reruns, cluster sizes and
  * engines (unlike rand()/TABLESAMPLE), so a sample drawn today can be
  * reproduced against tomorrow's snapshot.
  */
object Sampling {

  /** Uniform-ish value in [0,1) from a row key: first 24 bits of md5. */
  def hashUniform(keyCol: Column): Column =
    conv(substring(md5(keyCol.cast("string")), 1, 6), 16, 10).cast("double") / 16777216.0

  /** Keep a fraction `p` of rows, keyed deterministically. */
  def uniformSample(df: DataFrame, keyCol: String, p: Double): DataFrame =
    df.where(hashUniform(col(keyCol)) < p)

  /** Importance sampling: keep each row with probability `weightCol`
    * (clamped to [0,1]) — e.g. a quality score, so high-quality documents
    * are over-represented in the training mix.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: Column): DataFrame =
    df.where(hashUniform(col(keyCol)) < least(greatest(weightCol, lit(0.0)), lit(1.0)))

  /** Deterministic dataset split (train/val/test …): each row lands in the
    * first split whose cumulative weight bound exceeds its 24-bit key
    * hash. Pure function of the key — the split survives reruns,
    * repartitions and engine changes, and a row never migrates between
    * splits when other rows are added or removed.
    *
    * Threshold contract: bounds are `floor(2^24 · cum_i)` where `cum_i`
    * is the IEEE-double LEFT-FOLD of the weights in declaration order.
    * They are computed once here on the driver and embedded as integer
    * literals in the returned Column — the row-assignment path never
    * re-accumulates doubles, so every engine evaluating the expression
    * agrees bit-for-bit. An engine deriving bounds independently must
    * mirror the same left-fold (a different summation order, or exact
    * rational weights, can shift a bound by one ulp's worth of rows);
    * the canonical bounds for (0.8, 0.1, 0.1) are 13421772 and 15099494.
    */
  /** Leakage-guarded split: [[assignSplit]] keyed by a GROUP column
    * (source, canonical URL host, near-dup component id) instead of the
    * row id, so correlated rows — near-duplicates from one site, chunks
    * of one document — can NEVER straddle train/val/test. Straddling is
    * the classic eval-contamination bug: a row-keyed split puts one
    * near-dup in train and its twin in test, and the eval leaks. The
    * guard is structural: split is a pure function of the group key, so
    * "every group wholly inside one split" is true by construction (and
    * visible in q_split_by_group's output — per-split distinct-group
    * counts sum to the corpus total). Same stability contract as
    * [[assignSplit]]: adding/removing groups never migrates others.
    */
  def groupSplit(df: DataFrame, groupCol: String, splits: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", assignSplit(col(groupCol), splits))

  def assignSplit(keyCol: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $splits")
    val u24 = conv(substring(md5(keyCol.cast("string")), 1, 6), 16, 10).cast("long")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val bounds = cum.map(c => (c * 16777216.0).toLong)
    splits.init.zip(bounds.init)
      .foldRight(lit(splits.last._1)) { case (((name, _), hi), elseCol) =>
        when(u24 < hi, lit(name)).otherwise(elseCol)
      }
  }
}
