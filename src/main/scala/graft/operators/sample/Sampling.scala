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
}
