package graft.operators.asof

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, the greatest right timestamp ≤ the left
  * timestamp within the same key.
  *
  * Spark-first formulation: no custom physical operator is needed — union
  * both sides, sort within key by (ts, side) with the right side first on
  * ties (so "at or before" includes equality), and carry the last non-null
  * right timestamp forward with `last(ignoreNulls)`. One shuffle on the
  * key, linear per partition — same asymptotics as a dedicated merge-join
  * implementation, and AQE-managed.
  */
object AsOfJoin {

  /** Returns `left.* + <outCol timestamp>` (null when no prior right row).
    *
    * NULL keys follow JOIN semantics, not window semantics: a NULL-key
    * right row matches nothing (filtered before the union — a window
    * partition would otherwise group NULL with NULL and attribute a
    * NULL-key left row to a NULL-key right row, which no equi-join
    * oracle would reproduce), and a NULL-key left row passes through
    * with a NULL match.
    */
  def latestPriorTs(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      outCol: String): DataFrame = {
    val payloadType = StructType(left.schema.fields)
    val lSide = left.select(
      col(keyCol).as("__k"),
      col(leftTsCol).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast("timestamp").as("__rts"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__payload"))
    val rSide = right.where(col(keyCol).isNotNull).select(
      col(keyCol).as("__k"),
      col(rightTsCol).as("__ts"),
      lit(0).as("__side"),
      col(rightTsCol).as("__rts"),
      lit(null).cast(payloadType).as("__payload"))

    val w = Window
      .partitionBy("__k")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)

    lSide
      .unionByName(rSide)
      .withColumn("__matched", last(col("__rts"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__payload.*"), col("__matched").as(outCol))
  }

  /** [[latestPriorTs]] with a bounded lookback: a match older than
    * `toleranceSec` before the left timestamp comes back NULL — the
    * batch twin of the streaming attribution join's time-range bound
    * (an unbounded as-of would attribute a purchase to a years-old
    * signup; production attribution never wants that). Same plan plus
    * one map-side filter on the matched column.
    */
  def latestPriorTsWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      outCol: String,
      toleranceSec: Long): DataFrame = {
    // upper bound keeps toleranceSec * 1e6 inside Long — an "effectively
    // unbounded" Long.MaxValue would wrap negative and null EVERY match
    require(toleranceSec >= 0 && toleranceSec <= Long.MaxValue / 1000000L,
      s"toleranceSec must be in [0, ${Long.MaxValue / 1000000L}], got $toleranceSec " +
        "(use latestPriorTs for an unbounded lookback)")
    latestPriorTs(left, right, keyCol, leftTsCol, rightTsCol, outCol)
      .withColumn(outCol,
        when(unix_micros(col(leftTsCol)) - unix_micros(col(outCol))
          <= toleranceSec * 1000000L, col(outCol)))
  }
}
