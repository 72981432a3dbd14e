package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle data once at write time so repeated
  * joins/aggregations on the bucket key need no Exchange at read time —
  * the standard way to amortize the big shuffle across a 100 TB pipeline's
  * many downstream queries.
  */
object Bucketing {

  /** Writes `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Joins two tables bucketed on the same key: with matching bucket
    * counts Spark plans a shuffle-free sort-merge join.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
