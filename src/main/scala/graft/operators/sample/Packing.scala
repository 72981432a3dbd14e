package graft.operators.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic packing of a corpus into fixed-token training shards —
  * the "lay the documents end to end and cut every N tokens" step of a
  * training-data pipeline (shard files of ~uniform token count, stable
  * across reruns so shard k always holds the same documents).
  *
  * The naive formulation is a GLOBAL running-total window (single task
  * holding the corpus). Here the exclusive prefix sum is distributed,
  * TeraSort shape:
  *   1. range-partition the slim (id, hash, n_tokens) projection on the
  *      deterministic (md5(id), id) layout order;
  *   2. per-partition token sums → driver (numPartitions longs) →
  *      exclusive offsets;
  *   3. per-partition running total (window PARTITIONED by the range
  *      partition — each task sees one partition, never the corpus)
  *      plus the partition's offset = the exact global prefix;
  *   4. shard_id = floor(prefix / budget), a map-side projection.
  *
  * At 100 TB the ranged projection is what you would write to storage
  * once (it IS the shard layout); locally it is localCheckpoint'd so the
  * offset table and the per-row pass see the identical partitioning.
  */
object Packing {

  /** `idCol` contract: a unique non-null key — it IS the layout order
    * (with its md5) and the join-back key for [[writeShards]]. NULL-id
    * rows are excluded from the layout here so the assignment and the
    * written artifact always agree (a NULL key would consume shard
    * budget in the prefix sum yet never match the write-side join).
    */
  def assignShards(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val slim = df
      .where(col(idCol).isNotNull)
      .select(
        col(idCol).as("id"),
        md5(col(idCol).cast("string")).as("__h"),
        tokensCol.cast("long").as("n_tokens"))
    // pins the partitioning: the offsets below are only valid against the
    // exact partitions they were computed from (a recomputation could
    // re-sample different range boundaries)
    val ranged = slim
      .repartitionByRange(parts, col("__h"), col("id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val sums = ranged.groupBy("__pid").agg(sum(col("n_tokens")).as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = sums.map(_._1).zip(sums.scanLeft(0L)(_ + _._2).init)
    val offDf = broadcast(
      spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy("__h", "id")
      .rowsBetween(Window.unboundedPreceding, 0)
    ranged
      .join(offDf, Seq("__pid"))
      .withColumn("__prefix",
        sum(col("n_tokens")).over(w) + col("__off") - col("n_tokens"))
      .withColumn("shard_id", floor(col("__prefix") / lit(budgetTokens.toDouble)).cast("long"))
      .select(col("id").as(idCol), col("n_tokens"), col("shard_id"))
  }

  /** Durable form: the full rows written as parquet PARTITIONED BY
    * shard_id — the training-shard artifact a 100 TB run produces once
    * and trainers then read shard by shard (a shard predicate reaches the
    * scan as a PartitionFilter; PackingSpec asserts it). The slim
    * assignment re-attaches to the full rows by key, so wide columns
    * never pass through the prefix-sum shuffle.
    */
  def writeShards(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      budgetTokens: Long,
      path: String): Unit = {
    val assigned = assignShards(df, idCol, tokensCol, budgetTokens)
      .select(col(idCol), col("shard_id"))
    df.join(assigned, Seq(idCol))
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)
  }
}
