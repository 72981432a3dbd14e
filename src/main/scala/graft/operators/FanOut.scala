package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Input-parallelism guard for heavy per-row map work (optimization guide
  * §2.5 "input skew: one huge unsplittable file … repartition immediately
  * after the read", §2.6 stragglers).
  *
  * The failure mode this fixes (measured, r16 optimization round): a
  * snapshot table is a single parquet file with one row group, so its
  * scan is ONE task no matter the core count — and any expensive
  * generator fused into that scan (md5 resample weights, shingling,
  * span/window explodes) runs on one core while the rest of the box
  * idles. Worse, a `CacheScope.withPersisted` intermediate derived from
  * that scan inherits the single partition, so EVERY downstream consumer
  * stage of the cache is serial too (q_dedup_prefix_filter's four
  * back-to-back 1-task 0.66 s stages; q_bootstrap_ci's 6.5 s of 7.3 s in
  * one task — ProfileStages, OPTIMIZATION_r16.md).
  *
  * `byKey` hash-repartitions the slim pre-amplification projection to the
  * session default parallelism — but ONLY when the plan's current
  * parallelism is below it. At production scale the corpus scan already
  * has thousands of splits, the gate sees parallelism ≥ target, and the
  * operator is a structural NO-OP: no extra exchange ever appears on the
  * 100 TB path. The repartition is hash-by-unique-key (deterministic
  * under task retries — never round-robin, SPARK-38388) and every caller
  * feeds it to partitioning-independent aggregations, so results are
  * bit-identical either way (oracle-verified per call site).
  *
  * Conf: `spark.graft.fanout.partitions` — empty (default) derives the
  * target from `sparkContext.defaultParallelism`; an explicit int pins
  * it; `0` or `1` disables fan-out entirely (the pre-r16 shapes).
  */
private[graft] object FanOut {

  def targetPartitions(df: DataFrame): Int = {
    val spark = df.sparkSession
    val conf = spark.conf.get("spark.graft.fanout.partitions", "").trim
    if (conf.isEmpty) spark.sparkContext.defaultParallelism else conf.toInt
  }

  /** `df` repartitioned by `keys` to the target parallelism iff its
    * current physical parallelism is lower; `df` unchanged otherwise
    * (including streaming frames, where partition counts are unknowable
    * at plan time). `keys` should include a unique (or near-unique)
    * column so the hash spreads evenly.
    *
    * Call-site discipline: hand this SCAN-LEVEL projections only
    * (scan/filter/project). The gate physically plans `df` (`.rdd`), and
    * a subtree containing a join would both double-plan and pre-trigger
    * its broadcast jobs — measured as a net regression when the fan-out
    * sat above verifyJaccard's semi-join (r16-opt A/B). Fan out below
    * the join instead.
    */
  def byKey(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "FanOut.byKey needs at least one key column")
    if (df.isStreaming) return df
    val target = targetPartitions(df)
    if (target <= 1) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, keys: _*)
  }
}
