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

  /** Pin the partition count of a fan-out JOIN's hash exchange
    * (optimization guide §2.5 / §3.3): `keys` must be the join's equi
    * key. A pair-generation self-join multiplies rows AFTER the
    * exchange, so AQE's bytes-based coalescing — which only sees the
    * slim pre-join shuffle — systematically undersizes the stage
    * (measured r16-opt: the co-occurrence pair join ran as a 1.6 s
    * 3-task stage, the neighbor-overlap apex join as 2 tasks, on a
    * 32-core box). An explicit `repartition(n, keys)` is never an EXTRA
    * shuffle — the join requires this hash partitioning anyway and
    * EnsureRequirements inserts nothing on top — it only pins the
    * partition count AQE would otherwise shrink.
    *
    * Target = max(defaultParallelism | conf override,
    * spark.sql.shuffle.partitions): scale-adaptive, never below either
    * knob a cluster deployment tunes. Trade-off (documented, accepted):
    * the pinned exchange opts out of AQE coalescing AND skew-splitting
    * for this one join — correct here because the callers' group keys
    * are bounded-width baskets (lines per order, items per basket), not
    * skew candidates. The `spark.graft.fanout.partitions` knob disables
    * (`0`/`1`) or overrides, as for [[byKey]].
    *
    * Apply ONLY where A/B-measured as a win: every consumer of the
    * pinned layout pays per-task overhead per pass, so iterative or
    * multi-stage readers can lose more than the fat stage saves —
    * measured r16-opt: a WIN for the neighbor-Jaccard apex join (2.32
    * vs 2.56 s), a WASH for BFS, a LOSS for pagerank (4.22 vs 3.88),
    * triangles (2.16 vs 1.52) and assoc-rules (2.22 vs 1.89), all of
    * which stay unpinned with the verdict documented in place.
    */
  def byJoinKey(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "FanOut.byJoinKey needs at least one key column")
    if (df.isStreaming) return df
    val knob = targetPartitions(df)
    if (knob <= 1) df
    else {
      val target =
        math.max(knob, df.sparkSession.sessionState.conf.numShufflePartitions)
      df.repartition(target, keys: _*)
    }
  }
}
