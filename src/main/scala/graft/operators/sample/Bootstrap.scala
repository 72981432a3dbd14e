package graft.operators.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ExactMath

/** Poisson bootstrap confidence interval for a mean (B107) — the
  * resampling method that actually distributes (Chamandy et al. 2012,
  * "Estimating Uncertainty for Massive Data Streams"; Efron 1979 is the
  * classical form): instead of drawing n rows WITH replacement per
  * resample (a global shuffle per rep), each row independently enters
  * resample r with multiplicity ~ Poisson(1) — one scan-fused generator
  * explodes (row, rep) pairs, one partial-aggregated groupBy(rep)
  * reduces them, and the R resample means collapse to a single R-double
  * array. No per-rep pass over the data, no RNG state.
  *
  * Determinism (the Projection md5 precedent): ONE digest per
  * (row, 8-rep block) — `md5("<seed>:<key>:<block>")` — yields EIGHT
  * multiplicities by slicing its 32 lowercase-hex chars into 4-char
  * windows and comparing each LEXICOGRAPHICALLY (equal lengths, so the
  * compare is numeric) against embedded 4-hex-digit literals of the
  * Poisson(1) CDF (floor(CDF·16⁴): 0x5e2d, 0xbc5a, 0xeb71, 0xfb23 —
  * 2⁻¹⁶ CDF resolution, a ≤1.6e-5 per-threshold bias, negligible
  * against bootstrap noise and 8× fewer hashes than a digest per rep:
  * the hash IS the dominant generator cost at corpus scale).
  * Multiplicity truncates at 4 (P(>4) ≈ 0.37% of mass lands on 4 —
  * documented, deterministic). Per-rep sums ride the exact decimal
  * dsumProd chain; each resample mean is ONE division of exact
  * operands; the CI bounds are SELECTIONS from the sorted R-array
  * (ci_lo = element ceil(0.025·R), ci_med = lower median, ci_hi =
  * ceil(0.975·R)) — all hash UNROUNDED (the q_gini protocol).
  *
  * `keyCol` must be unique per row (it seeds the row's multiplicity
  * stream); rows with NULL key or value drop; `reps` must be a
  * multiple of 8 (the digest block size). 100 TB shape: the explode is
  * map-local ×(R/8) on slim (key, value) rows, the eight weights of a
  * block fold into per-BLOCK partial sums INSIDE the aggregate (one
  * generator row per block, not eight — the r14 A/B win), and the
  * shuffle carries R/8 rows of 16 exact sums; per-rep state rows
  * materialize from those blocks after the exchange.
  */
object Bootstrap {

  private val CdfHex = Seq("5e2d", "bc5a", "eb71", "fb23")

  /** Per-resample MERGEABLE state `(__r, __swv DECIMAL, __sw)` — the
    * D27 streaming-CI monitor's carried rows: both fields are
    * associative exact sums, so [[mergeRepState]] of batch states ==
    * the one-shot state EXACTLY (the D14/IncrementalAgg argument).
    * Weights are md5-deterministic per (key, rep), so the merge is
    * arrival-order free; REPLAYING rows double-counts their weights —
    * the D20 contract: batches must PARTITION the input. ≤ R rows of
    * state at any corpus size.
    */
  def repState(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      reps: Int = 64,
      seed: String = "boot"): DataFrame = {
    require(reps >= 8 && reps % 8 == 0, s"reps must be a multiple of 8, got $reps")
    val dec = ExactMath.ValueDecimal
    // the ×(R/8) md5 generator below is the dominant cost and fuses into
    // the scan — fan the slim (key, value) projection out first so it
    // parallelizes when the input is an unsplittable single file (gated
    // no-op at scale; weights are md5-per-(key, block), so the result is
    // partitioning-independent). Measured: 6.5 s of q_bootstrap_ci's
    // 7.3 s sat in ONE task before this (ProfileStages, r16-opt).
    val clean = graft.operators.FanOut.byKey(
      df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
        .select(col(keyCol).cast("string").as("__k"),
          col(valueCol).cast(dec).as("__v")),
      col("__k"))
    def weightOf(slice: org.apache.spark.sql.Column) =
      when(slice < CdfHex(0), 0)
        .when(slice < CdfHex(1), 1)
        .when(slice < CdfHex(2), 2)
        .when(slice < CdfHex(3), 3)
        .otherwise(4)
    // per-BLOCK in-generator partial sums (the r13 verdict item-6 A/B,
    // ProfileBootstrap: 5.8 → 5.0 s at sf0.1, state rows bit-identical):
    // one generator row per (row, 8-rep block) carrying SIXTEEN sum
    // inputs — eight fixed-offset substring slices of ONE md5 (the
    // aggregate codegen CSEs the shared digest; the previous shape
    // posexploded 8 (row, rep) rows per block, amplifying the local
    // agg 8x). The per-rep rows explode AFTER the corpus-grain
    // aggregation, from R/8 block rows. Decimal sums are associative —
    // regrouping by block instead of rep reproduces the per-rep state
    // EXACTLY.
    val hex = md5(concat(lit(seed + ":"), col("__k"), lit(":"),
      col("__blk").cast("string")))
    def w(i: Int) = weightOf(substring(hex, 1 + 4 * i, 4))
    val aggs = (0 until 8).flatMap { i =>
      Seq(
        sum((col("__v") * w(i).cast(dec)).cast(dec)).as(s"__swv$i"),
        sum(w(i).cast("long")).as(s"__sw$i"))
    }
    clean
      .select(col("__k"), col("__v"),
        explode(sequence(lit(0), lit(reps / 8 - 1))).as("__blk"))
      .groupBy("__blk")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__blk"), posexplode(array((0 until 8).map(i =>
        struct(col(s"__swv$i").as("swv"), col(s"__sw$i").as("sw"))): _*)))
      .select((col("__blk") * 8 + col("pos")).as("__r"),
        col("col.swv").as("__swv"), col("col.sw").as("__sw"))
  }

  /** Field-wise associative merge of two [[repState]]s. */
  def mergeRepState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("__r"))
      .agg(sum(col("__swv")).as("__swv"), sum(col("__sw")).as("__sw"))

  /** CI derivation from carried state — ONE definition shared with the
    * batch path, so state-maintained == one-shot is structural (D27).
    */
  def ciFromState(state: DataFrame, reps: Int): DataFrame = {
    val means = state
      .where(col("__sw") > 0L)
      .select((col("__swv").cast("double") / col("__sw").cast("double"))
        .as("__mean"))
    val loIdx = math.max(1, math.ceil(reps * 0.025).toInt)
    val medIdx = (reps + 1) / 2
    val hiIdx = math.min(reps, math.ceil(reps * 0.975).toInt)
    means.agg(
      count(lit(1)).as("n_reps"),
      array_sort(collect_list(col("__mean"))).as("__ms"))
      .select(
        col("n_reps"),
        // the index columns degrade to NULL (not an error) if reps with
        // nonzero weight fall short of the selection index — only
        // possible on near-empty inputs
        when(col("n_reps") >= loIdx, element_at(col("__ms"), loIdx)).as("ci_lo"),
        when(col("n_reps") >= medIdx, element_at(col("__ms"), medIdx)).as("ci_med"),
        when(col("n_reps") >= hiIdx, element_at(col("__ms"), hiIdx)).as("ci_hi"))
  }

  def poissonBootstrapCi(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      reps: Int = 64,
      seed: String = "boot"): DataFrame = {
    val dec = ExactMath.ValueDecimal
    val overall = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .agg(
        count(lit(1)).as("n_rows"),
        ExactMath.dsum(col(valueCol).cast(dec)).as("__sv"))
    val ci = ciFromState(repState(df, keyCol, valueCol, reps, seed), reps)
    overall.crossJoin(ci).select(
      col("n_rows"),
      when(col("n_rows") > 0L,
        col("__sv") / col("n_rows").cast("double")).as("mean"),
      col("n_reps"), col("ci_lo"), col("ci_med"), col("ci_hi"))
  }

  /** Random-relabeling permutation test for a difference in means
    * between two cohorts (B109) — the significance sibling of
    * [[poissonBootstrapCi]] (CI there; p-value here): under H₀
    * (exchangeable labels) the observed mean difference should not be
    * extreme among differences computed with RANDOM labels. This is
    * the binomial-relabeling variant (each row relabels A/B with
    * probability ½ per rep, independent of the original group sizes —
    * the large-sample screen; an exact size-preserving permutation
    * needs a global shuffle per rep, which is the construction this
    * operator exists to avoid). p = (#{|Δ_perm| ≥ |Δ_obs|} + 1)/(R+1)
    * — the standard add-one estimate, ONE exact-int division.
    *
    * Determinism: labels are md5 NIBBLES — one digest per (row,
    * 32-rep block) chunked inside the generator (the repState lesson),
    * nibble < '8' ⇒ A (the Projection sign rule, exactly p=½). Per-rep
    * and observed differences ride exact decimal (n, Σv) pairs with
    * the SAME written IEEE sequence sA/nA − sB/nB, so the ≥ compare is
    * engine-identical; obs_diff and p_value hash UNROUNDED. Degenerate
    * reps (a side empties — vanishing probability beyond toy inputs)
    * drop from both the count and R in the p denominator. `reps` must
    * be a multiple of 32.
    */
  def permutationTest(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String,
      reps: Int = 64,
      seed: String = "perm"): DataFrame = {
    require(reps >= 32 && reps % 32 == 0,
      s"reps must be a multiple of 32, got $reps")
    val dec = ExactMath.ValueDecimal
    // same single-task-generator fix as repState: the ×(R/32) md5-nibble
    // relabeling dominates and must not run inside a 1-split scan
    val clean = graft.operators.FanOut.byKey(
      df.where(col(keyCol).isNotNull && col(valueCol).isNotNull &&
        col(groupCol).isin(groupA, groupB))
        .select(col(keyCol).cast("string").as("__k"),
          col(valueCol).cast(dec).as("__v"),
          (col(groupCol) === groupA).as("__a")),
      col("__k"))
    val obs = clean.agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"),
      ExactMath.dsum(when(col("__a"), col("__v"))).as("__sa"),
      ExactMath.dsum(when(!col("__a"), col("__v"))).as("__sb"))
    val obsDiff = col("__sa") / col("n_a").cast("double") -
      col("__sb") / col("n_b").cast("double")
    // one digest per (row, 32-rep block), chunked to single nibbles
    // inside the generator so md5 evaluates once per row-block
    val nibbles = slice(split(regexp_replace(
      md5(concat(lit(seed + ":"), col("__k"), lit(":"),
        col("__blk").cast("string"))),
      "(.)", "$1,"), ","), 1, 32)
    val perRep = clean
      .select(col("__k"), col("__v"),
        explode(sequence(lit(0), lit(reps / 32 - 1))).as("__blk"))
      .select(col("__v"), col("__blk"), posexplode(nibbles))
      .select(col("__v"), (col("__blk") * 32 + col("pos")).as("__r"),
        (col("col") < "8").as("__pa"))
      .groupBy("__r")
      .agg(
        sum(when(col("__pa"), 1L).otherwise(0L)).as("__na"),
        sum(when(!col("__pa"), 1L).otherwise(0L)).as("__nb"),
        ExactMath.dsum(when(col("__pa"), col("__v"))).as("__psa"),
        ExactMath.dsum(when(!col("__pa"), col("__v"))).as("__psb"))
      .where(col("__na") > 0L && col("__nb") > 0L)
      .select((col("__psa") / col("__na").cast("double") -
        col("__psb") / col("__nb").cast("double")).as("__pd"))
    val reduced = perRep.crossJoin(broadcast(obs)).agg(
      count(lit(1)).as("n_reps"),
      sum(when(abs(col("__pd")) >= abs(obsDiff), 1L).otherwise(0L)).as("n_ge"),
      max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
      max(obsDiff).as("obs_diff"))
    reduced.select(
      col("n_a"), col("n_b"),
      col("obs_diff"),
      col("n_reps"), col("n_ge"),
      when(col("n_reps") > 0L,
        (col("n_ge") + lit(1L)).cast("double")
          / (col("n_reps") + lit(1L)).cast("double")).as("p_value"))
  }
}
