package graft.operators.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    psiFromCounts(binned(base), binned(cur), nBins)
  }

  /** `(bin, n)` counts of `df` against equal-width bins derived from
    * `base`'s min/max — the associative MONITORING STATE of the drift
    * audit: bin counts merge by plain addition, so a streaming monitor
    * keeps one (bin, n) row per bin and folds each microbatch in
    * (`merge(counts(a), counts(b)) == counts(a ∪ b)` exactly — the
    * IncrementalAgg/D14 argument), then derives PSI on demand via
    * [[psiFromCounts]]. Identical binning to [[psiByBins]] (clamping,
    * degenerate-baseline bin 0, null drops).
    */
  def binCounts(
      base: DataFrame,
      df: DataFrame,
      valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val v = col(valueCol)
    val bounds = base.where(v.isNotNull)
      .agg(min(v).cast("double").as("__lo"), max(v).cast("double").as("__hi"))
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
  }

  /** PSI report from pre-binned `(bin, n)` count relations (missing
    * bins are zero-filled against the spine) — [[psiByBins]]'s tail,
    * exposed so merged monitoring state ([[binCounts]]) feeds the same
    * arithmetic the batch audit hashes.
    */
  def psiFromCounts(
      baseCounts: DataFrame,
      curCounts: DataFrame,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val spark: SparkSession = baseCounts.sparkSession
    val bc = baseCounts.select(col("bin"), col("n").as("n_base"))
    val cc = curCounts.select(col("bin"), col("n").as("n_cur"))
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
        graft.functions.ExactMath.hashRound(p, 4).as("p_base"), graft.functions.ExactMath.hashRound(q, 4).as("p_cur"),
        graft.functions.ExactMath.hashRound((p - q) * log(p / q), 4).as("psi_contrib"))
  }

  /** Kolmogorov–Smirnov drift over the same equal-width bin spine as
    * [[psiByBins]] — the TRANSCENDENTAL-FREE drift statistic: per-bin
    * `|ΔECDF|`, whose max is the (binned) KS distance. Where PSI weights
    * tail mass through a ln, KS sees the largest cumulative split —
    * different sensitivities, same monitoring slot; this one hashes
    * UNROUNDED because every value is a division of exact BIGINTs and a
    * fixed-order subtract/abs (no libm anywhere).
    *
    * Plan shape: [[binCounts]] twice (scan-fused binning, (bin, n)
    * partial aggs), spine join, 1-row totals broadcast, then ONE window
    * over the nBins-row AGGREGATED spine (bounded by construction — not
    * a data-grain window).
    */
  def ksByBins(
      base: DataFrame,
      cur: DataFrame,
      valueCol: String,
      nBins: Int = 40): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val spark: SparkSession = base.sparkSession
    val bc = binCounts(base, base, valueCol, nBins).select(col("bin"), col("n").as("n_base"))
    val cc = binCounts(base, cur, valueCol, nBins).select(col("bin"), col("n").as("n_cur"))
    val spine = spark.range(nBins).select(col("id").as("bin"))
    val joined = spine
      .join(bc, Seq("bin"), "left")
      .join(cc, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_base")).as("__tb"), sum(col("n_cur")).as("__tc"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    joined
      .crossJoin(broadcast(totals))
      .withColumn("__cb", sum(col("n_base")).over(w))
      .withColumn("__cc", sum(col("n_cur")).over(w))
      .select(col("bin"), col("n_base"), col("n_cur"),
        (col("__cb").cast("double") / col("__tb").cast("double")).as("cum_base"),
        (col("__cc").cast("double") / col("__tc").cast("double")).as("cum_cur"),
        abs(col("__cb").cast("double") / col("__tb").cast("double")
          - col("__cc").cast("double") / col("__tc").cast("double")).as("ks_contrib"))
  }

  /** Categorical PSI — [[psiByBins]]'s sibling for DISCRETE columns
    * (language mix, source mix, status vocabularies): shares over the
    * BASELINE's top-K categories plus one `__OTHER__` bucket. Bounding
    * the spine to K+1 rows is the 100 TB contract: a raw per-category
    * PSI over a web-scale vocabulary has unbounded output (and its own
    * drift — new categories appear every batch); here new/rare
    * categories land in OTHER, whose share moving IS vocabulary drift.
    *
    * Top-K selection is deterministic: baseline count DESC, category ASC
    * (a distributed TakeOrderedAndProject over the already-aggregated
    * (category, n) relation — never a global sort of the data grain).
    * Smoothing uses the ACTUAL spine size (min(K, distinct) + 1),
    * computed alongside the totals in the same 1-row broadcast. Same
    * Laplace smoothing and ln margin-audit contract as [[psiByBins]].
    */
  def psiByCategory(
      base: DataFrame,
      cur: DataFrame,
      catCol: String,
      topK: Int = 20): DataFrame =
    psiFromCategoryCounts(
      categoryCounts(base, base, catCol, topK),
      categoryCounts(base, cur, catCol, topK))

  private val OtherCat = "__OTHER__"

  /** `(category, n)` counts of `df` bucketed against the BASELINE's
    * frozen top-K spine (non-top and unseen categories → `__OTHER__`) —
    * the associative MONITORING STATE of the categorical drift audit
    * (the [[binCounts]] argument: counts merge by plain addition, so a
    * streaming monitor keeps ≤ K+1 rows and folds each microbatch in,
    * deriving the report on demand via [[psiFromCategoryCounts]]).
    */
  def categoryCounts(
      base: DataFrame,
      df: DataFrame,
      catCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val c = col(catCol)
    val top = base.where(c.isNotNull).groupBy(c.cast("string").as("category"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("category").asc).limit(topK)
      .select(col("category"))
    df.where(c.isNotNull).groupBy(c.cast("string").as("category"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(top.withColumn("__keep", lit(1))), Seq("category"), "left")
      .select(
        when(col("__keep").isNotNull, col("category")).otherwise(lit(OtherCat)).as("category"),
        col("n"))
      .groupBy("category").agg(sum(col("n")).as("n"))
  }

  /** PSI report from pre-bucketed `(category, n)` relations —
    * [[psiByCategory]]'s tail, exposed so merged monitoring state feeds
    * the same arithmetic the batch audit hashes. The spine is the base
    * side's categories plus `__OTHER__` (always present, zero-filled);
    * smoothing uses the actual spine size.
    */
  def psiFromCategoryCounts(baseCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val joined = categorySpine(baseCounts, curCounts)
    val totals = joined.agg(
      sum(col("n_base")).as("__tb"), sum(col("n_cur")).as("__tc"),
      count(lit(1)).as("__k"))
    val p = (col("n_base") + 1).cast("double") / (col("__tb") + col("__k")).cast("double")
    val q = (col("n_cur") + 1).cast("double") / (col("__tc") + col("__k")).cast("double")
    joined
      .crossJoin(broadcast(totals))
      .select(col("category"), col("n_base"), col("n_cur"),
        graft.functions.ExactMath.hashRound(p, 4).as("p_base"), graft.functions.ExactMath.hashRound(q, 4).as("p_cur"),
        graft.functions.ExactMath.hashRound((p - q) * log(p / q), 4).as("psi_contrib"))
  }

  /** The shared baseline-spine join: base-side categories plus an
    * always-present zero-filled `__OTHER__` row, left-joined counts.
    */
  private def categorySpine(baseCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val spine = baseCounts.select(col("category"))
      .unionByName(baseCounts.sparkSession.range(1).select(lit(OtherCat).as("category")))
      .distinct()
    spine
      .join(baseCounts.select(col("category"), col("n").as("n_base")), Seq("category"), "left")
      .join(curCounts.select(col("category"), col("n").as("n_cur")), Seq("category"), "left")
      .select(col("category"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  /** Jensen–Shannon divergence contributions between two snapshots'
    * category distributions (B101) — the SYMMETRIC, bounded-[0, ln 2]
    * companion of [[psiByCategory]] (PSI explodes when a category
    * empties on one side; JSD is finite for ANY pair of distributions,
    * the standard divergence for corpus-mix comparisons). Rides
    * [[categoryCounts]] verbatim (frozen base top-K + `__OTHER__`
    * spine, ≤ K+1 rows at any cardinality — the 100 TB contract).
    *
    * No smoothing: JSD is defined at zeros. Shares are ONE exact-int
    * division each; m = (p+q)/2; a zero-count side contributes 0 via
    * its `when` guard (never an evaluated ln of 0), and m > 0 whenever
    * either guard passes. jsd_contrib = (p·ln(p/m))/2 + (q·ln(q/m))/2
    * in that written order — the catalog's 8TH audited transcendental:
    * hashRound(4) with a MarginAuditSpec boundary audit re-deriving the
    * unrounded contribution from the exact hashed counts at 3 SFs.
    * p_base/p_cur hash UNROUNDED (single divisions, the q_gini rule).
    * Total JSD = SUM(jsd_contrib) — left to the reader/monitor, never
    * hashed (an order-dependent double sum).
    */
  def jsdByCategory(
      base: DataFrame,
      cur: DataFrame,
      catCol: String,
      topK: Int = 20): DataFrame =
    jsdFromCategoryCounts(
      categoryCounts(base, base, catCol, topK),
      categoryCounts(base, cur, catCol, topK))

  /** JSD report from pre-bucketed `(category, n)` relations — the
    * monitoring-state tail (the [[psiFromCategoryCounts]] shape: counts
    * merge by addition, a streaming monitor folds microbatches into
    * ≤ K+1 rows and derives this on demand).
    */
  def jsdFromCategoryCounts(baseCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val joined = categorySpine(baseCounts, curCounts)
    val totals = joined.agg(
      sum(col("n_base")).as("__tb"), sum(col("n_cur")).as("__tc"))
    val p = col("n_base").cast("double") / col("__tb").cast("double")
    val q = col("n_cur").cast("double") / col("__tc").cast("double")
    val m = (p + q) / lit(2.0)
    val termP = when(col("n_base") > 0L, p * log(p / m)).otherwise(lit(0.0))
    val termQ = when(col("n_cur") > 0L, q * log(q / m)).otherwise(lit(0.0))
    val ok = col("__tb") > 0L && col("__tc") > 0L
    joined
      .crossJoin(broadcast(totals))
      .select(col("category"), col("n_base"), col("n_cur"),
        when(col("__tb") > 0L, p).as("p_base"),
        when(col("__tc") > 0L, q).as("p_cur"),
        graft.functions.ExactMath.hashRound(
          when(ok, termP / lit(2.0) + termQ / lit(2.0)), 4).as("jsd_contrib"))
  }

  /** Hellinger distance contributions between two snapshots' category
    * distributions (B116) — the TRANSCENDENTAL-FREE member of the
    * divergence family ([[psiByCategory]] explodes at zeros and needs
    * smoothing; [[jsdByCategory]] is zero-safe but routes through ln and
    * carries a margin audit; Hellinger is zero-safe AND pure
    * +,−,×,÷,sqrt — every op correctly rounded, so everything hashes
    * UNROUNDED with no audit obligation). Rides [[categoryCounts]]
    * verbatim (frozen base top-K + `__OTHER__` spine, ≤ K+1 rows at any
    * cardinality — the 100 TB contract; counts merge by addition, the
    * same streaming-monitor state shape).
    *
    * Per category: shares p, q are ONE exact-int division each;
    * hel_contrib = (√p − √q)². hel_total = √(Σ contrib / 2) ∈ [0, 1]
    * with the Σ folded SEQUENTIALLY over the category-sorted spine
    * (init 0.0 — the init-less `list_reduce` mirror, 0.0 + x exact),
    * broadcast back onto every row. NULL shares/total when a side is
    * empty.
    */
  def hellingerByCategory(
      base: DataFrame,
      cur: DataFrame,
      catCol: String,
      topK: Int = 20): DataFrame =
    hellingerFromCategoryCounts(
      categoryCounts(base, base, catCol, topK),
      categoryCounts(base, cur, catCol, topK))

  /** Hellinger report from pre-bucketed `(category, n)` relations — the
    * monitoring-state tail (the [[psiFromCategoryCounts]] shape).
    */
  def hellingerFromCategoryCounts(baseCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val joined = categorySpine(baseCounts, curCounts)
    val totals = joined.agg(
      sum(col("n_base")).as("__tb"), sum(col("n_cur")).as("__tc"))
    val p = col("n_base").cast("double") / col("__tb").cast("double")
    val q = col("n_cur").cast("double") / col("__tc").cast("double")
    val ok = col("__tb") > 0L && col("__tc") > 0L
    val contrib = (sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q))
    val cells = joined
      .crossJoin(broadcast(totals))
      .select(col("category"), col("n_base"), col("n_cur"),
        when(col("__tb") > 0L, p).as("p_base"),
        when(col("__tc") > 0L, q).as("p_cur"),
        when(ok, contrib).as("hel_contrib"))
    val total = cells.agg(
      array_sort(collect_list(struct(col("category").as("c"),
        col("hel_contrib").as("h")))).as("hs"))
      .select(sqrt(aggregate(col("hs"), lit(0.0),
        (acc, e) => acc + e.getField("h")) / lit(2.0)).as("hel_total"))
    cells.crossJoin(broadcast(total))
  }

  /** Benford first-digit audit — the fabricated-figures screen auditors
    * run on money columns (procurement budgets are a textbook target):
    * observed leading-digit counts against Benford's law
    * `P(d) = log10(1 + 1/d)`, with per-digit chi-square contributions.
    *
    * Determinism without a libm call: the nine expected shares are
    * EMBEDDED LITERAL doubles (both engines parse the identical
    * literal), and the leading digit is extracted arithmetically — a
    * decade CASE chain `v ≥ 10^k → v / 10^k` (powers of ten up to 10¹⁴
    * are exactly representable, the division is one correctly-rounded
    * IEEE op, `floor` of the identical double matches in any engine) —
    * never via double→string formatting, which engines disagree on.
    * The chi-square chain is IEEE mul/sub/div on exact counts and
    * literal shares, rounded to 4 (hash-safe, no margin audit needed —
    * no transcendental is EVALUATED anywhere).
    *
    * Contract: rows with NULL or `v < 1` are dropped (sub-unit values
    * would need a negative-decade chain; money columns start at 1 unit);
    * values must sit below `10^(maxDecade+1)` — beyond it the chain
    * clamps the digit to 9 (documented, deterministic) rather than
    * failing. All nine digits always appear (zero-count digits carry
    * their full expected mass in the contribution). One scan-fused
    * digit pass, a (digit, count) partial agg, a 1-row total broadcast.
    */
  def benfordByDigit(
      df: DataFrame,
      valueCol: String,
      maxDecade: Int = 14): DataFrame = {
    require(maxDecade >= 0 && maxDecade <= 22,
      s"maxDecade must be in [0, 22] (exact double powers of ten), got $maxDecade")
    val spark: SparkSession = df.sparkSession
    val v = col(valueCol).cast("double")
    // log10(1 + 1/d), d = 1..9 — literal, never computed at runtime
    val expected = Seq(
      0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
      0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
    val mantissa = (maxDecade to 1 by -1).foldRight(v) { (k, acc) =>
      // foldRight builds WHEN v>=10^maxDecade ... WHEN v>=10 THEN v/10 ELSE v
      when(v >= lit(math.pow(10, k)), v / lit(math.pow(10, k))).otherwise(acc)
    }
    val digits = df
      .where(v.isNotNull && v >= 1)
      .select(least(floor(mantissa), lit(9L)).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val spine = spark.range(1, 10).select(col("id").as("digit"))
      .join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
    val tot = spine.agg(sum(col("n_obs")).as("__n"))
    val expCol = expected.zipWithIndex.foldLeft(lit(Double.NaN)) { case (acc, (e, i)) =>
      when(col("digit") === (i + 1), lit(e)).otherwise(acc)
    }
    val n = col("__n").cast("double")
    val expN = n * expCol
    spine
      .crossJoin(broadcast(tot))
      .select(
        col("digit"),
        col("n_obs"),
        when(col("__n") > 0, graft.functions.ExactMath.hashRound(col("n_obs").cast("double") / n, 4)).as("obs_share"),
        graft.functions.ExactMath.hashRound(expCol, 4).as("exp_share"),
        when(col("__n") > 0,
          graft.functions.ExactMath.hashRound((col("n_obs").cast("double") - expN) * (col("n_obs").cast("double") - expN)
            / expN, 4)).as("chi2_contrib"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between two named groups of
    * one column (B91) — the transcendental-free distribution-shift test
    * at full resolution: where [[ksByBins]] compares snapshots over a
    * fixed bin spine, this compares two cohorts over the exact VALUE
    * spine (one partial agg to (value, per-group counts) — the B48
    * first-occurrence shape — then cumulative windows over that
    * AGGREGATED spine, bounded by distinct values, never raw rows).
    *
    * Determinism: ECDF steps are divisions of exact BIGINT cumulative
    * counts (correctly rounded, identical both engines), the max picks
    * by (d DESC, value ASC) — exact-double ties break on the value — so
    * `ks_d` and `at_value` hash UNROUNDED (the q_gini protocol).
    * Single-row output: n_a, n_b, ks_d, at_value. Degenerate inputs
    * (either group matching ZERO rows) yield NULL ks_d/at_value — the
    * mannWhitney/welchT/anovaOneWay convention; an unguarded division
    * would be 0/0 NaN on the Spark side while DuckDB's double
    * division-by-zero behaves differently.
    */
  def ksTwoSample(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val v = col(valueCol)
    val cells = df
      .where(col(groupCol).isin(groupA, groupB) && v.isNotNull)
      .groupBy(v.as("__s"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("__cb"))
    // distributed exclusive prefixes over the value spine (the
    // mannWhitney spine contract — bit-neutral vs the single-task
    // global window); inclusive cum = exclusive prefix + own count,
    // totals via a 1-row broadcast agg (was a second global window)
    val totals = cells.agg(
      sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    graft.operators.stats.RankedSpine
      .exclusivePrefix(cells, Nil, "__s",
        Seq("__ca" -> "__befa", "__cb" -> "__befb"))
      .withColumn("__cuma", col("__befa") + col("__ca"))
      .withColumn("__cumb", col("__befb") + col("__cb"))
      .crossJoin(broadcast(totals))
      .withColumn("__d", when(col("__na") > 0L && col("__nb") > 0L, abs(
        col("__cuma").cast("double") / col("__na").cast("double")
          - col("__cumb").cast("double") / col("__nb").cast("double"))))
      .agg(
        max(col("__na")).as("n_a"),
        max(col("__nb")).as("n_b"),
        max(struct(col("__d"), (lit(-1.0) * col("__s").cast("double")).as("__nv")))
          .as("__top"))
      .select(
        col("n_a"), col("n_b"),
        col("__top").getField("__d").as("ks_d"),
        when(col("__top").getField("__d").isNotNull,
          lit(-1.0) * col("__top").getField("__nv")).as("at_value"))
  }
}
