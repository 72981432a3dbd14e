package graft.operators.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactMath

/** Grouped least-squares / correlation over exact sufficient statistics.
  *
  * Spark's builtin `corr`/`regr_slope` aggregate raw doubles, so their
  * results depend on partial-aggregation order — two runs (or two
  * engines) can disagree in the last ulp, which an oracle hash compare
  * treats as failure. This operator instead reduces each group to the
  * five classical sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
  * summed EXACTLY in decimal ([[ExactMath]] — associative, so
  * partial aggregation and AQE re-plans cannot change them), then
  * derives slope/intercept/corr with one fixed sequence of IEEE double
  * ops (mul/sub/div and correctly-rounded sqrt — each deterministic
  * given identical operands). The whole pipeline is therefore
  * bit-reproducible across partitionings AND re-derivable verbatim by
  * any engine with exact decimal sums (the DuckDB oracle mirrors the
  * same formula on unrounded doubles).
  *
  * Scale shape: one partial-aggregated `groupBy` — the only shuffle
  * moves ≤ (groups × 6 decimals), never rows. Degenerate groups
  * (variance 0 after the double conversion) yield NULL slope/corr
  * rather than NaN/Inf so results stay hash-comparable.
  *
  * Reference behavior: the reference's pandas-agg surface
  * (`openai/my_toolkit.py` summary blocks) exposes means only; grouped
  * OLS/corr is the natural next analytics grain over the same tables.
  */
object Stats {

  /** Per-group simple linear regression of `y` on `x` plus Pearson
    * correlation. Rows with a NULL in either column are dropped (the
    * standard pairwise-complete contract). Output columns:
    * group cols, `n_pairs`, `x_mean`, `y_mean`, `slope`, `intercept`,
    * `corr` — unrounded doubles, deterministic as documented above.
    */
  def regression(df: DataFrame, xCol: String, yCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "regression needs at least one group column")
    val x = col(xCol)
    val y = col(yCol)
    val base = df.where(x.isNotNull && y.isNotNull)
    // per-row product: exact decimal mul (scale 12), rounded ONCE per
    // row back to the ValueDecimal scale — keeps every aggregate on the
    // proven scale-6 decimal→double conversion path (SURVEY §5); the
    // round is deterministic (exact operand, half-away-from-zero in
    // both engines) and the sum of rounded products stays exact
    def dsumProd(a: Column, b: Column): Column =
      sum((a.cast(ExactMath.ValueDecimal) * b.cast(ExactMath.ValueDecimal))
        .cast(ExactMath.ValueDecimal)).cast("double")
    val agg = base.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      ExactMath.dsum(x).as("sx"),
      ExactMath.dsum(y).as("sy"),
      dsumProd(x, y).as("sxy"),
      dsumProd(x, x).as("sxx"),
      dsumProd(y, y).as("syy")
    )
    // fixed IEEE op order below — the DuckDB oracle repeats it verbatim.
    // Sum-of-squares magnitudes can leave the 2^53 exact decimal→double
    // conversion envelope (unscaled syy > 2^53 already at sf0.001, where
    // DuckDB's hugeint→double→/10^scale double-rounds vs Java's single
    // correct rounding — measured: 1-ulp corr divergence), so every
    // derived ratio is rounded before hashing. Digits scale with the
    // column's magnitude so the rounding margin stays decades above the
    // conversion drift (≤ ~|v|·1e-14): means/intercept (up to ~1e5) → 4
    // digits, slope (O(1..10)) → 6, corr (|corr| ≤ 1) → 8. StatsSpec's
    // boundary-margin sweep asserts the headroom at all three SFs (the
    // MarginAuditSpec convention — an 8-digit uniform choice FAILED that
    // audit: a ~5e4-magnitude mean landed 9e-11 from a boundary).
    // `+ 0.0` collapses IEEE -0.0 identically in both engines.
    val n = col("n_pairs").cast("double")
    val num = n * col("sxy") - col("sx") * col("sy")
    val denx = n * col("sxx") - col("sx") * col("sx")
    val deny = n * col("syy") - col("sy") * col("sy")
    def out(c: Column, digits: Int): Column = graft.functions.ExactMath.hashRound(c, digits) + lit(0.0)
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n_pairs"),
        out(col("sx") / n, 4).as("x_mean"),
        out(col("sy") / n, 4).as("y_mean"),
        out(when(denx > 0d, num / denx), 6).as("slope"),
        out(when(denx > 0d, (col("sy") - (num / denx) * col("sx")) / n), 4).as("intercept"),
        out(when(denx > 0d && deny > 0d, num / (sqrt(denx) * sqrt(deny))), 8).as("corr")
      ): _*)
  }

  /** Spearman rank correlation per group (Spearman 1904): Pearson
    * correlation of the two columns' within-group AVERAGE ranks — the
    * monotone-association strength companion to the Mann–Kendall
    * direction test (Trend), robust to outliers and nonlinearity where
    * [[regression]]'s Pearson r is not.
    *
    * Determinism: ties take the average rank, and DOUBLED average
    * ranks are exact integers — 2·r̄ = 2·rank_min + tiecount − 1 (rank
    * and the tie count are both value-determined, so NO tiebreak
    * column is needed; the q_percent_rank rule) — which then ride
    * [[regression]]'s proven decimal-sufficient-stat chain unchanged
    * (`rho` = its `corr`, rounded 8; doubling cancels in the
    * correlation but keeps every input integral). Constant columns
    * yield NULL rho via the regression variance guards.
    *
    * Scale shape: two per-group VALUE-SPINE aggregations through the
    * [[RankedSpine]] distributed exclusive prefix (no per-group
    * single-task sort — a huge group's spine range-partitions like any
    * other data), re-attached to rows via slim (group, value)
    * equi-joins, feeding one partial agg; doubled ranks stay ≤ 2n so
    * the DECIMAL(18,6) product envelope holds for groups up to ~1e5
    * rows (the documented bound — bigger groups would need wider
    * moment decimals).
    */
  def spearmanByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "spearman needs at least one group column")
    val g = groupCols.map(col)
    // localCheckpoint the SLIM (group, x, y) projection once: the two
    // rankSpine calls each aggregate it and the two re-attach joins each
    // scan it again — without the pin the cleaned input re-derives ~4x
    // from the source (the q_rfm lesson, CLAUDE.md r8; VERDICT r14 #2).
    // Values are unchanged, so the oracle rows stay byte-identical.
    val clean = df
      .where((g.map(_.isNotNull) ++ Seq(col(xCol).isNotNull, col(yCol).isNotNull))
        .reduce(_ && _))
      .select((groupCols ++ Seq(xCol, yCol)).distinct.map(col): _*)
      .localCheckpoint(true)
    // doubled average rank from the per-group VALUE SPINE: a tie run of
    // length cnt starting after `before` rows has doubled average rank
    // 2·(before+1) + cnt − 1 = 2·before + cnt + 1 — the same integers
    // the historical per-group rank()/tie-count windows produced, now
    // via the RankedSpine distributed prefix (no per-group single-task
    // sort; the r13 verdict's per-group spine fix) and re-attached to
    // rows by a slim (group, value) equi-join.
    def rankSpine(c: String, out: String): DataFrame =
      RankedSpine
        .exclusivePrefix(
          clean.groupBy((g :+ col(c)): _*).agg(count(lit(1)).as("__cnt")),
          groupCols, c, Seq("__cnt" -> "__bef"))
        .select((g :+ col(c)) :+
          (lit(2L) * col("__bef") + col("__cnt") + lit(1L)).as(out): _*)
    val ranked = clean
      .join(rankSpine(xCol, "__rx"), groupCols :+ xCol)
      .join(rankSpine(yCol, "__ry"), groupCols :+ yCol)
    regression(ranked, "__rx", "__ry", groupCols)
      .select(g ++ Seq(col("n_pairs"), col("corr").as("rho")): _*)
  }

  /** Rolling trend strength: Pearson correlation of (value, position)
    * over each row's trailing `frameLen`-row frame within its group —
    * "is the metric trending, not just spiking?" (the monitoring sibling
    * of a rolling-mean anomaly screen). Emits only full frames.
    *
    * Determinism at ANY series length: the frame x-axis is RELATIVE
    * (j = 1..L), so Σx = L(L+1)/2, Σx² and the x-variance term are
    * CONSTANTS, and Σ(j·y) derives EXACTLY from the windowed decimal
    * sums as `sxy − (i−L)·sy` — the only doubles entering the corr
    * chain are small exact conversions however long the partition grows
    * (an absolute-index formulation overflows 2⁵³ decimal units on long
    * series). `valueCol` quantizes at DECIMAL(18,2) (the dsum-proven
    * double→decimal cast), making every windowed sum associative-exact:
    * frame evaluation order cannot matter. The corr chain is the
    * [[regression]] convention (IEEE mul/sub/div + correctly-rounded
    * sqrt), rounded to 6.
    *
    * Scale: one shuffle on the group key; a key's history sorts in one
    * task (the sessionize/as-of bound). NULL group/order/value rows are
    * dropped. Constant-y frames yield NULL (zero variance).
    */
  def rollingTrend(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      frameLen: Int = 20): DataFrame = {
    require(frameLen >= 2 && frameLen <= 10000,
      s"frameLen must be in [2, 10000], got $frameLen")
    val lL = frameLen.toLong
    val sxC = lL * (lL + 1) / 2 // Σ j
    val sxxC = lL * (lL + 1) * (2 * lL + 1) / 6 // Σ j²
    val denxC = (lL * sxxC - sxC * sxC).toDouble // constant x-variance term
    val w0 = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(tsCol), col(tieCol))
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__i")).rowsBetween(1 - frameLen, 0)
    val f = df
      .where(col(groupCol).isNotNull && col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(tieCol), col(tsCol),
        col(valueCol).cast("decimal(18,2)").as("__y"))
      .withColumn("__i", row_number().over(w0).cast("long"))
      .withColumn("__n", count(lit(1)).over(wf))
      .withColumn("__sxy", sum(col("__i") * col("__y")).over(wf))
      .withColumn("__sy", sum(col("__y")).over(wf))
      .withColumn("__syy", sum(col("__y") * col("__y")).over(wf))
      .where(col("__n") === frameLen)
    val sxyRel = (col("__sxy") - (col("__i") - lit(lL)) * col("__sy")).cast("double")
    val syD = col("__sy").cast("double")
    val syyD = col("__syy").cast("double")
    val num = lit(lL.toDouble) * sxyRel - lit(sxC.toDouble) * syD
    val deny = lit(lL.toDouble) * syyD - syD * syD
    f.select(col(groupCol), col(tieCol),
      (graft.functions.ExactMath.hashRound(when(deny > 0, num / (sqrt(lit(denxC)) * sqrt(deny))), 6) + lit(0.0))
        .as("trend_corr"))
  }

  /** Per-group two-proportion z-test of each group against its
    * complement — the "is this segment's rate actually different?"
    * screen behind every A/B readout and segment comparison. For group
    * g with successes x₁ of n₁ vs the rest's x₂ of n₂:
    * `z = (p₁ − p₂) / sqrt(p̂(1−p̂)(1/n₁ + 1/n₂))`, p̂ pooled.
    *
    * Determinism: all inputs are exact BIGINT counts from ONE partial-
    * aggregated pass (complement counts come from the 1-row global
    * total broadcast minus the group's own — no second scan, no
    * self-join); the z chain is a fixed sequence of IEEE div/mul/sub/
    * add and one correctly-rounded sqrt — bit-identical in any engine,
    * no libm, so `round(z, 4)` is hash-safe without a margin audit
    * (the `regression` convention). The significance flag compares the
    * ROUNDED z against the critical value in both engines (the B35
    * fence rule). Degenerate cases (empty group/complement, pooled
    * rate 0 or 1 — zero variance) yield NULL z and NULL flag.
    *
    * `successCol` must be 0/1 (pre-derive a condition upstream).
    */
  def twoProportionZ(
      df: DataFrame,
      groupCol: String,
      successCol: String,
      critical: Double = 1.96): DataFrame = {
    val agg = df
      .where(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_group"),
        sum(col(successCol).cast("long")).as("n_success"))
    val tot = agg.agg(sum(col("n_group")).as("__tn"), sum(col("n_success")).as("__tx"))
    val n1 = col("n_group").cast("double")
    val x1 = col("n_success").cast("double")
    val n2 = (col("__tn") - col("n_group")).cast("double")
    val x2 = (col("__tx") - col("n_success")).cast("double")
    val p1 = x1 / n1
    val p2 = x2 / n2
    val pp = (x1 + x2) / (n1 + n2)
    val z = (p1 - p2) / sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / n1 + lit(1.0) / n2))
    val zOut = when(n1 > 0 && n2 > 0 && pp > 0 && pp < 1, graft.functions.ExactMath.hashRound(z, 4) + lit(0.0))
    agg
      .crossJoin(broadcast(tot))
      .select(
        col(groupCol),
        col("n_group"),
        col("n_success"),
        graft.functions.ExactMath.hashRound(when(n1 > 0, p1), 4).as("p_group"),
        zOut.as("z_score"),
        when(zOut.isNotNull, abs(zOut) > critical).as("significant"))
  }

  /** Per-group Gini coefficient of a non-negative integer size measure —
    * the concentration audit (is 80% of the workload on 2% of the
    * suppliers?) a procurement or curation pipeline runs before trusting
    * a "balanced" dataset. Uses the rank formulation over ascending
    * sizes: G = (2·Σᵢ i·sᵢ − (n+1)·Σᵢ sᵢ) / (n·Σᵢ sᵢ), i = 1..n.
    *
    * Determinism: sizes are integers and Σ i·sᵢ is value-determined —
    * tied sizes swap ranks with equal terms, so the sum only depends on
    * the (size → count) spine; both Σ terms accumulate EXACTLY in
    * DECIMAL(38,0) (wrap-safe past the historical LONG path's ~2⁶³
    * bound) and the single division is one IEEE op on correctly-rounded
    * conversions of exact integers — hash-identical in any engine with
    * no rounding step. All-equal sizes give exactly 0.0. `tieCol` is
    * retained for signature stability only.
    *
    * NULL/negative sizes are dropped (a negative "size" breaks the
    * Lorenz-curve reading); an all-dropped group disappears; a group
    * with total size 0 yields NULL (the share curve is undefined).
    * Scale: one data-grain shuffle to entity grain upstream of the
    * caller, one partial agg to the per-group size spine, then the
    * [[RankedSpine]] distributed exclusive prefix — a huge group never
    * sorts through one task (the r13 verdict's per-group spine fix).
    */
  /** Herfindahl–Hirschman market-concentration index per group — the
    * antitrust/procurement screen (DOJ bands: <1 500 competitive,
    * 1 500–2 500 moderate, >2 500 concentrated, on HHI×10 000; this
    * emits the raw Σ share² in [1/n, 1]): Σ share² = Σv² / tot², with
    * BOTH sums decimal-exact partial aggregations — order-independent
    * with NO per-group list state (the r8 verdict's slimming, measured
    * equal-or-faster than the previous entity-sorted fold), converted
    * to double for exactly two IEEE ops (one division, one multiply).
    * Rounded to 4 (the similarity-output rule). Scale contract: state is
    * one decimal pair per (group, entity) at the first aggregation and
    * one triple per group at the second — never a materialized
    * participant list. Per-entity revenue must fit DECIMAL(18,6) (the
    * square stays inside decimal-exact range); a value beyond that
    * RAISES (with ANSI off, the narrowing cast alone would yield NULL
    * and SQL SUM would silently skip the entity — a plausible-looking
    * wrong HHI).
    */
  def hhiByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      entityCol: String,
      valueCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "hhiByGroup needs at least one group column")
    val g = groupCols.map(col)
    val per = df
      .groupBy((g :+ col(entityCol)): _*)
      .agg(sum(valueCol.cast("decimal(18,6)")).as("__rev_w"))
      .select((g :+
        when(abs(col("__rev_w")) < lit(1000000000000L), col("__rev_w").cast("decimal(18,6)"))
          .otherwise(raise_error(concat(
            lit("hhiByGroup: per-entity value "), col("__rev_w").cast("string"),
            lit(" exceeds DECIMAL(18,6) - rescale the value column first"))))
          .as("__rev_d")): _*)
    per
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n_entities"),
        sum(col("__rev_d")).cast("double").as("__tot"),
        sum(col("__rev_d") * col("__rev_d")).cast("double").as("__sumsq"))
      .select((g ++ Seq(
        col("n_entities"),
        graft.functions.ExactMath.hashRound(col("__sumsq") / (col("__tot") * col("__tot")), 4).as("hhi"))): _*)
  }

  def giniByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      sizeCol: String,
      tieCol: String): DataFrame = {
    require(groupCols.nonEmpty, "giniByGroup needs at least one group column")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // Σᵢ i·sᵢ only depends on the (size → count) spine: a tie run of
    // length cnt starting after `before` rows contributes
    // s·Σ(before+1 .. before+cnt) = s·(2·cnt·before + cnt·(cnt+1))/2,
    // so the doubled sum 2Σi·s is integral per cell — one partial agg
    // to the per-group size spine, a DISTRIBUTED exclusive prefix (the
    // mannWhitney spine contract, grouped variant — no per-group
    // single-task row_number sort), and exact DECIMAL(38,0) products
    // (wrap-safe where the historical LONG Σi·s wraps at target scale;
    // identical integers ⇒ identical doubles, bit-neutral). `tieCol`
    // is retained for signature stability; the spine form needs no
    // tiebreak (tied sizes swap ranks with equal terms — the identity
    // the historical scaladoc already relied on).
    val cells = df.where(col(sizeCol).isNotNull && col(sizeCol) >= 0)
      .groupBy((groupCols.map(col) :+ col(sizeCol).cast("long").as("__s")): _*)
      .agg(count(lit(1)).as("__cnt"))
    RankedSpine
      .exclusivePrefix(cells, groupCols, "__s", Seq("__cnt" -> "__bef"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__cnt")).as("n_entities"),
        // 2·Σ i·s, exact in DECIMAL(38,0) — operands cast BEFORE the
        // products (a LONG cnt·before wraps past ~3e9 rows)
        sum(col("__s").cast(d38)
          * (lit(2L).cast(d38) * col("__cnt").cast(d38) * col("__bef").cast(d38)
            + col("__cnt").cast(d38)
              * (col("__cnt") + lit(1L)).cast(d38))).as("__a2"),
        sum(col("__s").cast(d38) * col("__cnt").cast(d38)).as("__b"))
      .select(
        groupCols.map(col) ++ Seq(
          col("n_entities"),
          when(col("__b") > 0,
            (col("__a2") - (col("n_entities") + lit(1L)).cast(d38) * col("__b"))
              .cast("double")
              / (col("n_entities").cast(d38) * col("__b")).cast("double")).as("gini")
        ): _*)
  }

  /** Per-group ROC-AUC of a numeric score against a binary label — the
    * standard classifier-eval statistic, computed by the tie-aware
    * Mann–Whitney rank-sum identity (never by trapezoid sweep):
    *
    *   AUC = (Σ_{positives} rank − P(P+1)/2) / (P·N)
    *
    * with average ranks on tied scores. Everything stays EXACT until one
    * final IEEE division (the q_gini rule): per (group, score) tie-cell
    * the doubled positive rank-sum contribution is the INTEGER
    * `pos · (2·cum_before + cnt + 1)` (twice the average rank of a tie
    * run of length cnt starting after cum_before rows), accumulated in
    * DECIMAL(38,0) — order-free, and wrap-safe far beyond BIGINT (the
    * keySkew lesson: int64 products wrap at target scale; group counts
    * here are safe to ~10¹⁸ rows). AUC = (2Σr − P(P+1)) / (2PN) as one
    * double division, NULL when a group lacks both classes (NULLIF, the
    * engine-portable x/0 guard).
    *
    * Scale: one partial agg to the (group, score) spine, the
    * [[RankedSpine]] distributed exclusive prefix over it (a huge
    * group's continuous-score spine never sorts through one task — the
    * r13 verdict's per-group spine fix), one final agg.
    */
  def rocAucByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      labelCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "rocAucByGroup needs at least one group column")
    val g = groupCols.map(col)
    val d18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val cells = df
      // NULL labels are DROPPED, not defaulted: count(lit(1)) would count
      // the row while sum(label) skips it — silently scoring an unlabeled
      // row as a negative (the ADVICE r11 latent-divergence class)
      .where(g.map(_.isNotNull).reduce(_ && _) && col(scoreCol).isNotNull &&
        labelCol.isNotNull)
      .groupBy(g :+ col(scoreCol).as("__s"): _*)
      .agg(
        count(lit(1)).as("__cnt"),
        sum(labelCol.cast("long")).as("__pos"))
    // distributed per-group exclusive prefix — a huge group's score
    // spine no longer sorts through one task (the mannWhitney spine
    // contract, grouped variant; bit-neutral vs the per-group window)
    RankedSpine
      .exclusivePrefix(cells, groupCols, "__s", Seq("__cnt" -> "__before"))
      .groupBy(g: _*)
      .agg(
        sum(col("__cnt")).as("n"),
        sum(col("__pos")).as("n_pos"),
        sum(col("__pos").cast(d18)
          * (lit(2L) * col("__before") + col("__cnt") + lit(1L)).cast(d18)).as("__r2"))
      .select(g ++ Seq(
        col("n"), col("n_pos"),
        // numerator stays DECIMAL-exact (sum + one (18,0)×(18,0) product,
        // both within DuckDB's static 38-width cap); the denominator is a
        // plain double product — a triple decimal product would exceed the
        // cap, and a correctly-rounded double product of two exact counts
        // is deterministic in both engines
        ((col("__r2") - col("n_pos").cast(d18) * (col("n_pos") + lit(1L)).cast(d18))
          .cast("double")
          / nullif(lit(2.0) * col("n_pos").cast("double")
            * (col("n") - col("n_pos")).cast("double"), lit(0.0)))
          .as("auc")): _*)
  }

  /** Pearson chi-square independence audit between two categorical
    * columns, at CELL grain — one row per observed (a, b) pair with its
    * expected count under independence and its χ² contribution. The
    * per-cell grain is the determinism contract: observed/row/col/total
    * counts are exact BIGINTs, `expected = (row·col)/n` and
    * `contrib = (obs−E)·(obs−E)/E` are each ONE fixed IEEE sequence on
    * those exact counts (products taken in DOUBLE — correctly rounded
    * and wrap-safe where a BIGINT row·col product would overflow at
    * target scale), so unrounded doubles hash-match. No χ² TOTAL is
    * emitted: a sum of per-cell doubles would be order-dependent; the
    * consumer folds contributions in its own defined order.
    *
    * Scale: one partial agg to the cell spine, then windows over that
    * AGGREGATED spine (cells ≤ |A|·|B|, a few dozen rows for real
    * categorical columns — the q_drift_ks shape).
    */
  /** Cramér's V effect size (Cramér 1946) — "HOW associated are these
    * two categoricals?", the magnitude companion to [[chiSquareCells]]'
    * per-cell test statistics: V = sqrt((χ²/n) / min(r−1, c−1)) ∈ [0,1].
    *
    * The χ² TOTAL is an order-dependent sum of IEEE contributions —
    * exactly what q_chi_square declined to emit — so it folds over the
    * (a, b)-sorted GRID-COMPLETED cell array (the logRank protocol:
    * Spark's 0.0-init `aggregate` == DuckDB's init-less `list_reduce`,
    * 0.0+x exact; the grid because zero cells contribute E, see below).
    * Each contribution is the same pinned per-cell sequence the
    * q_chi_square oracle already hash-matches, so chi2 — and V through
    * one exact-int division, one division by the exact min, and one
    * correctly-rounded sqrt — hashes UNROUNDED.
    *
    * One row out; the cell list is bounded by the level-count product
    * (the B73 few-categories contract). Degenerate 1×c / r×1 tables
    * (min dof = 0) yield NULL v.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // GRID-complete the contingency table before totalling: a zero
    // cell contributes (0−E)²/E = E to χ², and [[chiSquareCells]]'
    // observed-cell grain omits it — a perfect-association 2×2 would
    // understate V as √½ instead of 1 (spec-pinned). Zero cells leave
    // the margins unchanged, so totals window over the grid safely.
    val observed = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("observed"))
    val cells = observed.select(col(aCol)).distinct()
      .crossJoin(broadcast(observed.select(col(bCol)).distinct()))
      .join(observed, Seq(aCol, bCol), "left")
      .na.fill(0L, Seq("observed"))
      .withColumn("row_total", sum(col("observed")).over(W.partitionBy(col(aCol))))
      .withColumn("col_total", sum(col("observed")).over(W.partitionBy(col(bCol))))
      .withColumn("grand_total", sum(col("observed")).over(W.partitionBy()))
      .withColumn("expected",
        (col("row_total").cast("double") * col("col_total").cast("double"))
          / col("grand_total").cast("double"))
      .withColumn("contrib",
        (col("observed").cast("double") - col("expected"))
          * (col("observed").cast("double") - col("expected")) / col("expected"))
    val agg = cells.agg(
      array_sort(collect_list(struct(
        col(aCol).as("a"), col(bCol).as("b"), col("contrib").as("x")))).as("__sp"),
      countDistinct(col(aCol)).as("r_levels"),
      countDistinct(col(bCol)).as("c_levels"),
      max(col("grand_total")).as("n_obs"))
    val chi2 = aggregate(col("__sp"), lit(0.0),
      (acc, e) => acc + e.getField("x"))
    val dof = least(col("r_levels") - 1L, col("c_levels") - 1L)
    agg
      .withColumn("chi2", chi2)
      .withColumn("dof_min", dof)
      .withColumn("cramers_v",
        when(col("dof_min") > 0L,
          sqrt((col("chi2") / col("n_obs").cast("double"))
            / col("dof_min").cast("double"))))
      .select("n_obs", "r_levels", "c_levels", "chi2", "dof_min", "cramers_v")
  }

  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val cells = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("observed"))
    val withTotals = cells
      .withColumn("row_total", sum(col("observed")).over(W.partitionBy(col(aCol))))
      .withColumn("col_total", sum(col("observed")).over(W.partitionBy(col(bCol))))
      .withColumn("grand_total", sum(col("observed")).over(W.partitionBy()))
    val e = (col("row_total").cast("double") * col("col_total").cast("double")) /
      col("grand_total").cast("double")
    withTotals
      .withColumn("expected", e)
      .withColumn("contrib",
        (col("observed").cast("double") - col("expected"))
          * (col("observed").cast("double") - col("expected")) / col("expected"))
  }

  /** One-way ANOVA F over the sufficient-statistic spine (B89): the
    * classic "do the group means differ" screen, from the same exact
    * decimal sums as [[regression]] — per group n/Σv/Σv² (each v²
    * product exact in DECIMAL(18,6), sums auto-widened), then ONE
    * order-free derivation: the k-group spine collects into a
    * group-sorted array and every double fold is sequential in group
    * order (the q_seasonality convention — a plain double SUM over the
    * spine would be partial-agg-order-dependent). SSB = Σ(S_g²/n_g) −
    * S²/N, SSW = Q − Σ(S_g²/n_g), F = (SSB/(k−1))/(SSW/(N−k)).
    *
    * Determinism: counts exact BIGINT; the decimal→double conversions
    * are the q_regression drift class (exact under 2^53 scaled units,
    * ≤ ~|v|·1e-14 beyond), every subsequent op one fixed IEEE
    * sequence mirrored verbatim in SQL; `f_stat` rounds via hashRound
    * at 4 with a StatsSpec margin audit (the B38 protocol). NULL when
    * k < 2 or SSW ≤ 0 (degenerate — no within-group variance).
    * Single-row output; the group spine is k rows, the fact table is
    * touched once by one partial-aggregated groupBy.
    */
  def anovaOneWay(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    anovaFromState(anovaGroupState(df, groupCol, valueCol))

  /** `(g, n_g, s_dec, q_dec)` per-group EXACT decimal sufficient sums —
    * the associative MONITORING STATE behind [[anovaOneWay]] and
    * [[etaSquared]] (D33, the D25 moments shape): every field is a
    * BIGINT count or an exact decimal sum, so [[mergeAnovaGroupState]]
    * of microbatch states == the one-shot state EXACTLY, and the
    * streaming experiment monitor derives F/η²/ω² on demand from the
    * merged state via [[anovaFromState]]/[[etaFromState]] (shared
    * derivations make state==one-shot structural). NOT idempotent (the
    * D20 partition contract).
    */
  def anovaGroupState(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.where(col(groupCol).isNotNull && v.isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_g"),
        sum(v.cast(ExactMath.ValueDecimal)).as("s_dec"),
        sum((v.cast(ExactMath.ValueDecimal) * v.cast(ExactMath.ValueDecimal))
          .cast(ExactMath.ValueDecimal)).as("q_dec"))
      .select(col(groupCol).cast("string").as("g"),
        col("n_g"), col("s_dec"), col("q_dec"))
  }

  /** Merge two [[anovaGroupState]] relations (field-wise sums). */
  def mergeAnovaGroupState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("g").agg(
      sum(col("n_g")).as("n_g"),
      sum(col("s_dec")).as("s_dec"),
      sum(col("q_dec")).as("q_dec"))

  /** The F derivation from a pre-aggregated group state — see
    * [[anovaOneWay]] for the full contract.
    */
  def anovaFromState(state: DataFrame): DataFrame = {
    val spine = anovaSpine(state)
    val (k, bigN, sTot, qTot, bTot) = anovaFolds
    spine.select(
      k.cast("long").as("n_groups"),
      bigN.as("n"),
      ExactMath.hashRound(
        when(k >= 2 && (qTot - bTot) > 0.0,
          ((bTot - sTot * sTot / bigN.cast("double")) / (k - 1).cast("double"))
            / ((qTot - bTot) / (bigN - k.cast("long")).cast("double"))),
        4).as("f_stat"))
  }

  private def anovaSpine(state: DataFrame): DataFrame =
    state.select(col("g"), col("n_g"),
      col("s_dec").cast("double").as("s_g"),
      col("q_dec").cast("double").as("q_g"))
      .agg(array_sort(collect_list(struct(
        col("g"), col("n_g"), col("s_g"), col("q_g")))).as("gs"))

  private def anovaFolds: (Column, Column, Column, Column, Column) = {
    def fold(term: Column => Column): Column =
      aggregate(col("gs"), lit(0.0), (acc, e) => acc + term(e))
    val k = size(col("gs"))
    val bigN = aggregate(col("gs"), lit(0L), (acc, e) => acc + e.getField("n_g"))
    val sTot = fold(_.getField("s_g"))
    val qTot = fold(_.getField("q_g"))
    val bTot = fold(e => e.getField("s_g") * e.getField("s_g")
      / e.getField("n_g").cast("double"))
    (k, bigN, sTot, qTot, bTot)
  }

  /** Two-sample Mann–Whitney U (Wilcoxon rank-sum) between two named
    * groups (B90): the nonparametric "is one distribution shifted"
    * companion of [[rocAucByGroup]] — and it rides the SAME tie-aware
    * doubled-rank machinery (one partial agg to the value spine, one
    * window over that AGGREGATED spine, one final agg; never a raw-scan
    * rank). Everything stays EXACT integers until the final z:
    * 2·U_a = R2_a − n_a(n_a+1) with R2_a the doubled rank-sum and the
    * whole subtraction kept in DECIMAL(38,0) (no long cast anywhere —
    * a LONG intermediate would silently wrap past 2^63 under ANSI-off
    * while the DuckDB mirror raises), tie term ΣT = Σ(t³−t) accumulated
    * in DECIMAL(38,0) too (a single value tied on > ~2.1M rows makes
    * t³ overflow LONG — the momentsState silent-overflow class), and
    * z = (2U_a − n_a·n_b) / (2·sqrt((n_a·n_b/12)·((N+1) − ΣT/(N(N−1)))))
    * — the only conversions are exact-DECIMAL→double (correctly rounded
    * identically in both engines; mirrored as HUGEINT→DOUBLE), one
    * fixed IEEE mul/div/sqrt chain: z hashes UNROUNDED (the q_gini
    * protocol). u_a halves the even/odd-exact 2U_a in decimal at scale
    * 1 (×0.5 is exact) and truncates — exact at ANY magnitude < 2^63,
    * where the previous double halving lost exactness past 2^53. NULL z
    * when either group is empty or the variance degenerates (all values
    * tied).
    */
  def mannWhitney(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val v = col(valueCol)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df
      .where(col(groupCol).isin(groupA, groupB) && v.isNotNull)
      .groupBy(v.as("__s"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__ca"),
        count(lit(1)).as("__cnt"))
    // distributed exclusive prefix over the value spine (TeraSort shape,
    // bit-neutral vs the historical single-task global window)
    val agg = RankedSpine
      .exclusivePrefix(cells, Nil, "__s", Seq("__cnt" -> "__before"))
      .agg(
        sum(col("__ca")).as("n_a"),
        sum(col("__cnt") - col("__ca")).as("n_b"),
        sum(col("__ca").cast(d38)
          * (lit(2L) * col("__before") + col("__cnt") + lit(1L)).cast(d38))
          .as("__r2a"),
        sum(col("__cnt").cast(d38) * col("__cnt").cast(d38) * col("__cnt").cast(d38)
          - col("__cnt").cast(d38)).as("__ties"))
    val na = col("n_a"); val nb = col("n_b")
    val bigN = na + nb
    // 2·U_a, exact DECIMAL(38,0) end to end — never through LONG
    val u2d = col("__r2a") - na.cast(d38) * (na + lit(1L)).cast(d38)
    // the N·N-shaped products stay decimal too (LONG wraps at ~3e9 rows)
    val varU = (na.cast(d38) * nb.cast(d38)).cast("double") / lit(12.0) *
      ((bigN + 1L).cast("double")
        - col("__ties").cast("double")
          / (bigN.cast(d38) * (bigN - 1L).cast(d38)).cast("double"))
    agg.select(
      na, nb,
      // halve in decimal (scale-1 ×0.5 is exact; truncating cast drops
      // the tie half, matching the historical double path bit-for-bit)
      (u2d * lit(new java.math.BigDecimal("0.5"))).cast("long").as("u_a"),
      when(na > 0L && nb > 0L && varU > 0.0,
        (u2d - (na.cast(d38) * nb.cast(d38))).cast("double")
          / (lit(2.0) * sqrt(varU))).as("z_score"))
  }

  /** Cliff's delta and the common-language effect size between two
    * cohorts (B121) — the EFFECT-SIZE companion of [[mannWhitney]] (z
    * there answers "is the shift real?", δ/CLES answer "how big is
    * it?"): δ = (#(a>b) − #(a<b))/(n_a·n_b) ∈ [−1, 1] and
    * CLES = P(a > b) + P(a = b)/2 = U_a/(n_a·n_b). Both derive from the
    * SAME doubled-rank identity the U test uses — 2·U_a = R2_a −
    * n_a(n_a+1), so δ = (2U_a − n_a·n_b)/(n_a·n_b) and
    * CLES = 2U_a/(2·n_a·n_b) — never a pairwise enumeration: one
    * partial agg to the value spine, ONE window over that AGGREGATED
    * spine, exact DECIMAL(38,0) end to end (the B90 overflow contract,
    * HUGEINT mirror), ONE division each ⇒ δ and CLES hash UNROUNDED.
    * NULL both when either cohort is empty. Single row.
    */
  def cliffsDelta(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val v = col(valueCol)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df
      .where(col(groupCol).isin(groupA, groupB) && v.isNotNull)
      .groupBy(v.as("__s"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__ca"),
        count(lit(1)).as("__cnt"))
    // distributed exclusive prefix (the mannWhitney spine contract)
    val agg = RankedSpine
      .exclusivePrefix(cells, Nil, "__s", Seq("__cnt" -> "__before"))
      .agg(
        sum(col("__ca")).as("n_a"),
        sum(col("__cnt") - col("__ca")).as("n_b"),
        sum(col("__ca").cast(d38)
          * (lit(2L) * col("__before") + col("__cnt") + lit(1L)).cast(d38))
          .as("__r2a"))
    val na = col("n_a"); val nb = col("n_b")
    val u2d = col("__r2a") - na.cast(d38) * (na + lit(1L)).cast(d38)
    val prod = (na.cast(d38) * nb.cast(d38)).cast(d38)
    agg.select(
      coalesce(na, lit(0L)).as("n_a"),
      coalesce(nb, lit(0L)).as("n_b"),
      when(na > 0L && nb > 0L,
        (u2d - prod).cast("double") / prod.cast("double")).as("cliffs_delta"),
      when(na > 0L && nb > 0L,
        u2d.cast("double") / (lit(2L).cast(d38) * prod).cast("double")).as("cles"))
  }

  /** One-way ANOVA effect sizes (B124) — the "how big" companion of
    * [[anovaOneWay]]'s F (the B121-to-B90 relationship): η² = SSB/SST
    * (variance share explained by the grouping) and the less-biased
    * ω² = (SSB − (k−1)·MSW)/(SST + MSW). Rides the IDENTICAL
    * construction — exact decimal per-group (n, Σv, Σv²) sums, the
    * group-sorted SEQUENTIAL spine folds (order-free rule), one fixed
    * IEEE chain — and the same conversion-drift class, so both hash at
    * hashRound 4 under the StatsSpec margin-audit protocol. NULL when
    * k < 2 or SST/MSW degenerate.
    */
  def etaSquared(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    etaFromState(anovaGroupState(df, groupCol, valueCol))

  /** The η²/ω² derivation from a pre-aggregated [[anovaGroupState]] —
    * see [[etaSquared]] for the full contract.
    */
  def etaFromState(state: DataFrame): DataFrame = {
    val spine = anovaSpine(state)
    val (k, bigN, sTot, qTot, bTot) = anovaFolds
    val corr = sTot * sTot / bigN.cast("double")
    val ssb = bTot - corr
    val sst = qTot - corr
    val msw = (qTot - bTot) / (bigN - k.cast("long")).cast("double")
    spine.select(
      k.cast("long").as("n_groups"),
      bigN.as("n"),
      when(k >= 2 && sst > 0.0,
        ExactMath.hashRound(ssb / sst, 4)).as("eta_sq"),
      when(k >= 2 && bigN > k.cast("long") && (sst + msw) > 0.0,
        ExactMath.hashRound(
          (ssb - (k - 1).cast("double") * msw) / (sst + msw), 4)).as("omega_sq"))
  }

  /** Between-bucket Theil-T inequality index contributions (B125) —
    * the DECOMPOSABLE inequality measure next to B56's Gini, evaluated
    * at the Lorenz bucket grain (B86's 100-percentile spine): with
    * bucket sums s_b and counts n_b,
    *   t_contrib_b = (s_b/S) · ln((s_b/S)/(n_b/N)),
    * Σ = the between-bucket Theil component (the within-bucket
    * remainder needs per-row lns — the LangModel dense-transcendental
    * trap, NOT hashed; the bucket grain keeps the audited ln count at
    * ≤ buckets).
    * Shares pass the >2^53 decimal→double conversions (the Lorenz
    * lesson) ⇒ rev_share and t_contrib hash at hashRound 4 under a
    * MarginAuditSpec boundary audit (the 11th audited transcendental).
    * Zero-sum buckets contribute exact 0 via the when guard.
    */
  def theilBetween(
      buckets: DataFrame,
      bucketCol: String,
      nCol: String,
      sumCol: String): DataFrame = {
    val totals = buckets.agg(
      sum(col(nCol)).as("__N"), sum(col(sumCol)).as("__S"))
    val j = buckets.crossJoin(broadcast(totals))
    val sShare = col(sumCol).cast("double") / col("__S").cast("double")
    val nShare = col(nCol).cast("double") / col("__N").cast("double")
    val contrib = sShare * log(sShare / nShare)
    val ok = col(sumCol) > 0 && col(nCol) > 0 && col("__S") > 0 && col("__N") > 0
    j.select(
      col(bucketCol), col(nCol).as("n_rows"),
      when(col("__S") > 0, ExactMath.hashRound(sShare, 4)).as("rev_share"),
      when(ok, ExactMath.hashRound(contrib, 4)).otherwise(lit(0.0)).as("t_contrib"))
      .orderBy(bucketCol)
  }

  /** Tukey–Kramer HSD pairwise comparisons after ANOVA (B127) — WHICH
    * groups differ once B89's F says "some do": for every group pair,
    * mean_diff = m_a − m_b and the studentized-range statistic
    * q = |m_a − m_b| / √((MSW/2)·(1/n_a + 1/n_b)) (the unequal-n
    * Tukey–Kramer form; compare against a studentized-range critical
    * value downstream — no distribution tables are embedded). Rides
    * [[anovaGroupState]]: pairs come from a self-join of the AGGREGATED
    * k-row state (≤ k²/2 — never the fact table), MSW from the shared
    * anova folds broadcast as one row. Means reuse the state's exact
    * decimal→double conversions (the anova drift class) ⇒ mean_diff and
    * q_stat hash at hashRound 4 under the StatsSpec margin-audit
    * protocol. NULL q on a degenerate MSW.
    */
  def tukeyHsd(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    tukeyFromState(anovaGroupState(df, groupCol, valueCol))

  /** The pairwise derivation from a pre-aggregated [[anovaGroupState]]
    * — see [[tukeyHsd]] for the full contract.
    */
  def tukeyFromState(state: DataFrame): DataFrame = {
    val spine = anovaSpine(state)
    val (k, bigN, _, qTot, bTot) = anovaFolds
    val msw1 = spine.select(
      when(k >= 2 && bigN > k.cast("long"),
        (qTot - bTot) / (bigN - k.cast("long")).cast("double")).as("__msw"))
    def side(suf: String) = state.select(
      col("g").as(s"group_$suf"), col("n_g").as(s"n_$suf"),
      (col("s_dec").cast("double") / col("n_g").cast("double")).as(s"mean_$suf"))
    val pairs = side("a").join(side("b"), col("group_a") < col("group_b"))
      .crossJoin(broadcast(msw1))
    val diff = col("mean_a") - col("mean_b")
    val se = sqrt((col("__msw") / lit(2.0)) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    pairs.select(
      col("group_a"), col("group_b"), col("n_a"), col("n_b"),
      ExactMath.hashRound(diff, 4).as("mean_diff"),
      when(col("__msw") > 0.0,
        ExactMath.hashRound(abs(diff) / se, 4)).as("q_stat"))
      .orderBy("group_a", "group_b")
  }

  /** Volume-peak detection over the per-unit count series (B128) —
    * which days spiked? A unit is a peak when its count strictly
    * exceeds BOTH neighbors in the unit order AND `factor × mean`
    * (boundary units never peak — no neighbor to beat, the LAG/LEAD
    * NULL convention). Shares [[unitCounts]] (the D32 state); the
    * neighbor window runs over the AGGREGATED unit spine (bounded by
    * the unit domain — days, never rows). mean = S1/n, one
    * correctly-rounded division of exact ints; every compare is on
    * engine-identical values ⇒ the peak SET is engine-identical and
    * all emitted columns are exact.
    */
  def volumePeaks(df: DataFrame, unitCol: String, factor: Double = 1.25): DataFrame =
    peaksFromUnitCounts(unitCounts(df, unitCol), factor)

  /** Peak derivation from a pre-aggregated [[unitCounts]] state. */
  def peaksFromUnitCounts(units: DataFrame, factor: Double = 1.25): DataFrame = {
    val w = Window.orderBy("u")
    val totals = units.agg(
      sum(col("x")).as("__s1"), count(lit(1)).as("__n"))
    val mean = col("__s1").cast("double") / col("__n").cast("double")
    units
      .withColumn("__prev", lag(col("x"), 1).over(w))
      .withColumn("__next", lead(col("x"), 1).over(w))
      .crossJoin(broadcast(totals))
      .where(col("x") > col("__prev") && col("x") > col("__next") &&
        col("x").cast("double") > lit(factor) * mean)
      .select(col("u").as("unit"), col("x").as("n_events"),
        col("__prev").as("n_prev"), col("__next").as("n_next"),
        mean.as("mean_rate"))
      .orderBy("unit")
  }

  /** Grubbs extreme-outlier statistic per group (B129) — is the single
    * most extreme value too extreme for a normal sample? The ONE-GROSS-
    * ERROR screen next to B35's fence counting:
    *   G = max(v_max − m, m − v_min) / s,  s = √((Σv² − n·m²)/(n−1)).
    * ONE partial-agg pass: exact decimal Σv/Σv² (the welch contract) +
    * exact min/max order statistics; m = Σv/n, one fixed IEEE chain.
    * extreme_value is the exact data value on the winning side (the
    * IEEE compare is engine-identical). The conversions ride the anova
    * drift class ⇒ mean/sd/G hash at hashRound 4 under the StatsSpec
    * margin-audit protocol; v_min/v_max/extreme hash exact. NULL G on
    * n < 3 or a degenerate s.
    */
  def grubbs(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val agg = df.where(col(groupCol).isNotNull && v.isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(v.cast(ExactMath.ValueDecimal)).as("__s1"),
        sum((v.cast(ExactMath.ValueDecimal) * v.cast(ExactMath.ValueDecimal))
          .cast(ExactMath.ValueDecimal)).as("__s2"),
        min(v).as("v_min"),
        max(v).as("v_max"))
    val n = col("n_rows").cast("double")
    val m = col("__s1").cast("double") / n
    val s = sqrt((col("__s2").cast("double") - n * m * m) /
      (col("n_rows") - lit(1L)).cast("double"))
    val devHi = col("v_max").cast("double") - m
    val devLo = m - col("v_min").cast("double")
    val g = when(devHi >= devLo, devHi).otherwise(devLo) / s
    // mean/sd carry ~1e5 magnitudes on money columns — the B38 rule:
    // digits scale to magnitude (round 2; a 4-digit grid sat 3e-7 from
    // a boundary at the gate). G itself is O(1..10): round 4.
    agg.select(
      col(groupCol), col("n_rows"), col("v_min"), col("v_max"),
      when(col("n_rows") >= 3L, ExactMath.hashRound(m, 2)).as("mean"),
      when(col("n_rows") >= 3L && s > 0.0, ExactMath.hashRound(s, 2)).as("sd"),
      when(col("n_rows") >= 3L && s > 0.0, ExactMath.hashRound(g, 4)).as("g_stat"),
      when(col("n_rows") >= 3L && s > 0.0,
        when(devHi >= devLo, col("v_max")).otherwise(col("v_min")))
        .as("extreme_value"))
      .orderBy(groupCol)
  }

  /** Three-variable variance inflation factors (B130) — the
    * collinearity diagnostic over [[partialCorrStats]]' exact state
    * (B117's second consumer): for each variable against the other two,
    *   VIF = 1/(1 − R²),  R²_x|yz = (r_xy² + r_xz² − 2·r_xy·r_xz·r_yz)
    *                                 / (1 − r_yz²).
    * Pairwise correlations reuse the CorrMatrix IEEE op order; the
    * same conversion drift class ⇒ all three VIFs hash at hashRound 4
    * under the MarginAuditSpec boundary audit (the partial-corr audit
    * extended). NULL on degenerate variances or a ±1 companion
    * correlation. Single row.
    */
  def vif3(df: DataFrame, xCol: String, yCol: String, zCol: String): DataFrame = {
    val stats = partialCorrStats(df, xCol, yCol, zCol)
    val n = col("n").cast("double")
    def mean(s: String): Column = col(s).cast("double") / n
    def variance(ss: String, s: String): Column =
      col(ss).cast("double") / n - mean(s) * mean(s)
    def covOf(sab: String, sa: String, sb: String): Column =
      col(sab).cast("double") / n - mean(sa) * mean(sb)
    val vx = variance("sxx", "sx"); val vy = variance("syy", "sy")
    val vz = variance("szz", "sz")
    val rxy = covOf("sxy", "sx", "sy") / sqrt(vx * vy)
    val rxz = covOf("sxz", "sx", "sz") / sqrt(vx * vz)
    val ryz = covOf("syz", "sy", "sz") / sqrt(vy * vz)
    def r2Of(rab: Column, rac: Column, rbc: Column): Column =
      (rab * rab + rac * rac - lit(2.0) * rab * rac * rbc) /
        (lit(1.0) - rbc * rbc)
    val r2x = r2Of(rxy, rxz, ryz)
    val r2y = r2Of(rxy, ryz, rxz)
    val r2z = r2Of(rxz, ryz, rxy)
    val ok = col("n") >= 3L && vx > 0.0 && vy > 0.0 && vz > 0.0
    // r² within an ulp of 1 means a numerically singular predictor set:
    // 1/(1−r²) would blow past hashRound's 2^53 envelope — NULL instead
    // (the guard bounds VIF ≤ 1e9, comfortably inside)
    val sing = lit(1.0) - lit(1e-9)
    stats.select(
      coalesce(col("n"), lit(0L)).as("n_rows"),
      when(ok && (lit(1.0) - ryz * ryz) > 0.0 && r2x < sing,
        ExactMath.hashRound(lit(1.0) / (lit(1.0) - r2x), 4)).as("vif_x"),
      when(ok && (lit(1.0) - rxz * rxz) > 0.0 && r2y < sing,
        ExactMath.hashRound(lit(1.0) / (lit(1.0) - r2y), 4)).as("vif_y"),
      when(ok && (lit(1.0) - rxy * rxy) > 0.0 && r2z < sing,
        ExactMath.hashRound(lit(1.0) / (lit(1.0) - r2z), 4)).as("vif_z"))
  }

  /** Conditional-entropy cells over a pre-aggregated transition table
    * (B123) — how predictable is the next event given the current one?
    * H(next|cur) = Σ −p(i,j)·ln(p(j|i)) — the sequence-predictability
    * number the B82 Markov matrix only shows cell-by-cell. Input is the
    * (from, to, n) count table (the SHARED transitionCounts grain);
    * margins derive from the AGGREGATED cells (the B112 MI shape —
    * broadcast joins, never a second pass). p_next = n_ij/n_i is ONE
    * exact-int division (unrounded); h_contrib routes through ln ⇒
    * AUDITED TRANSCENDENTAL (hashRound 4 + MarginAuditSpec boundary
    * audit re-deriving from the exact count columns). Observed cells
    * only; Σ h_contrib = H(next|cur).
    */
  def conditionalEntropy(
      cells: DataFrame,
      fromCol: String,
      toCol: String,
      nCol: String): DataFrame = {
    val base = cells.select(col(fromCol).cast("string").as("from_type"),
      col(toCol).cast("string").as("to_type"), col(nCol).as("n_trans"))
    val froms = base.groupBy("from_type").agg(sum(col("n_trans")).as("n_from"))
    val tot = base.agg(sum(col("n_trans")).as("n"))
    val j = base.join(broadcast(froms), "from_type").crossJoin(broadcast(tot))
    val pJoint = col("n_trans").cast("double") / col("n").cast("double")
    val pCond = col("n_trans").cast("double") / col("n_from").cast("double")
    j.select(
      col("from_type"), col("to_type"), col("n_trans"), col("n_from"), col("n"),
      pCond.as("p_next"),
      ExactMath.hashRound(-pJoint * log(pCond), 4).as("h_contrib"))
      .orderBy("from_type", "to_type")
  }

  /** Multi-lag autocorrelation function of a GLOBAL per-unit count
    * series (B122) — the seasonality detector over e.g. daily order
    * volumes (lag-7 spikes = weekly cycle), generalizing B75's per-key
    * lag-1 to lags 1..maxLag. Units aggregate to exact BIGINT counts;
    * the series is ONE bounded in-memory array (date-sorted — the MK
    * contract at the calendar grain: days, not rows).
    *   acf_k = Σ_{t≤n−k} d_t·d_{t+k} / Σ d_t²,   d_t = x_t − mean
    * with mean = S1/n (one correctly-rounded division of exact ints —
    * counts sit far inside 2^53) and BOTH sums folded SEQUENTIALLY in
    * date order from 0.0 (init-less `list_reduce` mirror over
    * LEAD-shifted products) ⇒ every acf hashes UNROUNDED. Gaps in the
    * unit domain are NOT filled — lags index the OBSERVED series
    * (documented; fill upstream for calendar-exact lags). NULL acf at
    * n ≤ k or a zero deviation sum.
    */
  def acfGlobal(df: DataFrame, unitCol: String, maxLag: Int): DataFrame =
    acfFromUnitCounts(unitCounts(df, unitCol), maxLag)

  /** `(u, x)` per-unit counts — the associative MONITORING STATE of
    * [[acfGlobal]] (D32): counts merge by plain addition
    * ([[mergeUnitCounts]] — the miCells shape), so a streaming monitor
    * folds microbatches into the standing volume series and re-derives
    * the ACF on demand. NOT idempotent (the D20 partition contract).
    */
  def unitCounts(df: DataFrame, unitCol: String): DataFrame =
    df.where(col(unitCol).isNotNull)
      .groupBy(col(unitCol).as("u")).agg(count(lit(1)).as("x"))

  /** Merge two [[unitCounts]] states by count addition. */
  def mergeUnitCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("u").agg(sum(col("x")).as("x"))

  /** Burstiness report from a pre-aggregated [[unitCounts]] state
    * (B156) — the dispersion summary of an event-arrival series next to
    * B122's ACF (same mergeable state, the D32 monitor shape):
    * Fano factor σ²/μ (1 = Poisson, >1 overdispersed/bursty) and the
    * Goh–Barabási burstiness B = (σ−μ)/(σ+μ) ∈ (−1, 1). Σx and Σx² are
    * EXACT integer sums (counts; squares stay far under 2^53 at any
    * realistic unit grain), the moment chain is fixed IEEE (sample
    * variance, n−1), sqrt is correctly-rounded — every output hashes
    * UNROUNDED. NULL at n < 2 or a degenerate σ+μ = 0. Single row.
    */
  def burstinessFromUnitCounts(units: DataFrame): DataFrame = {
    val agg = units.agg(
      count(lit(1)).as("n_units"),
      sum(col("x")).as("__s1"),
      sum(col("x") * col("x")).as("__s2"))
    val n = col("n_units").cast("double")
    val s1 = col("__s1").cast("double")
    val s2 = col("__s2").cast("double")
    val mu = s1 / n
    val vr = greatest((s2 - s1 * s1 / n) / (n - lit(1.0)), lit(0.0))
    val sd = sqrt(vr)
    agg.select(
      col("n_units"), col("__s1").as("n_events"),
      when(col("n_units") >= 2L, mu).as("mean_rate"),
      when(col("n_units") >= 2L, sd).as("sd_rate"),
      when(col("n_units") >= 2L && mu > 0.0, vr / mu).as("fano"),
      when(col("n_units") >= 2L && sd + mu > 0.0, (sd - mu) / (sd + mu))
        .as("burstiness"))
  }

  /** The ACF report from a pre-aggregated unit-count state — see
    * [[acfGlobal]] for the full contract.
    */
  def acfFromUnitCounts(units: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag must be in [1,64], got $maxLag")
    val agg = units.agg(
      array_sort(collect_list(struct(col("u"),
        col("x")))).as("sp"),
      sum(col("x")).as("__s1"),
      count(lit(1)).as("n_points"))
    val mean = col("__s1").cast("double") / col("n_points").cast("double")
    val withDevs = agg.withColumn("__devs",
      transform(col("sp"), e => e.getField("x").cast("double") - mean))
    val den = aggregate(col("__devs"), lit(0.0), (acc, x) => acc + x * x)
    val n = size(col("__devs"))
    def numK(k: Int): Column = aggregate(
      zip_with(
        slice(col("__devs"), lit(1), n - lit(k)),
        slice(col("__devs"), lit(k + 1), n - lit(k)),
        (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val lagRows = (1 to maxLag).map { k =>
      struct(lit(k).as("lag"),
        when(col("n_points") > lit(k.toLong) && col("__den") > 0.0,
          numK(k) / col("__den")).as("acf"))
    }
    withDevs
      .withColumn("__den", den)
      .select(col("n_points"), explode(array(lagRows: _*)).as("r"))
      .select(col("r.lag").as("lag"), col("n_points"), col("r.acf").as("acf"))
      .orderBy("lag")
  }

  /** Ljung–Box portmanteau statistic over the ACF lags (B137, Ljung &
    * Box 1978) — "is there ANY autocorrelation through lag k?" — the
    * whiteness test that summarizes [[acfGlobal]]'s per-lag table:
    *   Q_k = n(n+2) · Σ_{j=1..k} r_j²/(n−j),
    * one row per lag with the RUNNING portmanteau. Rides the acf
    * output verbatim (r_j are the engine-identical unrounded doubles
    * the B122 oracle already hashes); each Q_k folds its lag-prefix
    * SEQUENTIALLY in lag order from 0.0 over the ≤ maxLag-row spine
    * (init-less `list_reduce` mirror — never a cumulative double
    * window, whose evaluation strategy is engine-visible) ⇒ Q hashes
    * UNROUNDED. A NULL r_j (short series / zero variance) NULLs every
    * Q from that lag on (null propagates through the fold — both
    * engines). `exceeds_95` compares Q against the embedded χ²(k) 5%
    * critical literals (k ≤ 12) on identical doubles.
    */
  def ljungBoxGlobal(df: DataFrame, unitCol: String, maxLag: Int): DataFrame =
    ljungBoxFromUnitCounts(unitCounts(df, unitCol), maxLag)

  /** The portmanteau table from a pre-aggregated [[unitCounts]] state —
    * see [[ljungBoxGlobal]] for the full contract.
    */
  def ljungBoxFromUnitCounts(units: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 12,
      s"maxLag must be in [1,12] (embedded chi-square criticals), got $maxLag")
    // chi-square 95th percentiles for df = 1..12 (embedded literals —
    // the q_benford convention)
    val crit = Seq(3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067,
      15.507, 16.919, 18.307, 19.675, 21.026)
    val acf = acfFromUnitCounts(units, maxLag)
    // coalesce: an EMPTY unit series aggregates max(n_points) to NULL
    // where the oracle's COUNT emits 0 — keep the state-derived path
    // total on the degenerate input (every q stays NULL via the n > k
    // guard; ADVICE r14)
    val spine = acf.agg(
      coalesce(max(col("n_points")), lit(0L)).as("n_points"),
      array_sort(collect_list(struct(col("lag"), col("acf")))).as("__ls"))
    val n = col("n_points").cast("double")
    def qK(k: Int): Column = n * (n + lit(2.0)) * aggregate(
      slice(col("__ls"), 1, k), lit(0.0),
      (acc, e) => acc + e.getField("acf") * e.getField("acf")
        / (n - e.getField("lag").cast("double")))
    val lagRows = (1 to maxLag).map { k =>
      val q = when(col("n_points") > lit(k.toLong), qK(k))
      struct(lit(k).as("lag"), q.as("q"),
        when(q.isNotNull, q > lit(crit(k - 1))).as("ex"))
    }
    spine
      .select(col("n_points"), explode(array(lagRows: _*)).as("r"))
      .select(col("r.lag").as("lag"), col("n_points"),
        col("r.q").as("q_stat"), col("r.ex").as("exceeds_95"))
      .orderBy("lag")
  }

  /** Per-group skewness/kurtosis from exact decimal power sums (B95) —
    * the distribution-shape profiling pass (heavy tails / asymmetry)
    * next to B39's presence stats. Spark's builtin `skewness`/
    * `kurtosis` aggregate raw doubles (partial-order-dependent, the
    * corr lesson); here each row contributes v, v², v³, v⁴ as EXACT
    * DECIMAL(18,6) products (the regression dsumProd chain, nested —
    * the per-row casts round HALF_UP at scale 6 identically in both
    * engines), the sums are associative decimals, and the central-
    * moment derivation is ONE fixed IEEE sequence:
    *   m  = s1/n,  m2 = s2/n − m·m,
    *   m3 = s3/n − 3·m·(s2/n) + 2·m·m·m,
    *   m4 = s4/n − 4·m·(s3/n) + 6·m·m·(s2/n) − 3·m·m·m·m,
    *   skewness = m3/(sqrt(m2)·m2),  kurtosis = m4/(m2·m2) − 3.
    * The decimal→double conversions can exceed the 2^53 envelope (s4
    * grows fast) — outputs hashRound at (mean/variance 4, skew/kurt 6)
    * with a StatsSpec margin audit (the B38 protocol). NULL shape
    * stats when m2 ≤ 0 (constant group). Value-magnitude contract:
    * |v| ≤ 10³ keeps every per-row v⁴ product inside DECIMAL(18,6);
    * a violating row RAISES (the hhi rule — ANSI-off decimal overflow
    * would otherwise silently NULL the row out of every sum).
    */
  /** Per-group exact decimal power sums (n, Σv, Σv², Σv³, Σv⁴) — the
    * mergeable sufficient state behind [[momentsByGroup]] and the D25
    * streaming monitor: every field is associative (BIGINT count +
    * exact decimal sums), so [[mergeMomentsState]] of batch states ==
    * the one-shot state EXACTLY (the D14/IncrementalAgg argument).
    */
  def momentsState(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val dec = ExactMath.ValueDecimal
    val vd = when(abs(col(valueCol)) <= 1000.0, col(valueCol).cast(dec))
      .otherwise(raise_error(concat(
        lit("momentsByGroup: |value| "), col(valueCol).cast("string"),
        lit(" exceeds 1000 - v^4 would overflow DECIMAL(18,6); rescale first"))))
    def prod(a: Column, b: Column): Column = (a * b).cast(dec)
    df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(vd).as("__s1"),
        sum(prod(vd, vd)).as("__s2"),
        sum(prod(prod(vd, vd), vd)).as("__s3"),
        sum(prod(prod(vd, vd), prod(vd, vd))).as("__s4"))
  }

  /** Field-wise associative merge of two [[momentsState]]s. */
  def mergeMomentsState(a: DataFrame, b: DataFrame): DataFrame = {
    val key = a.columns.head
    a.unionByName(b)
      .groupBy(col(key))
      .agg(sum(col("n")).as("n"), sum(col("__s1")).as("__s1"),
        sum(col("__s2")).as("__s2"), sum(col("__s3")).as("__s3"),
        sum(col("__s4")).as("__s4"))
  }

  /** [[momentsByGroup]]'s derivation applied to carried state — ONE
    * definition, so state-maintained == one-shot is structural (D25). */
  def momentsFromState(state: DataFrame): DataFrame =
    deriveMoments(state)

  def momentsByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame =
    deriveMoments(momentsState(df, groupCol, valueCol))

  /** Jarque–Bera normality screen per group (B147) — rides the SAME
    * exact decimal power sums as [[momentsByGroup]] (one partial-agg
    * pass, the D25 mergeable state): JB = n/6·(g1² + g2²/4) over the
    * UNROUNDED skewness g1 and excess kurtosis g2 (the B95
    * central-moment IEEE chain verbatim, layered-CTE mirror — a named
    * subexpression holds the same double as the inline expansion).
    * jb hashRound(2): magnitude grows with n (the B38
    * digits-scale-to-magnitude rule; StatsSpec margin-audits the
    * unrounded jb at 3 SFs next to the moment chain it extends).
    * normal_rejected compares the ROUNDED jb against the χ²(2) 95%
    * bound 5.99 (the q_ab_test convention). NULL at n < 3 or m2 ≤ 0.
    */
  def jarqueBera(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val st = momentsState(df, groupCol, valueCol)
    val n = col("n").cast("double")
    val s1 = col("__s1").cast("double")
    val s2 = col("__s2").cast("double")
    val s3 = col("__s3").cast("double")
    val s4 = col("__s4").cast("double")
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - lit(3.0) * m * (s2 / n) + lit(2.0) * m * m * m
    val m4 = s4 / n - lit(4.0) * m * (s3 / n) +
      lit(6.0) * m * m * (s2 / n) - lit(3.0) * m * m * m * m
    val g1 = m3 / (sqrt(m2) * m2)
    val g2 = m4 / (m2 * m2) - lit(3.0)
    val jb = n / lit(6.0) * (g1 * g1 + g2 * g2 / lit(4.0))
    val ok = col("n") >= 3L && m2 > 0.0
    st.select(col(groupCol), col("n"),
      when(ok, ExactMath.hashRound(jb, 2)).as("jb"),
      when(ok, ExactMath.hashRound(jb, 2) > lit(5.99)).as("normal_rejected"))
  }

  /** Paired t-test over a precomputed difference column (B148) — the
    * parametric sibling of [[signTest]]/[[wilcoxonSignedRank]] on the
    * SAME first→last diff grain ([[pairedDiffsFromState]]): did the
    * paired movement shift the MEAN? Exact decimal Σd / Σd² (per-row
    * products quantized DECIMAL(18,6) — the cohens_d contract, DuckDB
    * mirror via (19,6) operand casts), then the welch-order chain
    *   m = s1/n, var = (s2 − s1·m)/(n−1), t = m / sqrt(var/n)
    * — one fixed IEEE sequence; mean_diff and t hashRound(4) (StatsSpec
    * boundary audit), `moved` compares the ROUNDED t (the q_ab_test
    * convention). Zero diffs COUNT here (they inform the mean), unlike
    * the rank/sign tests' drop convention. NULL t at n < 2 or var ≤ 0.
    * Single row.
    */
  def pairedT(df: DataFrame, diffCol: String): DataFrame = {
    val dec = ExactMath.ValueDecimal
    val d = col(diffCol)
    val agg = df.where(d.isNotNull)
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(d.cast(dec)).cast("double").as("__s1"),
        sum((d.cast(dec) * d.cast(dec)).cast(dec)).cast("double").as("__s2"))
    val n = col("n_pairs").cast("double")
    val m = col("__s1") / n
    val vr = (col("__s2") - col("__s1") * m) / (n - lit(1.0))
    val t = m / sqrt(vr / n)
    agg.select(col("n_pairs"),
      when(col("n_pairs") > 0L, ExactMath.hashRound(m, 4)).as("mean_diff"),
      when(col("n_pairs") >= 2L && vr > 0.0, ExactMath.hashRound(t, 4)).as("t_stat"))
      .withColumn("moved",
        when(col("t_stat").isNotNull, abs(col("t_stat")) > lit(1.96)))
  }

  private def deriveMoments(stateDf: DataFrame): DataFrame = {
    val key = stateDf.columns.head
    val agg = stateDf.select(col(key), col("n"),
      col("__s1").cast("double").as("__s1"),
      col("__s2").cast("double").as("__s2"),
      col("__s3").cast("double").as("__s3"),
      col("__s4").cast("double").as("__s4"))
    val n = col("n").cast("double")
    val m = col("__s1") / n
    val m2 = col("__s2") / n - m * m
    val m3 = col("__s3") / n - lit(3.0) * m * (col("__s2") / n) + lit(2.0) * m * m * m
    val m4 = col("__s4") / n - lit(4.0) * m * (col("__s3") / n) +
      lit(6.0) * m * m * (col("__s2") / n) - lit(3.0) * m * m * m * m
    agg.select(
      col(key), col("n"),
      ExactMath.hashRound(m, 4).as("mean"),
      // variance rounds at 4, not 6: magnitude ~10^2 with the s2-chain
      // drift left a sf0.001 value 9.8e-9 from a 6-digit boundary — the
      // margin audit rejected it at the gate (digits scale to magnitude,
      // the B38 rule)
      ExactMath.hashRound(m2, 4).as("variance"),
      ExactMath.hashRound(when(m2 > 0.0, m3 / (sqrt(m2) * m2)), 6).as("skewness"),
      ExactMath.hashRound(when(m2 > 0.0, m4 / (m2 * m2) - lit(3.0)), 6).as("kurtosis"))
  }

  /** Welch two-sample t-test between two named groups of a numeric
    * column (B96) — the continuous-outcome sibling of [[twoProportionZ]]
    * (unequal variances, no pooling): from each group's exact decimal
    * (n, Σv, Σv²),
    *   m = s1/n,  var = (s2 − s1·m)/(n−1),  se = var/n,
    *   t = (m_a − m_b)/sqrt(se_a + se_b),
    *   df = (se_a + se_b)² / (se_a²/(n_a−1) + se_b²/(n_b−1))
    * — one fixed IEEE sequence on decimal→double conversions (the B38
    * drift class once sums leave the 2^53 envelope; StatsSpec margin-
    * audits). t and the means hashRound at 4, df at 2; `significant`
    * compares the ROUNDED t against 1.96 (the q_ab_test convention).
    * NULL stats when either group has < 2 rows or both variances are 0.
    */
  def welchT(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val v = col(valueCol)
    def side(g: String, suf: String) = df
      .where(col(groupCol) === g && v.isNotNull)
      .agg(
        count(lit(1)).as(s"n_$suf"),
        ExactMath.dsum(v).as(s"__s1$suf"),
        sum((v.cast(ExactMath.ValueDecimal) * v.cast(ExactMath.ValueDecimal))
          .cast(ExactMath.ValueDecimal)).cast("double").as(s"__s2$suf"))
    val joined = side(groupA, "a").crossJoin(side(groupB, "b"))
    def stats(suf: String): (Column, Column, Column) = {
      val n = col(s"n_$suf").cast("double")
      val m = col(s"__s1$suf") / n
      val va = (col(s"__s2$suf") - col(s"__s1$suf") * m) / (n - lit(1.0))
      (m, va, va / n)
    }
    val (ma, _, sea) = stats("a")
    val (mb, _, seb) = stats("b")
    val ok = col("n_a") >= 2L && col("n_b") >= 2L && (sea + seb) > 0.0
    val t = (ma - mb) / sqrt(sea + seb)
    val dfW = (sea + seb) * (sea + seb) /
      (sea * sea / (col("n_a").cast("double") - lit(1.0))
        + seb * seb / (col("n_b").cast("double") - lit(1.0)))
    val tOut = ExactMath.hashRound(when(ok, t), 4)
    joined.select(
      col("n_a"), col("n_b"),
      ExactMath.hashRound(ma, 4).as("mean_a"),
      ExactMath.hashRound(mb, 4).as("mean_b"),
      tOut.as("t_stat"),
      ExactMath.hashRound(when(ok, dfW), 2).as("df"),
      when(tOut.isNotNull, abs(tOut) > lit(1.96)).as("significant"))
  }

  /** Kendall tau-b per key between two numeric columns (B98) — the
    * pairwise-concordance association measure next to [[spearmanByGroup]]
    * (Spearman ranks values once; Kendall counts INVERSIONS, the
    * 0-breakdown-robust choice for short noisy series).
    *
    * Same bounded-series shape as Theil–Sen/Mann–Kendall: the pair walk
    * is a nested HOF over the per-key tie-sorted array (plain hash
    * groupBy, map-side evaluation, nothing globally sorted) — O(depth²)
    * per key, the documented bounded-series contract. Each i<j pair
    * classifies into concordant (sign agreement), discordant, tied-x,
    * tied-y (a both-tied pair counts toward BOTH tie totals, the tau-b
    * definition), all exact integer counts.
    *
    * tau_b = (nc − nd) / sqrt((n0 − t_x)·(n0 − t_y)) with n0 = n(n−1)/2
    * — exact-BIGINT→double conversions, one IEEE multiply, a correctly
    * rounded sqrt, one division: hashes UNROUNDED (the q_gini protocol).
    * NULL when either factor is 0 (a column constant within the key).
    * `tieCol` must be unique within key (fixes the enumeration order;
    * the counts themselves are order-independent over unordered pairs).
    */
  def kendallTauByKey(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String,
      tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val g: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      g.map(_.isNotNull).reduce(_ && _) &&
        col(xCol).isNotNull && col(yCol).isNotNull && col(tieCol).isNotNull)
    // deliberately NOT FanOut-gated (r16-opt A/B, warm medians at sf0.1:
    // 0.692 s fanned vs 0.563 s plain): the per-key pair walk is bounded
    // by the series contract, so AQE's coalesced agg stage is already
    // cheap and the gate's overhead dominates
    val sp = clean
      .groupBy(g: _*)
      .agg(array_sort(collect_list(struct(
        col(tieCol).as("t"),
        col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y")))).as("sp"))
      .where(size(col("sp")) >= 2)
    // per-pair class code cx*3 + cy ∈ {-4..4}: ±4 concordant, ±2
    // discordant, {-1,0,1} tied-x, {-3,0,3} tied-y (0 = both tied)
    val codes = flatten(transform(
      sequence(lit(1), size(col("sp")) - 1),
      i => transform(
        sequence(i + lit(1), size(col("sp"))),
        j => {
          val xi = element_at(col("sp"), i).getField("x")
          val xj = element_at(col("sp"), j).getField("x")
          val yi = element_at(col("sp"), i).getField("y")
          val yj = element_at(col("sp"), j).getField("y")
          val cx = when(xi < xj, 1).when(xi > xj, -1).otherwise(0)
          val cy = when(yi < yj, 1).when(yi > yj, -1).otherwise(0)
          cx * lit(3) + cy
        })))
    val withCodes = sp.select(g ++ Seq(
      size(col("sp")).cast("long").as("n_points"), codes.as("__c")): _*)
    def cnt(pred: Column => Column): Column =
      size(filter(col("__c"), pred)).cast("long")
    val counted = withCodes.select(g ++ Seq(
      col("n_points"),
      size(col("__c")).cast("long").as("n_pairs"),
      cnt(c => c === 4 || c === -4).as("n_concordant"),
      cnt(c => c === 2 || c === -2).as("n_discordant"),
      cnt(c => c === 0 || c === 1 || c === -1).as("n_tied_x"),
      cnt(c => c === 0 || c === 3 || c === -3).as("n_tied_y")): _*)
    counted.select(g ++ Seq(
      col("n_points"), col("n_pairs"), col("n_concordant"),
      col("n_discordant"), col("n_tied_x"), col("n_tied_y"),
      when(col("n_pairs") > col("n_tied_x") && col("n_pairs") > col("n_tied_y"),
        (col("n_concordant") - col("n_discordant")).cast("double")
          / sqrt((col("n_pairs") - col("n_tied_x")).cast("double")
            * (col("n_pairs") - col("n_tied_y")).cast("double"))).as("tau_b")): _*)
  }

  /** Wilcoxon signed-rank test over a column of paired differences
    * (B99) — the paired companion of [[mannWhitney]] (same doubled-rank
    * machinery: one partial agg to the |d| value spine, one window over
    * that AGGREGATED spine, one final agg). Zero differences are
    * dropped BEFORE ranking (the standard Wilcoxon convention — callers
    * filter `d != 0`, this re-guards). Everything stays exact:
    * 2·W⁺ = Σ pos_cnt·(2·before + cnt + 1) and the tie term Σ(t³−t)
    * accumulate in DECIMAL(38,0) (the mannWhitney overflow contract),
    * and z = (2W⁺ − n(n+1)/2) / (2·sqrt(n(n+1)(2n+1)/24 − ΣT/48))
    * — exact-DECIMAL→double conversions, one fixed IEEE chain: z hashes
    * UNROUNDED. `w_plus` halves 2W⁺ in decimal and truncates (tie half
    * drops — the u_a convention). NULL z when no nonzero diffs or the
    * variance degenerates.
    */
  def wilcoxonSignedRank(df: DataFrame, diffCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val d = col(diffCol)
    val cells = df
      .where(d.isNotNull && d =!= 0)
      .groupBy(abs(d).as("__ad"))
      .agg(
        count(lit(1)).as("__cnt"),
        sum(when(d > 0, 1L).otherwise(0L)).as("__pos"))
    // distributed exclusive prefix over the |d| spine (the mannWhitney
    // spine contract — bit-neutral vs the single-task global window)
    val agg = RankedSpine
      .exclusivePrefix(cells, Nil, "__ad", Seq("__cnt" -> "__before"))
      .agg(
        sum(col("__cnt")).as("n_pairs"),
        sum(col("__pos").cast(d38)
          * (lit(2L) * col("__before") + col("__cnt") + lit(1L)).cast(d38))
          .as("__w2"),
        sum(col("__cnt").cast(d38) * col("__cnt").cast(d38) * col("__cnt").cast(d38)
          - col("__cnt").cast(d38)).as("__ties"))
    val n = col("n_pairs")
    val half = lit(new java.math.BigDecimal("0.5"))
    // n(n+1)/2 exact in decimal (scale-1 ×0.5 of an even product)
    val e2 = (n.cast(d38) * (n + lit(1L)).cast(d38) * half).cast(d38)
    val varW = (n.cast(d38) * (n + lit(1L)).cast(d38)
      * (lit(2L) * n + lit(1L)).cast(d38)).cast("double") / lit(24.0) -
      col("__ties").cast("double") / lit(48.0)
    agg.select(
      coalesce(n, lit(0L)).as("n_pairs"),
      (col("__w2") * half).cast("long").as("w_plus"),
      when(n > 0L && varW > 0.0,
        (col("__w2") - e2).cast("double") / (lit(2.0) * sqrt(varW)))
        .as("z_score"))
  }

  /** Kruskal–Wallis H test across ALL groups of a categorical column
    * (B108) — the k-group generalization of [[mannWhitney]] (the
    * nonparametric ANOVA): are the k distributions shifted? Rides the
    * same doubled-average-rank machinery over the GLOBAL value spine
    * (one partial agg to (value, group) cells, value-grain totals +
    * ONE window over that aggregated spine, per-group doubled rank
    * sums in DECIMAL(38,0)).
    *
    * With R2_g the doubled rank sum, H = 3·Σ_g(R2_g²/n_g)/(N(N+1)) −
    * 3(N+1) (the doubled-rank form of the classical 12/(N(N+1))
    * identity) and the tie-corrected H_c = H/(1 − ΣT/(N³−N)),
    * ΣT = Σ(t³−t) in DECIMAL (the B90 overflow contract). The
    * Σ over groups folds SEQUENTIALLY over the group-sorted spine (the
    * anovaOneWay order-free rule — k is the bounded group vocabulary);
    * every conversion is correctly rounded and the chain is one fixed
    * IEEE sequence ⇒ H and H_c hash UNROUNDED (the q_gini protocol).
    * NULL H_c when every value is tied (correction degenerates) or
    * k < 2. Single row.
    */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val clean = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
    val cells = clean
      .groupBy(col(valueCol).as("__s"), col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__cg"))
    val vals = cells.groupBy("__s").agg(sum(col("__cg")).as("__cnt"))
    // distributed exclusive prefix over the global value spine (the
    // mannWhitney spine contract — bit-neutral vs the global window)
    val valsW = RankedSpine
      .exclusivePrefix(vals, Nil, "__s", Seq("__cnt" -> "__bef"))
    val perG = cells.join(valsW, "__s")
      .groupBy("__g")
      .agg(
        sum(col("__cg")).as("__ng"),
        sum(col("__cg").cast(d38)
          * (lit(2L) * col("__bef") + col("__cnt") + lit(1L)).cast(d38))
          .as("__r2g"))
    val totals = vals.agg(
      sum(col("__cnt")).as("n"),
      sum(col("__cnt").cast(d38) * col("__cnt").cast(d38) * col("__cnt").cast(d38)
        - col("__cnt").cast(d38)).as("__ties"))
    val spine = perG.agg(
      count(lit(1)).as("n_groups"),
      array_sort(collect_list(struct(
        col("__g").as("g"), col("__ng").as("ng"),
        col("__r2g").cast("double").as("r2d")))).as("gs"))
    val joined = spine.crossJoin(broadcast(totals))
    val s = aggregate(col("gs"), lit(0.0), (acc, e) =>
      acc + e.getField("r2d") * e.getField("r2d")
        / e.getField("ng").cast("double"))
    val bigN = col("n")
    val nn1 = (bigN.cast(d38) * (bigN + lit(1L)).cast(d38)).cast("double")
    val h = lit(3.0) * s / nn1 - lit(3.0) * (bigN + lit(1L)).cast("double")
    val corr = lit(1.0) - col("__ties").cast("double") /
      (bigN.cast(d38) * bigN.cast(d38) * bigN.cast(d38) - bigN.cast(d38))
        .cast("double")
    joined.select(
      col("n"), col("n_groups"),
      when(col("n_groups") >= 2L && bigN > 0L, h).as("h_stat"),
      when(col("n_groups") >= 2L && bigN > 0L && corr > 0.0, h / corr)
        .as("h_corrected"))
  }

  /** McNemar's test over two boolean columns on the SAME rows (B106) —
    * do two filters/classifiers disagree symmetrically? The paired
    * companion of [[twoProportionZ]] (independent cohorts there; shared
    * rows here — only the DISCORDANT pairs carry signal):
    * χ² = (b − c)²/(b + c) with b = a-only, c = b-only counts.
    * Exact BIGINT counts, the squared difference in DECIMAL (no wrap),
    * ONE division ⇒ χ² hashes UNROUNDED and `significant` (χ² > 3.841,
    * the 1-dof 5% literal) compares identical doubles. NULL χ² when
    * b + c = 0 (no disagreement — the test is undefined). Single row,
    * one partial-agg pass.
    */
  def mcnemar(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val a = col(aCol); val b = col(bCol)
    val agg = df.where(a.isNotNull && b.isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n_a_only"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n_b_only"))
    val d = col("n_a_only") - col("n_b_only")
    val disc = col("n_a_only") + col("n_b_only")
    val chi2 = (d.cast(d38) * d.cast(d38)).cast("double") / disc.cast("double")
    agg.select(
      coalesce(col("n"), lit(0L)).as("n"),
      coalesce(col("n_a_only"), lit(0L)).as("n_a_only"),
      coalesce(col("n_b_only"), lit(0L)).as("n_b_only"),
      when(disc > 0L, chi2).as("chi2"),
      when(disc > 0L, chi2 > lit(3.841)).as("significant"))
  }

  /** Cohen's kappa between two categorical columns (B105) — the
    * chance-corrected agreement of a predicted vs actual label (the
    * eval-family companion of C48's raw confusion matrix: accuracy on a
    * skewed label mix overstates; kappa subtracts the marginal-product
    * chance agreement). κ = (p_o − p_e)/(1 − p_e) with p_o = diagonal/N
    * and p_e = Σ_c row_c·col_c / N².
    *
    * Exactness: ONE corpus pass to the (a, b) cell table; marginals
    * derive from the aggregated cells (bounded by label-vocabulary²);
    * Σ row·col accumulates in DECIMAL(38,0) (no long wrap at any N);
    * p_o, p_e are one exact division each and κ one fixed IEEE
    * sub/sub/div chain ⇒ all hash UNROUNDED (the q_gini protocol).
    * NULL κ when p_e = 1 (a single class on both sides — agreement is
    * undefined) or N = 0. Single-row output.
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame =
    kappaFromCells(agreementCells(df, aCol, bCol))

  /** (label_a, label_b, n) confusion cells — the shared MERGEABLE state
    * of [[cohensKappa]] and [[gwetAc1]] (D35): counts add, so a
    * streaming eval monitor folds microbatches with
    * [[mergeAgreementCells]] and re-derives either agreement statistic
    * on demand; merged cells == one-shot EXACTLY (the D29/miCells
    * argument). NOT idempotent (the D20 partition contract).
    */
  def agreementCells(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("__a"), col(bCol).cast("string").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("n"))

  /** Merge two [[agreementCells]] states by count addition. */
  def mergeAgreementCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("__a", "__b").agg(sum(col("n")).as("n"))

  /** Linearly-WEIGHTED Cohen's κ from carried [[agreementCells]]
    * (B157) — the ordinal-label extension of [[kappaFromCells]] (Cohen
    * 1968): disagreement is graded by distance, w_ij = |i−j|, and
    * κ_w = 1 − N·Σ n_ij·w_ij / Σ r_i·c_j·w_ij. The cells' string
    * labels must parse as integers (ordinal bands). Exact counts; the
    * numerator product and every r_i·c_j·w term cross DECIMAL(38,0)
    * (HUGEINT mirror — wrap-safe past LONG at corpus scale), each side
    * correctly rounded to double ONCE, one division + one subtraction
    * ⇒ κ_w engine-identical, hashed UNROUNDED. Zero-margin categories
    * contribute exact 0 to the denominator, so the observed-cell
    * margins suffice (no spine completion needed — unlike pe's
    * product in kappaFromCells, absent categories cannot shift a SUM
    * they enter with weight·0). Degenerate (zero expected
    * disagreement) → NULL. A derivation over the D35 mergeable state:
    * merged cells == one-shot exactly.
    */
  def weightedKappaFromCells(cells: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val ci = cells.select(col("__a").cast("int").as("__ai"),
      col("__b").cast("int").as("__bi"), col("n"))
    val num = ci.agg(
      sum(col("n") * abs(col("__ai") - col("__bi")).cast("long")).as("__wn"),
      sum(col("n")).as("n_docs"))
    val rowsM = ci.groupBy(col("__ai")).agg(sum(col("n")).as("rn"))
    val colsM = ci.groupBy(col("__bi")).agg(sum(col("n")).as("cn"))
    // explicit broadcast: the margins are ≤ k-row aggregates, and an
    // unhinted crossJoin can plan CartesianProduct (the q_isotonic
    // PlanSpec lesson)
    val den = rowsM.crossJoin(broadcast(colsM))
      .agg(sum(col("rn").cast(d38) * col("cn").cast(d38) *
        abs(col("__ai") - col("__bi")).cast(d38)).as("__wd"))
    num.crossJoin(broadcast(den)).select(
      col("n_docs"), col("__wn").as("sum_wn"),
      when(col("__wd") > 0,
        lit(1.0) - (col("__wn").cast(d38) * col("n_docs").cast(d38)).cast("double")
          / col("__wd").cast("double")).as("kappa_w"))
  }

  /** The κ derivation from carried [[agreementCells]] — ONE definition
    * shared with the batch path (the D27 convention).
    */
  def kappaFromCells(cells: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val rows = cells.groupBy(col("__a").as("cls")).agg(sum(col("n")).as("row_n"))
    val cols = cells.groupBy(col("__b").as("cls")).agg(sum(col("n")).as("col_n"))
    val spine = rows.select(col("cls")).unionByName(cols.select(col("cls"))).distinct()
    val margins = spine
      .join(rows, Seq("cls"), "left").join(cols, Seq("cls"), "left")
      .select(
        coalesce(col("row_n"), lit(0L)).cast(d38).as("__r"),
        coalesce(col("col_n"), lit(0L)).cast(d38).as("__c"))
      .agg(sum(col("__r") * col("__c")).as("__pe_num"))
    val tot = cells.agg(
      sum(col("n")).as("n"),
      sum(when(col("__a") === col("__b"), col("n")).otherwise(0L)).as("n_agree"))
    val j = tot.crossJoin(margins)
    val po = col("n_agree").cast("double") / col("n").cast("double")
    val pe = col("__pe_num").cast("double") /
      (col("n").cast(d38) * col("n").cast(d38)).cast("double")
    j.select(
      coalesce(col("n"), lit(0L)).as("n"),
      coalesce(col("n_agree"), lit(0L)).as("n_agree"),
      when(col("n") > 0L, po).as("p_observed"),
      when(col("n") > 0L, pe).as("p_expected"),
      when(col("n") > 0L && (lit(1.0) - pe) > 0.0,
        (po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Gwet's AC1 chance-corrected agreement (B135, Gwet 2008) — the
    * PARADOX-ROBUST companion of [[cohensKappa]] (kappa collapses when
    * the marginals are skewed even at high raw agreement — the "kappa
    * paradox"; AC1's chance term uses the class-PREVALENCE midpoints
    * instead of the marginal product): AC1 = (p_o − p_e)/(1 − p_e) with
    * p_e = Σ_c π_c(1−π_c)/(K−1), π_c = (row_c + col_c)/(2N).
    *
    * Exactness: the Σ telescopes — since Σ(row+col) = 2N,
    * Σ π(1−π) = 1 − Σ(row_c+col_c)²/(4N²), so p_e needs only
    * S = Σ(row+col)² accumulated EXACTLY in DECIMAL(38,0) (the kappa
    * pe_num protocol — never a per-class IEEE division summed in
    * engine-visible order) and one fixed IEEE chain; p_o is one exact
    * division ⇒ p_o/p_e/ac1 all hash UNROUNDED (the q_gini protocol).
    * Cells/marginals ride the SAME one-pass construction as kappa
    * (bounded by label vocabulary²). NULL ac1 when N = 0, K < 2 or the
    * chance term degenerates (p_e = 1 is impossible at K ≥ 2 —
    * Cauchy–Schwarz gives p_e ≤ 1/K — but the guard stays, belt and
    * braces). Single row.
    */
  def gwetAc1(df: DataFrame, aCol: String, bCol: String): DataFrame =
    ac1FromCells(agreementCells(df, aCol, bCol))

  /** The AC1 derivation from carried [[agreementCells]] — ONE
    * definition shared with the batch path (the D27 convention).
    */
  def ac1FromCells(cells: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val rows = cells.groupBy(col("__a").as("cls")).agg(sum(col("n")).as("row_n"))
    val cols = cells.groupBy(col("__b").as("cls")).agg(sum(col("n")).as("col_n"))
    val spine = rows.select(col("cls")).unionByName(cols.select(col("cls"))).distinct()
    val margins = spine
      .join(rows, Seq("cls"), "left").join(cols, Seq("cls"), "left")
      .select((coalesce(col("row_n"), lit(0L)) + coalesce(col("col_n"), lit(0L)))
        .cast(d38).as("__rc"))
      .agg(count(lit(1)).as("n_classes"), sum(col("__rc") * col("__rc")).as("__s"))
    val tot = cells.agg(
      sum(col("n")).as("n"),
      sum(when(col("__a") === col("__b"), col("n")).otherwise(0L)).as("n_agree"))
    val j = tot.crossJoin(margins)
    val po = col("n_agree").cast("double") / col("n").cast("double")
    // p_e = (1 − S/(4N²)) / (K−1), S and 4N² both exact decimals
    val pe = (lit(1.0) - col("__s").cast("double") /
      (lit(4L).cast(d38) * col("n").cast(d38) * col("n").cast(d38)).cast("double")) /
      (col("n_classes") - lit(1L)).cast("double")
    j.select(
      coalesce(col("n"), lit(0L)).as("n"),
      coalesce(col("n_agree"), lit(0L)).as("n_agree"),
      coalesce(col("n_classes"), lit(0L)).as("n_classes"),
      when(col("n") > 0L, po).as("p_observed"),
      when(col("n") > 0L && col("n_classes") >= 2L, pe).as("p_chance"),
      when(col("n") > 0L && col("n_classes") >= 2L && (lit(1.0) - pe) > 0.0,
        (po - pe) / (lit(1.0) - pe)).as("ac1"))
  }

  /** Cohen's d / Hedges' g standardized mean difference (B132) — the
    * EFFECT-SIZE companion of [[welchT]] (t answers "is the gap real?",
    * d answers "how many pooled SDs wide is it?"):
    *   d = (m_a − m_b) / s_p,  s_p² = ((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2),
    *   g = d · (1 − 3/(4(n_a+n_b) − 9))   (the small-sample bias factor).
    * Rides welchT's exact per-side decimal (n, Σv, Σv²) sums VERBATIM;
    * the written IEEE sequence computes each side's Σ(x−m)² as
    * s2 − s1·(s1/n) (the welch op order) and everything downstream is
    * one fixed chain. The decimal→double conversions share welch's
    * drift class ⇒ means/d/g hash at hashRound 4 under the StatsSpec
    * boundary-audit protocol. NULL d/g when either side has n < 2 or
    * the pooled variance degenerates. Single row.
    */
  def cohensD(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val v = col(valueCol)
    def side(g: String, suf: String) = df
      .where(col(groupCol) === g && v.isNotNull)
      .agg(
        count(lit(1)).as(s"n_$suf"),
        ExactMath.dsum(v).as(s"__s1$suf"),
        sum((v.cast(ExactMath.ValueDecimal) * v.cast(ExactMath.ValueDecimal))
          .cast(ExactMath.ValueDecimal)).cast("double").as(s"__s2$suf"))
    val joined = side(groupA, "a").crossJoin(side(groupB, "b"))
    def meanOf(suf: String) = col(s"__s1$suf") / col(s"n_$suf").cast("double")
    def ssOf(suf: String) =
      col(s"__s2$suf") - col(s"__s1$suf") * meanOf(suf)
    val nA = col("n_a").cast("double"); val nB = col("n_b").cast("double")
    val pooledVar = (ssOf("a") + ssOf("b")) / (nA + nB - lit(2.0))
    val d = (meanOf("a") - meanOf("b")) / sqrt(pooledVar)
    val g = d * (lit(1.0) - lit(3.0) / (lit(4.0) * (nA + nB) - lit(9.0)))
    val ok = col("n_a") >= 2L && col("n_b") >= 2L && pooledVar > 0.0
    joined.select(
      col("n_a"), col("n_b"),
      ExactMath.hashRound(meanOf("a"), 4).as("mean_a"),
      ExactMath.hashRound(meanOf("b"), 4).as("mean_b"),
      ExactMath.hashRound(when(ok, d), 4).as("cohens_d"),
      ExactMath.hashRound(when(ok, g), 4).as("hedges_g"))
  }

  /** Two-sample variance-ratio F test (B143) — "is one cohort more
    * VARIABLE than the other?", the two-group special case next to
    * [[bartlett]]'s k-group χ² (and the precondition check classical
    * pooled-t users run before trusting equal variances):
    * F = s_a²/s_b² with welch-order sample variances from the SAME
    * exact per-side decimal (n, Σv, Σv²) sums as [[welchT]] /
    * [[cohensD]]. One fixed IEEE chain, one division; the conversions
    * share welch's drift class ⇒ var_a/var_b/f_stat hashRound(4) under
    * the StatsSpec boundary-audit protocol. NULL F when either side
    * has n < 2 or a degenerate variance. Single row.
    */
  def varianceRatio(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val v = col(valueCol)
    def side(g: String, suf: String) = df
      .where(col(groupCol) === g && v.isNotNull)
      .agg(
        count(lit(1)).as(s"n_$suf"),
        ExactMath.dsum(v).as(s"__s1$suf"),
        sum((v.cast(ExactMath.ValueDecimal) * v.cast(ExactMath.ValueDecimal))
          .cast(ExactMath.ValueDecimal)).cast("double").as(s"__s2$suf"))
    val joined = side(groupA, "a").crossJoin(side(groupB, "b"))
    def vaOf(suf: String): Column = {
      val n = col(s"n_$suf").cast("double")
      (col(s"__s2$suf") - col(s"__s1$suf") * (col(s"__s1$suf") / n)) /
        (n - lit(1.0))
    }
    val va = vaOf("a"); val vb = vaOf("b")
    val ok = col("n_a") >= 2L && col("n_b") >= 2L && va > 0.0 && vb > 0.0
    joined.select(
      col("n_a"), col("n_b"),
      ExactMath.hashRound(when(ok, va), 4).as("var_a"),
      ExactMath.hashRound(when(ok, vb), 4).as("var_b"),
      ExactMath.hashRound(when(ok, va / vb), 4).as("f_stat"))
  }

  /** Paired sign test over a column of paired differences (B133) — the
    * assumption-free floor under [[wilcoxonSignedRank]] (Wilcoxon needs
    * symmetric differences; the sign test only needs exchangeability):
    * did MORE pairs move up than down? Zero differences drop (the
    * Wilcoxon convention — same input contract, callers share the diff
    * construction). z = (n_pos − n_neg)/√n on the normal approximation
    * WITHOUT continuity correction (documented — the correction's ±0.5
    * is a modeling choice, not a determinism hazard, but the plain form
    * keeps the chain one sub/sqrt/div). Exact BIGINT counts, one fixed
    * IEEE chain ⇒ z hashes UNROUNDED and `moved` compares identical
    * doubles (the q_gini protocol). NULL z when no nonzero diffs.
    * Single row.
    */
  def signTest(df: DataFrame, diffCol: String): DataFrame = {
    val d = col(diffCol)
    val agg = df.where(d.isNotNull && d =!= 0)
      .agg(
        sum(when(d > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(d < 0, 1L).otherwise(0L)).as("n_neg"))
    val n = col("n_pos") + col("n_neg")
    val z = (col("n_pos") - col("n_neg")).cast("double") /
      sqrt(n.cast("double"))
    val zOut = when(n > 0L, z)
    agg.select(
      coalesce(col("n_pos"), lit(0L)).as("n_pos"),
      coalesce(col("n_neg"), lit(0L)).as("n_neg"),
      zOut.as("z_score"),
      when(zOut.isNotNull, abs(zOut) > lit(1.96)).as("moved"))
  }

  /** Cochran–Armitage trend test (B134, Cochran 1954 / Armitage 1955)
    * — is a success RATE monotonically trending across k ORDERED
    * groups? The ordinal companion of [[twoProportionZ]] (two unordered
    * cohorts there; a dose-response ladder here — e.g. does the urgent→
    * low priority ladder carry a fulfillment-rate trend?). With integer
    * score w per row (the group's ordinal) and success s ∈ {0,1}:
    *   T = Σws − X·Σw/N,   Var = p(1−p)·(Σw² − (Σw)²/N),   z = T/√Var,
    * p = X/N. ONE row-grain partial-agg pass (Σw, Σw², Σws, X, N — the
    * group table never materializes); the cross products X·Σw and
    * (Σw)² accumulate in DECIMAL(38,0) (LONG wraps at target scale —
    * the keySkew lesson) and every downstream op is one fixed IEEE
    * chain on correctly-rounded conversions ⇒ z hashes UNROUNDED.
    * NULL z when N = 0, p degenerate (0 or 1), or Var ≤ 0 (all rows on
    * one score). `scoreCol` must be integral and NON-NULL where the
    * group is (pre-derive the ordinal upstream); NULL score/success
    * rows drop. Single row.
    */
  def cochranArmitage(
      df: DataFrame,
      scoreCol: Column,
      successCol: Column): DataFrame =
    trendFromState(trendState(df, scoreCol, successCol))

  /** Exact sufficient state of [[cochranArmitage]] (D34): ONE row of
    * field-wise associative sums (n, n_success, Σw, Σw², Σws) — a
    * streaming monitor folds microbatches with [[mergeTrendState]] and
    * re-derives z on demand; merged state == one-shot EXACTLY (the
    * D25/momentsState argument). NOT idempotent — replays double-count
    * (the D20 partition contract).
    */
  def trendState(
      df: DataFrame,
      scoreCol: Column,
      successCol: Column): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = scoreCol.cast("long")
    val s = successCol.cast("long")
    df.where(scoreCol.isNotNull && successCol.isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(s).as("n_success"),
        sum(w).as("__sw"),
        sum(w.cast(d38) * w.cast(d38)).as("__sw2"),
        sum(w * s).as("__sws"))
  }

  /** Field-wise merge of two [[trendState]]s. */
  def mergeTrendState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).agg(
      sum(col("n")).as("n"),
      sum(col("n_success")).as("n_success"),
      sum(col("__sw")).as("__sw"),
      sum(col("__sw2")).as("__sw2"),
      sum(col("__sws")).as("__sws"))

  /** The z derivation from a carried [[trendState]] — ONE definition
    * shared with the batch path (state-maintained == one-shot is
    * structural, the D27 convention).
    */
  def trendFromState(agg: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val nD = col("n").cast("double")
    val p = col("n_success").cast("double") / nD
    val t = col("__sws").cast("double") -
      (col("n_success").cast(d38) * col("__sw").cast(d38)).cast("double") / nD
    val varT = p * (lit(1.0) - p) *
      (col("__sw2").cast("double") -
        (col("__sw").cast(d38) * col("__sw").cast(d38)).cast("double") / nD)
    val ok = col("n") > 0L && p > 0.0 && p < 1.0 && varT > 0.0
    val z = when(ok, t / sqrt(varT))
    agg.select(
      coalesce(col("n"), lit(0L)).as("n"),
      coalesce(col("n_success"), lit(0L)).as("n_success"),
      z.as("z_score"),
      when(z.isNotNull, abs(z) > lit(1.96)).as("trending"))
  }

  /** Bartlett's test of variance homogeneity (B142, Bartlett 1937) —
    * the PARAMETRIC sibling of [[leveneBrownForsythe]] (Levene is
    * robust to non-normality; Bartlett is the textbook likelihood-ratio
    * form, more powerful under normality):
    *   χ² = [(N−k)·ln(s_p²) − Σ(n_i−1)·ln(s_i²)] /
    *        [1 + (Σ 1/(n_i−1) − 1/(N−k)) / (3(k−1))]
    * with welch-order sample variances s_i² = (q − s·m)/(n−1) and the
    * pooled s_p² = Σ(n_i−1)s_i²/(N−k). Rides [[anovaGroupState]]'s
    * exact decimal sums; every Σ folds SEQUENTIALLY over the
    * group-sorted spine (the anovaOneWay order-free rule, init-less
    * `list_reduce` mirror). The per-group lns are SPINE-BOUNDED (k
    * groups, the Theil rule) ⇒ chi2 and the pooled variance
    * hashRound(4) as the 13TH AUDITED TRANSCENDENTAL under a
    * MarginAuditSpec boundary audit. NULL when k < 2 or any group has
    * n < 2 / a degenerate variance (the statistic is undefined).
    */
  def bartlett(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spine = anovaSpine(anovaGroupState(df, groupCol, valueCol))
    def fold(term: Column => Column): Column =
      aggregate(col("gs"), lit(0.0), (acc, e) => acc + term(e))
    val k = size(col("gs"))
    val bigN = aggregate(col("gs"), lit(0L), (acc, e) => acc + e.getField("n_g"))
    def nD(e: Column): Column = e.getField("n_g").cast("double")
    def va(e: Column): Column =
      (e.getField("q_g") - e.getField("s_g") * (e.getField("s_g") / nD(e))) /
        (nD(e) - lit(1.0))
    val sw = fold(e => (nD(e) - lit(1.0)) * va(e))
    val sl = fold(e => (nD(e) - lit(1.0)) * log(va(e)))
    val si = fold(e => lit(1.0) / (nD(e) - lit(1.0)))
    val viol = fold(e =>
      when(e.getField("n_g") >= 2L && va(e) > 0.0, 0.0).otherwise(1.0))
    val nmk = (bigN - k.cast("long")).cast("double")
    val sp2 = sw / nmk
    val num = nmk * log(sp2) - sl
    val corr = lit(1.0) +
      (si - lit(1.0) / nmk) / (lit(3.0) * (k - 1).cast("double"))
    val ok = k >= 2 && viol === 0.0
    spine.select(
      k.cast("long").as("n_groups"),
      bigN.as("n"),
      ExactMath.hashRound(when(ok, sp2), 4).as("pooled_var"),
      ExactMath.hashRound(when(ok, num / corr), 4).as("chi2"))
  }

  /** Per-group coefficient of variation (B141) — the relative-spread
    * column of every profiling surface (a 10-unit sd means nothing
    * without the mean; cv = sd/mean is the comparable number): rides
    * [[anovaGroupState]]'s exact decimal (n, Σv, Σv²) sums with the
    * welch-order sample variance ((q − s·m)/(n−1)) and one
    * division each for cv and its relative standard error cv/√n.
    * The decimal→double conversions share the anova drift class ⇒
    * mean/sd/cv/rse hashRound(4) under the StatsSpec boundary-audit
    * protocol. NULL spread stats on n < 2, a zero mean (cv undefined)
    * or degenerate variance.
    */
  def cvByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    cvFromState(anovaGroupState(df, groupCol, valueCol))

  /** The cv derivation from a pre-aggregated [[anovaGroupState]] — one
    * definition shared with any streaming monitor over the mergeable
    * state (the D33 precedent).
    */
  def cvFromState(state: DataFrame): DataFrame = {
    val n = col("n_g").cast("double")
    val m = col("s_dec").cast("double") / n
    val va = (col("q_dec").cast("double") - col("s_dec").cast("double") * m) /
      (n - lit(1.0))
    val sd = sqrt(va)
    val cv = sd / m
    val ok = col("n_g") >= 2L && va > 0.0 && m =!= 0.0
    state.select(
      col("g"),
      col("n_g").as("n_rows"),
      ExactMath.hashRound(m, 4).as("mean"),
      ExactMath.hashRound(when(ok, sd), 4).as("sd"),
      ExactMath.hashRound(when(ok, cv), 4).as("cv"),
      ExactMath.hashRound(when(ok, cv / sqrt(n)), 4).as("rse"))
      .orderBy("g")
  }

  /** Per-key inter-arrival gap statistics (B140) — how regularly does
    * each entity act? The cadence profile behind churn screens and
    * replenishment models: per key with ≥ 2 events, the event count,
    * the first→last span in days, the LONGEST gap, and the mean gap.
    * mean_gap = span/(n−1) EXACTLY (consecutive gaps telescope — no
    * gap array needed for it); max_gap folds the (order, tie)-sorted
    * array once (the MK bounded-series contract — one in-memory array
    * per key, plain hash groupBy, map-side evaluation). Day diffs are
    * exact integers and the single division is one IEEE op ⇒
    * everything hashes unrounded (the q_gini protocol).
    */
  def interarrival(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val g = keyCols.map(col)
    val clean = df.where(g.map(_.isNotNull).reduce(_ && _) &&
      col(orderCol).isNotNull && col(tieCol).isNotNull)
    val agg = clean.groupBy(g: _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(orderCol)).as("__first"),
        max(col(orderCol)).as("__last"),
        sort_array(collect_list(struct(
          col(orderCol).as("d"), col(tieCol).as("t")))).as("__sp"))
      .where(col("n_events") >= 2L)
    val sz = size(col("__sp"))
    val gaps = zip_with(
      slice(col("__sp"), lit(1), sz - lit(1)),
      slice(col("__sp"), lit(2), sz - lit(1)),
      (a, b) => datediff(b.getField("d"), a.getField("d")).cast("long"))
    agg.select(
      (g ++ Seq(
        col("n_events"),
        datediff(col("__last"), col("__first")).cast("long").as("span_days"),
        array_max(gaps).as("max_gap_days"),
        (datediff(col("__last"), col("__first")).cast("long").cast("double")
          / (col("n_events") - lit(1L)).cast("double")).as("mean_gap_days"))): _*)
  }

  /** Per-key first/last-observation state (D36) — the mergeable state
    * behind the paired-movement tests ([[wilcoxonSignedRank]] /
    * [[signTest]] over first→last diffs): one row per key carrying the
    * struct-MIN and struct-MAX of (order, tie, value) plus the
    * observation count. min/max merge idempotently and counts add
    * ([[mergePairedMovementState]]), so a streaming monitor folds
    * microbatches and re-derives the diffs on demand; merged state ==
    * one-shot EXACTLY. The COUNT is the non-idempotent field (the D20
    * partition contract — replays double-count it; min/max survive
    * replays, so only the n ≥ 2 filter is at stake).
    */
  def pairedMovementState(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      valueCol: String): DataFrame =
    df.where(col(keyCol).isNotNull && col(orderCol).isNotNull &&
        col(tieCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(
        min(struct(col(orderCol).as("d"), col(tieCol).as("t"),
          col(valueCol).as("p"))).as("__f"),
        max(struct(col(orderCol).as("d"), col(tieCol).as("t"),
          col(valueCol).as("p"))).as("__l"),
        count(lit(1)).as("__n"))

  /** Merge two [[pairedMovementState]]s (struct min/max + count add). */
  def mergePairedMovementState(a: DataFrame, b: DataFrame, keyCol: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(keyCol))
      .agg(min(col("__f")).as("__f"), max(col("__l")).as("__l"),
        sum(col("__n")).as("__n"))

  /** First→last paired diffs from a carried state — keys with a single
    * observation drop (no pair yet); zero diffs survive here and drop
    * inside the tests (their shared convention).
    */
  def pairedDiffsFromState(state: DataFrame): DataFrame =
    state.where(col("__n") >= 2L)
      .select((col("__l").getField("p") - col("__f").getField("p")).as("__d"))

  /** Mood's median test across ALL groups of a categorical column
    * (B138) — the robust-to-outliers cousin of [[kruskalWallis]] (ranks
    * there, a single median split here: do the k groups straddle the
    * GLOBAL median at the same rate?). The global lower median is an
    * exact SELECTION from the value spine — the smallest value whose
    * inclusive cumulative count clears (N+1)/2, division-free via
    * `2·cum ≥ N+1` (the weightedQuantile threshold trick) over the
    * [[RankedSpine]] distributed prefix (no single-task spine window).
    * Per group: a_g = count strictly ABOVE the median (ties with the
    * median land below — documented, the split the selection implies);
    * χ² folds the 2×k grid SEQUENTIALLY over the group-sorted spine
    * (per-element terms built by `transform`, summed by a 0.0-init
    * `aggregate` — the logrank/cramers order-free rule, init-less
    * `list_reduce` mirror) with e = n_g·A/N in ONE written IEEE order
    * ⇒ med_value hashes EXACT and chi2 UNROUNDED. NULL chi2 when k < 2
    * or either side of the split is empty (degenerate expecteds).
    * Single row.
    */
  def moodsMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val clean = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
    val cells = clean
      .groupBy(col(valueCol).as("__s"), col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__cg"))
    val vals = cells.groupBy("__s").agg(sum(col("__cg")).as("__cnt"))
    val tot = vals.agg(sum(col("__cnt")).as("__n"))
    val medRow = RankedSpine
      .exclusivePrefix(vals, Nil, "__s", Seq("__cnt" -> "__bef"))
      .crossJoin(broadcast(tot))
      .where((col("__bef") + col("__cnt")) * 2 >= col("__n") + 1)
      .agg(min(col("__s")).as("__med"))
    val perG = cells.crossJoin(broadcast(medRow))
      .groupBy("__g")
      .agg(
        sum(col("__cg")).as("__ng"),
        sum(when(col("__s") > col("__med"), col("__cg")).otherwise(0L)).as("__a"),
        max(col("__med")).as("__med"))
    val spine = perG.agg(
      count(lit(1)).as("n_groups"),
      sum(col("__ng")).as("n"),
      sum(col("__a")).as("__ta"),
      max(col("__med")).as("med_value"),
      array_sort(collect_list(struct(
        col("__g"), col("__ng"), col("__a")))).as("__gs"))
    val nD = col("n").cast("double")
    val aD = col("__ta").cast("double")
    val bD = (col("n") - col("__ta")).cast("double")
    def term(e: Column): Column = {
      val ng = e.getField("__ng").cast("double")
      val ag = e.getField("__a").cast("double")
      val bg = (e.getField("__ng") - e.getField("__a")).cast("double")
      val ea = ng * aD / nD
      val eb = ng * bD / nD
      (ag - ea) * (ag - ea) / ea + (bg - eb) * (bg - eb) / eb
    }
    val chi2 = aggregate(transform(col("__gs"), term _), lit(0.0),
      (acc, t) => acc + t)
    spine.select(
      coalesce(col("n"), lit(0L)).as("n"),
      coalesce(col("n_groups"), lit(0L)).as("n_groups"),
      // exact decimal→double conversion (values sit far inside 2^53)
      col("med_value").cast("double").as("med_value"),
      when(col("n_groups") >= 2L && col("__ta") > 0L &&
        col("__ta") < col("n"), chi2).as("chi2"))
  }

  /** Wald–Wolfowitz runs test per key (B104) — is the sequence of
    * above/below-median outcomes random? The sign-memory screen next to
    * B75's lag-1 autocorrelation (linear memory). Bounded-series HOF
    * shape (the MK contract: one in-memory array per key, plain hash
    * groupBy, map-side folds).
    *
    * The per-key reference is the LOWER-MEDIAN ELEMENT of the
    * value-sorted array (SELECTION, exact — `quantile_disc` mirror);
    * rows EQUAL to it drop (the standard runs convention); the
    * (order, tie)-sorted residue maps to ±1 and ONE sequential fold
    * counts transitions (init prev=0 so the first element always opens
    * run 1). Exact ints end to end; with N = n₁+n₂,
    *   E = 2n₁n₂/N + 1,  V = 2n₁n₂(2n₁n₂ − N) / (N²(N−1)),
    *   z = (R − E)/sqrt(V)
    * — a fixed IEEE chain on exact-int conversions ⇒ `med_value` and
    * `z_score` hash UNROUNDED. The N³ long product is wrap-safe under
    * the bounded-series contract (N < 2.1M). NULL z when either sign is
    * absent or V degenerates.
    */
  def runsTest(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val g: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      g.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    val grouped = clean
      .groupBy(g: _*)
      .agg(
        array_sort(collect_list(struct(
          col(orderCol).as("o"), col(tieCol).as("t"),
          col(valueCol).cast("double").as("v")))).as("sp"),
        array_sort(collect_list(col(valueCol).cast("double"))).as("sv"))
      .where(size(col("sv")) >= 2)
    val med = element_at(col("sv"), ((size(col("sv")) + 1) / 2).cast("int"))
    val signed = grouped
      .withColumn("__med", med)
      .withColumn("__signs", filter(
        transform(col("sp"), e =>
          when(e.getField("v") > col("__med"), 1)
            .when(e.getField("v") < col("__med"), -1)),
        x => x.isNotNull))
    val n1 = size(filter(col("__signs"), x => x === 1)).cast("long")
    val n2 = size(filter(col("__signs"), x => x === -1)).cast("long")
    val runs = element_at(
      aggregate(col("__signs"), array(lit(0), lit(0)),
        (acc, x) => array(x,
          element_at(acc, 2) + when(x =!= element_at(acc, 1), 1).otherwise(0))),
      2).cast("long")
    val counted = signed.select(g ++ Seq(
      size(col("sp")).cast("long").as("n_points"),
      col("__med").as("med_value"),
      n1.as("n_above"), n2.as("n_below"), runs.as("n_runs")): _*)
    val bigN = col("n_above") + col("n_below")
    val twoAB = lit(2L) * col("n_above") * col("n_below")
    val e = twoAB.cast("double") / bigN.cast("double") + lit(1.0)
    val v = (twoAB * (twoAB - bigN)).cast("double") /
      (bigN * bigN * (bigN - lit(1L))).cast("double")
    counted.select(g ++ Seq(
      col("n_points"), col("med_value"),
      col("n_above"), col("n_below"), col("n_runs"),
      when(col("n_above") > 0L && col("n_below") > 0L && v > 0.0,
        (col("n_runs").cast("double") - e) / sqrt(v)).as("z_score")): _*)
  }

  /** Two-sample Poisson rate comparison between two named cohorts
    * (B100) — events-per-exposure-unit, the COUNT-outcome sibling of
    * [[twoProportionZ]] (shares vs rates): c = row count, t = DISTINCT
    * exposure units (e.g. active days), rate = c/t, and
    * z = (r_a − r_b) / sqrt(c_a/t_a² + c_b/t_b²)
    * (the Poisson-mean normal approximation with Var(c/t) ≈ c/t²).
    * Exact BIGINT counts; each rate is ONE division of exact ints and
    * the variance terms divide by exact DECIMAL t² products (no long
    * wrap at any scale), summed in written order — one fixed IEEE
    * chain, so rates and z hash UNROUNDED (the q_gini protocol). NULL
    * z when either exposure is 0 or the variance degenerates.
    */
  def poissonRateTest(
      df: DataFrame,
      groupCol: String,
      unitCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def side(gv: String, suf: String) = df
      .where(col(groupCol) === gv && col(unitCol).isNotNull)
      .agg(
        count(lit(1)).as(s"c_$suf"),
        countDistinct(col(unitCol)).as(s"t_$suf"))
    val j = side(groupA, "a").crossJoin(side(groupB, "b"))
    def rate(suf: String): Column =
      col(s"c_$suf").cast("double") / col(s"t_$suf").cast("double")
    def varTerm(suf: String): Column =
      col(s"c_$suf").cast("double") /
        (col(s"t_$suf").cast(d38) * col(s"t_$suf").cast(d38)).cast("double")
    val ok = col("t_a") > 0L && col("t_b") > 0L &&
      (varTerm("a") + varTerm("b")) > 0.0
    j.select(
      col("c_a"), col("t_a"), col("c_b"), col("t_b"),
      when(col("t_a") > 0L, rate("a")).as("rate_a"),
      when(col("t_b") > 0L, rate("b")).as("rate_b"),
      when(ok, (rate("a") - rate("b"))
        / sqrt(varTerm("a") + varTerm("b"))).as("z_score"))
  }

  /** Friedman test across k treatments over repeated blocks (B110) —
    * the BLOCKED companion of [[kruskalWallis]] (there every row ranks
    * on one global spine; here each block ranks its own k treatment
    * values, so between-block level shifts cancel — the repeated-
    * measures nonparametric ANOVA). Cells are exact
    * DECIMAL(18,6) value sums per (block, treatment); only COMPLETE
    * blocks (all k treatments present) enter, the classical contract.
    *
    * Ranks are the doubled-average-rank integers of the Spearman
    * protocol (r2 = 2·rank_min + tiecount − 1 — value-determined, no
    * tiebreak column needed; the decimal cell sums make real ties
    * astronomically rare but the formula stays exact if they happen),
    * assigned by ONE window pair over the AGGREGATED cell spine
    * (blocks × k rows — never the fact table). With R2_j the per-
    * treatment doubled rank sum, the tie-robust (Conover) form on
    * doubled ranks is
    *   χ²_F = (k−1)·Σ_j (R2_j − n(k+1))² / (A2 − C2),
    *   A2 = Σ r2²  (all cells),  C2 = n·k·(k+1)²
    * — every term an exact integer in DECIMAL(38,0) (HUGEINT mirror),
    * ONE final division ⇒ χ²_F hashes UNROUNDED (the q_gini protocol;
    * the two decimal→double conversions stay under 2^53 for any
    * block count below ~50M — document-bounded at the month grain).
    * No-ties sanity: the doubled form reduces exactly to the classical
    * 12/(nk(k+1))·ΣR² − 3n(k+1) (spec-pinned on a hand case). NULL
    * χ²_F when k < 2, no complete block, or A2 = C2 (every block fully
    * tied). Single-row output.
    */
  def friedman(
      df: DataFrame,
      blockCol: String,
      treatCol: String,
      valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val fin = friedmanCore(df, blockCol, treatCol, valueCol)
    val c2 = (col("n_blocks").cast(d38) * col("n_treatments").cast(d38)
      * (col("n_treatments") + lit(1L)).cast(d38)
      * (col("n_treatments") + lit(1L)).cast(d38)).cast(d38)
    val num = ((col("n_treatments") - lit(1L)).cast(d38) * col("__sumd2")).cast(d38)
    val den = (col("__A2") - c2).cast(d38)
    fin.select(
      coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
      coalesce(col("n_treatments"), lit(0L)).as("n_treatments"),
      when(col("n_treatments") >= 2L && col("n_blocks") > 0L && den > 0L,
        num.cast("double") / den.cast("double")).as("chi2_f"))
  }

  /** The shared single-row state behind [[friedman]] and [[kendallW]]:
    * (n_blocks, n_treatments, __sumd2 = Σ(R2_j − m(k+1))², __A2 = Σr2²)
    * over complete blocks with doubled within-block average ranks —
    * extracted verbatim from the r13 friedman (bit-neutral).
    */
  /** Complete-block doubled within-block ranks — (ranked cells with
    * (__b, __t, __r2), 1-row treatment-count frame) — shared by
    * [[friedman]], [[kendallW]] and [[pageTrend]].
    */
  private def friedmanRanked(
      df: DataFrame,
      blockCol: String,
      treatCol: String,
      valueCol: String): (DataFrame, DataFrame) = {
    val clean = df.where(col(blockCol).isNotNull && col(treatCol).isNotNull &&
      col(valueCol).isNotNull)
    val cells = clean
      .groupBy(col(blockCol).as("__b"), col(treatCol).cast("string").as("__t"))
      .agg(sum(col(valueCol).cast(ExactMath.ValueDecimal)).as("__v"))
    val kDf = cells.agg(countDistinct(col("__t")).as("__k"))
    val complete = cells.groupBy("__b").agg(count(lit(1)).as("__cb"))
      .crossJoin(broadcast(kDf))
      .where(col("__cb") === col("__k"))
      .select("__b")
    val wR = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val wT = Window.partitionBy(col("__b"), col("__v"))
    val ranked = cells.join(complete, "__b")
      .select(col("__b"), col("__t"),
        (lit(2L) * rank().over(wR) + count(lit(1)).over(wT) - lit(1L)).as("__r2"))
    (ranked, kDf)
  }

  private def friedmanCore(
      df: DataFrame,
      blockCol: String,
      treatCol: String,
      valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val (ranked, kDf) = friedmanRanked(df, blockCol, treatCol, valueCol)
    val perT = ranked.groupBy("__t")
      .agg(sum(col("__r2").cast(d38)).as("__R2"))
    val totals = ranked.agg(
      sum(col("__r2").cast(d38) * col("__r2").cast(d38)).as("__A2"),
      countDistinct(col("__b")).as("__n"))
    val dj = col("__R2") - (col("__n").cast(d38) * (col("__k") + lit(1L)).cast(d38))
    perT.crossJoin(broadcast(totals)).crossJoin(broadcast(kDf))
      .agg(
        sum(dj * dj).as("__sumd2"),
        max(col("__A2")).as("__A2"),
        max(col("__n")).as("n_blocks"),
        max(col("__k")).as("n_treatments"))
  }

  /** Page's trend test for an ORDERED alternative across treatments
    * (B139, Page 1963) — [[friedman]] asks "do the blocks distinguish
    * the treatments AT ALL?"; Page asks "do they rank them in THIS
    * order?" (the dose-response ladder — the blocked companion of
    * [[cochranArmitage]]'s row-grain trend). With w_j = the caller's
    * integer ordinal for treatment j and the doubled within-block
    * ranks, the DOUBLED Page statistic L2 = Σ_j w_j·R2_j stays an
    * exact integer even under ties (half-integral average ranks double
    * away — the mannWhitney convention); under H₀,
    *   E(L2) = m·k(k+1)²/2 (integral — k(k+1)² is always even),
    *   Var(L2) = m·k²(k+1)(k²−1)/36 (tie-free form, documented: the
    * value cells are continuous decimal sums, block-internal ties are
    * measure-zero; a fully-tied block only shrinks the true variance,
    * making the reported z conservative in magnitude... direction of
    * the approximation documented, not hidden).
    * All sums exact DECIMAL(38,0) (HUGEINT mirror), E(L2) halved
    * exactly in decimal (the u_a convention), z = one fixed IEEE chain
    * ⇒ l2_stat exact, z UNROUNDED. `increasing` = z > 1.645 (one-sided
    * 5%, the ordered-alternative read). NULL z at k < 2 or m = 0.
    */
  def pageTrend(
      df: DataFrame,
      blockCol: String,
      treatCol: String,
      valueCol: String,
      scoreOf: Column => Column): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val half = lit(new java.math.BigDecimal("0.5"))
    val (ranked, kDf) = friedmanRanked(df, blockCol, treatCol, valueCol)
    val perT = ranked.groupBy("__t")
      .agg(sum(col("__r2").cast(d38)).as("__R2"))
    val totals = ranked.agg(countDistinct(col("__b")).as("__n"))
    val fin = perT
      .agg(sum((scoreOf(col("__t")).cast("long")).cast(d38) * col("__R2"))
        .as("__l2"))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(kDf))
    val m = col("__n"); val k = col("__k")
    val e2 = ((m.cast(d38) * k.cast(d38)
      * ((k + lit(1L)) * (k + lit(1L))).cast(d38)).cast(d38) * half).cast(d38)
    val var2 = (m.cast(d38) * (k * k).cast(d38) * (k + lit(1L)).cast(d38)
      * (k * k - lit(1L)).cast(d38)).cast("double") / lit(36.0)
    val z = (col("__l2") - e2).cast("double") / sqrt(var2)
    val zOut = when(k >= 2L && m > 0L && var2 > 0.0, z)
    fin.select(
      coalesce(m, lit(0L)).as("n_blocks"),
      coalesce(k, lit(0L)).as("n_treatments"),
      col("__l2").cast("long").as("l2_stat"),
      zOut.as("z_score"),
      when(zOut.isNotNull, zOut > lit(1.645)).as("increasing"))
  }

  /** Kendall's coefficient of concordance W (B136, Kendall & Babington
    * Smith 1939) — HOW MUCH do the blocks agree on the treatment
    * ordering? The effect-size companion of [[friedman]]'s "is there
    * any agreement" χ² (the B124-to-B89 relationship), riding the
    * IDENTICAL doubled-rank state: with S2 = Σ(R2_j − m(k+1))² and the
    * Conover tie-corrected denominator, W = S2 / (m·(A2 − C2)) —
    * algebraically 12S/(m²(k³−k) − m·ΣT) (the friedman identity
    * χ²_F = m(k−1)·W, spec-pinned); W ∈ [0, 1], 1 = every block ranks
    * the treatments identically. Exact DECIMAL(38,0) end to end, ONE
    * division ⇒ W hashes UNROUNDED. NULL W when k < 2 or every block
    * fully ties (A2 = C2). Single row.
    */
  def kendallW(
      df: DataFrame,
      blockCol: String,
      treatCol: String,
      valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val fin = friedmanCore(df, blockCol, treatCol, valueCol)
    val c2 = (col("n_blocks").cast(d38) * col("n_treatments").cast(d38)
      * (col("n_treatments") + lit(1L)).cast(d38)
      * (col("n_treatments") + lit(1L)).cast(d38)).cast(d38)
    val den = (col("n_blocks").cast(d38) * (col("__A2") - c2)).cast(d38)
    fin.select(
      coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
      coalesce(col("n_treatments"), lit(0L)).as("n_treatments"),
      when(col("n_treatments") >= 2L && col("n_blocks") > 0L && den > 0L,
        col("__sumd2").cast("double") / den.cast("double")).as("w_concordance"))
  }

  /** Cochran's Q over k binary treatments measured on the same blocks
    * (B111) — the k-treatment generalization of [[mcnemar]] (paired
    * binary there, k-way here): do the k filters/classifiers pass
    * blocks at the same rate? Input is the BLOCK-GRAIN table (one row
    * per block, k boolean columns). With C_j the per-treatment success
    * counts, R_i the per-block success counts, N = ΣC_j:
    *   Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)
    * — exact BIGINT counts, squares in DECIMAL(38,0) (HUGEINT mirror;
    * C_j² ~ n² never wraps), ONE division ⇒ Q hashes UNROUNDED (the
    * q_gini protocol). All-0 and all-k blocks are kept (only all-0
    * blocks are Q-invariant — the classical statistic counts saturated
    * blocks in the denominator). NULL Q when the denominator is 0
    * (every block saturated or empty). Single row, one partial-agg
    * pass over the block table.
    */
  def cochranQ(df: DataFrame, blockCol: String, treatCols: Seq[String]): DataFrame = {
    require(treatCols.size >= 2, "Cochran's Q needs at least 2 treatments")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val k = treatCols.size
    val clean = df.where(col(blockCol).isNotNull &&
      treatCols.map(col(_).isNotNull).reduce(_ && _))
    val ints = treatCols.map(c => when(col(c), 1L).otherwise(0L).as(s"__$c"))
    val r = treatCols.map(c => col(s"__$c")).reduce(_ + _)
    val base = clean.select(ints: _*).withColumn("__r", r)
    val aggCols: Seq[Column] =
      sum(col("__r")).as("__N") +:
        sum(col("__r") * col("__r")).as("__sumR2") +:
        treatCols.map(c => sum(col(s"__$c")).as(s"__C_$c"))
    val agg = base.agg(count(lit(1)).as("n_blocks"), aggCols: _*)
    val sumC2 = treatCols.map(c => col(s"__C_$c").cast(d38) * col(s"__C_$c").cast(d38))
      .reduce(_ + _)
    val num = (lit(k - 1).cast(d38) *
      (lit(k).cast(d38) * sumC2 - col("__N").cast(d38) * col("__N").cast(d38))).cast(d38)
    val den = (lit(k).cast(d38) * col("__N").cast(d38) - col("__sumR2").cast(d38)).cast(d38)
    agg.select(
      coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
      lit(k.toLong).as("n_treatments"),
      coalesce(col("__N"), lit(0L)).as("n_success"),
      when(col("n_blocks") > 0L && den > 0L,
        num.cast("double") / den.cast("double")).as("q_stat"))
  }

  /** Durbin–Watson first-order autocorrelation statistic per key (B113)
    * — the residual-memory screen next to [[runsTest]] (sign memory)
    * and B75's lag-1 regression (linear memory): over the (order, tie)-
    * sorted series with e_t = v_t − mean,
    *   DW = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t²   (∈ [0, 4], 2 ≈ none).
    * Bounded-series HOF shape (the MK contract — one in-memory array
    * per key, plain hash groupBy, map-side folds). mean = exact decimal
    * sum ÷ n (one correctly-rounded division, identical both engines);
    * the numerator's mean CANCELS ((e_t − e_{t−1}) = (v_t − v_{t−1})) so
    * it is squared raw diffs; both sums fold SEQUENTIALLY in series
    * order from 0.0 (init-less `list_reduce` mirror — 0.0 + x is exact)
    * ⇒ DW hashes UNROUNDED. Keys with < 2 points drop (mirrored
    * HAVING); NULL DW when the residual sum is exactly 0.
    */
  def durbinWatson(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val g: Seq[Column] = keyCols.map(col)
    val clean = df.where(
      g.map(_.isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(tieCol).isNotNull && col(valueCol).isNotNull)
    val grouped = clean
      .groupBy(g: _*)
      .agg(
        array_sort(collect_list(struct(
          col(orderCol).as("o"), col(tieCol).as("t"),
          col(valueCol).cast("double").as("v")))).as("sp"),
        sum(col(valueCol).cast(ExactMath.ValueDecimal)).as("__s"),
        count(lit(1)).as("n_points"))
      .where(col("n_points") >= 2L)
    val withVs = grouped
      .withColumn("__vs", transform(col("sp"), e => e.getField("v")))
      .withColumn("__mean", col("__s").cast("double") / col("n_points").cast("double"))
    val den = aggregate(col("__vs"), lit(0.0), (acc, x) =>
      acc + (x - col("__mean")) * (x - col("__mean")))
    val diffs = zip_with(
      slice(col("__vs"), lit(2), size(col("__vs")) - 1),
      slice(col("__vs"), lit(1), size(col("__vs")) - 1),
      (a, b) => (a - b) * (a - b))
    val num = aggregate(diffs, lit(0.0), (acc, x) => acc + x)
    withVs
      .withColumn("__den", den)
      .withColumn("__num", num)
      .select(g ++ Seq(
        col("n_points"),
        when(col("__den") > 0.0, col("__num") / col("__den")).as("dw_stat")): _*)
  }

  /** Fleiss' kappa across m raters assigning categories to the same
    * items (B114) — the MULTI-RATER generalization of [[cohensKappa]]
    * (two fixed raters there; m interchangeable raters here). Input is
    * the ITEM-GRAIN table with one categorical column per rater; items
    * with any NULL rating drop (complete-rating contract). With
    * n_ij = raters assigning category j to item i, C_j = Σᵢ n_ij,
    * N = n·m:
    *   p_o = (Σᵢⱼ n_ij² − N) / (N·(m−1)),   p_e = Σⱼ C_j² / N²,
    *   κ = (p_o − p_e) / (1 − p_e).
    * Exact BIGINT counts; the squares accumulate in DECIMAL(38,0)
    * (HUGEINT mirror — C_j ~ N never wraps); p_o and p_e are one exact
    * division each and κ one fixed IEEE chain ⇒ all hash UNROUNDED
    * (the q_gini protocol). NULL κ at p_e = 1 (a single category from
    * every rater) or n = 0. Single row; one explode pass to the
    * (item, category) cells, margins from the AGGREGATED cells.
    */
  def fleissKappa(df: DataFrame, itemCol: String, raterCols: Seq[String]): DataFrame = {
    require(raterCols.size >= 2, "Fleiss' kappa needs at least 2 raters")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = raterCols.size
    val clean = df.where(col(itemCol).isNotNull &&
      raterCols.map(col(_).isNotNull).reduce(_ && _))
    val cells = clean
      .select(col(itemCol).as("__i"),
        explode(array(raterCols.map(c => col(c).cast("string")): _*)).as("__c"))
      .groupBy("__i", "__c").agg(count(lit(1)).as("__nij"))
    val perItem = cells.groupBy("__i")
      .agg(sum(col("__nij") * col("__nij")).as("__s2"))
    val perCat = cells.groupBy("__c").agg(sum(col("__nij")).as("__cj"))
    val itemTot = perItem.agg(
      count(lit(1)).as("n_items"),
      sum(col("__s2").cast(d38)).as("__sumS2"))
    val catTot = perCat.agg(
      sum(col("__cj").cast(d38) * col("__cj").cast(d38)).as("__sumC2"))
    val j = itemTot.crossJoin(broadcast(catTot))
    val bigN = (col("n_items").cast(d38) * lit(m.toLong).cast(d38)).cast(d38)
    val po = (col("__sumS2") - bigN).cast("double") /
      (bigN * lit((m - 1).toLong).cast(d38)).cast("double")
    val pe = col("__sumC2").cast("double") / (bigN * bigN).cast("double")
    j.select(
      coalesce(col("n_items"), lit(0L)).as("n_items"),
      lit(m.toLong).as("n_raters"),
      when(col("n_items") > 0L, po).as("p_observed"),
      when(col("n_items") > 0L, pe).as("p_expected"),
      when(col("n_items") > 0L && (lit(1.0) - pe) > 0.0,
        (po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Exact sufficient statistics for [[cronbachAlpha]]: one row per
    * item (plus the `__total` pseudo-item) with n, Σx, Σx² in exact
    * decimals (items cast to DECIMAL(18,6); squares exact in
    * DECIMAL(37,12) — no precision-loss rounding at these magnitudes).
    * Exposed so the MarginAuditSpec boundary audit can re-derive the
    * pre-rounding alpha from the same exact state the operator uses
    * (the CorrMatrix.sufficientStats pattern).
    */
  def cronbachStats(df: DataFrame, subjectCol: String, itemCols: Seq[String]): DataFrame = {
    require(itemCols.size >= 2, "Cronbach's alpha needs at least 2 items")
    val vd = ExactMath.ValueDecimal
    val clean = df.where(col(subjectCol).isNotNull &&
      itemCols.map(col(_).isNotNull).reduce(_ && _))
    // |x| beyond DECIMAL(18,6) would NULL the cast under ANSI-off and
    // silently drop the subject from every sum (the hhi class) — raise
    def guarded(c: String): Column =
      when(abs(col(c)) <= lit(1e11), col(c).cast(vd))
        .otherwise(raise_error(concat(
          lit(s"cronbachStats: item $c value "), col(c).cast("string"),
          lit(" exceeds DECIMAL(18,6) - rescale the item column first"))))
    // the __total pseudo-item is a SUM of k guarded items — the reduce
    // widens the decimal, but the narrowing cast back to (18,6) would
    // silently NULL past 1e12 under ANSI-off while the subject still
    // counts in n_subjects (the hhi silent-skew class, one level up) —
    // guard the total like the items (ADVICE r13)
    val totalWide = itemCols.map(guarded).reduce(_ + _)
    val totalGuarded =
      when(abs(totalWide) < lit(1000000000000L), totalWide.cast(vd))
        .otherwise(raise_error(concat(
          lit("cronbachStats: item-sum total "), totalWide.cast("string"),
          lit(" exceeds DECIMAL(18,6) - rescale the item columns first"))))
    val withTotal = clean.select(
      itemCols.map(c => guarded(c).as(s"__$c")) :+
        totalGuarded.as("__total"): _*)
    val names = itemCols.map(c => s"__$c") :+ "__total"
    val aggs = names.flatMap { c =>
      Seq(sum(col(c)).as(s"s_$c"), sum(col(c) * col(c)).as(s"ss_$c"))
    }
    val agg = withTotal.agg(count(lit(1)).as("n_subjects"), aggs: _*)
    val rows = names.map { c =>
      struct(lit(c).as("item"), col("n_subjects").as("n"),
        col(s"s_$c").cast("decimal(38,6)").as("sx"),
        col(s"ss_$c").cast("decimal(38,12)").as("sxx"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.item").as("item"), col("r.n").as("n"),
        col("r.sx").as("sx"), col("r.sxx").as("sxx"))
  }

  /** Cronbach's alpha internal-consistency coefficient (B115) — do k
    * numeric item scores measured on the same subjects move together?
    *   α = k/(k−1) · (1 − Σᵢ Var(xᵢ) / Var(Σᵢ xᵢ)).
    * Variances derive from [[cronbachStats]]' exact decimal sums with
    * ONE fixed IEEE sequence (Var = Σx²/n − (Σx/n)² — the CorrMatrix
    * op order); the item-variance Σ folds in ITEM-NAME-SORTED order
    * from 0.0 (the oracle writes the same sum in that literal order —
    * 0.0 + x is exact).
    * The decimal→double conversions can exceed 2^53 scaled units (the
    * TWA lesson: conversions there are correctly rounded but an
    * engine's rounding has measurably diverged an ulp), so alpha and
    * the variance ratio hash at hashRound 4 under a MarginAuditSpec
    * BOUNDARY audit (the CorrMatrix protocol — re-derived from the
    * exact decimal state at 3 SFs). NULL alpha when the total variance
    * degenerates to ≤ 0 or n < 2. Single row.
    */
  def cronbachAlpha(df: DataFrame, subjectCol: String, itemCols: Seq[String]): DataFrame = {
    val k = itemCols.size
    val stats = cronbachStats(df, subjectCol, itemCols)
    val n = col("n").cast("double")
    val v = col("sxx").cast("double") / n -
      (col("sx").cast("double") / n) * (col("sx").cast("double") / n)
    val perItem = stats.select(col("item"), col("n"), v.as("__v"))
    val spine = perItem.agg(
      max(col("n")).as("n_subjects"),
      array_sort(collect_list(struct(col("item").as("i"), col("__v").as("v")))).as("vs"))
    // __<item> sorts before __total only by luck of naming — fold the
    // ITEM variances by explicit filter, take the total by lookup
    val itemSum = aggregate(
      filter(col("vs"), e => e.getField("i") =!= lit("__total")),
      lit(0.0), (acc, e) => acc + e.getField("v"))
    val totalVar = element_at(
      map_from_entries(transform(col("vs"),
        e => struct(e.getField("i"), e.getField("v")))), lit("__total"))
    val ratio = itemSum / totalVar
    val alpha = (lit(k.toDouble) / lit((k - 1).toDouble)) * (lit(1.0) - ratio)
    spine.select(
      coalesce(col("n_subjects"), lit(0L)).as("n_subjects"),
      lit(k.toLong).as("n_items"),
      when(col("n_subjects") >= 2L && totalVar > 0.0,
        ExactMath.hashRound(ratio, 4)).as("var_ratio"),
      when(col("n_subjects") >= 2L && totalVar > 0.0,
        ExactMath.hashRound(alpha, 4)).as("alpha"))
  }

  /** Per-block OR-merged screen state (D28) — the streaming-maintenance
    * state of [[cochranQ]]: one row per block, k booleans, each the MAX
    * (= OR) of the batch's row-grain screen outcomes. OR is associative,
    * commutative AND idempotent (the D23 set-union contract: replaying
    * an absorbed batch is a no-op), so microbatches merge into the
    * standing state in any order and [[cochranQ]] over the merged state
    * equals the one-shot batch test exactly.
    */
  def screenState(df: DataFrame, blockCol: String, treatCols: Seq[String]): DataFrame =
    df.where(col(blockCol).isNotNull &&
        treatCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(col(blockCol))
      .agg(max(col(treatCols.head)).as(treatCols.head),
        treatCols.tail.map(c => max(col(c)).as(c)): _*)

  /** Merge two [[screenState]] relations (field-wise OR). */
  def mergeScreenState(a: DataFrame, b: DataFrame, blockCol: String,
      treatCols: Seq[String]): DataFrame =
    screenState(a.unionByName(b), blockCol, treatCols)

  /** Pointwise mutual information cells between two categorical columns
    * (B112) — the dependence DECOMPOSITION next to B80's single-number
    * Cramér's V: which (x, y) cells are over/under-represented, and by
    * how much? Output is the observed cell spine (bounded by the two
    * vocabularies) with exact counts and
    *   mi_contrib = (n_xy/N) · ln(n_xy·N / (n_x·n_y))
    * — summing the column gives the mutual information I(X;Y).
    *
    * ONE corpus pass to the cell table; margins derive from the
    * AGGREGATED cells (the cohensKappa shape — broadcast joins, never a
    * second fact scan). p_xy is one exact-int division (hashes
    * UNROUNDED); the ratio's numerator/denominator are DECIMAL(38,0)
    * products converted once (no wrap at any N); mi_contrib routes
    * through ln, so it is an AUDITED TRANSCENDENTAL (hashRound 4 +
    * MarginAuditSpec boundary audit re-deriving from the exact count
    * columns — the PSI/JSD convention). Observed cells only (n_xy ≥ 1 —
    * zero cells contribute 0 to I and never appear).
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame =
    miFromCells(miCells(df, xCol, yCol))

  /** `(x_val, y_val, n_xy)` observed-cell counts — the associative
    * MONITORING STATE of [[mutualInformation]] (D29): counts merge by
    * plain addition ([[mergeMiCells]]), so a streaming monitor keeps a
    * vocabulary-bounded cell table and derives the MI report on demand
    * via [[miFromCells]] — the categoryCounts/binCounts shape.
    */
  def miCells(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("string").as("x_val"), col(yCol).cast("string").as("y_val"))
      .groupBy("x_val", "y_val").agg(count(lit(1)).as("n_xy"))

  /** Merge two [[miCells]] relations by count addition (associative,
    * commutative — arrival order free; NOT idempotent, the D20
    * partition contract).
    */
  def mergeMiCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("x_val", "y_val").agg(sum(col("n_xy")).as("n_xy"))

  /** The MI report from a pre-aggregated cell state — see
    * [[mutualInformation]] for the full contract.
    */
  def miFromCells(cells: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val xs = cells.groupBy("x_val").agg(sum(col("n_xy")).as("n_x"))
    val ys = cells.groupBy("y_val").agg(sum(col("n_xy")).as("n_y"))
    val tot = cells.agg(sum(col("n_xy")).as("n"))
    val j = cells
      .join(broadcast(xs), "x_val")
      .join(broadcast(ys), "y_val")
      .crossJoin(broadcast(tot))
    val p = col("n_xy").cast("double") / col("n").cast("double")
    val ratio = (col("n_xy").cast(d38) * col("n").cast(d38)).cast("double") /
      (col("n_x").cast(d38) * col("n_y").cast(d38)).cast("double")
    j.select(
      col("x_val"), col("y_val"),
      col("n_xy"), col("n_x"), col("n_y"), col("n"),
      p.as("p_xy"),
      ExactMath.hashRound(p * log(ratio), 4).as("mi_contrib"))
      .orderBy("x_val", "y_val")
  }

  /** Exact sufficient statistics for [[partialCorr]]: ONE partial-agg
    * pass to n plus the nine decimal sums (Σx..Σyz; columns cast to
    * DECIMAL(18,6), pairwise products exact at (37,12)). Exposed so the
    * MarginAuditSpec boundary audit re-derives the pre-rounding
    * correlations from the same exact state (the cronbachStats
    * pattern). Single row.
    */
  def partialCorrStats(df: DataFrame, xCol: String, yCol: String, zCol: String): DataFrame = {
    val vd = ExactMath.ValueDecimal
    // fan out before the 9 decimal-product partials (r16-opt): on a
    // single-split input they all fused into ONE scan task (1.16 s of
    // q_vif's 1.50 s, ProfileStages); decimal sums are order-free, so
    // the repartition is bit-neutral
    val clean = graft.operators.FanOut.byKey(
      df.where(col(xCol).isNotNull && col(yCol).isNotNull && col(zCol).isNotNull)
        .select(col(xCol).cast(vd).as("__x"), col(yCol).cast(vd).as("__y"),
          col(zCol).cast(vd).as("__z")),
      col("__x"), col("__y"), col("__z"))
    clean.agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"), sum(col("__z")).as("sz"),
      sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__y") * col("__y")).as("syy"),
      sum(col("__z") * col("__z")).as("szz"),
      sum(col("__x") * col("__y")).as("sxy"),
      sum(col("__x") * col("__z")).as("sxz"),
      sum(col("__y") * col("__z")).as("syz"))
  }

  /** First-order partial correlation of x and y controlling for z
    * (B117) — does the x–y association survive once z is held fixed?
    *   r_xy.z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²)).
    * Pairwise Pearson correlations derive from [[partialCorrStats]]'
    * exact decimal sums with the CorrMatrix IEEE op order
    * (cov = sab/n − (sa/n)(sb/n), r = cov/√(v_a·v_b)). The
    * decimal→double conversions can exceed 2^53 scaled units (the TWA
    * conversion-ulp class) ⇒ all four correlations hash at hashRound 4
    * under a MarginAuditSpec BOUNDARY audit (the CorrMatrix/cronbach
    * protocol). NULL r on a degenerate variance; NULL r_partial when
    * either control correlation is ±1. Single row.
    */
  def partialCorr(df: DataFrame, xCol: String, yCol: String, zCol: String): DataFrame = {
    val stats = partialCorrStats(df, xCol, yCol, zCol)
    val n = col("n").cast("double")
    def mean(s: String): Column = col(s).cast("double") / n
    def variance(ss: String, s: String): Column =
      col(ss).cast("double") / n - mean(s) * mean(s)
    def covOf(sab: String, sa: String, sb: String): Column =
      col(sab).cast("double") / n - mean(sa) * mean(sb)
    val vx = variance("sxx", "sx"); val vy = variance("syy", "sy")
    val vz = variance("szz", "sz")
    val rxy = covOf("sxy", "sx", "sy") / sqrt(vx * vy)
    val rxz = covOf("sxz", "sx", "sz") / sqrt(vx * vz)
    val ryz = covOf("syz", "sy", "sz") / sqrt(vy * vz)
    val denArg = (lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)
    val partial = (rxy - rxz * ryz) / sqrt(denArg)
    val okXY = col("n") >= 2L && vx > 0.0 && vy > 0.0
    val okXZ = col("n") >= 2L && vx > 0.0 && vz > 0.0
    val okYZ = col("n") >= 2L && vy > 0.0 && vz > 0.0
    stats.select(
      coalesce(col("n"), lit(0L)).as("n_rows"),
      when(okXY, ExactMath.hashRound(rxy, 4)).as("r_xy"),
      when(okXZ, ExactMath.hashRound(rxz, 4)).as("r_xz"),
      when(okYZ, ExactMath.hashRound(ryz, 4)).as("r_yz"),
      when(okXY && okXZ && okYZ && denArg > 0.0,
        ExactMath.hashRound(partial, 4)).as("r_partial"))
  }

  /** 2×2 odds ratio and relative risk between a boolean exposure and a
    * boolean outcome (B118) — the epidemiology-shaped screen next to
    * [[twoProportionZ]] (z there answers "different?", OR/RR answer
    * "how many times as likely?"). With a = exposed∧outcome,
    * b = exposed-only, c = outcome-only, d = neither:
    *   OR = a·d / (b·c),   RR = (a/(a+b)) / (c/(c+d)).
    * Exact BIGINT counts, products in DECIMAL(38,0) (HUGEINT mirror),
    * fixed IEEE chains ⇒ both hash UNROUNDED (the q_gini protocol).
    * NULL OR at b·c = 0, NULL RR when either cohort is empty or the
    * unexposed risk is 0. Single row, one partial-agg pass.
    */
  def oddsRatio(df: DataFrame, exposureCol: String, outcomeCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = col(exposureCol); val o = col(outcomeCol)
    val agg = df.where(e.isNotNull && o.isNotNull).agg(
      sum(when(e && o, 1L).otherwise(0L)).as("n_both"),
      sum(when(e && !o, 1L).otherwise(0L)).as("n_exp_only"),
      sum(when(!e && o, 1L).otherwise(0L)).as("n_out_only"),
      sum(when(!e && !o, 1L).otherwise(0L)).as("n_neither"))
    val a = col("n_both"); val b = col("n_exp_only")
    val c = col("n_out_only"); val d = col("n_neither")
    val or = (a.cast(d38) * d.cast(d38)).cast("double") /
      (b.cast(d38) * c.cast(d38)).cast("double")
    val riskExp = a.cast("double") / (a + b).cast("double")
    val riskUn = c.cast("double") / (c + d).cast("double")
    agg.select(
      coalesce(a, lit(0L)).as("n_both"),
      coalesce(b, lit(0L)).as("n_exp_only"),
      coalesce(c, lit(0L)).as("n_out_only"),
      coalesce(d, lit(0L)).as("n_neither"),
      when(b > 0L && c > 0L, or).as("odds_ratio"),
      when(a + b > 0L && c + d > 0L && c > 0L, riskExp / riskUn).as("relative_risk"))
  }

  /** Poisson overdispersion screen over per-unit event counts (B119) —
    * is the count process burstier than Poisson? Units aggregate to
    * exact BIGINT counts x; with S1 = Σx, S2 = Σx²,
    *   dispersion = Var/mean = (n·S2 − S1²) / (n·S1)
    * — numerator and denominator EXACT in DECIMAL(38,0) (HUGEINT
    * mirror), ONE division ⇒ mean_rate and dispersion hash UNROUNDED
    * while both conversions stay inside the 2^53 envelope (n·S2 ≲ 9e15
    * — holds at every test SF; past it, route through hashRound + a
    * boundary audit, the changepoint convention). ≈1 under Poisson,
    * >1 overdispersed. NULL at n < 2 or S1 = 0. Single row.
    */
  def overdispersion(df: DataFrame, unitCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val units = df.where(col(unitCol).isNotNull)
      .groupBy(col(unitCol)).agg(count(lit(1)).as("__x"))
    val agg = units.agg(
      count(lit(1)).as("n_units"),
      sum(col("__x")).as("n_events"),
      sum(col("__x").cast(d38) * col("__x").cast(d38)).as("__s2"))
    val n = col("n_units"); val s1 = col("n_events")
    val num = (n.cast(d38) * col("__s2") - s1.cast(d38) * s1.cast(d38)).cast(d38)
    val den = (n.cast(d38) * s1.cast(d38)).cast(d38)
    agg.select(
      coalesce(n, lit(0L)).as("n_units"),
      coalesce(s1, lit(0L)).as("n_events"),
      when(n > 0L, s1.cast("double") / n.cast("double")).as("mean_rate"),
      when(n >= 2L && s1 > 0L,
        num.cast("double") / den.cast("double")).as("dispersion"))
  }
}
