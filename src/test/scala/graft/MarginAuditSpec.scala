package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.text.TextStats
import graft.sources.Snapshot

/** Standing guard for the one class of oracle-hashed value that is NOT
  * IEEE-exact: transcendentals (libm-dependent `ln`/`log2`/`exp`/...).
  * SURVEY §5's cosine rule admits +,−,×,÷,sqrt as exactly reproducible
  * across engines; a rounded transcendental passes the hash only while
  * the unrounded double stays clear of its rounding boundary on every
  * libm the two engines link. This spec makes that condition an
  * asserted invariant instead of luck:
  *
  *  1. An automated scan of `SparkEntry.oracleSql` pins the set of
  *     oracles that reference a transcendental function. A NEW oracle
  *     using one fails here until its hashed columns get a margin audit
  *     below (the "no new transcendental without an audit" rule).
  *  2. For each audited query, at ALL THREE SFs, every value that the
  *     oracle rounds-then-hashes must sit > ε from its nearest
  *     round-half boundary, and every windowed rank decided by the
  *     transcendental must be separated by > ε (or be an exact IEEE
  *     tie, which the deterministic term tiebreak then owns).
  *
  * ε calibration: libm revisions disagree by a few ulps — ~1e-15 at
  * these magnitudes. ε = 1e-9 in value units gives ≥10^6 ulps of
  * headroom while sitting 3+ decades below today's measured minima
  * (tfidf boundary margin 1.5e-8, rank gap 2e-3 at sf0.01), so a
  * testdata change that drifts a value onto a boundary fails loudly
  * here before it flakes the driver's hash gate.
  */
class MarginAuditSpec extends SparkSpecBase {

  private val TranscendentalRe =
    raw"(?i)\b(ln|log|log2|log10|log1p|exp|expm1|pow|power|sin|cos|tan|asin|acos|atan|atan2|sinh|cosh|tanh)\s*\(".r

  /** Queries allowed to hash a transcendental — each MUST have a margin
    * audit test in this spec. Everything else in the catalog must stay
    * IEEE-exact (ints, decimal-exact sums, md5 witnesses, rounded
    * +,−,×,÷,sqrt compositions).
    */
  private val audited =
    Set("q_tfidf_top_terms", "q_bm25", "q_bm25_synonyms", "q_drift_psi",
      "q_drift_categorical", "q_rrf_fusion", "q_retrieval_metrics",
      // ndcg: the ln lives in the embedded BM25 chain; the hashed
      // dcg/ndcg values ride top-10 membership and per-rank gains, both
      // decided by the SAME rank gaps auditRetrievalMetrics checks (the
      // gains themselves are build-time literals, never computed)
      "q_retrieval_ndcg",
      // the 6th audited ln: PMI collocations (round 10)
      "q_collocations",
      // the 12th audited ln: Zipf rank-frequency fit (round 14)
      "q_zipf_fit",
      // the 13th audited ln: Bartlett variance homogeneity (round 14)
      "q_bartlett",
      // the 7th: c-TF-IDF class labeling (round 12)
      "q_class_tfidf",
      // the 8th: Jensen-Shannon categorical divergence (round 13)
      "q_jsd",
      // the 9th: pointwise mutual-information cells (round 13)
      "q_mutual_information",
      // the 10th: conditional entropy of event transitions (round 13)
      "q_entropy_rate",
      // the 11th: between-bucket Theil-T inequality (round 13)
      "q_theil",
      // the 14th: the learned quality classifier's sigmoid score
      // (round 15) — the logit itself is a sequential IEEE fold of
      // identical doubles (hashes unrounded, no audit needed); only
      // the exp() inside the sigmoid is libm-dependent
      "q_quality_classifier",
      // the score-consumer family (round 16): isotonic / ECE / Brier all
      // derive EVERY hashed value from the SAME hashRound-4 sigmoid the
      // q_quality_classifier audit already boundary-checks at 3 SFs over
      // the identical (corpus, model) logit set — once the rounded-4
      // scores are engine-identical (the audited property), every
      // downstream step here is IEEE over identical doubles (bins =
      // floor products, means = one-division exact ints, folds =
      // pinned-order sums). No NEW transcendental evaluation exists in
      // these oracles beyond the audited sigmoid itself.
      "q_isotonic", "q_ece", "q_brier", "q_pr_curve",
      // conformal rides the HOLDOUT sigmoid — the same audited rounded-4
      // score family (C84's oracle shares the audited construction);
      // every hashed value is an exact selection / one-division over it
      "q_conformal",
      // the 15th audited ln: binned-spine logistic loss (round 16) —
      // lns at the score-spine grain, audited below
      "q_log_loss",
      // the 16th audited ln: Heaps'-law vocabulary-growth fit
      // (round 16) — lns over the ≤20-bucket cumulative spine,
      // audited below (auditHeaps)
      "q_heaps_fit")

  test("oracle scan: no oracle hashes a transcendental without a margin audit") {
    val offenders = SparkEntry.oracleSql.filter { case (_, sql) =>
      TranscendentalRe.findFirstIn(sql).isDefined
    }.keySet
    assert(offenders == audited,
      s"oracles referencing transcendentals changed: $offenders vs audited $audited — " +
        "add a margin audit to MarginAuditSpec (and SURVEY §5) before hashing a new one")
  }

  /** Number of 2-arg `round(x, d)` calls in a SQL string (paren-matched;
    * a top-level comma inside the call marks the digits argument).
    */
  private def twoArgRounds(sql: String): Int = {
    val re = raw"(?i)\bround\(".r
    var count = 0
    for (m <- re.findAllMatchIn(sql)) {
      var j = m.end; var depth = 1; var topComma = false
      while (depth > 0 && j < sql.length) {
        val ch = sql.charAt(j)
        if (ch == '(') depth += 1
        else if (ch == ')') depth -= 1
        else if (ch == ',' && depth == 1) topComma = true
        j += 1
      }
      if (topComma) count += 1
    }
    count
  }

  /** Oracles allowed to keep a 1-arg round-to-INTEGER (the int8
    * quantization grid): integer+0.5 midpoints are exactly binary-
    * representable, so Spark's HALF_UP-on-shortest-repr and a
    * round-on-binary-value build see the SAME midpoint and agree —
    * the d>=1 seam (decimal midpoints that are NOT binary-exact,
    * the q_cohort_ltv / q_corr_matrix incident class) cannot arise.
    */
  private val intRoundAllowed =
    Set("q_embedding_quantize", "q_ann_quantized", "q_embedding_pipeline")

  test("oracle scan: no oracle rounds a hashed float with 2-arg round() " +
      "(floor-formula contract, r11 item 1)") {
    // Spark round() is HALF_UP on the shortest decimal repr; DuckDB
    // round() rounds the binary value and is BUILD-DEPENDENT — the two
    // diverged twice (q_cohort_ltv at the gate, q_corr_matrix at the
    // driver) with margins that a boundary audit cannot cover. Every
    // fixed-digit rounding an oracle hashes must therefore be the
    // floor formula (ExactMath.hashRound mirrored as
    // floor(x * 1e<d> + 0.5) / 1e<d>), which is the same correctly-
    // rounded IEEE sequence on any build of either engine.
    val offenders = SparkEntry.oracleSql.filter { case (_, sql) =>
      twoArgRounds(sql) > 0
    }.keySet
    assert(offenders.isEmpty,
      s"oracles using build-sensitive 2-arg round(): $offenders — migrate to " +
        "the hashRound floor formula (and mirror the Spark side)")
    val oneArg = SparkEntry.oracleSql.filter { case (_, sql) =>
      raw"(?i)\bround\(".r.findAllMatchIn(sql).nonEmpty && twoArgRounds(sql) == 0
    }.keySet
    assert(oneArg == intRoundAllowed,
      s"oracles using 1-arg integer round() changed: $oneArg vs allowed " +
        s"$intRoundAllowed — integer-grid rounds are safe (binary-exact " +
        "midpoints) but must be declared here")
  }

  /** q_corr_matrix boundary audit (r11 item 2): re-derive the
    * pre-rounding cov/corr doubles from the exact decimal sufficient
    * statistics with the operator's own IEEE op sequence
    * (CorrMatrix.pearsonByDimPair's formula verbatim) and assert every
    * hashed value sits clear of its 4-digit floor-formula boundary —
    * the lattice (m + 0.5) / 10^4 is shared by hashRound and
    * boundaryMargin. Guards the residual hashRound risk: the engines
    * arriving with doubles an ulp apart that straddle a boundary
    * (DECIMAL(28,12) moment sums can exceed 2^53 scaled units, where
    * decimal→double conversion is known to diverge an ulp — the TWA
    * lesson).
    */
  private def auditCorrMatrix(sfDir: String): Unit = {
    val stats = graft.operators.ann.CorrMatrix
      .sufficientStats(Snapshot(spark, sfDir).embeddings, "embedding", 64, 16)
      .collect()
    assert(stats.length == 136, s"$sfDir: expected 136 dim pairs, got ${stats.length}")
    val margin = boundaryMargin(4)
    var minB = Double.MaxValue
    for (r <- stats) {
      val n = r.getLong(2).toDouble
      val sx = r.getDecimal(3).doubleValue; val sy = r.getDecimal(4).doubleValue
      val sxx = r.getDecimal(5).doubleValue; val syy = r.getDecimal(6).doubleValue
      val sxy = r.getDecimal(7).doubleValue
      val cov = sxy / n - (sx / n) * (sy / n)
      val cxx = math.max(sxx / n - (sx / n) * (sx / n), 0.0)
      val cyy = math.max(syy / n - (sy / n) * (sy / n), 0.0)
      minB = math.min(minB, margin(cov))
      if (cxx > 0.0 && cyy > 0.0)
        minB = math.min(minB, margin(cov / math.sqrt(cxx * cyy)))
    }
    assert(minB > 1e-9,
      f"$sfDir: a hashed cov/corr sits $minB%.3e from its 4-digit rounding " +
        "boundary — an ulp of decimal->double drift could flip the hash")
  }

  /** Distance from x to its nearest round-half boundary at `digits`
    * decimal places, in value units. round() is half-away-from-zero on
    * both engines, so the boundary lattice for positive x is
    * (m + 0.5) / 10^digits.
    */
  private def boundaryMargin(digits: Int) = {
    val scale = math.pow(10, digits)
    (x: Double) => {
      val frac = x * scale - math.floor(x * scale)
      math.abs(frac - 0.5) / scale
    }
  }

  private def auditTfidf(sfDir: String): Unit = {
    val docs = Snapshot(spark, sfDir).documents
    val scored = TextStats.tfidfScored(docs, "doc_id", "text")
    // hashed rows are rnk <= 3; rank gaps up to 4 decide both the hashed
    // rnk values and top-k membership (the 3rd-vs-4th cut)
    val audit = scored.where(col("rnk") <= 4)
      .withColumn("next_tfidf",
        lead(col("tfidf"), 1).over(Window.partitionBy("doc_id").orderBy(col("rnk"))))
      .select(col("doc_id"), col("rnk"), col("tfidf"), col("next_tfidf"))
      .collect()

    val margin = boundaryMargin(6)
    val minBoundary = audit.iterator.filter(_.getLong(1) <= 3)
      .map(r => margin(r.getDouble(2))).min
    assert(minBoundary > 1e-9,
      f"$sfDir: a hashed tfidf value sits $minBoundary%.3e from its 6-digit " +
        "rounding boundary — libm drift could flip the hash")

    val gaps = audit.iterator.filter(r => !r.isNullAt(3))
      .map(r => r.getDouble(2) - r.getDouble(3))
      .filter(_ != 0.0) // exact IEEE ties -> deterministic term tiebreak
      .toSeq
    assert(gaps.forall(_ > 0), s"$sfDir: rank order must be non-increasing in tfidf")
    assert(gaps.min > 1e-6,
      f"$sfDir: adjacent tfidf ranks separated by only ${gaps.min}%.3e — " +
        "rank assignment could flip under libm drift")
  }

  private def auditBm25(sfDir: String): Unit = {
    val docs = Snapshot(spark, sfDir).documents
    val scored = TextStats.bm25Scored(docs, "doc_id", "text",
      Seq("spark", "join", "stream"))
    // hashed rows are rnk <= 20; rank 21 decides the top-k cut
    val audit = scored.where(col("rnk") <= 21).orderBy("rnk").collect()

    // 4-digit rounding (not tfidf's 6): at 6 digits a sf0.01 value
    // measured 5.7e-10 from its boundary — this audit rejected it
    val margin = boundaryMargin(4)
    val minBoundary = audit.iterator.filter(_.getLong(0) <= 20)
      .map(r => margin(r.getDouble(3))).min
    assert(minBoundary > 1e-9,
      f"$sfDir: a hashed bm25 value sits $minBoundary%.3e from its 4-digit " +
        "rounding boundary — libm drift could flip the hash")

    val gaps = audit.iterator.sliding(2).withPartial(false)
      .map(p => p.head.getDouble(3) - p.last.getDouble(3))
      .filter(_ != 0.0) // exact IEEE ties -> deterministic doc_id tiebreak
      .toSeq
    assert(gaps.forall(_ > 0), s"$sfDir: rank order must be non-increasing in bm25")
    assert(gaps.min > 1e-6,
      f"$sfDir: adjacent bm25 ranks separated by only ${gaps.min}%.3e — " +
        "rank assignment could flip under libm drift")
  }

  private def auditBm25Synonyms(sfDir: String): Unit = {
    val docs = Snapshot(spark, sfDir).documents
    val scored = TextStats.bm25SynonymScored(docs, "doc_id", "text",
      SparkEntry.bm25Concepts)
    // hashed rows are rnk <= 21; rank 21 decides the top-k cut. The
    // AND-of-three-concepts query is far more selective than flat bm25:
    // guard the .min/.sliding math against a regenerated corpus where
    // almost nothing survives every concept, so the audit fails with a
    // named condition instead of an opaque empty.min crash
    val audit = scored.where(col("rnk") <= 21).orderBy("rnk").collect()
    assert(audit.length >= 2,
      s"$sfDir: only ${audit.length} docs match every concept — the synonym " +
        "query is degenerate on this corpus; re-pick concepts before hashing")

    val margin = boundaryMargin(4)
    val minBoundary = audit.iterator.filter(_.getLong(0) <= 20)
      .map(r => margin(r.getDouble(3))).min
    assert(minBoundary > 1e-9,
      f"$sfDir: a hashed synonym-bm25 value sits $minBoundary%.3e from its " +
        "4-digit rounding boundary — libm drift could flip the hash")

    val gaps = audit.iterator.sliding(2).withPartial(false)
      .map(p => p.head.getDouble(3) - p.last.getDouble(3))
      .filter(_ != 0.0) // exact IEEE ties -> deterministic doc_id tiebreak
      .toSeq
    assert(gaps.forall(_ > 0), s"$sfDir: rank order must be non-increasing in bm25")
    // all-ties (gaps empty) is legitimate: every rank is owned by the
    // doc_id tiebreak and no transcendental decides anything
    gaps.headOption.foreach { _ =>
      assert(gaps.min > 1e-6,
        f"$sfDir: adjacent synonym-bm25 ranks separated by only ${gaps.min}%.3e — " +
          "rank assignment could flip under libm drift")
    }
  }

  private def auditRrf(sfDir: String): Unit = {
    // q_rrf_fusion's only transcendental dependence is the kw ranks the
    // bm25 ln produces: hashed kw_rnk values use ranks 1..50 and rank 51
    // decides keyword-list membership. rrf itself is exact rational
    // arithmetic on those integer ranks (no boundary audit needed), and
    // the vector list is IEEE-exact cosine — so the audit is the bm25
    // rank-gap check extended through the 50/51 cut.
    val docs = Snapshot(spark, sfDir).documents
    val scored = TextStats.bm25Scored(docs, "doc_id", "text",
      Seq("spark", "join", "stream"))
    val audit = scored.where(col("rnk") <= 51).orderBy("rnk").collect()
    assert(audit.length >= 2,
      s"$sfDir: fewer than 2 docs match the fusion terms — degenerate corpus")
    val gaps = audit.iterator.sliding(2).withPartial(false)
      .map(p => p.head.getDouble(3) - p.last.getDouble(3))
      .filter(_ != 0.0) // exact IEEE ties -> deterministic doc_id tiebreak
      .toSeq
    assert(gaps.forall(_ > 0), s"$sfDir: rank order must be non-increasing in bm25")
    gaps.headOption.foreach { _ =>
      assert(gaps.min > 1e-6,
        f"$sfDir: adjacent fusion kw ranks separated by only ${gaps.min}%.3e — " +
          "rank assignment could flip under libm drift")
    }
  }

  private def auditDriftPsi(sfDir: String): Unit = {
    // hashed transcendental = psi_contrib rounded to 4. Re-derive the
    // UNROUNDED contribution from the exact bin counts (the operator's
    // own smoothing/ln arithmetic) and check its boundary margin.
    val rows = SparkEntry.queries("q_drift_psi")(spark, sfDir)
      .select(col("n_base"), col("n_cur")).collect()
    assert(rows.length == 10, s"$sfDir: expected 10 bins, got ${rows.length}")
    val tb = rows.map(_.getLong(0)).sum.toDouble + 10
    val tc = rows.map(_.getLong(1)).sum.toDouble + 10
    val margin = boundaryMargin(4)
    val minBoundary = rows.iterator.map { r =>
      val p = (r.getLong(0) + 1).toDouble / tb
      val q = (r.getLong(1) + 1).toDouble / tc
      margin((p - q) * math.log(p / q))
    }.min
    assert(minBoundary > 1e-9,
      f"$sfDir: a hashed psi_contrib sits $minBoundary%.3e from its 4-digit " +
        "rounding boundary — libm drift could flip the hash")
  }

  private def auditDriftCategorical(sfDir: String): Unit = {
    // same contract as auditDriftPsi over the K+1-category spine: the
    // hashed psi_contrib re-derives from exact counts with the operator's
    // own smoothing arithmetic; k rides the spine size (top-8 + OTHER)
    val rows = SparkEntry.queries("q_drift_categorical")(spark, sfDir)
      .select(col("n_base"), col("n_cur")).collect()
    val k = rows.length
    assert(k >= 2 && k <= 9, s"$sfDir: expected <= 9 spine rows, got $k")
    val tb = rows.map(_.getLong(0)).sum.toDouble + k
    val tc = rows.map(_.getLong(1)).sum.toDouble + k
    val margin = boundaryMargin(4)
    val minBoundary = rows.iterator.map { r =>
      val p = (r.getLong(0) + 1).toDouble / tb
      val q = (r.getLong(1) + 1).toDouble / tc
      margin((p - q) * math.log(p / q))
    }.min
    assert(minBoundary > 1e-9,
      f"$sfDir: a hashed categorical psi_contrib sits $minBoundary%.3e from its " +
        "4-digit rounding boundary — libm drift could flip the hash")
  }

  /** q_jsd hashes round-4 JSD contributions; re-derive each UNROUNDED
    * contribution from the exact hashed counts with the operator's own
    * op sequence (unsmoothed shares, zero-side guards, termP/2 + termQ/2
    * in written order) and check the 4-digit boundary margin.
    */
  private def auditJsd(sfDir: String): Unit = {
    val rows = SparkEntry.queries("q_jsd")(spark, sfDir)
      .select(col("n_base"), col("n_cur")).collect()
    assert(rows.nonEmpty && rows.length <= 9,
      s"$sfDir: expected <= 9 spine rows, got ${rows.length}")
    val tb = rows.map(_.getLong(0)).sum.toDouble
    val tc = rows.map(_.getLong(1)).sum.toDouble
    val margin = boundaryMargin(4)
    val minBoundary = rows.iterator.map { r =>
      val p = r.getLong(0).toDouble / tb
      val q = r.getLong(1).toDouble / tc
      val m = (p + q) / 2.0
      val tp = if (r.getLong(0) > 0) p * math.log(p / m) else 0.0
      val tq = if (r.getLong(1) > 0) q * math.log(q / m) else 0.0
      margin(tp / 2.0 + tq / 2.0)
    }.min
    assert(minBoundary > 1e-9,
      f"$sfDir: a hashed jsd_contrib sits $minBoundary%.3e from its 4-digit " +
        "rounding boundary — libm drift could flip the hash")
  }

  /** q_mutual_information hashes round-4 MI contributions; re-derive
    * each UNROUNDED contribution from the exact hashed counts with the
    * operator's own op sequence (p·ln(n_xy·N/(n_x·n_y)), products in
    * exact integers) and check the 4-digit boundary margin.
    */
  private def auditMutualInformation(sfDir: String): Unit = {
    val rows = SparkEntry.queries("q_mutual_information")(spark, sfDir)
      .select(col("n_xy"), col("n_x"), col("n_y"), col("n")).collect()
    assert(rows.nonEmpty && rows.length <= 25,
      s"$sfDir: expected a bounded cell spine, got ${rows.length}")
    val margin = boundaryMargin(4)
    val minBoundary = rows.iterator.map { r =>
      val p = r.getLong(0).toDouble / r.getLong(3).toDouble
      val ratio = (BigInt(r.getLong(0)) * BigInt(r.getLong(3))).toDouble /
        (BigInt(r.getLong(1)) * BigInt(r.getLong(2))).toDouble
      margin(p * math.log(ratio))
    }.min
    assert(minBoundary > 1e-9,
      f"$sfDir: a hashed mi_contrib sits $minBoundary%.3e from its 4-digit " +
        "rounding boundary — libm drift could flip the hash")
  }

  /** q_cronbach_alpha hashes floor-formula-round-4 var_ratio/alpha that
    * pass through decimal→double conversions above 2^53 scaled units
    * (the TWA conversion-ulp class — no transcendental, but the same
    * residual risk auditCorrMatrix guards). Re-derive both from
    * `Stats.cronbachStats`' exact decimal sufficient statistics with
    * the operator's own IEEE op sequence and check the 4-digit
    * boundary margins.
    */
  private def auditCronbach(sfDir: String): Unit = {
    val stats = graft.operators.stats.Stats
      .cronbachStats(SparkEntry.cronbachSubjects(spark, sfDir), "o_custkey",
        Seq("sp_early", "sp_mid", "sp_late"))
      .collect()
    assert(stats.length == 4, s"$sfDir: expected 4 stat rows, got ${stats.length}")
    val byItem = stats.map(r => r.getString(0) ->
      (r.getLong(1).toDouble, r.getDecimal(2).doubleValue, r.getDecimal(3).doubleValue)).toMap
    def variance(item: String): Double = {
      val (n, sx, sxx) = byItem(item)
      sxx / n - (sx / n) * (sx / n)
    }
    // item-name-sorted fold order: __sp_early, __sp_late, __sp_mid
    val itemSum = 0.0 + variance("__sp_early") + variance("__sp_late") +
      variance("__sp_mid")
    val ratio = itemSum / variance("__total")
    val alpha = (3.0 / 2.0) * (1.0 - ratio)
    val margin = boundaryMargin(4)
    assert(margin(ratio) > 1e-9 && margin(alpha) > 1e-9,
      f"$sfDir: hashed var_ratio/alpha sit ${margin(ratio)}%.3e/${margin(alpha)}%.3e " +
        "from a 4-digit rounding boundary — a conversion ulp could flip the hash")
  }

  /** q_partial_corr hashes floor-formula-round-4 correlations derived
    * through decimal→double conversions past 2^53 scaled units (the
    * cronbach/CorrMatrix class). Re-derive all four from
    * `Stats.partialCorrStats`' exact decimal sums with the operator's
    * own IEEE op sequence and check the 4-digit boundary margins.
    */
  private def auditPartialCorr(sfDir: String): Unit = {
    val r = graft.operators.stats.Stats
      .partialCorrStats(Snapshot(spark, sfDir).lineitem,
        "l_quantity", "l_extendedprice", "l_discount")
      .collect().head
    val n = r.getLong(0).toDouble
    def d(i: Int): Double = r.getDecimal(i).doubleValue
    val (sx, sy, sz) = (d(1), d(2), d(3))
    val (sxx, syy, szz) = (d(4), d(5), d(6))
    val (sxy, sxz, syz) = (d(7), d(8), d(9))
    val vx = sxx / n - (sx / n) * (sx / n)
    val vy = syy / n - (sy / n) * (sy / n)
    val vz = szz / n - (sz / n) * (sz / n)
    val rxy = (sxy / n - (sx / n) * (sy / n)) / math.sqrt(vx * vy)
    val rxz = (sxz / n - (sx / n) * (sz / n)) / math.sqrt(vx * vz)
    val ryz = (syz / n - (sy / n) * (sz / n)) / math.sqrt(vy * vz)
    val partial = (rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    // q_vif rides the same stats — audit its three chains too
    def vif(rab: Double, rac: Double, rbc: Double): Double =
      1.0 / (1.0 - (rab * rab + rac * rac - 2.0 * rab * rac * rbc) /
        (1.0 - rbc * rbc))
    val margin = boundaryMargin(4)
    val minB = Seq(rxy, rxz, ryz, partial,
      vif(rxy, rxz, ryz), vif(rxy, ryz, rxz), vif(rxz, ryz, rxy)).map(margin).min
    assert(minB > 1e-9,
      f"$sfDir: a hashed correlation/VIF sits $minB%.3e from its 4-digit " +
        "rounding boundary — a conversion ulp could flip the hash")
  }

  /** q_name_match hashes floor-formula-round-4 Jaro–Winkler scores and
    * ORDERS the top-k cut by them; the two engines compute the same
    * rational through op orders that may differ by ulps. The audit
    * sweeps EVERY within-block pair (a rounding flip anywhere could
    * change cut membership): each score must sit > 1e-9 from its
    * 4-digit boundary AND each raw jaro > 1e-9 from the 0.7 Winkler
    * boost threshold (the one branch a ulp could flip).
    */
  private def auditNameMatch(sfDir: String): Unit = {
    import graft.operators.text.NameMatch
    val pairs = NameMatch
      .blockedPairs(SparkEntry.nameMatchParts(spark, sfDir),
        "p_partkey", "p_name", "__blk")
      .select(col("name_a"), col("name_b"))
      .collect()
    assert(pairs.nonEmpty, s"$sfDir: blocking produced no pairs — degenerate key")
    val margin = boundaryMargin(4)
    var minB = Double.MaxValue
    var minThresh = Double.MaxValue
    pairs.foreach { r =>
      val a = r.getString(0).getBytes("UTF-8")
      val b = r.getString(1).getBytes("UTF-8")
      val j = NameMatch.jaroBytes(a, b)
      val jw = NameMatch.jaroWinklerBytes(a, b)
      minB = math.min(minB, margin(jw))
      minThresh = math.min(minThresh, math.abs(j - 0.7))
    }
    assert(minB > 1e-9,
      f"$sfDir: a jw score sits $minB%.3e from its 4-digit rounding boundary")
    assert(minThresh > 1e-9,
      f"$sfDir: a jaro sits $minThresh%.3e from the 0.7 boost threshold — " +
        "an engine ulp could flip the Winkler branch")
  }

  /** q_entropy_rate hashes round-4 −p(i,j)·ln(p(j|i)) contributions;
    * re-derive each UNROUNDED from the exact hashed counts with the
    * operator's own op sequence and check the 4-digit boundary margin
    * (single-destination cells are an exact ±0.0 — skipped, the
    * deterministic zero).
    */
  private def auditEntropyRate(sfDir: String): Unit = {
    val rows = SparkEntry.queries("q_entropy_rate")(spark, sfDir)
      .select(col("n_trans"), col("n_from"), col("n")).collect()
    assert(rows.nonEmpty && rows.length <= 64,
      s"$sfDir: expected a bounded cell spine, got ${rows.length}")
    val margin = boundaryMargin(4)
    val margins = rows.iterator.filter(r => r.getLong(0) != r.getLong(1)).map { r =>
      val pJoint = r.getLong(0).toDouble / r.getLong(2).toDouble
      val pCond = r.getLong(0).toDouble / r.getLong(1).toDouble
      margin(-pJoint * math.log(pCond))
    }.toSeq
    if (margins.nonEmpty) assert(margins.min > 1e-9,
      f"$sfDir: a hashed h_contrib sits ${margins.min}%.3e from its 4-digit " +
        "rounding boundary — libm drift could flip the hash")
  }

  /** q_theil hashes round-4 bucket shares and (s/S)·ln((s/S)/(n/N))
    * contributions; re-derive both UNROUNDED from the shared
    * `SparkEntry.lorenzSpine`'s exact decimal bucket state with the
    * operator's own op sequence and check the 4-digit boundary margins.
    */
  private def auditTheil(sfDir: String): Unit = {
    val rows = SparkEntry.lorenzSpine(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 100,
      s"$sfDir: expected <= 100 buckets, got ${rows.length}")
    val bigN = rows.map(_.getLong(1)).sum.toDouble
    // the operator sums decimals EXACTLY then converts once — mirror that
    val bigS = rows.map(r => BigDecimal(r.getDecimal(2))).sum.toDouble
    val margin = boundaryMargin(4)
    val minB = rows.iterator.flatMap { r =>
      val sShare = r.getDecimal(2).doubleValue / bigS
      val nShare = r.getLong(1).toDouble / bigN
      Iterator(margin(sShare), margin(sShare * math.log(sShare / nShare)))
    }.min
    assert(minB > 1e-9,
      f"$sfDir: a hashed theil share/contrib sits $minB%.3e from its 4-digit " +
        "rounding boundary — libm drift could flip the hash")
  }

  private def auditRetrievalMetrics(sfDir: String): Unit = {
    // q_retrieval_metrics hashes only INTEGER ranks/counts and exact
    // divisions of them — no float from the ln survives to the hash —
    // but every hashed value rides the top-10 ORDER, so the decisive
    // quantity is the adjacent-rank score gap through the 10/11 cut,
    // per labeled query arm (the auditBm25 gap rule at k=10).
    val docs = Snapshot(spark, sfDir).documents
    SparkEntry.retrievalQueries.foreach { case (qid, terms) =>
      val audit = TextStats.bm25Scored(docs, "doc_id", "text", terms)
        .where(col("rnk") <= 11).select(col("rnk"), col("bm25"))
        .orderBy("rnk").collect()
      val gaps = audit.iterator.sliding(2).withPartial(false)
        .map(p => p.head.getDouble(1) - p.last.getDouble(1))
        .filter(_ != 0.0) // exact IEEE ties -> deterministic doc_id tiebreak
        .toSeq
      assert(gaps.forall(_ > 0), s"$sfDir/$qid: rank order must be non-increasing")
      if (gaps.nonEmpty) assert(gaps.min > 1e-6,
        f"$sfDir/$qid: adjacent bm25 ranks separated by only ${gaps.min}%.3e — " +
          "rank assignment (and the hashed first_rel_rank) could flip under libm drift")
    }
  }

  /** q_collocations hashes round-4 PMI plus exact counts; rank and
    * top-20 membership ride the UNROUNDED pmi order (ties break on
    * (w1, w2) — exact-IEEE equal pmi is engine-stable). The audit
    * re-derives the unrounded pmi from the exact count columns with the
    * operator's own op sequence (the psi convention) over ranks 1..21:
    * boundary margin for the 20 hashed values, adjacent gaps through
    * the 20/21 cut.
    */
  private def auditCollocations(sfDir: String): Unit = {
    val rows = graft.operators.text.Collocations
      .topPmi(Snapshot(spark, sfDir).documents, "text", 5L, 21)
      .orderBy("rank").collect()
    assert(rows.length == 21, s"$sfDir: expected 21 audit rows, got ${rows.length}")
    def raw(r: org.apache.spark.sql.Row): Double =
      math.log((r.getLong(3).toDouble * r.getLong(6).toDouble)
        / (r.getLong(4).toDouble * r.getLong(5).toDouble))
    val margin = boundaryMargin(4)
    val minBoundary = rows.iterator.filter(_.getInt(0) <= 20).map(r => margin(raw(r))).min
    assert(minBoundary > 1e-9,
      f"$sfDir: a hashed pmi sits $minBoundary%.3e from its 4-digit rounding " +
        "boundary — libm drift could flip the hash")
    val gaps = rows.iterator.sliding(2).withPartial(false)
      .map(p => raw(p.head) - raw(p.last))
      .filter(_ != 0.0) // exact IEEE ties -> deterministic (w1, w2) tiebreak
      .toSeq
    assert(gaps.forall(_ >= 0), s"$sfDir: rank order must be non-increasing in pmi")
    assert(gaps.min > 1e-6,
      f"$sfDir: adjacent pmi ranks separated by only ${gaps.min}%.3e — " +
        "rank assignment could flip under libm drift")
  }

  /** q_zipf_fit hashes round-4 slope/intercept/corr whose inputs are
    * libm ln values (the 12th audited transcendental). Top-50
    * MEMBERSHIP and rank order are decided by exact (count, term) — no
    * float enters the cut, so only the three hashed values need
    * margins. The audit re-derives them from the exact (rank, count)
    * pairs with the operator's own rank-ordered fold sequence.
    */
  private def auditZipf(sfDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val terms = Snapshot(spark, sfDir).documents
      .where(col("text").isNotNull)
      .select(explode(filter(split(lower(col("text")), " "),
        w => length(w) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val top = terms.orderBy(col("c").desc, col("w")).limit(50)
      .withColumn("rank", row_number().over(Window.orderBy(col("c").desc, col("w"))))
      .orderBy("rank").collect()
    assert(top.length >= 3, s"$sfDir: need >= 3 ranks")
    val pairs = top.map(r =>
      r.getInt(r.fieldIndex("rank")) -> r.getLong(r.fieldIndex("c")))
    val n = pairs.length.toDouble
    def fold(f: (Int, Long) => Double): Double =
      pairs.foldLeft(0.0) { case (acc, (rk, c)) => acc + f(rk, c) }
    val sx = fold((rk, _) => math.log(rk.toDouble))
    val sy = fold((_, c) => math.log(c.toDouble))
    val sxx = fold((rk, _) => math.log(rk.toDouble) * math.log(rk.toDouble))
    val sxy = fold((rk, c) => math.log(rk.toDouble) * math.log(c.toDouble))
    val syy = fold((_, c) => math.log(c.toDouble) * math.log(c.toDouble))
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val num = n * sxy - sx * sy
    val slope = num / denx
    val intercept = (sy - slope * sx) / n
    val corr = num / (math.sqrt(denx) * math.sqrt(deny))
    val margin = boundaryMargin(4)
    Seq("slope" -> slope, "intercept" -> intercept, "corr" -> corr).foreach {
      case (name, v) =>
        assert(margin(v) > 1e-9,
          f"$sfDir: zipf $name $v%.10g sits ${margin(v)}%.3e from its 4-digit " +
            "rounding boundary — libm drift could flip the hash")
    }
  }

  /** q_heaps_fit hashes round-4 beta/lnk/corr whose inputs are libm ln
    * values over the cumulative (tokens, vocab) spine (the 16th audited
    * transcendental). The spine itself is EXACT integer counts (bucket
    * membership is integer arithmetic — no float enters it), so only
    * the three hashed fit values need margins; the audit re-derives
    * them from the operator's own exact cum columns with its
    * bucket-ordered fold sequence.
    */
  private def auditHeaps(sfDir: String): Unit = {
    val pts = graft.operators.text.TextStats
      .heapsFit(Snapshot(spark, sfDir).documents, "doc_id", "text")
      .where(col("cum_tokens") > 0L && col("cum_types") > 0L)
      .select("bucket", "cum_tokens", "cum_types")
      .orderBy("bucket").collect()
      .map(r => r.getLong(r.fieldIndex("cum_tokens")) ->
        r.getLong(r.fieldIndex("cum_types")))
    assert(pts.length >= 3, s"$sfDir: need >= 3 heaps points")
    val n = pts.length.toDouble
    def fold(f: (Long, Long) => Double): Double =
      pts.foldLeft(0.0) { case (acc, (ct, cv)) => acc + f(ct, cv) }
    val sx = fold((ct, _) => math.log(ct.toDouble))
    val sy = fold((_, cv) => math.log(cv.toDouble))
    val sxx = fold((ct, _) => math.log(ct.toDouble) * math.log(ct.toDouble))
    val sxy = fold((ct, cv) => math.log(ct.toDouble) * math.log(cv.toDouble))
    val syy = fold((_, cv) => math.log(cv.toDouble) * math.log(cv.toDouble))
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val num = n * sxy - sx * sy
    val slope = num / denx
    val intercept = (sy - slope * sx) / n
    val corr = num / (math.sqrt(denx) * math.sqrt(deny))
    val margin = boundaryMargin(4)
    Seq("beta" -> slope, "lnk" -> intercept, "corr" -> corr).foreach {
      case (name, v) =>
        assert(margin(v) > 1e-9,
          f"$sfDir: heaps $name $v%.10g sits ${margin(v)}%.3e from its 4-digit " +
            "rounding boundary — libm drift could flip the hash")
    }
  }

  /** q_bartlett hashes round-4 pooled_var/chi2 whose chain routes
    * through k+1 spine-bounded lns (the 13th audited transcendental).
    * The audit re-derives both from the exact per-group decimal sums
    * with the operator's own group-ordered fold sequence.
    */
  private def auditBartlett(sfDir: String): Unit = {
    val groups = Snapshot(spark, sfDir).lineitem
      .where(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
      .groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        graft.functions.ExactMath.dsum(col("l_quantity")).as("s1"),
        sum((col("l_quantity").cast("decimal(18,6)") * col("l_quantity").cast("decimal(18,6)"))
          .cast("decimal(18,6)")).cast("double").as("s2"))
      .orderBy("l_returnflag")
      .collect()
    val k = groups.length.toDouble
    val bigN = groups.map(_.getAs[Long]("n")).sum.toDouble
    def va(r: org.apache.spark.sql.Row): Double = {
      val n = r.getAs[Long]("n").toDouble
      val s1 = r.getAs[Double]("s1"); val s2 = r.getAs[Double]("s2")
      (s2 - s1 * (s1 / n)) / (n - 1.0)
    }
    def fold(f: org.apache.spark.sql.Row => Double): Double =
      groups.foldLeft(0.0)((acc, r) => acc + f(r))
    val sw = fold(r => (r.getAs[Long]("n").toDouble - 1.0) * va(r))
    val sl = fold(r => (r.getAs[Long]("n").toDouble - 1.0) * math.log(va(r)))
    val si = fold(r => 1.0 / (r.getAs[Long]("n").toDouble - 1.0))
    val nmk = bigN - k
    val sp2 = sw / nmk
    val chi2 = (nmk * math.log(sp2) - sl) /
      (1.0 + (si - 1.0 / nmk) / (3.0 * (k - 1.0)))
    val margin = boundaryMargin(4)
    Seq("pooled_var" -> sp2, "chi2" -> chi2).foreach { case (name, v) =>
      assert(margin(v) > 1e-9,
        f"$sfDir: bartlett $name $v%.10g sits ${margin(v)}%.3e from its 4-digit " +
          "rounding boundary — libm drift could flip the hash")
    }
  }

  /** q_class_tfidf hashes round-4 c-TF-IDF scores; rank and top-5
    * membership ride the UNROUNDED score order per class (ties break on
    * the word — exact-IEEE equal scores are engine-stable). Consumes
    * the SAME classTfidfScored pipeline the query rounds.
    */
  private def auditClassTfidf(sfDir: String): Unit = {
    val docs = Snapshot(spark, sfDir).documents
    val audit = graft.operators.text.TextStats
      .classTfidfScored(docs, "source", "text")
      .where(col("rnk") <= 6)
      .select(col("class"), col("rnk"), col("score"))
      .collect()
      .groupBy(_.getString(0))
    assert(audit.nonEmpty)
    val margin = boundaryMargin(4)
    audit.foreach { case (cls, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      val minBoundary = sorted.iterator.filter(_.getLong(1) <= 5)
        .map(r => margin(r.getDouble(2))).min
      assert(minBoundary > 1e-9,
        f"$sfDir/$cls: a hashed c-tfidf score sits $minBoundary%.3e from its " +
          "4-digit rounding boundary — libm drift could flip the hash")
      val gaps = sorted.iterator.sliding(2).withPartial(false)
        .map(p => p.head.getDouble(2) - p.last.getDouble(2))
        .filter(_ != 0.0) // exact IEEE ties -> deterministic word tiebreak
        .toSeq
      assert(gaps.forall(_ > 0), s"$sfDir/$cls: rank order must be non-increasing")
      if (gaps.nonEmpty) assert(gaps.min > 1e-6,
        f"$sfDir/$cls: adjacent c-tfidf ranks separated by only ${gaps.min}%.3e")
    }
  }

  /** q_quality_classifier hashes the UNROUNDED logit (a sequential IEEE
    * fold of identical embedded weights — engine-identical by the cosSql
    * argument) and the round-4 sigmoid score (the 14th audited
    * transcendental: the exp() is the only libm-dependent step). The
    * audit collects every logit from the operator itself, re-derives the
    * unrounded sigmoid with the operator's own op sequence, and checks
    * the 4-digit boundary margin; the is_quality flag compares the
    * engine-identical logit against 0, so it needs no margin — but a
    * logit EXACTLY 0.0 would be suspicious (all-bucket cancellation), so
    * it is reported if seen.
    */
  private def auditQualityClassifier(sfDir: String): Unit = {
    val margin = boundaryMargin(4)
    def sweep(weights: Seq[Double], bias: Double,
        docs: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val rows = graft.operators.text.QualityClassifier
        .scoreWithModel(docs, "doc_id", "text", weights, bias)
        .select("logit").collect()
      assert(rows.nonEmpty, s"$sfDir: $tag classifier scored no documents")
      val minB = rows.iterator.map { r =>
        val logit = r.getDouble(0)
        margin(1.0 / (1.0 + math.exp(-logit)))
      }.min
      assert(minB > 1e-9,
        f"$sfDir: a hashed $tag classifier score sits $minB%.3e from its " +
          "4-digit rounding boundary — libm drift could flip the hash")
    }
    val all = Snapshot(spark, sfDir).documents
    sweep(SparkEntry.qualityModelWeights, SparkEntry.qualityModelBias, all, "main")
    // the HOLDOUT model's rounded-4 scores are hashed too (q_conformal
    // selects a |y - score| element) — sweep them over the held-out
    // slice, the population that row scores
    val held = all.where(graft.operators.sample.Sampling.assignSplit(
      col("source"), Seq("train" -> 0.8, "heldout" -> 0.2)) === "heldout")
    sweep(SparkEntry.qualityHoldoutWeights, SparkEntry.qualityHoldoutBias,
      held, "holdout")
  }

  /** q_log_loss hashes ONE rounded-4 value — the score-spine-grain fold
    * of −(p·ln(clip(s)) + (n−p)·ln(1−clip(s))) / N. Re-derive it from
    * the exact spine counts with the operator's own IEEE op sequence
    * and check the 4-digit boundary margin against the ACCUMULATED libm
    * drift bound: each of the ≤ 2·spine lns carries ~1-ulp engine
    * spread, weighted by its cell count, so the bound scales with
    * Σ|term|/N rather than the flat classifier bound.
    */
  private def auditLogLoss(sfDir: String): Unit = {
    val scored = graft.operators.text.QualityClassifier
      .scoreWithModel(Snapshot(spark, sfDir).documents, "doc_id", "text",
        SparkEntry.qualityModelWeights, SparkEntry.qualityModelBias)
      .select(col("doc_id"), col("score"))
    val ws = graft.operators.text.QualityClassifier.tokens(col("text"))
    val lab = Snapshot(spark, sfDir).documents
      .where(col("text").isNotNull)
      .select(col("doc_id"), ws.as("__ws"))
      .where(size(col("__ws")) > 0)
      .select(col("doc_id"),
        (size(filter(col("__ws"), w =>
          w.isInCollection(graft.operators.text.TextStats.Markers.head._2)))
          .cast("double") / size(col("__ws")).cast("double") >= 0.05).as("lbl"))
    val cells = scored.join(lab, "doc_id")
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lbl"), 1L).otherwise(0L)).as("p"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(cells.nonEmpty, s"$sfDir: empty score spine")
    val eps = 1e-6; val hi = 1.0 - eps
    def clip(s: Double) = math.max(math.min(s, hi), eps)
    val terms = cells.map { case (s, n, p) =>
      -(p.toDouble * math.log(clip(s)) + (n - p).toDouble * math.log(1.0 - clip(s)))
    }
    val nTot = cells.map(_._2).sum.toDouble
    val ll = terms.foldLeft(0.0)(_ + _) / nTot
    val mg = boundaryMargin(4)(ll)
    val driftBound = (terms.iterator.map(math.abs).sum / nTot + 1.0) * 1e-13
    assert(mg > 1e3 * driftBound,
      f"$sfDir: log_loss $ll%.10g sits $mg%.3e from its 4-digit boundary " +
        f"(accumulated-drift bound $driftBound%.3e)")
  }

  for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"tfidf margin audit at $dir: boundary margin > 1e-9, rank gaps > 1e-6") {
      auditTfidf(sf(dir))
    }
    test(s"collocations margin audit at $dir: boundary margin > 1e-9, rank gaps > 1e-6") {
      auditCollocations(sf(dir))
    }
    test(s"drift-psi margin audit at $dir: boundary margin > 1e-9") {
      auditDriftPsi(sf(dir))
    }
    test(s"categorical-drift margin audit at $dir: boundary margin > 1e-9") {
      auditDriftCategorical(sf(dir))
    }
    test(s"bm25 margin audit at $dir: boundary margin > 1e-9, rank gaps > 1e-6") {
      auditBm25(sf(dir))
    }
    test(s"synonym-bm25 margin audit at $dir: boundary margin > 1e-9, rank gaps > 1e-6") {
      auditBm25Synonyms(sf(dir))
    }
    test(s"rrf-fusion margin audit at $dir: kw rank gaps > 1e-6 through the 50/51 cut") {
      auditRrf(sf(dir))
    }
    test(s"retrieval-metrics rank audit at $dir: gaps > 1e-6 through each 10/11 cut") {
      auditRetrievalMetrics(sf(dir))
    }
    test(s"corr-matrix boundary audit at $dir: cov/corr margins > 1e-9") {
      auditCorrMatrix(sf(dir))
    }
    test(s"c-tfidf margin audit at $dir: boundary margin > 1e-9, rank gaps > 1e-6") {
      auditClassTfidf(sf(dir))
    }
    test(s"zipf-fit margin audit at $dir: slope/intercept/corr margins > 1e-9") {
      auditZipf(sf(dir))
    }
    test(s"heaps-fit margin audit at $dir: beta/lnk/corr margins > 1e-9") {
      auditHeaps(sf(dir))
    }
    test(s"bartlett margin audit at $dir: pooled_var/chi2 margins > 1e-9") {
      auditBartlett(sf(dir))
    }
    test(s"jsd margin audit at $dir: boundary margin > 1e-9") {
      auditJsd(sf(dir))
    }
    test(s"mutual-information margin audit at $dir: boundary margin > 1e-9") {
      auditMutualInformation(sf(dir))
    }
    test(s"cronbach-alpha boundary audit at $dir: ratio/alpha margins > 1e-9") {
      auditCronbach(sf(dir))
    }
    test(s"partial-corr boundary audit at $dir: correlation margins > 1e-9") {
      auditPartialCorr(sf(dir))
    }
    test(s"name-match boundary audit at $dir: jw margins and boost-threshold gaps > 1e-9") {
      auditNameMatch(sf(dir))
    }
    test(s"entropy-rate margin audit at $dir: boundary margin > 1e-9") {
      auditEntropyRate(sf(dir))
    }
    test(s"theil margin audit at $dir: boundary margin > 1e-9") {
      auditTheil(sf(dir))
    }
    test(s"quality-classifier margin audit at $dir: sigmoid boundary margin > 1e-9") {
      auditQualityClassifier(sf(dir))
    }
    test(s"log-loss margin audit at $dir: rounded total clear of its boundary") {
      auditLogLoss(sf(dir))
    }
  }
}
