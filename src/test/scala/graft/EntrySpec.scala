package graft

import org.apache.spark.sql.functions._

/** Contract checks on the driver surface: every query runs, is non-empty,
  * and every oracle-declared key exists in queries.
  */
class EntrySpec extends SparkSpecBase {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("all queries run non-empty on sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        if (fn(spark, sf()).count() > 0) None else Some(s"$name: empty")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("SURVEY §2 inventory and SparkEntry.queries stay in sync") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val table = survey.substring(
      survey.indexOf("## §2"), survey.indexOf("### E. Sources"))
    val surveyKeys = "`(q_[a-z0-9_]+|q1_[a-z_]+|q3_[a-z_]+|q5_[a-z_]+)`".r
      .findAllMatchIn(table).map(_.group(1)).toSet
    val queryKeys = SparkEntry.queries.keySet
    assert((surveyKeys -- queryKeys).isEmpty,
      s"SURVEY names queries that don't exist: ${surveyKeys -- queryKeys}")
    assert((queryKeys -- surveyKeys).isEmpty,
      s"queries missing from SURVEY §2: ${queryKeys -- surveyKeys}")
  }

  test("every oracle has a total ORDER BY (or is a single-row aggregate)") {
    // hash compare is row-order sensitive; CLAUDE.md determinism rule
    val singleRow = Set("q_insights_summary", "q_null_audit", "q_embedding_audit",
      "q_key_skew", "q_cramers_v", "q_anova", "q_mann_whitney", "q_welch_t",
      "q_wilcoxon_signed", "q_poisson_rate", "q_ks_two_sample", "q_levene",
      "q_cohens_kappa", "q_mcnemar", "q_bootstrap_ci", "q_kruskal_wallis",
      "q_permutation_test", "q_friedman", "q_cochran_q", "q_fleiss_kappa",
      "q_cronbach_alpha", "q_partial_corr", "q_odds_ratio", "q_overdispersion",
      "q_cliffs_delta", "q_eta_squared", "q_vif", "q_cohens_d",
      "q_sign_test", "q_cochran_armitage", "q_gwet_ac1", "q_kendall_w",
      "q_moods_median", "q_page_trend", "q_zipf_fit", "q_bartlett",
      "q_variance_ratio", "q_classifier_eval", "q_classifier_eval_holdout",
      "q_brier", "q_log_loss", "q_paired_t", "q_mcc", "q_burstiness",
      "q_kappa_weighted", "q_conformal")
    val missing = SparkEntry.oracleSql.collect {
      case (name, sql) if !singleRow(name) && !sql.toUpperCase.contains("ORDER BY") => name
    }
    assert(missing.isEmpty, s"oracles without ORDER BY: $missing")
  }

  test("twin-run gate: every no-oracle query is bit-stable across runs") {
    // the driver can only rows-check these (xxhash64/HLL-seeded outputs are
    // not DuckDB-expressible) — identical results across two full runs is
    // the strongest correctness signal available for them.
    // Caveat: the IVF-backed entries share SparkEntry's cached index, so
    // this in-process gate does NOT re-exercise quantizer training; the
    // cross-JVM double-Verify sweep (SURVEY §5) covers training
    // determinism end to end.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    noOracle.toSeq.sorted.foreach { name =>
      val a = SparkEntry.queries(name)(spark, sf()).collect().toSeq
      val b = SparkEntry.queries(name)(spark, sf()).collect().toSeq
      assert(a == b, s"$name differs across runs")
    }
  }

  test("deterministic: representative queries give identical rows across runs") {
    // one per family with internal state: star join, window sessionize,
    // TF-IDF (iterative-ish), custom TopKPerKey, IVF (trained quantizer)
    Seq("q5_region_volume", "q_sessionize", "q_tfidf_top_terms",
        "q_top_n_per_group", "q_ann_ivf").foreach { name =>
      val a = SparkEntry.queries(name)(spark, sf()).collect().toSeq
      val b = SparkEntry.queries(name)(spark, sf()).collect().toSeq
      assert(a == b, s"$name differs across runs")
    }
  }
}
