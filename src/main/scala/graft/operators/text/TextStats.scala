package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Text-analysis operators for training-data pipelines: language-ID,
  * quality scoring, token counting, content fingerprinting. All are pure
  * column expressions (codegen-friendly, no UDFs except the native
  * fingerprint expression), so they fuse into the scan stage at any scale.
  */
object TextStats {

  /** Marker stopwords per language (tiny fixed lists — the n-gram heuristic
    * degenerates to marker-hit counting, which is what's mirrorable in the
    * SQL oracle and deterministic at any scale).
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "de", "es", "y"),
    "fr" -> Seq("le", "la", "et", "est", "un"),
    "zh" -> Seq("的", "是", "了"))

  def markerHits(textCol: Column, markers: Seq[String]): Column =
    size(filter(split(lower(textCol), " "), w => w.isInCollection(markers)))

  /** Arg-max over marker-hit scores with fixed priority tie-break (the
    * declaration order of [[Markers]]).
    */
  def langId(textCol: Column): Column = {
    val scores = Markers.map { case (lang, ms) => lang -> markerHits(textCol, ms) }
    scores.zipWithIndex
      .init
      .foldRight(lit(scores.last._1)) { case (((lang, s), i), elseCol) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        when(laterScores.map(s >= _).reduce(_ && _), lit(lang)).otherwise(elseCol)
      }
  }

  /** Quality features + a deterministic composite score. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(col(textCol), " ")
    val nWords = size(words).cast("long")
    val nChars = length(col(textCol)).cast("long")
    val punct = length(regexp_replace(col(textCol), "[a-z0-9 ]", "")).cast("double")
    val stops = markerHits(col(textCol), Markers.head._2).cast("double")
    // NULLIF on the char-count denominator: empty text would otherwise be
    // engine-dependent (Spark non-ANSI x/0 = NULL, DuckDB IEEE = NaN)
    df.select(
        col(idCol),
        nChars.as("n_chars"),
        nWords.as("n_words"),
        (nChars.cast("double") / nWords.cast("double")).as("mean_word_len"),
        (punct / nullif(nChars.cast("double"), lit(0.0))).as("punct_ratio"),
        (stops / nWords.cast("double")).as("stopword_ratio"))
      .withColumn(
        "quality_score",
        least(col("n_words").cast("double") / 50d, lit(1.0)) * 0.5
          + col("stopword_ratio") * 0.5
          - col("punct_ratio") * 0.2)
  }

  /** Gopher-style per-document quality-RULE audit (C73; Rae et al. 2021
    * appendix A heuristics, the mirrorable subset) — where [[quality]]
    * blends signals into one composite score, this emits the per-rule
    * diagnosis a curation pipeline filters and REPORTS on: word-count
    * band, mean-word-length band, alpha-word ratio, bullet-line ratio,
    * ellipsis-line-ending ratio, minimum stopword presence (the SHARED
    * EN marker set — the mirror-ability contract, not linguistic
    * coverage), and `keep` = all rules pass.
    *
    * Determinism: every ratio is ONE division of exact integer counts
    * (both engines correctly-round the same quotient — comparisons to
    * literal thresholds are then identical), and the word-length sum is
    * an exact integer fold. Single scan-fused projection; no shuffle at
    * all.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = split(t, " ")
    val nWords = size(words).cast("long")
    val sumWlen = aggregate(transform(words, w => length(w)), lit(0),
      (a, x) => a + x).cast("long")
    val meanWlen = sumWlen.cast("double") / nWords.cast("double")
    val alphaRatio = size(filter(words, w => w.rlike("[a-zA-Z]")))
      .cast("double") / nWords.cast("double")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long")
    val bulletRatio = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("* "))).cast("double") /
      nLines.cast("double")
    val ellipsisRatio = size(filter(lines, l => l.endsWith("...")))
      .cast("double") / nLines.cast("double")
    val stops = markerHits(t, Markers.head._2).cast("long")
    df.where(t.isNotNull)
      .select(
        col(idCol),
        nWords.as("n_words"),
        meanWlen.as("mean_word_len"),
        alphaRatio.as("alpha_ratio"),
        (nWords >= 50L && nWords <= 100000L).as("r_word_count"),
        (meanWlen >= 3.0 && meanWlen <= 10.0).as("r_mean_word_len"),
        (alphaRatio >= 0.8).as("r_alpha_words"),
        (bulletRatio <= 0.9).as("r_bullets"),
        (ellipsisRatio <= 0.3).as("r_ellipsis"),
        (stops >= 2L).as("r_stopwords"))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") && col("r_alpha_words") &&
          col("r_bullets") && col("r_ellipsis") && col("r_stopwords"))
  }

  /** Flesch-reading-ease-style readability score — the classic
    * text-difficulty quality signal (Flesch 1948): 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words), with the
    * standard cheap heuristics (sentences = `[.!?]+` runs, floored at
    * 1 for unpunctuated corpora; syllables = vowel-group runs incl. y,
    * floored at 1). Every arithmetic op is exact-IEEE (divisions of
    * exact counts, literal constants both engines parse to the same
    * double — the B58 rule), so the rounded score is oracle-hashable
    * with no margin audit.
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nWords = size(split(col(textCol), " ")).cast("long")
    val nSent = greatest(lit(1L), regexp_count(col(textCol), lit("[.!?]+")).cast("long"))
    val nSyll = greatest(lit(1L), regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long"))
    df.where(col(textCol).isNotNull)
      .select(
        col(idCol),
        nWords.as("n_words"),
        nSent.as("n_sentences"),
        nSyll.as("n_syllables"))
      .withColumn("flesch", graft.functions.ExactMath.hashRound(
        lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double")),
        4))
  }

  /** Whitespace tokens + a BPE-ish regex token count (letter runs, digit
    * runs, single other non-space chars).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(split(col(textCol), " ")).cast("long").as("ws_tokens"),
      regexp_count(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long").as("bpe_tokens"))

  /** Order-sensitive rolling-hash fingerprint (native expression). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), GraftFunctions.fingerprint(split(lower(col(textCol)), " ")).as("fingerprint"))

  /** PII scrubbing: email/URL redaction with per-doc counts. Patterns are
    * deliberately restricted to syntax with identical semantics in Java
    * regex and RE2 (character classes + bounded quantifiers) so the
    * operator is oracle-checkable; production would extend the list.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
  val UrlRe = "https?://[^ ]+"

  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"), UrlRe, "<URL>").as("cleaned"),
      (regexp_count(col(textCol), lit(EmailRe)) + regexp_count(col(textCol), lit(UrlRe)))
        .cast("long").as("n_redactions"))

  /** PII widening beyond email/URL (round-8): phones, IPv4s, and credit-
    * card-shaped numbers with a Luhn mod-10 check done ARITHMETICALLY
    * (16 fixed-position digit expressions — no UDF, no loop), so the
    * DuckDB oracle mirrors it term by term. Same Java-regex/RE2 common
    * subset as [[EmailRe]]; candidates are scanned left-to-right non-
    * overlapping (identical in both engines), which is the documented
    * contract for digit runs longer than a candidate.
    */
  val PhoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val CcRe = "[0-9]{16}"

  /** Luhn mod-10 validity of an exactly-16-digit string: odd positions
    * from the left (= every second digit from the right) double, with
    * 9 subtracted past 9; valid iff the total ≡ 0 (mod 10). Pure integer
    * arithmetic over fixed positions — hash-safe and oracle-mirrorable.
    */
  def luhnValid16(s: Column): Column =
    (1 to 16).map { i =>
      val d = substring(s, i, 1).cast("int")
      if (i % 2 == 1) when(d * 2 > 9, d * 2 - 9).otherwise(d * 2) else d
    }.reduce(_ + _) % 10 === 0

  /** All-octets-in-range validity of an IPv4-SHAPED candidate (the regex
    * admits 0-999 octets; real validation is numeric).
    */
  def ipv4Valid(s: Column): Column =
    size(filter(split(s, "\\."), o => o.cast("int") <= 255)) === 4

  /** Per-document PII audit + conservative redaction. Counts are per-
    * pattern over the RAW text; `redacted` applies the five replacements
    * sequentially (email, URL, phone, credit card, IPv4 — the patterns
    * are mutually non-overlapping on dash/dot/@ structure). Redaction is
    * conservative: every CANDIDATE is masked; `n_cc_valid`/`n_ipv4_valid`
    * report how many candidates pass the Luhn / octet-range checks.
    * Scale shape: scan-fused column expressions, no shuffle.
    */
  /** Per-source template-prefix audit (C77) — the boilerplate screen at
    * the document HEAD (C10's shared-shingle boilerplate looks anywhere
    * in the body; templated crawls — headers, cookie banners, generated
    * reports — concentrate at the start): bucket each doc by its first
    * k chars, then per source report the prefix-vocabulary size and the
    * share of the modal prefix. top_prefix picks by (count DESC, prefix
    * DESC) — a struct-max SELECTION over the aggregated (source,
    * prefix) spine, deterministic; top_prefix_share is ONE exact-int
    * division (unrounded); is_templated = share > 0.5 compares
    * identical quotients. Two partial aggs, the corpus text never
    * shuffles beyond the k-char prefix.
    */
  def templatePrefix(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      k: Int = 40): DataFrame = {
    require(k >= 1, s"prefix length must be >= 1, got $k")
    val counts = df
      .where(col(sourceCol).isNotNull && col(textCol).isNotNull)
      .select(col(sourceCol).cast("string").as("source"),
        substring(col(textCol), 1, k).as("__p"))
      .groupBy("source", "__p").agg(count(lit(1)).as("__c"))
    counts.groupBy("source")
      .agg(
        sum(col("__c")).as("n_docs"),
        count(lit(1)).as("n_prefixes"),
        max(struct(col("__c").as("c"), col("__p").as("p"))).as("__top"))
      .select(col("source"), col("n_docs"), col("n_prefixes"),
        col("__top").getField("p").as("top_prefix"),
        (col("__top").getField("c").cast("double") / col("n_docs").cast("double"))
          .as("top_prefix_share"),
        (col("__top").getField("c").cast("double") / col("n_docs").cast("double")
          > 0.5).as("is_templated"))
      .orderBy("source")
  }

  /** Garbled-text (OCR-noise) audit per document (C76) — the
    * symbol-soup screen a curation pipeline runs on scanned/extracted
    * corpora (broken OCR shows dense non-alphanumerics and impossible
    * consonant runs; C9's composite quality score blends signals, this
    * emits the per-rule diagnosis the pipeline filters on):
    *   - symbol_ratio = chars outside [a-zA-Z0-9 ] / chars — ONE
    *     exact-int division (length-difference counting, no per-char
    *     UDF; engine-identical quotient ⇒ identical flags);
    *   - max_consonant_run = longest [b..z consonants]+ match over the
    *     lowercased text (regexp_extract_all in the Java↔RE2 common
    *     subset — the pii contract);
    *   - is_garbled = symbol_ratio > 0.3 OR max_consonant_run ≥ 8.
    * LATIN-CENTRIC by construction (CJK text flags as symbols — on the
    * catalog corpus the zh docs keep the flag non-vacuous); compose
    * AFTER langid routing on mixed corpora. Scan-fused projection, no
    * shuffle.
    */
  def garbledAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val nSymbols = (length(t) -
      length(regexp_replace(t, "[^a-zA-Z0-9 ]", ""))).cast("long")
    val runs = regexp_extract_all(lower(t),
      lit("[bcdfghjklmnpqrstvwxyz]+"), lit(0))
    val maxRun = coalesce(array_max(transform(runs, r => length(r))), lit(0))
      .cast("long")
    val ratio = nSymbols.cast("double") / nChars.cast("double")
    df.where(t.isNotNull && length(t) > 0)
      .select(col(idCol), nChars.as("n_chars"), nSymbols.as("n_symbols"),
        ratio.as("symbol_ratio"), maxRun.as("max_consonant_run"),
        (ratio > 0.3 || maxRun >= 8L).as("is_garbled"))
  }

  /** Zipf rank–frequency fit over the top-k corpus terms (C80) — the
    * classic natural-language sanity check (a Zipfian corpus has
    * ln(freq) ≈ a + s·ln(rank) with s near −1; machine-generated or
    * template-heavy corpora bend away): least-squares of ln(count) on
    * ln(rank) over the top-k terms by (count DESC, term ASC).
    *
    * Scale/determinism: the term table is one partial agg; the top-k
    * cut is `TakeOrdered` (orderBy + limit — distributed heap, never a
    * global rank window over the vocabulary spine); rank MEMBERSHIP and
    * order are decided by exact (count, term) — no float enters the
    * cut. The regression folds the five power sums SEQUENTIALLY in
    * rank order over the COLLECTED ≤ k-row spine (transform + 0.0-init
    * aggregate — init-less `list_reduce` mirror), and slope/intercept/
    * corr are one fixed IEEE chain. ln is libm ⇒ the hashed values go
    * through `hashRound(4)` under a MarginAuditSpec boundary audit
    * (the 12th audited transcendental); the exact anchors
    * (n_terms, vocab_size, c_top) hash exactly. NULL fit when fewer
    * than 3 ranks or a degenerate variance.
    */
  def zipfFit(df: DataFrame, textCol: String, k: Int = 50): DataFrame =
    zipfFitFromTermCounts(termCounts(df, textCol), k)

  /** (w, c) corpus term counts — the mergeable state behind [[zipfFit]]
    * (D37): counts add ([[mergeTermCounts]]), so a streaming corpus
    * monitor folds microbatches and re-fits the Zipf line on demand;
    * merged state == one-shot EXACTLY (the D29 cell argument). NOT
    * idempotent (the D20 partition contract).
    */
  def termCounts(df: DataFrame, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(explode(filter(split(lower(col(textCol)), " "),
        w => length(w) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Merge two [[termCounts]] states by count addition. */
  def mergeTermCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("w").agg(sum(col("c")).as("c"))

  /** The fit from a pre-aggregated [[termCounts]] state — see
    * [[zipfFit]] for the full contract.
    */
  def zipfFitFromTermCounts(terms: DataFrame, k: Int = 50): DataFrame = {
    require(k >= 3 && k <= 1000, s"k must be in [3,1000], got $k")
    val vocab = terms.agg(count(lit(1)).as("vocab_size"))
    val top = terms.orderBy(col("c").desc, col("w")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("c").desc, col("w"))))
    val spine = top.agg(
      count(lit(1)).as("n_terms"),
      max(when(col("rank") === 1, col("c"))).as("c_top"),
      array_sort(collect_list(struct(col("rank"), col("c")))).as("__ts"))
    def fold(term: Column => Column): Column =
      aggregate(transform(col("__ts"), term), lit(0.0), (acc, t) => acc + t)
    def x(e: Column): Column = log(e.getField("rank").cast("double"))
    def y(e: Column): Column = log(e.getField("c").cast("double"))
    val n = col("n_terms").cast("double")
    val sx = fold(x); val sy = fold(y)
    val sxx = fold(e => x(e) * x(e)); val sxy = fold(e => x(e) * y(e))
    val syy = fold(e => y(e) * y(e))
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val num = n * sxy - sx * sy
    val slope = num / denx
    val intercept = (sy - slope * sx) / n
    val corr = num / (sqrt(denx) * sqrt(deny))
    val ok = col("n_terms") >= 3L && denx > 0.0 && deny > 0.0
    spine.crossJoin(broadcast(vocab)).select(
      col("n_terms"), col("vocab_size"), col("c_top"),
      graft.functions.ExactMath.hashRound(when(ok, slope), 4).as("zipf_slope"),
      graft.functions.ExactMath.hashRound(when(ok, intercept), 4).as("zipf_intercept"),
      graft.functions.ExactMath.hashRound(when(ok, corr), 4).as("fit_corr"))
  }

  /** Heaps'-law vocabulary-growth fit at the SHINGLE grain (C86) —
    * Zipf's companion corpus sanity check: V(N) ≈ k·N^β, so ln V on
    * ln N should be near-linear (template/machine corpora bend off it;
    * a duplicated corpus flattens it). The "type" unit is the C36
    * 5-word shingle, NOT the word: this synthetic corpus draws from a
    * small FIXED word vocabulary that saturates in the first bucket
    * (word-grain V is constant ⇒ degenerate fit — the q_boilerplate
    * vacuity lesson, measured), while shingle types genuinely grow with
    * the corpus; shingle-grain Heaps is also what the dedup/novelty
    * family actually consumes. N/V checkpoints are `nBuckets`
    * doc-id-range slices in document order: bucket =
    * ((id − mn)·nBuckets) div (mx − mn + 1) — EXACT integer arithmetic
    * on a broadcast 1-row (mn, mx) aggregate, engine-identical, never a
    * row-grain ntile window. Per-bucket token sums are exact LONGs; a
    * shingle's first bucket = min bucket (monotone in doc_id ⇒ the C66
    * first-occurrence convention at bucket grain); cumulative
    * tokens/types are windows over the ≤ nBuckets AGGREGATED spine
    * (the q_peaks-allowed shape). The spine shuffle keys are the 64-bit
    * xxhash shingles (the C66b slim-spine plan — every count is
    * identical to the string form absent an xxhash64 collision, the
    * argument q_novelty_hashed's green oracle already proves on this
    * corpus; the DuckDB oracle computes the string form). The ln-ln
    * regression folds its five power sums SEQUENTIALLY in bucket order
    * over the collected spine (transform + 0.0-init aggregate —
    * init-less `list_reduce` mirror, the zipfFit protocol);
    * beta/lnk/corr go through `hashRound(4)` under a MarginAuditSpec
    * boundary audit (the 16TH audited transcendental). Buckets with
    * zero cumulative tokens/types are excluded from the fit by the
    * exact-int predicate; NULL fit under 3 points or degenerate
    * variance. Token counts use the `termCounts` convention (lower,
    * space-split, empties drop); shingles use the C66 convention
    * verbatim (unfiltered split, whole-text fallback under 5 words).
    */
  def heapsFit(
      df: DataFrame, idCol: String, textCol: String, nBuckets: Int = 20): DataFrame = {
    require(nBuckets >= 3 && nBuckets <= 1000,
      s"nBuckets must be in [3,1000], got $nBuckets")
    val ws0 = split(lower(col(textCol)), " ")
    val shingles = array_distinct(GraftFunctions.shingleHashes(ws0, 5))
    val base = df.where(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        size(filter(ws0, w => length(w) > 0)).cast("long").as("__ntok"),
        shingles.as("__ss"))
    val rng = base.agg(min(col("__id")).as("__mn"), max(col("__id")).as("__mx"))
    val bucketed = base.crossJoin(broadcast(rng))
      .withColumn("__bucket",
        expr(s"CAST(((__id - __mn) * ${nBuckets}L) div (__mx - __mn + 1L) AS INT)"))
    val perBucket = bucketed.groupBy("__bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("__ntok")).as("__tok"))
    val newTypes = bucketed
      .select(col("__bucket"), explode(col("__ss")).as("__s"))
      .groupBy("__s").agg(min(col("__bucket")).as("__fb"))
      .groupBy(col("__fb").as("__bucket")).agg(count(lit(1)).as("__newv"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = perBucket.join(newTypes, Seq("__bucket"), "left")
      .select(col("__bucket").as("bucket"), col("n_docs"),
        coalesce(col("__newv"), lit(0L)).as("new_types"), col("__tok"))
      .select(col("bucket"), col("n_docs"), col("new_types"),
        sum(col("__tok")).over(w).as("cum_tokens"),
        sum(col("new_types")).over(w).as("cum_types"))
    val pts = cum.where(col("cum_tokens") > 0L && col("cum_types") > 0L)
      .agg(count(lit(1)).as("__np"),
        array_sort(collect_list(struct(col("bucket"),
          col("cum_tokens"), col("cum_types")))).as("__ps"))
    def fold(term: Column => Column): Column =
      aggregate(transform(col("__ps"), term), lit(0.0), (acc, t) => acc + t)
    def x(e: Column): Column = log(e.getField("cum_tokens").cast("double"))
    def y(e: Column): Column = log(e.getField("cum_types").cast("double"))
    val n = col("__np").cast("double")
    val sx = fold(x); val sy = fold(y)
    val sxx = fold(e => x(e) * x(e)); val sxy = fold(e => x(e) * y(e))
    val syy = fold(e => y(e) * y(e))
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val num = n * sxy - sx * sy
    val slope = num / denx
    val intercept = (sy - slope * sx) / n
    val corr = num / (sqrt(denx) * sqrt(deny))
    val ok = col("__np") >= 3L && denx > 0.0 && deny > 0.0
    val fit = pts.select(
      graft.functions.ExactMath.hashRound(when(ok, slope), 4).as("heaps_beta"),
      graft.functions.ExactMath.hashRound(when(ok, intercept), 4).as("heaps_lnk"),
      graft.functions.ExactMath.hashRound(when(ok, corr), 4).as("fit_corr"))
    cum.crossJoin(broadcast(fit))
  }

  /** Code-vs-prose screen per document (C87) — the filter a text
    * pipeline runs to ROUTE code out of (or into) a training mix:
    * symbol-character share (`{}()[];=<>` via a translate-delete
    * length diff — pure codepoint counting, both engines), code-keyword
    * token hits (exact whitespace-token membership), and 2-space
    * indented-line count (the dominant code formatting signal; lines =
    * `\n` split). `symbol_share` is ONE exact-int division and
    * `is_code` = share ≥ 0.02 AND ≥ 2 keyword hits — engine-identical
    * booleans (the q_gopher_rules rule). NULL/empty texts drop.
    */
  def codeAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = filter(split(t, " "), w => length(w) > 0)
    val kw = size(filter(words, w => w.isInCollection(CodeKeywords))).cast("long")
    val symbols = (length(t) - length(translate(t, CodeSymbols, ""))).cast("long")
    val indents = size(filter(split(t, "\n"), l => l.startsWith("  "))).cast("long")
    val nChars = length(t).cast("long")
    df.where(t.isNotNull && length(t) > 0)
      .select(col(idCol),
        nChars.as("n_chars"), symbols.as("n_symbol"),
        size(words).cast("long").as("n_words"), kw.as("kw_hits"),
        indents.as("indent_lines"),
        (symbols.cast("double") / nChars.cast("double")).as("symbol_share"))
      .withColumn("is_code", col("symbol_share") >= 0.02 && col("kw_hits") >= 2L)
  }

  /** The code-keyword vocabulary of [[codeAudit]] — shared with the
    * oracle literal list.
    */
  val CodeKeywords: Seq[String] =
    Seq("def", "return", "import", "class", "function", "var", "const",
      "if", "else", "for")

  /** The symbol-character class of [[codeAudit]]. */
  val CodeSymbols: String = "{}()[];=<>"

  /** Casing / character-class profile per document (C78) — the
    * SHOUTY-TEXT and OCR-noise screen next to [[garbledAudit]] (symbol
    * soup there; casing pathology here): ALL-CAPS word share (boiler
    * headers, scraped navigation), TitleCase share, and upper/digit
    * CHARACTER shares. Words = the whitespace-token convention
    * (empty tokens from repeated spaces drop); every share is ONE
    * exact-int division ⇒ all values and the `is_shouty` flag are
    * engine-identical (the q_garbled rule — flags chosen to be
    * non-vacuous on this corpus: caps-share > 0.2 with ≥ 5 words).
    * Zero-length/NULL texts drop.
    */
  def casingAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = filter(split(t, " "), w => length(w) > 0)
    val nWords = size(words).cast("long")
    val caps = size(filter(words, w => w.rlike("^[A-Z]{2,}$"))).cast("long")
    val title = size(filter(words, w => w.rlike("^[A-Z][a-z]+$"))).cast("long")
    val nChars = length(t).cast("long")
    def classChars(re: String): Column =
      (length(t) - length(regexp_replace(t, re, ""))).cast("long")
    val upper = classChars("[A-Z]")
    val digit = classChars("[0-9]")
    val capsShare = caps.cast("double") / nWords.cast("double")
    // the word-count guard keeps the share divisions off 0/0 (an
    // all-whitespace text has chars but no words)
    df.where(t.isNotNull && length(t) > 0 && size(words) > 0)
      .select(col(idCol),
        nWords.as("n_words"), caps.as("n_caps_words"),
        title.as("n_title_words"), nChars.as("n_chars"),
        capsShare.as("caps_share"),
        (upper.cast("double") / nChars.cast("double")).as("upper_share"),
        (digit.cast("double") / nChars.cast("double")).as("digit_share"),
        (nWords >= 5L && capsShare > 0.2).as("is_shouty"))
  }

  def piiAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    val ccs = regexp_extract_all(c, lit(CcRe), lit(0))
    val ips = regexp_extract_all(c, lit(Ipv4Re), lit(0))
    val redacted = Seq(EmailRe -> "<EMAIL>", UrlRe -> "<URL>", PhoneRe -> "<PHONE>",
      CcRe -> "<CC>", Ipv4Re -> "<IP>")
      .foldLeft(c) { case (acc, (re, tag)) => regexp_replace(acc, re, tag) }
    df.select(
        col(idCol),
        regexp_count(c, lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(c, lit(UrlRe)).cast("long").as("n_urls"),
        regexp_count(c, lit(PhoneRe)).cast("long").as("n_phones"),
        size(ips).cast("long").as("n_ipv4"),
        size(filter(ips, ipv4Valid _)).cast("long").as("n_ipv4_valid"),
        size(ccs).cast("long").as("n_cc"),
        size(filter(ccs, luhnValid16 _)).cast("long").as("n_cc_valid"),
        redacted.as("redacted"))
      .withColumn("n_redactions",
        col("n_emails") + col("n_urls") + col("n_phones") + col("n_ipv4") + col("n_cc"))
  }

  /** Quality gate: keep docs passing the score/length thresholds — the
    * filter stage of a training-data pipeline, composed from [[quality]].
    */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
      minScore: Double, minWords: Long): DataFrame =
    quality(df, idCol, textCol)
      .where(col("quality_score") >= minScore && col("n_words") >= minWords)
      .select(col(idCol), col("n_words"), col("quality_score"))

  /** Per-doc word-distribution Shannon entropy — the classic
    * "repetitive/degenerate text" quality signal complementing
    * [[repetition]] (entropy catches skewed DISTRIBUTIONS, repetition
    * catches repeated SEQUENCES). Computed as a deterministic
    * sequential fold: per-doc word counts collect into an array sorted
    * by word and fold left through `-Σ p·log2(p)` — IEEE addition is
    * order-sensitive, so the fold order is part of the contract (the
    * DuckDB mirror uses `list(... ORDER BY wd)` + `list_reduce`, the
    * same [[graft.functions.GraftFunctions.cosine]] convention).
    *
    * `word_entropy` is a `log2` transcendental — libm-dependent, so it
    * is NOT oracle-hashable (SURVEY §5): the driver-checked query
    * hashes only the IEEE-exact companions emitted here — `n_words`,
    * `n_distinct`, and `count_sig` (md5 of the word-sorted count
    * vector, which determines the entropy value exactly) — and the
    * entropy float itself is gated by analytic planted cases in
    * TextStatsSpec (2^k equally-frequent words ⇒ entropy exactly k).
    * Word-count grain: one shuffle on (doc, word), one on doc; per-doc
    * state is vocabulary-sized.
    */
  def entropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("wd"))
      .groupBy(col(idCol), col("wd")).agg(count(lit(1)).as("c"))
    counts
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("wd"), col("c")))).as("cs"),
        sum(col("c")).as("n_words"))
      .select(col(idCol), col("n_words"),
        size(col("cs")).cast("long").as("n_distinct"),
        // the count vector (sorted by word) determines the entropy
        // exactly; its md5 is the IEEE-exact hashable witness
        md5(concat_ws(",", transform(col("cs"), s => s("c").cast("string"))))
          .as("count_sig"),
        // + 0.0 collapses IEEE -0.0 (an all-one-word doc) to +0.0 on
        // both engines before rounding/hashing
        round(-aggregate(
          transform(col("cs"), s =>
            (s("c") / col("n_words")) * log2(s("c") / col("n_words"))),
          lit(0.0), (acc, x) => acc + x) + lit(0.0), 4).as("word_entropy"))
  }

  /** Intra-document repetition (Gopher/RefinedWeb-style boilerplate
    * signal): the fraction of word n-gram occurrences that repeat an
    * earlier n-gram of the same doc. 0.0 = all shingles unique; → 1.0 =
    * heavily repeated boilerplate. Pure column expression over the native
    * shingle hasher — fuses into the scan.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String, shingle: Int = 3): DataFrame = {
    val sh = GraftFunctions.shingleHashes(split(lower(col(textCol)), " "), shingle)
    val total = size(sh).cast("long")
    val uniq = size(array_distinct(sh)).cast("long")
    df.select(
      col(idCol),
      total.as("n_shingles"),
      uniq.as("n_unique_shingles"),
      (lit(1.0) - uniq.cast("double") / total.cast("double")).as("repetition_ratio"))
  }

  /** Cross-document boilerplate detection (CCNet/RefinedWeb-style): the
    * fraction of a doc's DISTINCT word n-gram shingles that appear in at
    * least `minDocs` distinct documents of the same source — headers,
    * footers, navigation and license blocks shared across one site's
    * pages. Complements [[repetition]] (intra-doc) with the cross-doc
    * signal.
    *
    * Scale shape: only slim (doc_id, source, hash) rows ever shuffle
    * (shingle text never leaves the scan); the common-shingle set is
    * frequency-bounded by construction (a shingle must recur `minDocs`
    * times within one source), and the per-doc counts come back via a
    * doc_id join — no per-doc windows, no wide arrays through exchanges.
    * The corpus is scanned and shingle-hashed ONCE: the exploded slim
    * set is persisted for the call and feeds all three consumers
    * (per-doc totals, the common-shingle aggregate, the hit counts);
    * its blocks are released before returning (the checkpointed result
    * is one stats row per doc — output-sized, not corpus-text-sized).
    */
  def boilerplate(df: DataFrame, idCol: String, textCol: String, sourceCol: String,
      shingle: Int = 3, minDocs: Int = 5): DataFrame = {
    val exploded = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        explode(array_distinct(
          GraftFunctions.shingleHashes(split(lower(col(textCol)), " "), shingle))).as("h"))
    graft.operators.dedup.CacheScope.withPersisted(exploded) { ex =>
      // every non-null text yields >= 1 shingle (short docs collapse to a
      // single whole-text shingle), so ex covers every doc: per-doc
      // totals can come from the slim set, no second corpus scan
      val perDoc = ex.groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_distinct_shingles"))
      // rows are distinct per doc already, so count(*) = distinct docs
      val common = ex.groupBy("source", "h").agg(count(lit(1)).as("nd"))
        .where(col("nd") >= minDocs).select("source", "h")
      val hits = ex.join(common, Seq("source", "h"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_common"))
      perDoc
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"), col("n_distinct_shingles"),
          coalesce(col("n_common"), lit(0L)).as("n_boilerplate_shingles"),
          (coalesce(col("n_common"), lit(0L)).cast("double") /
            col("n_distinct_shingles").cast("double")).as("boilerplate_ratio"))
    }
  }

  /** Unrounded, unfiltered TF-IDF ranking — the shared pipeline behind
    * [[tfidfTopTerms]] and MarginAuditSpec's transcendental audit (the
    * audit must see the SAME doubles the query rounds/ranks, so it
    * consumes this codepath rather than recomputing the formula).
    * Emits (doc_id, term, tfidf, rnk) for EVERY term.
    */
  def tfidfScored(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = df.select(col(idCol).as("doc_id"), explode(split(lower(col(textCol)), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = terms.distinct().groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n"))
    val scored = tf
      .join(docFreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") * (log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("rnk"), col("term"), col("tfidf"))
  }

  /** Top-k TF-IDF terms per document. Term/doc frequencies are two
    * hash-partitioned aggregations; the corpus size joins in as a broadcast
    * scalar; ranking is a per-doc window. idf = ln((N+1)/(df+1)) + 1.
    * The rounded `tfidf` is a `ln` transcendental hashed by the oracle —
    * admissible only under MarginAuditSpec's standing boundary/rank-gap
    * audit (SURVEY §5).
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    tfidfScored(df, idCol, textCol)
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), graft.functions.ExactMath.hashRound(col("tfidf"), 6).as("tfidf"))

  /** Unrounded, unfiltered class-TF-IDF ranking (C70; Grootendorst's
    * c-TF-IDF, the BERTopic class-labeling scorer) — the SHARED
    * pipeline behind [[classTfidfTopTerms]] and MarginAuditSpec's
    * boundary/rank-gap audit (one codepath, the tfidfScored rule):
    * classes are document GROUPS (sources/clusters), tf is the word's
    * count inside the class, and
    *   score = tf · ln(1 + A / f_w)
    * with f_w the word's corpus-wide count and A the average words per
    * class (total/num classes — ONE IEEE division of exact BIGINTs).
    * Emits (class, word, tf, score, rnk) for EVERY (class, word).
    *
    * Scale shape: one token explode fused into the scan, partial aggs
    * to the (class, word) and (word) spines, two 1-row broadcast
    * scalars, and a per-class window over the AGGREGATED spine.
    */
  def classTfidfScored(df: DataFrame, classCol: String, textCol: String): DataFrame = {
    val words = df
      .where(col(classCol).isNotNull && col(textCol).isNotNull)
      .select(col(classCol).as("class"),
        explode(split(lower(col(textCol)), " ")).as("word"))
      .where(col("word") =!= "")
    val tf = words.groupBy("class", "word").agg(count(lit(1)).as("tf"))
    val fw = words.groupBy("word").agg(count(lit(1)).as("__fw"))
    val scalars = tf.agg(
      sum(col("tf")).as("__total"),
      countDistinct(col("class")).as("__k"))
    val scored = tf
      .join(fw, Seq("word"))
      .crossJoin(broadcast(scalars))
      .withColumn("score",
        col("tf").cast("double") * log(lit(1.0)
          + (col("__total").cast("double") / col("__k").cast("double"))
            / col("__fw").cast("double")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("class").orderBy(col("score").desc, col("word"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("class"), col("rnk"), col("word"), col("tf"), col("score"))
  }

  /** Top-k c-TF-IDF terms per class; the rounded `score` is a `ln`
    * transcendental hashed by the oracle — admissible only under the
    * standing MarginAuditSpec boundary/rank-gap audit (SURVEY §5).
    */
  def classTfidfTopTerms(
      df: DataFrame, classCol: String, textCol: String, k: Int): DataFrame =
    classTfidfScored(df, classCol, textCol)
      .where(col("rnk") <= k)
      .select(col("class"), col("rnk"), col("word"), col("tf"),
        graft.functions.ExactMath.hashRound(col("score"), 4).as("score"))

  /** Unrounded BM25 ranked retrieval over a literal term query — the
    * reference's keyword search upgraded to the standard relevance
    * scorer (reference: /root/reference/openai/list_of_tools.py:14
    * keyword filtering; BM25 per Robertson et al., the Lucene-default
    * formulation):
    *
    *   idf(t)  = ln(1 + (N − df + 0.5) / (df + 0.5))
    *   s(t, D) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Scale shape: doc lengths and per-(doc, query-term) tfs are two
    * hash aggregations of the exploded tokens (the query-term filter
    * prunes the tf table to matching docs BEFORE any join); N/avgdl
    * arrive as a broadcast scalar; ranking is a global
    * TakeOrderedAndProject, never a corpus-wide single-task window.
    *
    * Determinism: the per-doc score sums one double per query term in
    * LITERAL LIST ORDER via a fixed coalesce chain (never a groupBy sum
    * of doubles, whose merge order is partition-dependent); every
    * non-transcendental step is IEEE +,−,×,÷ mirrored operand-for-
    * operand by the DuckDB oracle; the `ln` makes any hashed output
    * admissible only under MarginAuditSpec (SURVEY §5). Emits
    * (rnk, doc_id, n_terms_matched, bm25 UNROUNDED) for every matching
    * doc; rnk orders by (score desc, doc_id).
    */
  /** Shared per-term scoring stage of both BM25 surfaces: one row
    * (doc_id, term, sc) per matching (doc, query-term). The token
    * explode, dl/corpus-stats aggregations, tf/df tables and the
    * idf·saturation formula live ONLY here — the flat scorer and the
    * synonym scorer differ solely in how they pivot these rows.
    */
  private def bm25TermScores(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double, b: Double): DataFrame = {
    val terms = df.select(col(idCol).as("doc_id"),
      explode(split(lower(col(textCol)), " ")).as("term"))
    val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // N and avgdl over docs WITH tokens (null text yields no rows) —
    // one broadcast scalar row
    val stats = dl.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val tf = terms.where(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf
      .join(docFreq, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("sc",
        col("idf") * (col("tf").cast("double") * (lit(k1) + lit(1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))))
  }

  def bm25Scored(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "queryTerms must be non-empty and distinct")
    val scored = bm25TermScores(df, idCol, textCol, queryTerms, k1, b)
    // fixed-order sum: one pivoted column per literal term, added in
    // list order — bit-stable regardless of partitioning
    val pivoted = scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_terms_matched"),
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("sc"))).as(s"__s$i")
      }: _*)
    val score = queryTerms.indices
      .map(i => coalesce(col(s"__s$i"), lit(0.0)))
      .reduceLeft(_ + _)
    val ranked = pivoted
      .withColumn("bm25", score)
      .select(col("doc_id"), col("n_terms_matched"), col("bm25"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id"))
    ranked
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("n_terms_matched"), col("bm25"))
  }

  /** Top-k BM25 docs, score rounded to 4 digits for the oracle hash
    * (SURVEY §5's similarity-output convention: at 6 digits a sf0.01
    * value measured 5.7e-10 from its rounding boundary — the margin
    * audit rejected it; the 4-digit lattice is 100× coarser). The
    * global window in [[bm25Scored]] only ever sees the docs matching
    * ≥1 query term; for corpus-scale matching sets take `orderBy.limit`
    * instead.
    */
  def bm25TopDocs(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame =
    bm25Scored(df, idCol, textCol, queryTerms)
      .where(col("rnk") <= k)
      .select(col("rnk"), col("doc_id"), col("n_terms_matched"),
        graft.functions.ExactMath.hashRound(col("bm25"), 4).as("bm25"))

  /** BM25 over the reference's CONCEPT query shape: OR-of-synonyms
    * within a group, AND-of-concepts across groups (reference:
    * /root/reference/openai/basic_functions.py step 5 — each concept is
    * a synonym list, a row must match at least one synonym of EVERY
    * concept). Scoring choice, documented: a concept scores the MAX of
    * its synonyms' per-term BM25 scores (a concept's evidence is its
    * best surface form — summing would double-count one concept
    * whenever two spellings co-occur, the classic synonym-expansion
    * inflation; this is Lucene SynonymQuery/DisMax semantics), and the
    * doc score SUMS the concept scores in literal group order
    * (independent evidence accumulates across concepts, exactly as
    * BM25 sums independent terms).
    *
    * Scale shape is [[bm25Scored]]'s: the flattened synonym list prunes
    * the token explosion before any join; the AND filter runs on the
    * pivoted per-doc row (one hash aggregation); ranking windows only
    * the docs passing every concept.
    *
    * Determinism: per-term scores are [[bm25Scored]]'s; the per-concept
    * max is SELECTION, not arithmetic (order-independent and IEEE-exact
    * on both engines — Spark `greatest` and DuckDB `greatest` both
    * ignore NULLs); the cross-concept sum is a fixed-order chain. The
    * `ln` idf keeps any hashed output under MarginAuditSpec (SURVEY §5).
    * Emits (rnk, doc_id, n_terms_matched, bm25 UNROUNDED) for docs
    * matching every concept; rnk orders by (score desc, doc_id).
    * A synonym absent from the corpus simply never matches (its pivot
    * column is all-NULL); a whole concept with zero corpus presence
    * empties the result, faithfully to AND semantics.
    */
  def bm25SynonymScored(df: DataFrame, idCol: String, textCol: String,
      concepts: Seq[Seq[String]], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val flat = concepts.flatten
    require(concepts.nonEmpty && concepts.forall(_.nonEmpty) && flat.distinct == flat,
      "concepts must be non-empty synonym groups over globally-distinct terms")
    val scored = bm25TermScores(df, idCol, textCol, flat, k1, b)
    // one pivot column per literal term ((doc, term) is unique after the
    // groupBy, so max() is just "the value if matched, else NULL")
    val pivoted = scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_terms_matched"),
      flat.zipWithIndex.map { case (t, i) =>
        max(when(col("term") === t, col("sc"))).as(s"__s$i")
      }: _*)
    // concept score = greatest over its synonyms' columns (NULLs
    // ignored, NULL iff no synonym matched — the AND filter's predicate)
    val offsets = concepts.scanLeft(0)(_ + _.size)
    val conceptScores = concepts.zip(offsets).map { case (g, off) =>
      val cols = g.indices.map(j => col(s"__s${off + j}"))
      if (cols.size == 1) cols.head else greatest(cols: _*)
    }
    val ranked = pivoted
      .where(conceptScores.map(_.isNotNull).reduceLeft(_ && _))
      .withColumn("bm25", conceptScores.reduceLeft(_ + _))
      .select(col("doc_id"), col("n_terms_matched"), col("bm25"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id"))
    ranked
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("n_terms_matched"), col("bm25"))
  }

  /** Top-k docs for a concept query, score rounded to 4 digits for the
    * oracle hash (same lattice rationale as [[bm25TopDocs]]). The global
    * window only sees docs passing EVERY concept; for corpus-scale
    * matching sets take `orderBy.limit` instead.
    */
  def bm25SynonymTopDocs(df: DataFrame, idCol: String, textCol: String,
      concepts: Seq[Seq[String]], k: Int): DataFrame =
    bm25SynonymScored(df, idCol, textCol, concepts)
      .where(col("rnk") <= k)
      .select(col("rnk"), col("doc_id"), col("n_terms_matched"),
        graft.functions.ExactMath.hashRound(col("bm25"), 4).as("bm25"))

  /** Corpus n-gram counts: top-k word n-grams by occurrence with
    * document frequency — the vocabulary/LM-statistics pass of a
    * training-data pipeline, exact (pure integer counts, no
    * transcendentals). The n-gram explosion is linear in token count
    * and partial-aggregates map-side; the top-k is a distributed
    * TakeOrderedAndProject (never a global window over the n-gram
    * table, whose cardinality approaches token count at large n).
    */
  def ngramCounts(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    require(n >= 2, s"use term counts for n=1; got n=$n")
    val toks = df.select(col(idCol).as("doc_id"),
      split(lower(col(textCol)), " ").as("__t"))
    // sequence(0, size-n) DESCENDS when size < n — short docs must yield
    // an empty gram list, not negative indices
    val gramExpr = expr(
      s"CASE WHEN size(__t) < $n THEN array() ELSE " +
        s"transform(sequence(0, size(__t) - $n), i -> " +
        (0 until n).map(j => s"__t[i + $j]").mkString("concat_ws(' ', ", ", ", ")") +
        ") END")
    val grams = toks.select(col("doc_id"), explode(gramExpr).as("ngram"))
    val counts = grams.groupBy("ngram").agg(
      count(lit(1)).as("n_occurrences"),
      count_distinct(col("doc_id")).as("n_docs"))
    val top = counts.orderBy(col("n_occurrences").desc, col("ngram")).limit(k)
    // rnk over the k-row result only (TakeOrderedAndProject upstream)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occurrences").desc, col("ngram"))
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("ngram"), col("n_occurrences"), col("n_docs"))
  }
}
