package graft.operators.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass per-column data profiling — the "describe this snapshot"
  * operator every ingestion pipeline runs before trusting a feed
  * (row count, null count, exact distinct cardinality, min/max).
  *
  * Shape, exact path: TWO aggregation passes whose 1-row results meet
  * in a trivial cross join, then a shuffle-free `inline` unpivot.
  * Pass 1 folds null counts + min/max with no grouping key (no sort,
  * whole-stage codegen); pass 2 computes every `count(DISTINCT cᵢ)`
  * through Catalyst's single Expand (×(k+1) row replication) into a
  * pure-count HashAggregate. They are deliberately NOT one `agg`: a
  * combined aggregate rides the min/max buffers (strings — not
  * hash-aggregable) through the Expand's value-keyed aggregation,
  * demoting the whole 1M-row pipeline to SortAggregate — measured 2.4×
  * slower than the two passes together at sf0.1 (2.8 s vs 1.2 s +
  * 0.3 s; ProfileProfile). For 100 TB feeds where exact distincts (or
  * a second scan) are too hot, `approx = true` swaps in
  * `approx_count_distinct` (HLL): no Expand, ONE single-pass
  * aggregation over one scan — the estimate path is spec-checked
  * against the exact path at small SF, while the exact path is the
  * oracle-gated default.
  *
  * min/max never do arithmetic (order-statistics are exactly
  * reproducible for every type), but their cross-engine RENDERING is
  * not: doubles stringify differently between engines, so min/max are
  * emitted in three typed column families instead of one string —
  * `min_int`/`max_int` (integral types, plus timestamps as epoch
  * micros and dates as epoch days — exact integers in any engine),
  * `min_dbl`/`max_dbl` (floating columns, the double passed through
  * untouched), `min_str`/`max_str` (strings). Families that don't
  * apply are NULL.
  */
object Profiling {

  def columnProfile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val schema = df.schema
    val nullInt = lit(null).cast("long")
    val nullDbl = lit(null).cast("double")
    val nullStr = lit(null).cast("string")
    val perCol = cols.map { name =>
      val dt = schema(name).dataType
      val c = col(name)
      val (mnI, mxI, mnD, mxD, mnS, mxS) = dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          (min(c).cast("long"), max(c).cast("long"), nullDbl, nullDbl, nullStr, nullStr)
        case TimestampType | TimestampNTZType =>
          // NTZ casts to instant under the UTC session, so epoch micros
          // are identical either way (Snapshot reads parquet as NTZ)
          (min(unix_micros(c.cast(TimestampType))),
            max(unix_micros(c.cast(TimestampType))), nullDbl, nullDbl, nullStr, nullStr)
        case DateType =>
          (min(unix_date(c)).cast("long"), max(unix_date(c)).cast("long"),
            nullDbl, nullDbl, nullStr, nullStr)
        case FloatType | DoubleType =>
          (nullInt, nullInt, min(c).cast("double"), max(c).cast("double"), nullStr, nullStr)
        case StringType =>
          (nullInt, nullInt, nullDbl, nullDbl, min(c), max(c))
        case other =>
          throw new IllegalArgumentException(
            s"columnProfile: unsupported type $other for column $name")
      }
      (Seq(
        count(c).as(s"__nn_$name"),
        mnI.as(s"__mni_$name"), mxI.as(s"__mxi_$name"),
        mnD.as(s"__mnd_$name"), mxD.as(s"__mxd_$name"),
        mnS.as(s"__mns_$name"), mxS.as(s"__mxs_$name")),
        (if (approx) approx_count_distinct(c) else countDistinct(c))
          .as(s"__nd_$name"))
    }
    val statExprs = count(lit(1)).as("__n") +: perCol.flatMap(_._1)
    val ndExprs = perCol.map(_._2)
    val one =
      if (approx)
        // single pass, single scan: HLL buffers need no Expand
        df.agg((statExprs ++ ndExprs).head, (statExprs ++ ndExprs).tail: _*)
      else
        df.agg(statExprs.head, statExprs.tail: _*)
          .crossJoin(df.agg(ndExprs.head, ndExprs.tail: _*))
    val rows = cols.map { name =>
      struct(
        lit(name).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$name")).as("n_nulls"),
        col(s"__nd_$name").as("n_distinct"),
        col(s"__mni_$name").as("min_int"), col(s"__mxi_$name").as("max_int"),
        col(s"__mnd_$name").as("min_dbl"), col(s"__mxd_$name").as("max_dbl"),
        col(s"__mns_$name").as("min_str"), col(s"__mxs_$name").as("max_str"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** Dataset-card metrics for a text corpus — the one-row-per-metric
    * summary a curation run publishes next to the shards (HuggingFace
    * dataset-card numbers; the corpus-grain sibling of the reference's
    * procurement `insights_summary`). TWO aggregation passes (corpus
    * totals + the duplicate-mass groupBy) meeting in a 1×1 cross join,
    * then a map-side unpivot — no metric touches more than one shuffle.
    * Every value is an exact BIGINT cast to double except `mean_words`,
    * ONE IEEE division of two exact integers (the q_gini hash rule).
    */
  def corpusReport(df: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val t = col(textCol)
    val base = df.agg(
      count(lit(1)).cast("double").as("n_docs"),
      count(t).cast("double").as("n_with_text"),
      countDistinct(col(sourceCol)).cast("double").as("n_sources"),
      // size(split(NULL)) is -1 under legacy non-ANSI — gate to non-null
      // so the sum skips null texts exactly like the SQL mirror's SUM
      sum(when(t.isNotNull, size(split(t, " "))).cast("long")).cast("double").as("total_words"),
      sum(length(t).cast("long")).cast("double").as("total_chars"),
      countDistinct(md5(t)).cast("double").as("n_distinct_texts"))
    // duplicate mass: total docs sharing their text with at least one other
    val dups = df.where(t.isNotNull)
      .groupBy(md5(t).as("__h")).agg(count(lit(1)).as("__c"))
      .where(col("__c") > 1)
      .agg(coalesce(sum(col("__c")), lit(0L)).cast("double").as("n_dup_docs"))
    val wide = base.crossJoin(dups)
      .withColumn("mean_words", col("total_words") / col("n_with_text"))
    val metrics = Seq("mean_words", "n_distinct_texts", "n_docs", "n_dup_docs",
      "n_sources", "n_with_text", "total_chars", "total_words")
    wide.unpivot(Array.empty, metrics.map(col).toArray, "metric", "value")
      .orderBy("metric")
  }

  /** Per-source lexical diversity (C74) — the vocabulary-health card
    * next to [[corpusReport]]'s volume metrics: type–token ratio and
    * hapax share per source (a crawler stuck on templated pages shows a
    * collapsing TTR; a glossary-like source shows an inflated hapax
    * share). ONE explode pass to the (source, word) count table (the
    * collocations aggregated-spine shape — margins never rescan the
    * corpus); whitespace tokens, empty tokens counted identically in
    * both engines (the gopher split convention). n_words/n_types/
    * n_hapax are exact BIGINTs; the two ratios are ONE exact-int
    * division each ⇒ hash UNROUNDED (the q_gini protocol).
    */
  def lexicalDiversityBySource(df: DataFrame, sourceCol: String, textCol: String): DataFrame =
    diversityFromWordCounts(wordCounts(df, sourceCol, textCol))

  /** `(source, word, c)` counts — the associative MONITORING STATE of
    * [[lexicalDiversityBySource]] (D31): counts merge by plain addition
    * ([[mergeWordCounts]] — the miCells/categoryCounts shape), so a
    * streaming monitor folds microbatches into the standing vocabulary
    * table and derives the diversity card on demand. NOT idempotent
    * (the D20 partition contract). Hapax status is a PROPERTY OF THE
    * MERGED STATE, not of any batch — a word seen once in two separate
    * batches is correctly non-hapax after the merge.
    */
  def wordCounts(df: DataFrame, sourceCol: String, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(sourceCol).cast("string").as("source"),
        explode(split(col(textCol), " ")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("c"))

  /** Merge two [[wordCounts]] states by count addition. */
  def mergeWordCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("source", "word").agg(sum(col("c")).as("c"))

  /** Cross-source vocabulary overlap (C88) — the slice-similarity /
    * contamination screen between corpus sources: per ordered source
    * pair, shared-vocabulary count, Jaccard, and containment
    * (common / min vocab). Rides the [[wordCounts]] vocabulary table
    * (C74/D31's shared tokenization — ONE definition): the distinct
    * (source, word) spine self-joins on `word` with `src_a < src_b`,
    * so the join fan-out per word is bounded by the SOURCE count
    * (≤ nSources² output pairs per word, never a row-grain product) and
    * the output is ≤ nSources² rows at any corpus size. Exact counts;
    * jaccard/containment ONE exact-int division each ⇒ hash-safe
    * UNROUNDED (the B56 rule). Pair membership orders by the sources'
    * raw string comparison (ASCII sources — both engines agree; a
    * non-ASCII source column would need a collation pin).
    */
  def vocabOverlapBySource(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val vocab = wordCounts(df, sourceCol, textCol).select("source", "word")
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("n"))
    val pairs = vocab.as("a")
      .join(vocab.as("b"),
        col("a.word") === col("b.word") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_common"),
        (col("n_common").cast("double")
          / (col("n_a") + col("n_b") - col("n_common")).cast("double")).as("jaccard"),
        (col("n_common").cast("double")
          / least(col("n_a"), col("n_b")).cast("double")).as("containment"))
  }

  /** The diversity report from a pre-aggregated word-count state — see
    * [[lexicalDiversityBySource]] for the full contract.
    */
  def diversityFromWordCounts(wc: DataFrame): DataFrame =
    wc.groupBy("source")
      .agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_words"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_words").cast("double"))
          .as("type_token_ratio"),
        (col("n_hapax").cast("double") / col("n_types").cast("double"))
          .as("hapax_share"))
      .orderBy("source")

  /** Key-skew diagnostic — the measurement that decides between a plain
    * shuffle, salting (SURVEY §4's measured 3× win under a 50%-hot key)
    * and AQE skew splitting BEFORE a job burns a wall-clock hour on one
    * straggler task: per-key counts reduce at data grain (one shuffle),
    * then one 1-row aggregate. `top1_share` is the hot-key fraction;
    * `skew_ratio` = max/mean key size (1.0 = perfectly uniform). Both
    * are single exact IEEE divisions of exact BIGINTs (hash-safe
    * unrounded, the B56 rule).
    */
  def keySkew(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keySkew needs at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("__n")).as("max_key_rows"))
      .select(
        col("n_rows"), col("n_keys"), col("max_key_rows"),
        (col("max_key_rows").cast("double") / col("n_rows").cast("double"))
          .as("top1_share"),
        // both factors cast to double BEFORE multiplying: at the corpus
        // sizes this diagnostic targets, max_key_rows * n_keys can pass
        // Long.MaxValue and a BIGINT multiply would wrap silently
        ((col("max_key_rows").cast("double") * col("n_keys").cast("double")) /
          col("n_rows").cast("double")).as("skew_ratio"))
  }
}
