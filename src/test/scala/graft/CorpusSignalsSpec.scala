package graft

import org.apache.spark.sql.functions._

import graft.operators.stats.Profiling
import graft.operators.text.Compress

/** Dataset-card report and compression-ratio quality signal units. */
class CorpusSignalsSpec extends SparkSpecBase {
  import spark.implicits._

  test("heapsFit: hand-derived buckets, cumulative spine, and fold-exact fit") {
    import graft.operators.text.TextStats
    // ids 0..9, nBuckets=5 -> bucket = (id*5) div 10: {0,1}->0 ... {8,9}->4
    // types are C36 shingles: <5-word texts collapse to ONE whole-text
    // shingle; doc 8 (6 words) contributes TWO 5-word window shingles.
    // doc 5 duplicates doc 0's text -> its shingle is NOT new (the
    // first-occurrence convention at bucket grain).
    val docs = Seq(
      (0L, "a b"), (1L, "a c"),          // b0: 4 tok, new {"a b","a c"}=2
      (2L, "a b c"), (3L, "d"),          // b1: 4 tok, new {"a b c","d"}=2
      (4L, "d e e"), (5L, "a b"),        // b2: 5 tok, new {"d e e"}=1
      (6L, "f g"), (7L, null: String),   // b3: 2 tok, new {"f g"}=1
      (8L, "p q r s t u"), (9L, "h")     // b4: 7 tok, new {2 windows,"h"}=3
    ).toDF("doc_id", "text")
    val out = TextStats.heapsFit(docs, "doc_id", "text", nBuckets = 5)
      .orderBy("bucket").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3, 4))
    assert(out.map(_.getLong(out.head.fieldIndex("new_types"))).toSeq ==
      Seq(2L, 2L, 1L, 1L, 3L))
    assert(out.map(_.getLong(out.head.fieldIndex("cum_tokens"))).toSeq ==
      Seq(4L, 8L, 13L, 15L, 22L))
    assert(out.map(_.getLong(out.head.fieldIndex("cum_types"))).toSeq ==
      Seq(2L, 4L, 5L, 6L, 9L))
    // fit: re-derive with the operator's own fold sequence over the
    // hand-checked exact spine (the transcendental chain is what the
    // margin audit guards; here we pin the plumbing end to end)
    val pts = Seq((4L, 2L), (8L, 4L), (13L, 5L), (15L, 6L), (22L, 9L))
    val n = pts.length.toDouble
    def fold(f: (Long, Long) => Double): Double =
      pts.foldLeft(0.0) { case (acc, (ct, cv)) => acc + f(ct, cv) }
    val sx = fold((ct, _) => math.log(ct.toDouble))
    val sy = fold((_, cv) => math.log(cv.toDouble))
    val sxx = fold((ct, _) => math.log(ct.toDouble) * math.log(ct.toDouble))
    val sxy = fold((ct, cv) => math.log(ct.toDouble) * math.log(cv.toDouble))
    val syy = fold((_, cv) => math.log(cv.toDouble) * math.log(cv.toDouble))
    val denx = n * sxx - sx * sx; val deny = n * syy - sy * sy
    val num = n * sxy - sx * sy
    def hr4(v: Double): Double = math.floor(v * 10000.0 + 0.5) / 10000.0
    val r = out.head
    assert(r.getDouble(r.fieldIndex("heaps_beta")) == hr4(num / denx))
    assert(r.getDouble(r.fieldIndex("heaps_lnk")) ==
      hr4((sy - (num / denx) * sx) / n))
    assert(r.getDouble(r.fieldIndex("fit_corr")) ==
      hr4(num / (math.sqrt(denx) * math.sqrt(deny))))
    assert(r.getDouble(r.fieldIndex("heaps_beta")) > 0.0)
  }

  test("heapsFit: exact-copy corpus grows types only in the first bucket") {
    import graft.operators.text.TextStats
    val dup = (0L until 12L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val out = TextStats.heapsFit(dup, "doc_id", "text", nBuckets = 4)
      .orderBy("bucket").collect()
    val nw = out.map(r => r.getLong(r.fieldIndex("new_types"))).toSeq
    assert(nw.head == 1L && nw.tail.forall(_ == 0L),
      s"duplicated corpus must stop growing its type inventory, got $nw")
    val cv = out.map(r => r.getLong(r.fieldIndex("cum_types"))).toSeq
    assert(cv.forall(_ == 1L))
  }

  test("codeAudit: hand-counted symbols/keywords/indents; soup stays unflagged") {
    import graft.operators.text.TextStats
    val code = "a b \n def f(x): \n   return x ; \n"
    val soup = "w ((())) {{}} == <<>> ;;"
    val prose = "plain words only here"
    val df = Seq((1L, code), (2L, soup), (3L, prose)).toDF("doc_id", "text")
    val out = TextStats.codeAudit(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val c = byId(1L)
    assert(c.getLong(c.fieldIndex("n_chars")) == code.length.toLong)
    // symbols in "{}()[];=<>": ( ) :-excluded ; -> f(x): has ( ), "; " has ;
    assert(c.getLong(c.fieldIndex("n_symbol")) == 3L)
    assert(c.getLong(c.fieldIndex("kw_hits")) == 2L)  // def, return
    assert(c.getLong(c.fieldIndex("indent_lines")) == 1L)
    assert(c.getBoolean(c.fieldIndex("is_code")))
    val s = byId(2L)
    assert(s.getLong(s.fieldIndex("kw_hits")) == 0L)
    assert(s.getDouble(s.fieldIndex("symbol_share")) > 0.02)
    assert(!s.getBoolean(s.fieldIndex("is_code")),
      "symbol soup without keywords must not flag")
    val p = byId(3L)
    assert(p.getLong(p.fieldIndex("n_symbol")) == 0L &&
      !p.getBoolean(p.fieldIndex("is_code")))
  }

  test("vocabOverlapBySource: hand-derived pair, zero-overlap pairs absent") {
    val df = Seq(
      (1L, "a b c", "s1"), (2L, "b c d e", "s2"), (3L, "x", "s3"))
      .toDF("doc_id", "text", "source")
    val out = Profiling.vocabOverlapBySource(df, "source", "text").collect()
    assert(out.length == 1, s"only (s1,s2) shares vocab, got ${out.toSeq}")
    val r = out.head
    assert(r.getString(r.fieldIndex("src_a")) == "s1" &&
      r.getString(r.fieldIndex("src_b")) == "s2")
    assert(r.getLong(r.fieldIndex("n_a")) == 3L &&
      r.getLong(r.fieldIndex("n_b")) == 4L &&
      r.getLong(r.fieldIndex("n_common")) == 2L)
    assert(r.getDouble(r.fieldIndex("jaccard")) == 2.0 / 5.0)
    assert(r.getDouble(r.fieldIndex("containment")) == 2.0 / 3.0)
  }

  test("dup profile construction: corpus-wide dup mass lands on every owning source") {
    // "x" duplicated within s1 AND across s1/s2: all three copies count
    // as dup mass in their own sources; uniques don't.
    val df = Seq(
      (1L, "x", "s1"), (2L, "x", "s1"), (3L, "u1", "s1"),
      (4L, "x", "s2"), (5L, "u2", "s2"), (6L, "u3", "s2"))
      .toDF("doc_id", "text", "source")
    val st = df.groupBy("source", "text").agg(count(lit(1)).as("__c"))
    val tx = st.groupBy("text").agg(sum(col("__c")).as("__tc"))
    val got = st.join(tx, "text")
      .groupBy("source").agg(
        sum(col("__c")).as("n_docs"),
        sum(when(col("__tc") > 1L, col("__c")).otherwise(0L)).as("n_dup_docs"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("s1") == ((3L, 2L)) && got("s2") == ((3L, 1L)))
  }

  test("corpusReport computes exact metrics on a crafted corpus") {
    val df = Seq(
      (1L, "a b c", "s1"), (2L, "a b c", "s1"), // planted exact dups (mass 2)
      (3L, "d e", "s2"), (4L, null: String, "s2"))
      .toDF("doc_id", "text", "source")
    val m = Profiling.corpusReport(df, "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_docs") == 4.0 && m("n_with_text") == 3.0)
    assert(m("n_sources") == 2.0 && m("n_distinct_texts") == 2.0)
    assert(m("n_dup_docs") == 2.0) // both copies count as duplicate mass
    assert(m("total_words") == 8.0 && m("total_chars") == 13.0)
    assert(m("mean_words") == 8.0 / 3.0) // one IEEE division of exact ints
  }

  test("corpusReport with zero duplicates reports n_dup_docs = 0") {
    val df = Seq((1L, "x y", "s"), (2L, "z", "s")).toDF("doc_id", "text", "source")
    val m = Profiling.corpusReport(df, "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_dup_docs") == 0.0)
  }

  test("deflateLen is deterministic, null-safe, and empty text has no ratio") {
    val df = Seq((1L, "spark " * 50), (2L, ""), (3L, null: String)).toDF("id", "text")
    val a = Compress.report(df, "id", "text").orderBy("id").collect()
    val b = Compress.report(df, "id", "text").orderBy("id").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a(0).getLong(1) == 300L && a(0).getLong(2) > 0L && !a(0).isNullAt(3))
    assert(a(1).getLong(1) == 0L && a(1).isNullAt(3)) // empty: NULL ratio, not 0-perfect
    assert(a(2).isNullAt(1) && a(2).isNullAt(3)) // null text propagates
  }

  test("compression ratio orders repetitive < prose < hex noise") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = Seq(
      (1L, "ab " * 800),
      (2L, "the quick brown fox jumps over the lazy dog and then walks on by " * 36),
      (3L, (0 until 150).map(i => hex(s"n$i")).mkString))
      .toDF("id", "text")
    val r = Compress.report(df, "id", "text").orderBy("id")
      .select("compress_ratio").collect().map(_.getDouble(0))
    assert(r(0) < r(1) && r(1) < r(2), r.mkString(","))
    assert(r(0) < 0.05 && r(2) > 0.4)
  }

  test("readability: hand-counted Flesch components and score") {
    val df = Seq(
      (1L, "the cat sat."),           // 3 words, 1 sentence, 3 vowel groups
      (2L, "aa bee! cee? dee dee."),  // 5 words, 3 sentence runs, 5 groups
      (3L, "xyz qrs"),               // y counts as a vowel; floors at 1 sentence
      (4L, null: String))            // dropped
      .toDF("doc_id", "text")
    val got = graft.operators.text.TextStats.readability(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.length == 3)
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3)) == ((3L, 1L, 3L)))
    val exp1 = math.rint((206.835 - 1.015 * 3.0 - 84.6 * 1.0) * 1e4) / 1e4
    assert(math.abs(got(0).getDouble(4) - exp1) < 1e-9, got(0).getDouble(4))
    assert((got(1).getLong(1), got(1).getLong(2), got(1).getLong(3)) == ((5L, 3L, 5L)))
    assert((got(2).getLong(1), got(2).getLong(2), got(2).getLong(3)) == ((2L, 1L, 1L)))
  }

  test("q_source_cap: at most 3 per source, scores non-increasing, window parity") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_source_cap")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.values.forall(_.length <= 3))
    bySource.values.foreach { rs =>
      val scores = rs.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // parity with the plain window formulation (the heap-vs-window gate)
    val docs = sources.Snapshot(spark, sf()).documents.where(col("text").isNotNull)
    val scored = docs.select(col("doc_id"), col("source"))
      .join(graft.operators.text.TextStats.quality(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality_score")), "doc_id")
      .where(col("quality_score").isNotNull)
    val w = Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val want = scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("source", "doc_id", "quality_score")
      .collect().map(_.toString).sorted.toSeq
    assert(rows.map(_.toString).sorted.toSeq == want)
  }

  test("gopherRules: each rule trips on its planted violator, clean doc keeps") {
    import graft.operators.text.TextStats
    val clean = (Seq.fill(48)("word") ++ Seq("the", "is")).mkString(" ") // 50 words
    val short = Seq.fill(10)("word").mkString(" ")
    val zh = Seq.fill(50)("的").mkString(" ")
    val bullets = "- alpha the is\n- beta\n- gamma"
    val ellipsis = "one the is...\ntwo...\nthree words here now ok"
    val df = Seq(
      (1L, clean), (2L, short), (3L, zh), (4L, bullets), (5L, ellipsis)
    ).toDF("doc_id", "text")
    val rows = TextStats.gopherRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Boolean =
      rows(id).getBoolean(rows(id).fieldIndex(name))
    // clean: 50 words, mean len (48*4 + 3 + 2)/50 = 3.94, all pass
    assert(rows(1L).getLong(1) == 50L)
    assert(rows(1L).getDouble(2) == (48 * 4 + 3 + 2).toDouble / 50.0)
    assert(flag(1L, "keep"))
    assert(!flag(2L, "r_word_count") && !flag(2L, "keep"))
    // zh: zero alpha words, mean word len 1, zero stopwords
    assert(rows(3L).getDouble(3) == 0.0)
    assert(!flag(3L, "r_alpha_words") && !flag(3L, "r_mean_word_len") &&
      !flag(3L, "r_stopwords"))
    // bullets: every line starts with "- " -> ratio 1 > 0.9
    assert(!flag(4L, "r_bullets") && flag(4L, "r_ellipsis"))
    // ellipsis: 2 of 3 lines end with "..." -> ratio 2/3 > 0.3
    assert(!flag(5L, "r_ellipsis") && flag(5L, "r_bullets"))
  }

  test("cohensKappa: perfect, hand 2x2, zero-kappa, and degenerate cases") {
    import graft.operators.stats.Stats
    def kappa(pairs: Seq[(String, String)]) =
      Stats.cohensKappa(pairs.toDF("a", "b"), "a", "b").collect().head
    // perfect agreement across 3 classes: kappa exactly 1
    val perfect = kappa(Seq(("x", "x"), ("y", "y"), ("z", "z")))
    assert(perfect.getDouble(4) == 1.0)
    // classic 2x2: po=0.7, pe=0.5, kappa=(0.7-0.5)/0.5
    val pairs = Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(10)(("y", "n")) ++ Seq.fill(5)(("n", "y"))
    val r = kappa(pairs)
    assert((r.getLong(0), r.getLong(1)) == ((50L, 35L)))
    assert(r.getDouble(2) == 35.0 / 50.0 && r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == (35.0 / 50.0 - 0.5) / (1.0 - 0.5))
    // prediction class absent from actuals: spine covers the union
    val asym = kappa(Seq(("a", "b"), ("b", "b")))
    assert(asym.getDouble(3) == 0.5 && asym.getDouble(4) == 0.0)
    // single class both sides: pe = 1 -> NULL kappa
    val degen = kappa(Seq(("s", "s"), ("s", "s")))
    assert(degen.isNullAt(4))
  }

  test("poissonBootstrapCi: constant column collapses the CI to the constant") {
    import graft.operators.sample.Bootstrap
    val df = (1L to 200L).map(i => (i, 7.25)).toDF("k", "v")
    val r = Bootstrap.poissonBootstrapCi(df, "k", "v", reps = 16).collect().head
    assert(r.getLong(0) == 200L && r.getDouble(1) == 7.25)
    assert(r.getLong(2) == 16L)
    // every resample averages the same constant -> all three selections exact
    assert(r.getDouble(3) == 7.25 && r.getDouble(4) == 7.25 && r.getDouble(5) == 7.25)
  }

  test("poissonBootstrapCi: CI brackets the mean, ordered, and is run-stable") {
    import graft.operators.sample.Bootstrap
    val df = (1L to 500L).map(i => (i, (i % 100).toDouble)).toDF("k", "v")
    val a = Bootstrap.poissonBootstrapCi(df, "k", "v", reps = 64).collect().head
    val b = Bootstrap.poissonBootstrapCi(df, "k", "v", reps = 64).collect().head
    assert(a == b) // md5-seeded: bit-identical across runs
    val (lo, med, hi) = (a.getDouble(3), a.getDouble(4), a.getDouble(5))
    assert(lo <= med && med <= hi)
    // a 2.5–97.5% interval over 500 near-uniform rows must bracket the mean
    assert(lo < a.getDouble(1) && a.getDouble(1) < hi)
    // the weight law: resample means stay within a plausible band of the
    // population mean (Poisson(1) weights, sd ~ sigma/sqrt(n) ~ 1.3)
    assert(math.abs(med - a.getDouble(1)) < 10.0)
  }

  test("permutationTest: shifted cohorts score small p, identical cohorts large p") {
    import graft.operators.sample.Bootstrap
    // strongly shifted: A ~ [1000, 1100), B ~ [0, 100) -> no random
    // relabeling should reach the observed gap
    val shifted = ((1L to 100L).map(i => (i, "A", 1000.0 + i)) ++
      (101L to 200L).map(i => (i, "B", (i - 100).toDouble)))
      .toDF("k", "g", "v")
    val rs = Bootstrap.permutationTest(shifted, "k", "v", "g", "A", "B", 32)
      .collect().head
    assert((rs.getLong(0), rs.getLong(1)) == ((100L, 100L)))
    assert(rs.getLong(3) == 32L && rs.getLong(4) == 0L)
    assert(rs.getDouble(5) == 1.0 / 33.0)
    // exactly matched cohorts (mod 5 is coprime with the parity split,
    // so both groups hold each residue 40 times): obs_diff is exactly 0
    // and EVERY permuted |diff| >= 0 -> p is exactly 1
    val same = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) "A" else "B", (i % 5).toDouble)).toDF("k", "g", "v")
    val rSame = Bootstrap.permutationTest(same, "k", "v", "g", "A", "B", 32)
      .collect().head
    assert(rSame.getDouble(2) == 0.0 && rSame.getDouble(5) == 1.0)
    // determinism: bit-identical across runs
    val again = Bootstrap.permutationTest(same, "k", "v", "g", "A", "B", 32)
      .collect().head
    assert(rSame == again)
  }

  test("mcnemar: hand-derived chi2; no-disagreement degenerates to NULL") {
    import graft.operators.stats.Stats
    // concordant 10, a-only 9, b-only 1: chi2 = 64/10
    val df = (Seq.fill(10)((true, true)) ++ Seq.fill(9)((true, false)) ++
      Seq.fill(1)((false, true))).toDF("a", "b")
    val r = Stats.mcnemar(df, "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((20L, 9L, 1L)))
    assert(r.getDouble(3) == 64.0 / 10.0 && r.getBoolean(4))
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    val r2 = Stats.mcnemar(agree, "a", "b").collect().head
    assert(r2.getLong(0) == 2L && r2.isNullAt(3) && r2.isNullAt(4))
  }
}
