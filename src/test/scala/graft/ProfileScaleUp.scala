package graft

// Scale-up smoke profiler (test scope, not shipped):
//   sbt "Test/runMain graft.ProfileScaleUp [factor]"
// Amplifies the sf0.1 documents/orders tables FACTOR× in /tmp (shifted
// ids, planted exact duplicates) and times the operators whose plans
// were rewritten for scale this round — evidence that their costs grow
// ~linearly with input instead of hitting a single-task wall.
object ProfileScaleUp {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val factor = args.headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.local(32)
    val sn = graft.sources.Snapshot(spark, "/root/testdata/sf0.1")

    val tmp = java.nio.file.Files.createTempDirectory("graft_scaleup").toFile
    tmp.deleteOnExit()
    // each copy shifts ids into its own range; text unchanged -> every doc
    // has factor-1 planted exact duplicates (worst-ish case for dedup)
    val docs0 = sn.documents
    val amplifiedDocs = (0 until factor)
      .map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
      .reduce(_ unionAll _)
    amplifiedDocs.write.mode("overwrite").parquet(s"$tmp/documents")
    val orders0 = sn.orders
    val amplifiedOrders = (0 until factor)
      .map(i => orders0.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L)))
      .reduce(_ unionAll _)
    amplifiedOrders.write.mode("overwrite").parquet(s"$tmp/orders")
    val docs = spark.read.parquet(s"$tmp/documents")
    val orders = spark.read.parquet(s"$tmp/orders")

    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
        .agg(sum("h"), count(lit(1))).head().getLong(1)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scaleup x$factor] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("docs count")(docs.count())
    time("exact dedup")(force(graft.operators.dedup.ExactDedup.groups(docs, "doc_id", "text")))
    time("minhash candidatePairs")(
      force(graft.operators.dedup.MinHashDedup.candidatePairs(docs, "doc_id", "text")))
    time("ngram stats")(
      force(graft.operators.dedup.NGramJaccardDedup.stats(docs, "doc_id", "text")))
    time("deciles (boundary bcast)")(
      force(graft.operators.quantile.Quantiles
        .withNtile(orders, "o_totalprice", "o_orderkey", 10, "decile")
        .groupBy("decile").agg(count(lit(1)).as("n"))))
    time("token packing")(
      force(graft.operators.sample.Packing
        .assignShards(docs.where(col("text").isNotNull), "doc_id",
          size(split(col("text"), " ")), 4096L)
        .groupBy("shard_id").agg(count(lit(1)).as("n"))))
    time("token chunking")(
      force(graft.operators.text.Chunking
        .chunkByTokens(docs, "doc_id", "text", 32, 8)
        .groupBy().agg(count(lit(1)).as("n"), sum("n_chunk_tokens").as("t"))))
    time("chunk->pack composition")(
      force {
        val chunks = graft.operators.text.Chunking
          .chunkByTokens(docs, "doc_id", "text", 64)
          .select(concat(col("doc_id").cast("string"), lit("_"),
            col("chunk_idx").cast("string")).as("ck"), col("n_chunk_tokens"))
        graft.operators.sample.Packing
          .assignShards(chunks, "ck", col("n_chunk_tokens"), 2048L)
          .groupBy("shard_id").agg(count(lit(1)).as("n"))
      })
    time("balanced mix")(
      force(graft.operators.sample.Mixing.balancedSample(docs, "doc_id", "lang")
        .groupBy("lang").agg(count(lit(1)).as("n"))))
    // embeddings scale-up: amplify in memory (vectors unchanged — the
    // quantize path is elementwise, only row count matters)
    val emb0 = sn.embeddings
    val emb = (0 until factor)
      .map(i => emb0.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L)))
      .reduce(_ unionAll _)
    time("int8 quantize fidelity")(
      force(graft.operators.ann.Quantize.fidelity(emb, "vec_id", "embedding")
        .groupBy().agg(count(lit(1)).as("n"), min("cos_fidelity").as("worst"))))
    time("deciles by group")(
      force(graft.operators.quantile.Quantiles
        .withNtileByGroup(orders, "o_orderpriority", "o_totalprice", "o_orderkey", 10, "d")
        .groupBy("o_orderpriority", "d").agg(count(lit(1)).as("n"))))
    time("span dedup (C4 lines)")(
      force(graft.operators.dedup.LineDedup
        .cleanSpans(docs, "doc_id", "text")
        .select(col("doc_id"), length(col("cleaned")).as("len"), col("n_kept"))))
    time("interval join (pt-in-iv)")(
      force {
        val iv = orders.where(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey").as("iv_key"), col("o_orderdate").as("start_d"),
            date_add(col("o_orderdate"), 7).as("end_d"))
        graft.operators.join.IntervalJoin
          .pointInInterval(orders.select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
            "o_orderdate", iv, "start_d", "end_d")
          .groupBy("iv_key").agg(count(lit(1)).as("n"))
      })
    time("overlap join")(
      force {
        val a = orders.where(col("o_orderkey") % 13 === 0)
          .select(col("o_orderkey").as("a_key"), col("o_orderdate").as("a_start"),
            date_add(col("o_orderdate"), 7).as("a_end"))
        val b = orders.where(col("o_orderkey") % 13 === 7)
          .select(col("o_orderkey").as("b_key"), col("o_orderdate").as("b_start"),
            date_add(col("o_orderdate"), 10).as("b_end"))
        graft.operators.join.IntervalJoin
          .overlapJoin(a, "a_start", "a_end", b, "b_start", "b_end")
          .groupBy("a_key").agg(count(lit(1)).as("n"))
      })
    time("z-order (2 cols)")(
      force {
        val z = graft.operators.layout.Layout
          .zOrder(orders.select(col("o_totalprice"), col("o_custkey")),
            Seq("o_totalprice", "o_custkey"), nPartitions = 32)
        z.groupBy().agg(count(lit(1)).as("n"))
      })
    time("sign projection 64->16")(
      force(graft.operators.ann.Projection
        .project(emb, "embedding", 64, 16, "graft5")
        .groupBy().agg(count(lit(1)).as("n"), sum("p0").as("s0"))))
    time("asof bucketed(64)")(
      force {
        // amplified orders as the event stream: key = custkey mod small
        // (few huge keys — the operator's contract regime)
        val ev = orders.select((col("o_custkey") % 8).as("k"),
          col("o_orderdate").cast("timestamp").as("ts"), col("o_orderkey"))
        graft.operators.asof.AsOfJoin
          .latestPriorTsBucketed(ev.where(col("o_orderkey") % 3 =!= 0),
            ev.where(col("o_orderkey") % 3 === 0), "k", "ts", "ts", "m", 64)
          .groupBy("k").agg(count(lit(1)).as("n"), count(col("m")).as("matched"))
      })

    time("regression (exact stats)")(
      force(graft.operators.stats.Stats
        .regression(orders.withColumn("b", pmod(col("o_custkey"), lit(16))),
          "o_totalprice", "o_custkey", Seq("b"))))
    time("column profile (exact)")(
      force(graft.operators.stats.Profiling
        .columnProfile(orders, Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority"))))
    time("column profile (approx)")(
      force(graft.operators.stats.Profiling
        .columnProfile(orders, Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority"), approx = true)))
    time("skyline (bucketed x)")(
      force(graft.operators.stats.Skyline
        .frontier2D(orders.withColumn("b", pmod(col("o_custkey"), lit(1000))),
          "b", "o_totalprice")))

    // ---- round-7 quality/maintenance operators ---------------------------
    time("constraint audit (3 checks)")(
      force(graft.operators.quality.Constraints.audit(Seq(
        graft.operators.quality.Constraints.Unique("u", orders, Seq("o_orderkey")),
        graft.operators.quality.Constraints.Referential(
          "fk", orders, "o_custkey", sn.customer, "c_custkey"),
        graft.operators.quality.Constraints.InRange(
          "r", orders, "o_totalprice", 0.0, 1e6)))))
    time("snapshot diff (fingerprint)")(
      force {
        val v1 = orders.where(col("o_orderkey") % 3 =!= 0)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        val v2 = orders.where(col("o_orderkey") % 5 =!= 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")).as("o_totalprice"),
            col("o_orderstatus"))
        graft.operators.quality.Reconcile
          .diff(v1, v2, Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
          .groupBy("status").agg(count(lit(1)).as("n"))
      })
    time("incremental agg merge")(
      force {
        val cutoff = lit("1998-01-01").cast("timestamp")
        val base = graft.operators.agg.IncrementalAgg.aggregate(
          orders.where(col("o_orderdate") < cutoff),
          Seq("o_orderpriority"), col("o_totalprice"))
        graft.operators.agg.IncrementalAgg.merge(base,
          orders.where(col("o_orderdate") >= cutoff),
          Seq("o_orderpriority"), col("o_totalprice"))
      })
    time("mad audit")(
      force(graft.operators.quantile.Outliers
        .madAudit(orders, "o_orderpriority", "o_totalprice")))
    time("drift psi")(
      force {
        val cutoff = lit("1998-01-01").cast("timestamp")
        graft.operators.stats.Drift.psiByBins(
          orders.where(col("o_orderdate") < cutoff),
          orders.where(col("o_orderdate") >= cutoff), "o_totalprice", 10)
      })
    time("interval merge")(
      force(graft.operators.temporal.Islands.mergeIntervals(
        orders.where(col("o_orderkey") % 97 === 0)
          .select(col("o_orderpriority"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("ws"),
            date_add(to_date(col("o_orderdate")), 3).as("we")),
        Seq("o_orderpriority"), "ws", "we", "o_orderkey")))
    time("weighted median")(
      force(graft.operators.quantile.Quantiles.weightedQuantile(
        orders, Seq("o_orderpriority"), "o_totalprice",
        // synthetic positive integer weight derived from the key keeps
        // the value-grain aggregation honest without another table
        "o_orderkey", 50, "wm")))
    time("gini by segment")(
      force {
        val perCust = orders.where(col("o_custkey").isNotNull)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        graft.operators.stats.Stats.giniByGroup(
          perCust.withColumn("seg", col("o_custkey") % 5),
          Seq("seg"), "n_orders", "o_custkey")
      })
    time("two-proportion z")(
      force(graft.operators.stats.Stats.twoProportionZ(
        orders.select(col("o_orderpriority"),
          (col("o_orderstatus") === "F").cast("int").as("su")),
        "o_orderpriority", "su")))
    time("benford digits")(
      force(graft.operators.stats.Drift.benfordByDigit(orders, "o_totalprice", 6)))
    time("rolling trend (frame 20)")(
      force(graft.operators.stats.Stats.rollingTrend(
        orders.withColumn("g", col("o_custkey") % 64)
          .withColumn("ts", col("o_orderdate").cast("timestamp")),
        "g", "ts", "o_orderkey", "o_totalprice", 20)))
    time("inverted index build+AND")(
      force {
        val p = graft.operators.text.InvertedIndex.build(docs, "doc_id", "text", 64)
        graft.operators.text.InvertedIndex.searchAnd(p, Seq("spark", "stream"))
      })
    time("bpe encode+count")(
      force(docs.where(col("text").isNotNull)
        .select(col("doc_id"),
          graft.operators.text.Bpe.nTokens(col("text")).cast("long").as("n"))
        .groupBy().agg(sum("n").as("t"), count(lit(1)).as("n"))))
    time("bpe chunkIds (64/8)")(
      force(graft.operators.text.Bpe.chunkIds(docs, "doc_id", "text", 64, 8)
        .groupBy().agg(count(lit(1)).as("n"), sum("n_chunk_tokens").as("t"))))
    time("pii audit")(
      force {
        // documents text + a synthesized contact tail so every pattern fires
        val blob = docs.where(col("text").isNotNull).select(col("doc_id"),
          concat(col("text"), lit(" phone 25-989-741-2988 card 4111111111111111 ip 10.0.0."),
            (col("doc_id") % 300).cast("string")).as("blob"))
        graft.operators.text.TextStats.piiAudit(blob, "doc_id", "blob")
          .select(col("doc_id"), col("n_redactions"), col("n_cc_valid"), col("n_ipv4_valid"))
      })
    time("categorical drift (top-20)")(
      force(graft.operators.stats.Drift.psiByCategory(
        orders.where(col("o_orderkey") % 2 === 0),
        orders.where(col("o_orderkey") % 2 === 1), "o_orderpriority", 20)))
    time("ks drift (40 bins)")(
      force(graft.operators.stats.Drift.ksByBins(
        orders.where(col("o_orderkey") % 2 === 0),
        orders.where(col("o_orderkey") % 2 === 1), "o_totalprice", 40)))
    time("hhi by priority")(
      force(graft.operators.stats.Stats.hhiByGroup(
        orders.where(col("o_custkey").isNotNull), Seq("o_orderpriority"),
        "o_custkey", col("o_totalprice"))))
    time("corpus report")(
      force(graft.operators.stats.Profiling.corpusReport(docs, "text", "source")))
    time("compress ratio")(
      force(graft.operators.text.Compress.report(
        docs.where(col("text").isNotNull), "doc_id", "text")
        .groupBy().agg(count(lit(1)).as("n"), sum("deflated_bytes").as("d"))))
    time("url canonical dedup")(
      force(graft.operators.text.UrlTools.dedupByCanonical(
        docs.select(concat(lit("HTTP://Example"), (col("doc_id") % 97).cast("string"),
          lit(".COM:80/p"), (col("doc_id") % 1009).cast("string"),
          lit("?utm_source=x&id="), (col("doc_id") % 13).cast("string"),
          lit("#f")).as("url")), "url")))
    // ---- round-10 operators ----
    time("prefix-filter pairs (0.6)")(
      force(graft.operators.dedup.PrefixFilter
        .duplicatePairs(docs, "doc_id", "text", 0.6)
        .groupBy().agg(count(lit(1)).as("n"))))
    time("incremental near-dup probe")(
      force {
        // standing 90% corpus store probed by the 10% batch — the
        // steady-state per-batch cost INCLUDES the store build here
        // (the hermetic shape); production amortizes the build
        val d = docs.where(col("text").isNotNull)
        val store = graft.operators.dedup.MinHashIndex
          .build(d.where(col("doc_id") % 10 =!= 0), "doc_id", "text")
        try graft.operators.dedup.MinHashIndex
          .statsExact(store, d.where(col("doc_id") % 10 === 0), "doc_id", "text", 0.5)
          .groupBy().agg(count(lit(1)).as("n"), sum("n_matches").as("m"))
        finally { store.shingleSets.unpersist(false); () }
      })
    time("perplexity (bigram LM)")(
      force(graft.operators.text.LangModel
        .scoreNll(docs, docs.where(col("doc_id") % 4 === 0), "doc_id", "text")
        .groupBy().agg(count(lit(1)).as("n"), sum("n_oov").as("o"))))
    time("bpe train (12 merges)")(
      force {
        val m = graft.operators.text.Bpe.train(docs, "text", 12)
        import spark.implicits._
        m.map(_._1).toDF("l").groupBy().agg(count(lit(1)).as("n"))
      })
    time("html extract + quality")(
      force {
        val html = docs.where(col("text").isNotNull).select(col("doc_id"),
          concat(lit("<html><body><p>"), col("text"),
            lit("</p><script>var x = 1;</script></body></html>")).as("h"))
        graft.operators.text.HtmlExtract.report(html, "doc_id", "h")
          .groupBy().agg(count(lit(1)).as("n"), sum("n_chars").as("c"))
      })
    time("host stats")(
      force {
        val d = docs.where(col("text").isNotNull)
        val url = concat(lit("HTTP://H"), (col("doc_id") % 7).cast("string"),
          lit(".Example.COM/p/"), col("doc_id").cast("string"))
        val hostDf = d.select(col("doc_id"), graft.operators.text.UrlTools.host(url).as("host"))
        val q = graft.operators.text.TextStats.quality(d, "doc_id", "text")
          .select(col("doc_id"), col("n_words"), col("quality_score"))
        hostDf.join(q, Seq("doc_id")).groupBy("host")
          .agg(count(lit(1)).as("n"), sum("n_words").as("w"))
      })
    time("readability")(
      force(graft.operators.text.TextStats.readability(docs, "doc_id", "text")
        .groupBy().agg(count(lit(1)).as("n"), sum("n_syllables").as("s"))))

    // ---- round-10 additions ----------------------------------------------
    time("holt forecast")(
      force(graft.operators.temporal.Forecast
        .perKeyHolt(orders, Seq("o_custkey"), "o_orderdate", "o_orderkey",
          "o_totalprice", 0.5, 0.5, 0.25, 0.75, horizon = 3)
        .groupBy().agg(count(lit(1)).as("n"), sum("n_points").as("p"))))
    time("time-weighted avg")(
      force(graft.operators.temporal.TimeWeighted
        .avgByKey(orders, Seq("o_custkey"), "o_orderdate", "o_orderkey", "o_totalprice")
        .groupBy().agg(count(lit(1)).as("n"), sum("span_us").as("s"))))
    time("chi-square cells")(
      force(graft.operators.stats.Stats
        .chiSquareCells(orders, "o_orderpriority", "o_orderstatus")))
    time("cusum")(
      force(graft.operators.temporal.Cusum
        .perKeyCusum(orders, Seq("o_custkey"), "o_orderdate", "o_orderkey",
          "o_totalprice", k = 300000.0, h = 400000.0)
        .groupBy("alarm").agg(count(lit(1)).as("n"))))
    time("autocorr (lag regression)")(
      force {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        val pairs = orders
          .where(col("o_custkey").isNotNull && col("o_orderdate").isNotNull
            && col("o_orderkey").isNotNull && col("o_totalprice").isNotNull)
          .select(col("o_custkey"), col("o_totalprice").as("y"),
            lag(col("o_totalprice"), 1).over(w).as("x"))
        graft.operators.stats.Stats.regression(pairs, "x", "y", Seq("o_custkey"))
      })
    time("roc auc by source")(
      force {
        val scored = docs.where(col("text").isNotNull && col("lang").isNotNull
            && col("source").isNotNull)
          .select(col("source"),
            graft.operators.text.TextStats
              .markerHits(col("text"), graft.operators.text.TextStats.Markers.head._2)
              .cast("long").as("score"),
            col("lang"))
        graft.operators.stats.Stats.rocAucByGroup(scored, Seq("source"), "score",
          col("lang") === "en")
      })
    // per-copy user shift keeps touches-per-user density CONSTANT — the
    // attribution join's cost knob — so the expected growth is linear
    val events0 = sn.events
    val amplifiedEvents = (0 until factor)
      .map(i => events0
        .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 10000000L)))
      .reduce(_ unionAll _)
    time("attribution (7d lookback)")(
      force(graft.operators.temporal.Attribution
        .linearCredit(amplifiedEvents, "event_id", "user_id", "ts", "event_type",
          "value", "purchase", Seq("click", "view"), "INTERVAL 7 DAYS")
        .groupBy().agg(count(lit(1)).as("n"), sum("n_touches").as("t"))))
    time("set overlap audit")(
      force(graft.operators.sketch.OverlapSketch
        .overlapAudit(amplifiedEvents, "event_type", "user_id")))
    time("standardize fit (64 dims)")(
      force(graft.operators.ann.Standardize.fit(emb, "embedding", 64)))
    time("pmi collocations (top 20)")(
      force(graft.operators.text.Collocations.topPmi(docs, "text", 5L, 20)))
    time("kaplan-meier (event grain -> subject grain -> curve)")(
      force {
        val u = graft.operators.stats.Survival.subjects(
          amplifiedEvents, "user_id", "ts", "event_id", "event_type",
          col("event_type") === "purchase" && col("value") >= 150.0)
          .select(col("fs.label").as("first_type"),
            expr("(unix_micros(coalesce(tp, tl)) - unix_micros(t0)) div 3600000000")
              .as("t_hours"),
            col("tp").isNotNull.as("observed"))
        graft.operators.stats.Survival
          .kaplanMeier(u, Seq("first_type"), "t_hours", "observed")
      })
    time("fuzzy vocab (deletion-neighborhood + verify)")(
      force {
        val vocab = docs.where(col("text").isNotNull)
          .select(explode(split(lower(col("text")), " ")).as("word"))
          .where(length(col("word")) >= 3)
          .groupBy("word").agg(count(lit(1)).as("n"))
        graft.operators.text.FuzzyMatch.editDistance1Pairs(vocab, "word", "n")
      })
    time("corr matrix (16 dims, 136 pairs)")(
      force(graft.operators.ann.CorrMatrix.pearsonByDimPair(emb, "embedding", 64, 16)))
    // key on (custkey, copy) so per-key series DEPTH stays constant —
    // the O(k^2) pair walk is bounded-series by contract; growth here
    // must be linear in the number of series, not quadratic in depth
    time("mann-kendall trend (per-customer-copy series)")(
      force(graft.operators.temporal.Trend.mannKendall(
        orders.where(col("o_totalprice").isNotNull)
          .withColumn("copy", expr("o_orderkey div 100000000")),
        Seq("o_custkey", "copy"), "o_orderdate", "o_orderkey", "o_totalprice")))
    time("log-rank (grid risk sets + two folds)")(
      force {
        val u = graft.operators.stats.Survival.subjects(
          amplifiedEvents, "user_id", "ts", "event_id", "event_type",
          col("event_type") === "purchase" && col("value") >= 150.0)
          .select(col("fs.label").as("first_type"),
            expr("(unix_micros(coalesce(tp, tl)) - unix_micros(t0)) div 3600000000")
              .as("t_hours"),
            col("tp").isNotNull.as("observed"))
        graft.operators.stats.Survival.logRank(u, "first_type", "t_hours", "observed")
      })
    // per-(custkey, copy) so rank-window partitions stay bounded like
    // the MK profile above — growth linear in series count
    time("spearman rho (per-customer-copy rank windows)")(
      force(graft.operators.stats.Stats.spearmanByGroup(
        orders.where(col("o_totalprice").isNotNull)
          .withColumn("copy", expr("o_orderkey div 100000000")),
        Seq("o_custkey", "copy"), "o_orderdate", "o_totalprice")))
    time("markov transitions (per-user lead + smoothed probabilities)")(
      force {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val trans = amplifiedEvents
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .where(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n_transitions"))
        val k = trans.agg(countDistinct(col("to_type")).as("__k"))
        trans.crossJoin(broadcast(k))
          .withColumn("p_smooth", (col("n_transitions") + lit(1L)).cast("double")
            / (col("n_transitions") + col("__k")).cast("double"))
      })
    time("cramers v (grid-completed chi2 fold)")(
      force(graft.operators.stats.Stats.cramersV(
        orders, "o_orderpriority", "o_orderstatus")))
    time("url blocklist (suffix explode x broadcast rules)")(
      force {
        val host = concat(
          lit("h"), (col("doc_id") % 7).cast("string"), lit("."),
          when(col("doc_id") % 3 === 0, lit("ads"))
            .when(col("doc_id") % 3 === 1, lit("cdn")).otherwise(lit("www")),
          lit(".site"), (col("doc_id") % 5).cast("string"), lit(".com"))
        val labels = split(host, "\\.")
        val suffixes = transform(
          sequence(lit(1), size(labels) - 1),
          i => array_join(slice(labels, i, size(labels) - i + lit(1)), "."))
        val rules = spark.createDataFrame(Seq(
          Tuple1("site0.com"), Tuple1("cdn.site0.com"),
          Tuple1("ads.site2.com"), Tuple1("h3.cdn.site4.com"))).toDF("rule")
        docs.where(col("text").isNotNull)
          .select(col("doc_id"), host.as("host"), explode(suffixes).as("__sfx"))
          .join(broadcast(rules), col("__sfx") === col("rule"))
          .groupBy("doc_id", "host")
          .agg(count(lit(1)).as("n_rules"))
      })
    time("novelty (shingle -> first-doc spine + join back)")(
      force(graft.operators.text.Novelty
        .firstOccurrenceNovelty(docs, "doc_id", "text")))
    time("embedding outliers (centroid broadcast + cosine top-k)")(
      force {
        val embOk = emb.where(col("embedding").isNotNull && size(col("embedding")) === 64)
        val cent = graft.operators.ann.Standardize.fit(embOk, "embedding", 64)
          .agg(transform(
            array_sort(collect_list(struct(col("dim"), col("mean")))),
            e => e.getField("mean")).as("__c"))
        def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          aggregate(
            zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0), (acc, x) => acc + x)
        embOk.crossJoin(broadcast(cent))
          .select(col("vec_id"),
            round(dot(col("embedding"), col("__c"))
              / (sqrt(dot(col("embedding"), col("embedding")))
                * sqrt(dot(col("__c"), col("__c")))), 4).as("cos_centroid"))
          .orderBy(col("cos_centroid").asc, col("vec_id").asc).limit(25)
      })
    time("growth accounting (distinct user-month + windows)")(
      force(graft.operators.temporal.Growth
        .monthlyAccounting(orders, "o_custkey", "o_orderdate")))
    time("lorenz curve (customer agg + ntile(100) + running share)")(
      force {
        val cust = orders
          .where(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
          .groupBy("o_custkey")
          .agg(graft.functions.ExactMath.dsum(col("o_totalprice")).as("revenue"))
        graft.operators.quantile.Quantiles
          .withNtile(cust, "revenue", "o_custkey", 100, "pctile")
          .groupBy("pctile")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("revenue").cast(graft.functions.ExactMath.ValueDecimal)).as("rev"))
      })
    time("cohort ltv (customer-month agg + cohort windows)")(
      force {
        val V = graft.functions.ExactMath.ValueDecimal
        val W = org.apache.spark.sql.expressions.Window
        val um = orders
          .where(col("o_custkey").isNotNull && col("o_orderdate").isNotNull &&
            col("o_totalprice").isNotNull)
          .groupBy(col("o_custkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("mi"))
          .agg(sum(col("o_totalprice").cast(V)).as("rev"))
        um.withColumn("cohort", min(col("mi")).over(W.partitionBy("o_custkey")))
          .groupBy(col("cohort"), (col("mi") - col("cohort")).as("age"))
          .agg(count(lit(1)).as("n_active"), sum(col("rev")).as("r"))
      })
    time("session paths (islands windows + path agg)")(
      force {
        val W = org.apache.spark.sql.expressions.Window
        val w = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        amplifiedEvents
          .where(col("user_id").isNotNull && col("ts").isNotNull &&
            col("event_id").isNotNull && col("event_type").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("nw", when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1L)
            .otherwise(0L))
          .withColumn("sess", sum(col("nw")).over(w.rowsBetween(W.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sess"))
          .agg(array_join(slice(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type").as("et")))),
            e => e.getField("et")), 1, 8), ">").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      })
    time("trimmed mean (exact fences + decimal mean)")(
      force {
        val o = orders.where(col("o_totalprice").isNotNull)
        val fences = o.groupBy("o_orderpriority")
          .agg(round(expr("percentile(o_totalprice, 0.05)"), 4).as("lo"),
            round(expr("percentile(o_totalprice, 0.95)"), 4).as("hi"))
        o.join(broadcast(fences), "o_orderpriority")
          .where(col("o_totalprice") >= col("lo") && col("o_totalprice") <= col("hi"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_kept"),
            round(graft.functions.ExactMath.dsum(col("o_totalprice"))
              / count(lit(1)).cast("double"), 4).as("trimmed_mean"))
      })

    // ---- round-12 operators ----------------------------------------------
    time("anova (spine folds)")(
      force(graft.operators.stats.Stats
        .anovaOneWay(orders, "o_orderpriority", "o_totalprice")))
    time("mann-whitney (rank spine)")(
      force(graft.operators.stats.Stats
        .mannWhitney(orders, "o_orderpriority", "o_totalprice",
          "1-URGENT", "5-LOW")))
    // the pre-r14 single-task global-window shape, inline ONLY as the
    // r14 A/B comparison row (the RankedSpine refactor's "old path") —
    // r2a is the same doubled-rank sum the real operator derives
    time("mann-whitney LEGACY global window")(
      force {
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val v = col("o_totalprice")
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("__s"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        orders
          .where(col("o_orderpriority").isin("1-URGENT", "5-LOW") && v.isNotNull)
          .groupBy(v.as("__s"))
          .agg(sum(when(col("o_orderpriority") === "1-URGENT", 1L)
            .otherwise(0L)).as("__ca"), count(lit(1)).as("__cnt"))
          .withColumn("__before", coalesce(sum(col("__cnt")).over(w), lit(0L)))
          .agg(sum(col("__ca").cast(d38)
            * (lit(2L) * col("__before") + col("__cnt") + lit(1L)).cast(d38))
            .as("r2a"))
      })
    time("ks two-sample (value spine)")(
      force(graft.operators.stats.Drift
        .ksTwoSample(orders, "o_orderpriority", "o_totalprice",
          "1-URGENT", "5-LOW")))
    time("theil-sen (pair folds)")(
      force(graft.operators.temporal.Trend
        .theilSen(orders.withColumn("__x", expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")),
          Seq("o_custkey"), "__x", "o_orderkey", "o_totalprice")
        .groupBy().agg(count(lit(1)).as("n"), sum("n_slopes").as("s"))))
    time("changepoint (AMOC)")(
      force(graft.operators.temporal.Changepoint
        .amocByKey(orders, Seq("o_custkey"), "o_orderdate", "o_orderkey",
          "o_totalprice")
        .groupBy().agg(count(lit(1)).as("n"), sum("cp_stat").as("s"))))
    time("mad sketch audit")(
      force(graft.operators.quantile.Outliers
        .madAuditApprox(orders, "o_orderpriority", "o_totalprice")))
    time("weighted quantile sketch")(
      force(graft.operators.quantile.Quantiles
        .weightedQuantileApprox(
          orders.withColumn("__w", pmod(col("o_orderkey"), lit(10)) + 1),
          Seq("o_orderpriority"),
          "o_totalprice", "__w", 50, nSplits = 50, accuracy = 1000)
        .drop("approx_value")))
    time("rake keywords")(
      force(graft.operators.text.Rake.topPhrases(docs, "doc_id", "text", 20)))
    time("novelty hashed (slim spine)")(
      force(graft.operators.text.Novelty
        .firstOccurrenceNoveltyHashed(docs, "doc_id", "text")
        .groupBy().agg(count(lit(1)).as("n"), sum("n_novel").as("s"))))
    time("growth accounting from state")(
      force(graft.operators.temporal.Growth.monthlyAccountingFromState(
        graft.operators.temporal.Growth
          .activityState(orders, "o_custkey", "o_orderdate"))))

    time("welch t")(
      force(graft.operators.stats.Stats
        .welchT(orders, "o_orderpriority", "o_totalprice", "1-URGENT", "5-LOW")))
    time("winsorized mean")(
      force(graft.operators.quantile.Outliers
        .winsorAudit(orders, "o_orderpriority", "o_totalprice")))
    time("moments (power sums)")(
      force(graft.operators.stats.Stats
        .momentsByGroup(orders.withColumn("__v",
            pmod(col("o_orderkey"), lit(97)).cast("double")),
          "o_orderpriority", "__v")))
    time("class tfidf (top 5/source)")(
      force(graft.operators.text.TextStats
        .classTfidfTopTerms(docs, "source", "text", 5)))

    // ---- round-13 operators ----------------------------------------------
    time("kendall tau (pair codes)")(
      force(graft.operators.stats.Stats
        .kendallTauByKey(orders.withColumn("__x", expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")),
          Seq("o_custkey"), "__x", "o_totalprice", "o_orderkey")
        .groupBy().agg(count(lit(1)).as("n"), sum("n_concordant").as("s"))))
    time("wilcoxon signed-rank")(
      force {
        val o = orders.where(col("o_custkey").isNotNull &&
          col("o_orderdate").isNotNull && col("o_orderkey").isNotNull &&
          col("o_totalprice").isNotNull)
        val diffs = o.groupBy("o_custkey").agg(
          min(struct(col("o_orderdate").as("d"), col("o_orderkey").as("t"),
            col("o_totalprice").as("p"))).as("__f"),
          max(struct(col("o_orderdate").as("d"), col("o_orderkey").as("t"),
            col("o_totalprice").as("p"))).as("__l"),
          count(lit(1)).as("__n")).where(col("__n") >= 2L)
          .select((col("__l").getField("p") - col("__f").getField("p")).as("__d"))
        graft.operators.stats.Stats.wilcoxonSignedRank(diffs, "__d")
      })
    time("poisson rate")(
      force(graft.operators.stats.Stats
        .poissonRateTest(orders, "o_orderpriority", "o_orderdate",
          "1-URGENT", "5-LOW")))
    time("levene (median-centered anova)")(
      force {
        val o = orders.where(col("o_orderpriority").isNotNull &&
          col("o_totalprice").isNotNull)
        val med = o.groupBy("o_orderpriority")
          .agg(expr("percentile(o_totalprice, 0.5)").as("__med"))
        graft.operators.stats.Stats.anovaOneWay(
          o.join(broadcast(med), "o_orderpriority")
            .select(col("o_orderpriority"),
              abs(col("o_totalprice") - col("__med")).as("__z")),
          "o_orderpriority", "__z")
      })
    time("jsd (category spine)")(
      force(graft.operators.stats.Drift.jsdByCategory(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "lang", 8)))
    time("runs test")(
      force(graft.operators.stats.Stats
        .runsTest(orders, Seq("o_custkey"), "o_orderdate", "o_orderkey",
          "o_totalprice")
        .groupBy().agg(count(lit(1)).as("n"), sum("n_runs").as("s"))))
    time("holt-winters (m=4)")(
      force(graft.operators.temporal.Forecast
        .perKeyHoltWinters(orders, Seq("o_custkey"), "o_orderdate",
          "o_orderkey", "o_totalprice",
          0.5, 0.5, 0.25, 0.75, 0.25, 0.75, period = 4, horizon = 4)
        .groupBy().agg(count(lit(1)).as("n"), sum("forecast").as("s"))))
    time("url keep-best dedup")(
      force {
        val k = col("doc_id")
        val url = concat(lit("http://example"), (k % 7).cast("string"),
          lit(".com:80/Path"), (k % 11).cast("string"),
          lit("?b=2&a=1&utm_x=1&id="), (k % 3).cast("string"))
        val base = docs.where(col("text").isNotNull)
        val scored = base.select(col("doc_id"), url.as("url"))
          .join(graft.operators.text.TextStats
            .quality(base, "doc_id", "text")
            .select(col("doc_id"), col("quality_score")), "doc_id")
        graft.operators.text.UrlTools
          .dedupKeepBest(scored, "url", "doc_id", "quality_score")
      })
    time("substring window dedup")(
      force(graft.operators.dedup.WindowDedup
        .windowDedup(docs, "doc_id", "text", 40, 20)
        .groupBy().agg(count(lit(1)).as("n"), sum("n_shared").as("s"))))
    time("interval state fold")(
      force {
        val iv = orders.where(col("o_orderkey") % 7 === 0)
          .select(col("o_orderpriority"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("ws"),
            date_add(to_date(col("o_orderdate")), 3).as("we"))
        val st1 = graft.operators.temporal.Islands.mergeIntervals(
          iv.where(col("o_orderkey") % 2 === 0),
          Seq("o_orderpriority"), "ws", "we", "o_orderkey")
        graft.operators.temporal.Islands.foldIntervalState(
          st1, iv.where(col("o_orderkey") % 2 === 1),
          Seq("o_orderpriority"), "ws", "we")
      })

    // ---- round-13 continuation operators ---------------------------------
    time("friedman (blocked ranks)")(
      force(graft.operators.stats.Stats.friedman(
        orders.where(col("o_orderdate").isNotNull)
          .withColumn("__mi",
            year(col("o_orderdate")) * 12 + month(col("o_orderdate"))),
        "__mi", "o_orderpriority", "o_totalprice")))
    val screens = Seq("t_urgent", "t_big", "t_recent")
    time("cochran q (screen state)")(
      force {
        val rows = orders.where(col("o_custkey").isNotNull).select(
          col("o_custkey"),
          (col("o_orderpriority") === "1-URGENT").as("t_urgent"),
          (col("o_totalprice") > 150000.0).as("t_big"),
          (year(col("o_orderdate")) >= 1995).as("t_recent"))
        graft.operators.stats.Stats.cochranQ(
          graft.operators.stats.Stats.screenState(rows, "o_custkey", screens),
          "o_custkey", screens)
      })
    time("durbin-watson")(
      force(graft.operators.stats.Stats
        .durbinWatson(orders, Seq("o_custkey"), "o_orderdate", "o_orderkey",
          "o_totalprice")
        .groupBy().agg(count(lit(1)).as("n"), sum("dw_stat").as("s"))))
    time("mutual information cells")(
      force(graft.operators.stats.Stats
        .mutualInformation(orders, "o_orderpriority", "o_orderstatus")))
    time("hellinger (category spine)")(
      force(graft.operators.stats.Drift.hellingerByCategory(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "source", 8)))
    time("fleiss kappa (3 raters)")(
      force {
        val d = docs.where(col("text").isNotNull)
        def cls(v: org.apache.spark.sql.Column, lo: Int, hi: Int) =
          when(v < lo, "short").when(v < hi, "medium").otherwise("long")
        graft.operators.stats.Stats.fleissKappa(
          d.select(col("doc_id"),
            cls(size(split(col("text"), " ")), 50, 200).as("r_words"),
            cls(length(col("text")), 300, 1200).as("r_chars"),
            cls(size(array_distinct(split(col("text"), " "))), 40, 150)
              .as("r_distinct")),
          "doc_id", Seq("r_words", "r_chars", "r_distinct"))
      })
    time("cronbach alpha")(
      force {
        val vd = graft.functions.ExactMath.ValueDecimal
        def bucket(cond: org.apache.spark.sql.Column) =
          sum(when(cond, col("o_totalprice")).otherwise(lit(0.0)).cast(vd))
        val subj = orders.where(col("o_custkey").isNotNull)
          .groupBy("o_custkey")
          .agg(bucket(year(col("o_orderdate")) <= 1993).as("sp_early"),
            bucket(year(col("o_orderdate")) >= 1994 &&
              year(col("o_orderdate")) <= 1995).as("sp_mid"),
            bucket(year(col("o_orderdate")) >= 1996).as("sp_late"))
        graft.operators.stats.Stats.cronbachAlpha(
          subj, "o_custkey", Seq("sp_early", "sp_mid", "sp_late"))
      })
    val liAmp = (0 until factor)
      .map(i => sn.lineitem.withColumn("l_orderkey",
        col("l_orderkey") + lit(i.toLong * 100000000L)))
      .reduce(_ unionAll _)
    time("partial corr (lineitem xF)")(
      force(graft.operators.stats.Stats
        .partialCorr(liAmp, "l_quantity", "l_extendedprice", "l_discount")))
    time("odds ratio")(
      force(graft.operators.stats.Stats.oddsRatio(
        orders.where(col("o_orderpriority").isNotNull &&
          col("o_totalprice").isNotNull)
          .select((col("o_orderpriority") === "1-URGENT").as("e"),
            (col("o_totalprice") > 150000.0).as("o")),
        "e", "o")))
    time("overdispersion (daily counts)")(
      force(graft.operators.stats.Stats
        .overdispersion(orders.where(col("o_orderdate").isNotNull), "o_orderdate")))
    time("lexical diversity")(
      force(graft.operators.stats.Profiling
        .lexicalDiversityBySource(docs, "source", "text")))
    // parts amplified: copies SHARE names, so within-block pairs grow
    // ~factor^2 — the cost is pair-count-driven (the prefix-filter
    // regime), not a scan wall; the blocking key keeps it bounded
    val partAmp = (0 until factor)
      .map(i => sn.part.withColumn("p_partkey",
        col("p_partkey") + lit(i.toLong * 10000000L)))
      .reduce(_ unionAll _)
      .where(col("p_partkey").isNotNull && col("p_name").isNotNull)
      .withColumn("__blk", concat(
        element_at(split(col("p_name"), " "), 1), lit(" "),
        element_at(split(col("p_name"), " "), 2)))
    time("jaro-winkler pairs (xF^2)")(
      force(graft.operators.text.NameMatch
        .topSimilarPairs(partAmp, "p_partkey", "p_name", "__blk", 50)))
    time("cliffs delta")(
      force(graft.operators.stats.Stats.cliffsDelta(
        orders, "o_orderpriority", "o_totalprice", "1-URGENT", "5-LOW")))
    time("count-min sketch") {
      import org.apache.spark.sql.Encoders
      val sk = docs.where(col("text").isNotNull)
        .select(explode(split(lower(col("text")), " ")).as("term"))
        .as(Encoders.STRING)
        .select(new graft.operators.sketch.CountMin(4, 2048).toColumn).first()
      sk.n
    }
    time("acf (5 lags)")(
      force(graft.operators.stats.Stats
        .acfGlobal(orders.where(col("o_orderdate").isNotNull), "o_orderdate", 5)))
    time("entropy rate (transitions)")(
      force {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        val trans = orders
          .withColumn("__next", lead(col("o_orderpriority"), 1).over(w))
          .where(col("__next").isNotNull)
          .groupBy(col("o_orderpriority").as("f"), col("__next").as("t"))
          .agg(count(lit(1)).as("n"))
        graft.operators.stats.Stats.conditionalEntropy(trans, "f", "t", "n")
      })
    time("eta/omega squared")(
      force(graft.operators.stats.Stats
        .etaSquared(orders, "o_orderpriority", "o_totalprice")))
    time("theil between-bucket")(
      force {
        val cust = orders.where(col("o_custkey").isNotNull &&
          col("o_totalprice").isNotNull)
          .groupBy("o_custkey")
          .agg(graft.functions.ExactMath.dsum(col("o_totalprice")).as("revenue"))
        val spine = graft.operators.quantile.Quantiles
          .withNtile(cust, "revenue", "o_custkey", 100, "pctile")
          .groupBy("pctile")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("revenue").cast(graft.functions.ExactMath.ValueDecimal)).as("rev"))
        graft.operators.stats.Stats.theilBetween(spine, "pctile", "n_customers", "rev")
      })
    time("boxplot stats")(
      force(graft.operators.quantile.Outliers
        .boxplotStats(orders, "o_orderpriority", "o_totalprice")))
    time("garbled audit")(
      force(graft.operators.text.TextStats
        .garbledAudit(docs, "doc_id", "text")
        .groupBy().agg(count(lit(1)).as("n"),
          sum(when(col("is_garbled"), 1L).otherwise(0L)).as("g"))))
    time("tukey hsd pairs")(
      force(graft.operators.stats.Stats
        .tukeyHsd(orders, "o_orderpriority", "o_totalprice")))
    time("volume peaks")(
      force(graft.operators.stats.Stats
        .volumePeaks(orders.where(col("o_orderdate").isNotNull), "o_orderdate")))
    time("grubbs")(
      force(graft.operators.stats.Stats
        .grubbs(orders, "o_orderpriority", "o_totalprice")))
    time("vif (lineitem xF)")(
      force(graft.operators.stats.Stats
        .vif3(liAmp, "l_quantity", "l_extendedprice", "l_discount")))
    time("template prefix")(
      force(graft.operators.text.TextStats
        .templatePrefix(docs, "source", "text", 40)))
    time("lift curve")(
      force {
        val base = docs.where(col("text").isNotNull)
        val scored = graft.operators.text.TextStats.quality(base, "doc_id", "text")
          .select(col("doc_id"), col("quality_score").as("score"))
          .join(base.select(col("doc_id"),
            (graft.operators.text.TextStats.markerHits(col("text"),
              graft.operators.text.TextStats.Markers.head._2) >= 2).as("label")),
            "doc_id")
        val spine = graft.operators.quantile.Quantiles
          .withNtile(scored, "score", "doc_id", 10, "decile")
          .groupBy("decile")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"))
        spine
      })

    // ---- round-14 operators ----------------------------------------------
    time("moods median (RankedSpine)")(
      force(graft.operators.stats.Stats
        .moodsMedian(orders, "o_orderpriority", "o_totalprice")))
    time("cochran-armitage trend")(
      force(graft.operators.stats.Stats.cochranArmitage(orders,
        substring(col("o_orderpriority"), 1, 1).cast("int"),
        (col("o_orderstatus") === "F").cast("int"))))
    val ordersMi = orders.where(col("o_orderdate").isNotNull)
      .withColumn("__mi", year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
    time("page trend (friedman ranks)")(
      force(graft.operators.stats.Stats.pageTrend(
        ordersMi, "__mi", "o_orderpriority", "o_totalprice",
        t => substring(t, 1, 1).cast("int"))))
    time("kendall w")(
      force(graft.operators.stats.Stats.kendallW(
        ordersMi, "__mi", "o_orderpriority", "o_totalprice")))
    time("cohens d")(
      force(graft.operators.stats.Stats
        .cohensD(orders, "o_orderpriority", "o_totalprice", "1-URGENT", "5-LOW")))
    time("sign test (paired state)")(
      force(graft.operators.stats.Stats.signTest(
        graft.operators.stats.Stats.pairedDiffsFromState(
          graft.operators.stats.Stats.pairedMovementState(
            orders, "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")),
        "__d")))
    time("ljung-box (acf lags)")(
      force(graft.operators.stats.Stats
        .ljungBoxGlobal(orders.where(col("o_orderdate").isNotNull),
          "o_orderdate", 5)))
    time("gwet ac1 (langid cells)")(
      force(graft.operators.stats.Stats.gwetAc1(
        docs.where(col("text").isNotNull && col("lang").isNotNull)
          .select(graft.operators.text.TextStats.langId(col("text")).as("pred"),
            col("lang")),
        "pred", "lang")))
    time("zipf fit (top-50 terms)")(
      force(graft.operators.text.TextStats.zipfFit(docs, "text", 50)))
    time("casing audit")(
      force(graft.operators.text.TextStats.casingAudit(
        docs.where(col("text").isNotNull), "doc_id", "text")))
    time("tracking audit")(
      force {
        val k = col("doc_id")
        val url = concat(lit("http://h"), (k % 7).cast("string"),
          lit(".example.com/p/"), k.cast("string"),
          when(k % 3 === 0, lit("?utm_source=x&q=1")).otherwise(lit("")))
        graft.operators.text.UrlTools
          .trackingAudit(docs.select(url.as("url")), "url")
      })
    // round 15: the learned classifier is a pure map (tokenize -> hash ->
    // fold), expected flat-linear; one training epoch is one slim
    // (bucket, decimal) shuffle over the corpus
    time("quality classifier (score)")(
      force(graft.operators.text.QualityClassifier.scoreWithModel(
        docs, "doc_id", "text",
        SparkEntry.qualityModelWeights, SparkEntry.qualityModelBias)))
    time("quality classifier (3 train epochs)") {
      graft.operators.text.QualityClassifier.train(
        docs.where(col("text").isNotNull)
          .select(col("text"), (col("doc_id") % 3 === 0).as("lbl")),
        "text", "lbl", dim = 64, epochs = 3, lr = 1.0)._1.length.toLong
    }
    // round 15: semantic dedup under copy amplification — every vector
    // has factor-1 EXACT copies, so component count stays ~|emb0| while
    // within-cell candidate pairs grow ~factor^2 per cell (the
    // prefix-filter planted-copies regime: cost is OUTPUT-pair-driven);
    // nLists scales with the corpus (64 here vs 8 at sf0.1) as a real
    // deployment would tune it
    time("semantic dedup (keep-best)")(
      force(graft.operators.dedup.EmbeddingDedup.dedupeSemantic(
        emb, "vec_id", "embedding",
        coalesce(col("label").cast("double"), lit(-1.0)), 0.4,
        nLists = 64, iters = 2, nAssign = 2)
        .groupBy().agg(count(lit(1)).as("n_survivors"))))
    // round 16: the hot-cell path under the same regime — the cap is
    // forced far below the ~factor*|emb0|/64 first-choice populations so
    // EVERY cell goes hot and the star-collapse + rep-pairing path
    // carries the whole corpus; with factor-1 exact copies per vector
    // the dup stars are the output and the distinct reps per cell fit
    // the cap, so the cost must stay in the usable-cell path's band
    // (output-pair-driven either way, no quadratic blowup)
    time("semantic dedup (all cells HOT)")(
      force(graft.operators.dedup.EmbeddingDedup.dedupeSemantic(
        emb, "vec_id", "embedding",
        coalesce(col("label").cast("double"), lit(-1.0)), 0.4,
        nLists = 64, iters = 2, nAssign = 2, maxCellSize = 600)
        .groupBy().agg(count(lit(1)).as("n_survivors"))))

    // round 16 continuation: the classifier-eval completions (score-grid
    // PR sweep + MCC ride the same scored/labeled grain — cost should
    // track the classifier score pass) and the corpus-shape additions
    // (heaps = one vocab-grain min-bucket agg over the token explode;
    // vocab overlap = word-keyed self-join with source-bounded fan-out;
    // code detect = a pure per-doc map)
    {
      import graft.operators.stats.Calibration
      import graft.operators.text.{QualityClassifier, TextStats}
      val scored = QualityClassifier.scoreWithModel(
        docs, "doc_id", "text",
        SparkEntry.qualityModelWeights, SparkEntry.qualityModelBias)
        .select(col("doc_id"), col("score"), (col("doc_id") % 3 === 0).as("lbl"))
      time("pr curve (score cells)")(
        force(Calibration.prCurve(scored, col("score"), col("lbl"))))
      time("heaps fit (20 buckets)")(
        force(TextStats.heapsFit(docs, "doc_id", "text")))
      time("vocab overlap (source pairs)")(
        force(graft.operators.stats.Profiling
          .vocabOverlapBySource(docs, "source", "text")))
      time("code detect (per-doc map)")(
        force(TextStats.codeAudit(docs, "doc_id", "text")
          .groupBy().agg(sum(when(col("is_code"), 1L).otherwise(0L)).as("n_code"))))
    }
    // hodges-lehmann walsh enumeration is quadratic in per-key series
    // depth (the theil-sen copy-amplification regime — bounded-series
    // contract); ewma's corpus cost is the one monthly aggregation
    time("hodges-lehmann (walsh pairs)")(
      force(graft.operators.temporal.Trend
        .hodgesLehmann(orders, Seq("o_custkey"), "o_totalprice")))
    time("page-hinkley (bounded series)")(
      force(graft.operators.temporal.Cusum.pageHinkley(
        orders, Seq("o_custkey"), "o_orderdate", "o_orderkey", "o_totalprice",
        delta = 0.0, lambda = 250000.0)))
    time("dup profile (distinct-text join)")(
      force {
        val st = docs.where(col("text").isNotNull && col("source").isNotNull)
          .groupBy("source", "text").agg(count(lit(1)).as("__c"))
        val tx = st.groupBy("text").agg(sum(col("__c")).as("__tc"))
        st.join(tx, "text").groupBy("source").agg(
          sum(col("__c")).as("n_docs"),
          sum(when(col("__tc") > 1L, col("__c")).otherwise(0L)).as("n_dup"))
      })
    time("ewma chart (monthly cells)") {
      val cells = orders
        .where(col("o_orderpriority").isNotNull && col("o_orderdate").isNotNull &&
          col("o_totalprice").isNotNull)
        .groupBy(col("o_orderpriority"),
          (year(col("o_orderdate")) * 12 + (month(col("o_orderdate")) - 1)).as("m"))
        .agg(graft.functions.ExactMath.dsum(col("o_totalprice")).as("mt"))
      force(graft.operators.temporal.Cusum
        .ewmaChart(cells, Seq("o_orderpriority"), "m", "mt"))
    }

    // ---- planted-hot-key join stress (SURVEY §4) --------------------------
    // ~half of the (2×factor-amplified) lineitem rows remapped onto ONE
    // partkey, written to parquet so every measurement starts from a real
    // scan. The three plans under test: plain shuffle join with AQE
    // skew-split, plain with skew-split disabled (the straggler baseline),
    // and SkewTools.saltedJoin. Broadcast is forced OFF — at 100 TB the dim
    // side of a hot join is not assumed broadcastable; that path would hide
    // the skew entirely.
    val hotKey = 1L
    val li0 = sn.lineitem
    (0 until factor * 2)
      .map(i => li0.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L)))
      .reduce(_ unionAll _)
      .withColumn("l_partkey",
        when(pmod(col("l_orderkey"), lit(2)) === 0, lit(hotKey)).otherwise(col("l_partkey")))
      .write.mode("overwrite").parquet(s"$tmp/lineitem_skew")
    val liSkew = spark.read.parquet(s"$tmp/lineitem_skew")
    val partDim = sn.part.withColumnRenamed("p_partkey", "l_partkey")
    def agg(j: org.apache.spark.sql.DataFrame): Long =
      force(j.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("p_retailprice").as("v")))
    def withConfs(kvs: (String, String)*)(f: => Unit): Unit = {
      // getOption: an unset conf restores via unset, not set(null)
      val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; f }
      finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      time("skew: plain join + AQE split")(agg(liSkew.join(partDim, Seq("l_partkey"))))
      withConfs("spark.sql.adaptive.skewJoin.enabled" -> "false") {
        time("skew: plain join, no AQE")(agg(liSkew.join(partDim, Seq("l_partkey"))))
        time("skew: saltedJoin x8")(agg(graft.operators.join.SkewTools
          .saltedJoin(liSkew, partDim, "l_partkey", 8, "l_orderkey")))
      }
    }
    // hot-key share sanity so the printed numbers are self-describing
    val hotN = liSkew.where(col("l_partkey") === hotKey).count()
    println(f"[scaleup x$factor] hot-key share: $hotN of ${liSkew.count()} lineitem rows")
    spark.stop()
  }
}
