package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-ground-truth gates for the queries no DuckDB oracle can mirror
  * (hash-seeded minhash/simhash banding, IVF/LSH ANN, HLL, the rolling-
  * hash fingerprint). The cross-JVM double-Verify sweep proves those are
  * DETERMINISTIC; these checks prove they are CORRECT: plant rows whose
  * right answer is known by construction — exact duplicate docs, copied
  * embedding vectors — and assert the operator finds every planted item.
  *
  * Each check is a recall-of-planted-truth assertion, not a golden-file:
  *  - an exact duplicate text has Jaccard 1, identical minhash signature
  *    (every band collides) and identical simhash (hamming 0), so banded
  *    dedup MUST emit the pair — anything less is a correctness bug, not
  *    tuning;
  *  - a copied embedding vector lands in its twin's IVF cell (identical
  *    input ⇒ identical nearest-centroid) and hashes to its twin's LSH
  *    bucket (identical hyperplane signs), so approx dedup / ANN MUST
  *    return the twin at cosine ≈ 1;
  *  - HLL is judged against the exact distinct count, within 3× its
  *    configured rsd;
  *  - equal texts MUST fingerprint equal, and distinct normalized texts
  *    must not collide at this corpus size.
  *
  * Run by [[Verify]] after the query dump; results land in
  * `<outDir>/selfcheck.json` (CORRECTNESS-style rows) and `SELFCHECK.json`
  * in the working directory.
  */
object SelfCheck {

  final case class Result(name: String, pass: Boolean, planted: Long, found: Long, detail: String)

  /** Disjoint id range for planted twins (testdata ids are far smaller). */
  private val Offset = 1000000000L

  def run(spark: SparkSession, sfDir: String): Seq[Result] = {
    val sn = graft.sources.Snapshot(spark, sfDir)

    // every ~7th doc gets an exact-duplicate twin at doc_id + Offset;
    // ground truth = the planted (orig, orig + Offset) pairs themselves
    val baseDocs = sn.documents.where(col("text").isNotNull)
    val plantedDocIds = baseDocs.where(col("doc_id") % 7 === 0).select("doc_id")
    val docTwins = baseDocs.where(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + lit(Offset))
    val docs = baseDocs.unionByName(docTwins).localCheckpoint(true)
    val nDocPairs = plantedDocIds.count()

    // same construction over embeddings: copied vectors, new ids
    val baseVecs = sn.embeddings.where(col("embedding").isNotNull)
    val vecTwins = baseVecs.where(col("vec_id") % 5 === 0)
      .withColumn("vec_id", col("vec_id") + lit(Offset))
    val vecs = baseVecs.unionByName(vecTwins).localCheckpoint(true)
    val nVecPairs = vecTwins.count()

    // ---- near-dup plants at KNOWN similarity (round-5 gate) ----
    // Texts: a doc of m distinct synthetic words and a twin sharing its
    // t-word prefix each carry n = m-2 distinct 3-shingles, t-2 shared,
    // so shingle Jaccard = (t-2)/(2n-(t-2)) EXACTLY by construction.
    // Vocab is flavor+pair-scoped ("zq<flavor><j>w<i>"), so plants never
    // share a shingle with the corpus or another plant pair. Three
    // flavors: near J = 36/40 = 0.9 (above the 0.5 minhash threshold),
    // tight J = 38/40 = 0.95 (1-word tail edit, the simhash regime),
    // far J = 12/60 = 0.2 (below every threshold — must be excluded).
    val NearPairs = 40
    val PairGap = 100000000L // id_b = id_a + PairGap within a flavor
    def plantPair(flavor: String, j: Int, m: Int, t: Int): (String, String) = {
      val w = (1 to m).map(i => s"zq$flavor${j}w$i")
      val twin = w.take(t) ++ ((t + 1) to m).map(i => s"zq$flavor${j}f$i")
      (w.mkString(" "), twin.mkString(" "))
    }
    def plantDocs(flavor: String, aBase: Long, m: Int, t: Int): Seq[(Long, String)] =
      (0 until NearPairs).flatMap { j =>
        val (a, b) = plantPair(flavor, j, m, t)
        Seq((aBase + j, a), (aBase + PairGap + j, b))
      }
    val NearA  = 2000000000L // J = 0.9
    val TightA = 2400000000L // J = 0.95
    val FarA   = 2800000000L // J = 0.2
    import spark.implicits._
    val nearPlants =
      (plantDocs("n", NearA, m = 40, t = 38) ++
        plantDocs("t", TightA, m = 41, t = 40) ++
        plantDocs("f", FarA, m = 38, t = 14)).toDF("doc_id", "text")
    val docsNear = baseDocs.select(col("doc_id"), col("text"))
      .unionByName(nearPlants).localCheckpoint(true)
    // the planted-pair shape: id_a in a flavor's orig range, id_b its twin
    def plantedPairsOf(pairs: DataFrame, aBase: Long): DataFrame =
      pairs.where(col("id_a") >= aBase && col("id_a") < aBase + NearPairs &&
        col("id_b") === col("id_a") + PairGap)

    // Vectors: sign-flips preserve the norm EXACTLY ((-x)^2 == x^2 in
    // IEEE), so cos(v, flipped v) = (S_keep - S_flip) / S_total over the
    // same squares — deterministic, and computed below with the operator's
    // own cosine as per-pair ground truth. One flipped coordinate => sim
    // near 1 (must be found); first half flipped => sim near 0 (must be
    // excluded by the 0.4 threshold's exact verify stage).
    val FlipNearOff = 2000000000L
    val FlipFarOff = 3000000000L
    def flipped(off: Long, mod: Int, nFlip: Int): DataFrame = baseVecs
      .where(col("vec_id") % mod === 0)
      .select((col("vec_id") + lit(off)).as("vec_id"),
        transform(col("embedding"), (x, i) => when(i < nFlip, negate(x)).otherwise(x))
          .as("embedding"))
    val vecsNear = baseVecs.select("vec_id", "embedding")
      .unionByName(flipped(FlipNearOff, 5, 1))
      .unionByName(flipped(FlipFarOff, 7, 32))
      .localCheckpoint(true)

    def pairRecall(name: String, pairs: DataFrame, planted: Long, idA: String, idB: String,
        detail: String): Result = {
      // a planted pair is (orig, orig + Offset) with orig < orig + Offset,
      // matching the operators' id_a < id_b orientation
      val found = pairs
        .where(col(idB) === col(idA) + lit(Offset) && col(idA) < lit(Offset))
        .join(plantedDocIds.withColumnRenamed("doc_id", idA), Seq(idA), "left_semi")
        .count()
      Result(name, found == planted, planted, found, detail)
    }

    val checks = Seq[(String, () => Result)](
      "q_dedup_minhash" -> (() => pairRecall("q_dedup_minhash",
        graft.operators.dedup.MinHashDedup.duplicatePairs(docs, "doc_id", "text", 0.5),
        nDocPairs, "id_a", "id_b",
        "every planted exact-duplicate pair emitted (identical signature => every band collides)")),

      "q_dedup_simhash" -> (() => pairRecall("q_dedup_simhash",
        graft.operators.dedup.SimHashDedup.duplicatePairs(docs, "doc_id", "text", 3),
        nDocPairs, "id_a", "id_b",
        "every planted exact-duplicate pair emitted at hamming 0")),

      "q_dedup_embedding_approx" -> (() => {
        val pairs = graft.operators.dedup.EmbeddingDedup
          .duplicatePairsApprox(vecs, "vec_id", "embedding", 0.4, nLists = 8, iters = 2, nAssign = 2)
        val found = pairs
          .where(col("id_b") === col("id_a") + lit(Offset) && col("id_a") < lit(Offset)
            && col("sim") >= 0.999)
          .count()
        Result("q_dedup_embedding_approx", found == nVecPairs, nVecPairs, found,
          "every planted copied-vector pair co-buckets (identical nearest centroid) at sim ~ 1")
      }),

      "q_ann_ivf" -> (() => {
        val index = graft.operators.ann.IvfKNN.buildIndex(baseVecs, "vec_id", "embedding", 16, 3)
        val queries = vecTwins
        val res = graft.operators.ann.IvfKNN.search(index, queries, "vec_id", "embedding", 5, nProbe = 4)
        val found = res
          .where(col("neighbor_id") === col("query_id") - lit(Offset) && col("sim") >= 0.999)
          .select("query_id").distinct().count()
        Result("q_ann_ivf", found == nVecPairs, nVecPairs, found,
          "each copied-vector query returns its corpus twin among top-5 at sim ~ 1")
      }),

      "q_ann_lsh" -> (() => {
        val res = graft.operators.ann.LshKNN
          .topK(vecTwins, baseVecs, "vec_id", "embedding", "vec_id", "embedding", 5)
        val found = res
          .where(col("neighbor_id") === col("query_id") - lit(Offset) && col("sim") >= 0.999)
          .select("query_id").distinct().count()
        Result("q_ann_lsh", found == nVecPairs, nVecPairs, found,
          "identical vector hashes to its twin's bucket (same hyperplane signs) => twin in top-5")
      }),

      "q_distinct_approx" -> (() => {
        // truth = the exact distinct count; HLL must sit within 3x its
        // configured rsd (default 0.05) on every group
        val joined = sn.lineitem
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact"),
            approx_count_distinct(col("l_partkey")).as("approx"))
          .withColumn("rel_err", abs(col("approx") - col("exact")) / col("exact"))
        val groups = joined.count()
        val ok = joined.where(col("rel_err") <= 0.15).count()
        Result("q_distinct_approx", ok == groups, groups, ok,
          "per-group HLL estimate within 15% (3x rsd) of exact distinct count")
      }),

      "q_token_bpe" -> (() => {
        import graft.operators.text.Bpe
        // (a) lossless roundtrip THROUGH THE EXPRESSIONS (codegen path)
        // over the whole corpus: byte-level base tokens make
        // decode(encode(x)) == x a theorem — any miss is a bug, not tuning
        val total = baseDocs.count()
        val rt = baseDocs
          .where(Bpe.decodeIds(Bpe.encodeIds(col("text"))) === col("text")).count()
        // (b) planted analytic merge sequences: each expectation is "the
        // token whose PRODUCT STRING is X" (ids defined by the literal
        // table, independent of the merge-loop implementation), hand-
        // derived by applying the rank order on paper
        def pid(p: String): Int = {
          val i = Bpe.Products.indexOf(p)
          require(i >= 0, s"no merge product '$p'"); 256 + i
        }
        val plants: Seq[(String, Seq[Int])] = Seq(
          "the" -> Seq(pid("the")),
          " spark table" -> Seq(pid(" spark"), pid(" table")),
          " fastest" -> Seq(pid(" fast"), pid("es"), 't'.toInt),
          " window join" -> Seq(pid(" window"), pid(" join")),
          "batch" -> Seq('b'.toInt, pid("at"), 'c'.toInt, 'h'.toInt))
        val plantsOk = plants.forall { case (w, exp) => Bpe.encode(w).toSeq == exp }
        // (c) non-triviality: merges fire corpus-wide (else the table is
        // dead weight and every gate above passes vacuously)
        val comp = baseDocs.agg(
          sum(graft.operators.text.Bpe.nTokens(col("text"))).as("toks"),
          sum(octet_length(col("text")).cast("long")).as("bytes")).head()
        val fires = comp.getLong(0) < comp.getLong(1)
        Result("q_token_bpe", rt == total && plantsOk && fires, total, rt,
          s"decode(encode(x)) == x on $rt/$total docs; planted analytic merge " +
            s"sequences ok=$plantsOk; merges fire corpus-wide " +
            s"(${comp.getLong(0)} tokens < ${comp.getLong(1)} bytes)")
      }),

      "q_bpe_train" -> (() => {
        import graft.operators.text.{Bpe, BpeTable}
        // (a) analytic planted-corpus recovery: the classic low/lower/
        // newest/widest corpus, whose pair frequencies are hand-countable
        // — training MUST reproduce the paper-derived merge sequence
        // (ties at rounds 1/3/5/6 pin the count-DESC/pair-ASC rule)
        val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
          Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
        val planted = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
          .toDF("doc_id", "text")
        val expect = Vector(
          "e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w", "e" -> "w", "ew" -> "est")
        val plantOk = Bpe.train(planted, "text", 6) == expect
        // (b) the table trained on the REAL corpus validates (formable
        // sides, unique products — the BpeTable constructor), round-trips
        // a doc sample losslessly, and its merges actually fire
        val trained = new BpeTable(Bpe.train(baseDocs, "text", 12))
        val sample = baseDocs.orderBy("doc_id").limit(40)
          .select("text").collect().map(_.getString(0))
        val rt = sample.count(s => trained.decode(trained.encode(s)) == s)
        val toks = sample.map(s => trained.encode(s).length.toLong).sum
        val bytes = sample.map(_.getBytes("UTF-8").length.toLong).sum
        Result("q_bpe_train",
          plantOk && rt == sample.length && toks < bytes, sample.length.toLong, rt.toLong,
          s"planted Sennrich corpus recovers the hand-derived 6-merge sequence: $plantOk; " +
            s"corpus-trained 12-merge table round-trips $rt/${sample.length} sampled docs; " +
            s"learned merges fire ($toks tokens < $bytes bytes)")
      }),

      "q_compress_ratio" -> (() => {
        import graft.operators.text.Compress
        // (a) range sanity corpus-wide: deflate of non-empty text is a
        // positive length bounded by raw + zlib's worst-case overhead
        // (2-byte header + 4-byte adler + 5-byte stored-block header per
        // 16 KB ≈ 11 bytes for these docs; 16 is the loose bound). A
        // ratio bound would be wrong: a 47-byte doc legitimately sits
        // above 1.1 on overhead alone.
        val rep = Compress.report(baseDocs, "doc_id", "text")
        val total = rep.count()
        val inRange = rep.where(col("compress_ratio") > 0 &&
          col("deflated_bytes") <= col("n_bytes") + lit(16L)).count()
        // (b) analytic doubling plant: text||text re-finds the first copy
        // inside zlib's 32 KB window, so the doubled doc's ratio must sit
        // FAR below the single copy's (0.75 is a loose bound for any
        // >=200-byte input; measured ~0.52)
        val paired = baseDocs.where(octet_length(col("text")) >= 200)
          .select(
            Compress.deflateLen(col("text")).cast("double").as("d1"),
            octet_length(col("text")).cast("double").as("b1"),
            Compress.deflateLen(concat(col("text"), col("text"))).cast("double").as("d2"))
          .localCheckpoint(true)
        val nPair = paired.count()
        val okPair = paired
          .where(col("d2") / (col("b1") * 2) < lit(0.75) * (col("d1") / col("b1"))).count()
        // (c) repetitive text compresses far below hex noise
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val plants = Seq(
          (1L, "spark table row " * 150), // repetitive
          (2L, (0 until 80).map(i => hex(s"seed$i")).mkString)) // hex noise
          .toDF("doc_id", "text")
        val pr = Compress.report(plants, "doc_id", "text").orderBy("doc_id")
          .select("compress_ratio").collect().map(_.getDouble(0))
        val plantsOk = pr(0) < 0.1 && pr(1) > 0.4 && pr(0) < pr(1)
        Result("q_compress_ratio",
          inRange == total && okPair == nPair && nPair >= 10 && plantsOk, total, inRange,
          s"deflate in (0, raw+16] on $inRange/$total docs; doubling plant $okPair/$nPair " +
            f"below the 0.75 bound; repetitive ${pr(0)}%.3f << hex-noise ${pr(1)}%.3f")
      }),

      "q_text_fingerprint" -> (() => {
        val fp = graft.operators.text.TextStats.fingerprint(docs, "doc_id", "text")
        // (a) planted twins fingerprint equal
        val a = fp.where(col("doc_id") < lit(Offset)).withColumnRenamed("fingerprint", "fp_a")
        val b = fp.where(col("doc_id") >= lit(Offset))
          .select((col("doc_id") - lit(Offset)).as("doc_id"), col("fingerprint").as("fp_b"))
        val twinEq = a.join(b, "doc_id").where(col("fp_a") === col("fp_b")).count()
        // (b) no collisions: distinct normalized texts == distinct prints
        val norm = docs.select(md5(lower(col("text"))).as("t"),
          graft.functions.GraftFunctions.fingerprint(split(lower(col("text")), " ")).as("f"))
        val nTexts = norm.select("t").distinct().count()
        val nPrints = norm.select("f").distinct().count()
        Result("q_text_fingerprint", twinEq == nDocPairs && nTexts == nPrints,
          nDocPairs, twinEq,
          s"planted twins fingerprint equal; $nPrints distinct prints for $nTexts distinct texts (no collisions)")
      }),

      // ---- near-dup gates: thresholds behave, not just exact twins ----
      "q_dedup_minhash_neardup" -> (() => {
        val mh = graft.operators.dedup.MinHashDedup
          .duplicatePairs(docsNear, "doc_id", "text", 0.5).localCheckpoint(true)
        // the verify stage computes EXACT shingle Jaccard, so a found
        // planted pair must carry exactly the analytic value; the far
        // pairs sit below threshold and must be filtered even when a
        // band collides (the verify stage is a hard guarantee)
        val exact = plantedPairsOf(mh, NearA)
          .where(col("jaccard") === lit(36.0 / 40.0)).count()
        val far = plantedPairsOf(mh, FarA).count()
        Result("q_dedup_minhash_neardup", exact == NearPairs && far == 0,
          NearPairs, exact,
          s"perturbed twins at analytic J=36/40 all banded+verified at exactly 0.9 " +
            s"(16x4 banding recall at J=0.9: 1-(1-0.9^4)^16 ~ 1-4e-8); " +
            s"far J=12/60 pairs emitted: $far (must be 0)")
      }),

      "q_dedup_simhash_neardup" -> (() => {
        // per-pair ground truth with the operator's own signature: a
        // 1-word edit on a ~40-feature doc lands on EITHER side of the
        // hamming-3 bar (the bar is tight by design), so the gate is the
        // exact partition: every planted pair whose true hamming <= 3
        // MUST be emitted (4x16-bit chunk pigeonhole makes candidacy a
        // structural guarantee, then the popcount verify keeps it) and
        // every planted pair beyond 3 must NOT be.
        val sig = graft.operators.dedup.SimHashDedup.signature(col("text"))
        val plantSigs = nearPlants.select(col("doc_id"), sig.as("sig"))
        val truth = plantSigs.where(
            (col("doc_id") >= TightA && col("doc_id") < TightA + NearPairs) ||
            (col("doc_id") >= FarA && col("doc_id") < FarA + NearPairs))
          .select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
          .join(plantSigs.select((col("doc_id") - PairGap).as("id_a"), col("sig").as("sig_b")),
            Seq("id_a"))
          .select(col("id_a"), (col("id_a") + PairGap).as("id_b"),
            bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("true_hamming"))
        val sh = graft.operators.dedup.SimHashDedup
          .duplicatePairs(docsNear, "doc_id", "text", 3)
        val joined = truth.join(sh, Seq("id_a", "id_b"), "left").localCheckpoint(true)
        val nWithin = joined.where(col("true_hamming") <= 3).count()
        val found = joined.where(col("true_hamming") <= 3 &&
          col("hamming") === col("true_hamming")).count()
        val leaked = joined.where(col("true_hamming") > 3 && col("hamming").isNotNull).count()
        val nontrivial = nWithin >= 10 && nWithin <= 2 * NearPairs - 10
        Result("q_dedup_simhash_neardup",
          found == nWithin && leaked == 0 && nontrivial, nWithin, found,
          s"planted 1-word-edit + far twins partitioned exactly at the hamming-3 bar: " +
            s"$found/$nWithin within-bar pairs emitted with hamming == truth, " +
            s"$leaked beyond-bar pairs leaked (must be 0); split non-trivial: $nontrivial")
      }),

      "q_dedup_embedding_approx_neardup" -> (() => {
        val twins = vecsNear.where(col("vec_id") >= lit(FlipNearOff))
          .select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
          .withColumn("id_a",
            when(col("id_b") >= FlipFarOff, col("id_b") - FlipFarOff)
              .otherwise(col("id_b") - FlipNearOff))
        // per-pair ground truth with the operator's own cosine over the
        // same vectors: identical expression => identical double, so a
        // found pair's rounded sim must EQUAL round(truth, 4)
        val truth = baseVecs.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
          .join(twins, Seq("id_a"))
          .select(col("id_a"), col("id_b"),
            graft.functions.GraftFunctions.cosine(col("v_a"), col("v_b")).as("truth"))
        val ap = graft.operators.dedup.EmbeddingDedup
          .duplicatePairsApprox(vecsNear, "vec_id", "embedding", 0.4,
            nLists = 8, iters = 2, nAssign = 2)
        val joined = truth.join(ap, Seq("id_a", "id_b"), "left").localCheckpoint(true)
        // The operator's REAL contract, asserted exactly:
        //  - HARD: every emitted planted pair (any truth band) carries
        //    sim == round(truth, 4) — the exact verify stage recomputes
        //    cosine over the same vectors with the same fold;
        //  - HARD: zero pairs below the 0.4 threshold emitted — the
        //    verify stage excludes them whether or not they co-bucket;
        //  - FLOOR: recall at truth >= 0.9 is >= 0.95. Co-bucketing is
        //    approximate BY CONSTRUCTION (Dedup.scala nAssign comment): a
        //    vector sitting near a Voronoi boundary can straddle cells
        //    under an arbitrarily small perturbation, so 100% recall
        //    above any threshold < 1 is not a theorem — measured 374/375
        //    at sf0.1, 100% at sf0.001/sf0.01. The 100%-recall gate for
        //    this operator is the exact-twin plant above (identical input
        //    => identical nearest centroids, structural).
        val nMust = joined.where(col("truth") >= 0.9).count()
        val found = joined.where(col("truth") >= 0.9 && col("sim").isNotNull).count()
        val wrongSim = joined.where(col("sim").isNotNull &&
          !(col("sim") === graft.functions.ExactMath.hashRound(col("truth"), 4))).count()
        val midTotal = joined.where(col("truth") >= 0.4 && col("truth") < 0.9).count()
        val midFound = joined.where(col("truth") >= 0.4 && col("truth") < 0.9 &&
          col("sim").isNotNull).count()
        val leaked = joined.where(col("truth") < 0.4 && col("sim").isNotNull).count()
        Result("q_dedup_embedding_approx_neardup",
          wrongSim == 0 && leaked == 0 && nMust >= 10 &&
            found >= math.ceil(0.95 * nMust).toLong, nMust, found,
          s"sign-flip twins (norm preserved exactly): recall at known cos >= 0.9 " +
            s"is $found/$nMust (floor 0.95 — co-bucketing is approximate by " +
            s"construction); every emitted pair at sim == hashRound(truth, 4): " +
            s"${wrongSim == 0}; mid-band [0.4,0.9) recall $midFound/$midTotal " +
            s"(informational); below-0.4 pairs emitted: $leaked (must be 0)")
      }),

      "q_dedup_semantic" -> (() => {
        // SELF-CONTAINED planted corpus (unlike the pair gates, which
        // plant into the real corpus): dedupe-collapse assertions need
        // the TRUE component structure, and real corpus vectors carry
        // uncontrolled cross-similarities that could merge components.
        // Two-coordinate supports keep every CROSS-family cosine at or
        // below 0 (disjoint supports fold to exactly 0.0; shared-support
        // cross terms are 0.48 − 0.48 = 0.0 exactly or 0.36 − 0.64 < 0),
        // so components == planted pairs by construction. Three plant
        // families over 64 dims:
        //  - j in [0,16): EXACT copies (identical vector => identical
        //    centroid, structural) — must ALL collapse;
        //  - j in [16,32): near twins at cos = 0.96 (support (0.8,0.6)
        //    vs (0.6,0.8)) — recall floor 15/16 (Voronoi straddle);
        //  - j in [32,48): far twins at cos = 0.0 (orthogonal supports)
        //    — must NEVER collapse (the exact verify stage excludes
        //    sub-threshold pairs, hard).
        // Every twin (id + 1000) carries the HIGHER score, so keep-best
        // must retain the twin and drop the original — proving the
        // quality policy is live, not the min-id default.
        val dim = 64
        def vec(support: Int, a: Double, b: Double): Seq[Double] =
          Seq.tabulate(dim)(i =>
            if (i == 2 * support) a else if (i == 2 * support + 1) b else 0.0)
        val plants: Seq[(Long, Seq[Double], Double)] =
          (0 until 16).flatMap { j =>
            Seq((j.toLong, vec(j, 0.8, 0.6), 1.0),
              (j + 1000L, vec(j, 0.8, 0.6), 2.0))
          } ++ (16 until 32).flatMap { j =>
            Seq((j.toLong, vec(j, 0.8, 0.6), 1.0),
              (j + 1000L, vec(j, 0.6, 0.8), 2.0))
          } ++ (32 until 48).flatMap { j =>
            // orthogonal supports WITHIN the far pair: (j-32) vs (j-16)
            Seq((j.toLong, vec(j - 32, 0.6, -0.8), 3.0),
              (j + 1000L, vec(j - 16, 0.6, -0.8), 4.0))
          }
        val pdf = plants.toDF("vec_id", "embedding", "score")
        val survivors = graft.operators.dedup.EmbeddingDedup
          .dedupeSemantic(pdf, "vec_id", "embedding", col("score"), 0.4,
            nLists = 4, iters = 2, nAssign = 2)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val copyOk = (0 until 16).forall(j =>
          survivors(j + 1000L) && !survivors(j.toLong))
        val nearCollapsed = (16 until 32).count(j =>
          !(survivors(j.toLong) && survivors(j + 1000L)))
        val nearKeepBest = (16 until 32).forall(j =>
          (survivors(j.toLong) && survivors(j + 1000L)) || // not collapsed
            (survivors(j + 1000L) && !survivors(j.toLong))) // collapsed -> twin kept
        val farOk = (32 until 48).forall(j =>
          survivors(j.toLong) && survivors(j + 1000L))
        Result("q_dedup_semantic",
          copyOk && farOk && nearKeepBest && nearCollapsed >= 15,
          32L, 16L + nearCollapsed,
          s"semantic dedupe on disjoint-support plants: exact copies all collapse " +
            s"to the higher-score twin: $copyOk; near twins (cos 0.96) collapsed " +
            s"$nearCollapsed/16 (floor 15 — Voronoi straddle), every collapse " +
            s"keeps the best: $nearKeepBest; far twins (cos 0.0) all survive: $farOk")
      }),

      "q_dedup_semantic_hotcell" -> (() => {
        // the over-cap IVF cell seam, closed (VERDICT r15 #1): plant a
        // DELIBERATELY hot cell — 64 exact copies of one vector family,
        // more than 2x the 30-row cap, so its first-choice cell is
        // over-cap no matter how the 2-cell quantizer places the rest —
        // and require every planted pair still recovered. Pre-r16 the
        // hot cell was EXCLUDED from pairing: the flood would survive
        // undeduplicated and this gate fails. Same disjoint-support
        // geometry as the q_dedup_semantic gate (cross-family cosines
        // <= 0); near/far twins ride usable cells or the hot cell's
        // direct rep pairing (the <= 25 distinct reps fit the cap), so
        // recovery is complete up to the one-straddle twin floor.
        val dim = 64
        def vec(support: Int, a: Double, b: Double): Seq[Double] =
          Seq.tabulate(dim)(i =>
            if (i == 2 * support) a else if (i == 2 * support + 1) b else 0.0)
        val plants: Seq[(Long, Seq[Double], Double)] =
          (0 until 64).map(j => (j.toLong, vec(0, 0.8, 0.6), j + 1.0)) ++ // flood: 64 copies, best = id 63
            (1 to 8).flatMap { j =>
              Seq((100L + j, vec(j, 0.8, 0.6), 1.0),
                (1100L + j, vec(j, 0.6, 0.8), 2.0)) // near twins at cos 0.96
            } ++ (9 to 12).flatMap { j =>
              Seq((200L + j, vec(j, 0.6, -0.8), 3.0),
                (1200L + j, vec(j + 4, 0.6, -0.8), 4.0)) // far twins at cos 0.0
            }
        val pdf = plants.toDF("vec_id", "embedding", "score")
        val survivors = graft.operators.dedup.EmbeddingDedup
          .dedupeSemantic(pdf, "vec_id", "embedding", col("score"), 0.4,
            nLists = 2, iters = 2, nAssign = 2, maxCellSize = 30)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val floodOk = survivors(63L) && (0 until 63).forall(j => !survivors(j.toLong))
        val nearCollapsed = (1 to 8).count(j =>
          !(survivors(100L + j) && survivors(1100L + j)))
        val nearKeepBest = (1 to 8).forall(j =>
          (survivors(100L + j) && survivors(1100L + j)) ||
            (survivors(1100L + j) && !survivors(100L + j)))
        val farOk = (9 to 12).forall(j =>
          survivors(200L + j) && survivors(1200L + j))
        Result("q_dedup_semantic_hotcell",
          floodOk && farOk && nearKeepBest && nearCollapsed >= 7,
          64L + 8L, 64L + nearCollapsed,
          s"planted over-cap cell (64 copies vs cap 30): flood collapses to the " +
            s"best-scored copy: $floodOk; near twins collapsed $nearCollapsed/8 " +
            s"(floor 7), keep-best live: $nearKeepBest; far twins survive: $farOk")
      })
    )

    checks.map { case (name, c) =>
      try c()
      catch { case e: Throwable =>
        Result(name, pass = false, 0L, 0L, s"threw: ${e.getMessage}")
      }
    }
  }

  // same escape contract as Verify's oracle_sql dump: quotes, backslashes
  // and ALL control chars — exception messages in the "threw:" path carry
  // quotes/newlines, and the artifact must stay parseable exactly when a
  // check fails
  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def toJson(rs: Seq[Result]): String =
    rs.map { r =>
      s""""${esc(r.name)}": {"pass": ${r.pass}, "planted": ${r.planted}, "found": ${r.found}, "detail": "${esc(r.detail)}"}"""
    }.mkString("{", ", ", "}")
}
