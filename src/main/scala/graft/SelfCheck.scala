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
