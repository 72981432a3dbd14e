package graft.operators.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Re-expresses the reference's `mini_retrieve_similar_keywords`
  * (/root/reference/openai/list_of_tools.py:121 — cosine top-k over stored
  * embeddings) as a distributed operator, with a correctness baseline
  * (brute force) and a scale path (random-hyperplane LSH).
  */
object BruteForceKNN {

  /** Exact top-k per query vector. Queries are broadcast (they're the small
    * side by construction); the corpus is scanned exactly once — the right
    * plan at any corpus size as long as |queries| is bounded.
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      corpusIdCol: String,
      corpusVecCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    // excludeSelf only makes sense when queries and corpus share an id
    // space (queries drawn from the corpus); pass false for cross-table KNN
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv")))
    val c = corpus.select(col(corpusIdCol).as("neighbor_id"), col(corpusVecCol).as("__cv"))
    val scored = c
      .crossJoin(q)
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", GraftFunctions.cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), graft.functions.ExactMath.hashRound(col("sim"), 4).as("sim"))
  }
}

/** IVF (inverted-file) ANN — the library's DEFAULT approximate-NN path
  * (LshKNN below is the cheap/low-recall alternative): a coarse k-means
  * quantizer partitions the corpus into `nLists` cells; queries score only
  * the `nProbe` nearest cells. Candidates/query ≈ nProbe/nLists of the
  * corpus.
  *
  * The centroid set is tiny (nLists×dim doubles), so it lives on the
  * driver and ships inside a codegen'd expression: assignment is MAP-ONLY
  * — zero shuffles over the corpus, per training round or for the final
  * index build. The only shuffle in training is the centroid update, and
  * partial aggregation collapses it to ≤ partitions×nLists×dim slim rows.
  * At 100 TB: train on a sample, assign the full corpus in one map-only
  * pass, persist the assigned corpus partitioned by cell so queries touch
  * nProbe partitions only.
  */
object IvfKNN {
  import graft.functions.GraftFunctions
  import graft.functions.GraftFunctions.cosine

  /** Map-only assignment: appends `cell_id` = nearest centroid by cosine
    * (ties → lowest cell id) via a driver-embedded literal centroid set —
    * no join, no shuffle, stays inside whole-stage codegen. Zero-norm
    * vectors go to cell 0 (deterministic, never dropped); null vectors get
    * a null cell_id.
    */
  def assign(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): DataFrame =
    df.withColumn("cell_id", GraftFunctions.nearestCentroid(col(vecCol), centroids))

  /** Trains the coarse quantizer: deterministic hash-sample init, then
    * `iters` Lloyd's rounds. Assignment is map-only; the update's
    * posexplode+groupBy shuffles only the partially-aggregated
    * (cell, pos, sum) triples. Means go through the decimal path so the
    * trained centroids are bit-stable across partitionings/AQE re-plans.
    * Cells that end a round empty keep their previous centroid, so cell
    * ids stay dense 0..nLists-1.
    */
  def trainCentroids(
      corpus: DataFrame, vecCol: String, nLists: Int, iters: Int = 5,
      maxTrainRows: Long = 100000L): Seq[Seq[Double]] = {
    val asDouble = transform(col(vecCol), v => v.cast("double"))
    // distributed TakeOrdered for the seed sample (a global row_number
    // window would drag the whole corpus into one partition)
    val seed = corpus
      .select(asDouble.as("centroid"))
      .where(col("centroid").isNotNull)
      .withColumn("__h", xxhash64(col("centroid").cast("array<string>")))
      .orderBy("__h")
      .limit(nLists)
      .select("centroid")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(seed.nonEmpty, "cannot train IVF on an empty corpus")

    // Lloyd's trains on a deterministic hash-sample of ~maxTrainRows (a
    // coarse quantizer needs a sample, not the corpus): at 100 TB the
    // training rounds scan a bounded set and only the final map-only
    // assignment touches every row. The count is taken on the BARE input
    // (no projection/filter) so a parquet-backed corpus answers it from
    // footer metadata; null vectors make it an overcount, which only
    // shrinks the sample slightly below the target.
    val all = corpus.select(asDouble.as("__v")).where(col("__v").isNotNull)
    val total = corpus.count()
    val sampled = total > maxTrainRows
    val vectors =
      if (!sampled) all
      else {
        // 2^40 buckets so the keep fraction stays proportional down to
        // ~1e-12 — a 1e6 modulus would floor at 1e-6 and let the sample
        // grow linearly past the bound on very large corpora
        val buckets = 1L << 40
        val keep = (maxTrainRows.toDouble / total * buckets).toLong max 1L
        all.where(pmod(xxhash64(col("__v").cast("array<string>")), lit(buckets)) < keep)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    var cents: Array[Array[Double]] = seed
    val dim = cents.head.length
    var it = 0
    while (it < iters) {
      // collect() is nLists×dim rows — centroids are driver-sized by design
      val updated = assign(vectors, "__v", cents.map(_.toSeq).toSeq)
        .select(col("cell_id"), posexplode(col("__v")))
        .groupBy("cell_id", "pos")
        .agg(graft.functions.ExactMath.dmean(col("col")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      updated.foreach { r =>
        val cell = r.getLong(0).toInt; val pos = r.getInt(1)
        if (cell < next.length && pos < dim) next(cell)(pos) = r.getDouble(2)
      }
      cents = next
      it += 1
    }
    // the sample is only consumed by the loop above — release its blocks
    if (sampled) vectors.unpersist(false)
    cents.map(_.toSeq).toSeq
  }

  /** DataFrame view of [[trainCentroids]]: (cell_id, centroid). */
  def train(corpus: DataFrame, vecCol: String, nLists: Int, iters: Int = 5): DataFrame = {
    val cents = trainCentroids(corpus, vecCol, nLists, iters)
    corpus.sparkSession.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i.toLong, c) })
      .toDF("cell_id", "centroid")
  }

  /** A built IVF index: the trained quantizer plus the cell-assigned
    * corpus. Build once, search many — at 100 TB the assigned corpus is
    * what you write out, partitioned by cell_id, so each query touches
    * only its probed cells' partitions. Locally it is persisted
    * MEMORY_AND_DISK (recomputable lineage — an executor loss re-runs the
    * map-only assignment instead of failing the job).
    */
  final case class Index(centroids: Seq[Seq[Double]], assigned: DataFrame)

  def buildIndex(
      corpus: DataFrame,
      corpusIdCol: String,
      corpusVecCol: String,
      nLists: Int = 16,
      iters: Int = 5): Index = {
    val cents = trainCentroids(corpus, corpusVecCol, nLists, iters)
    val assigned = assign(
      corpus.select(col(corpusIdCol).as("neighbor_id"), col(corpusVecCol).as("__cv")),
      "__cv", cents)
      .where(col("cell_id").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Index(cents, assigned)
  }

  /** Durable form of the index: the assigned corpus written as parquet
    * PARTITIONED BY cell_id (plus a tiny centroids parquet). This is the
    * 100 TB artifact — a [[search]] over a loaded index hits only the
    * probed cells' partitions (partition pruning at the scan, PlanSpec-
    * asserted), so each query batch reads ~nProbe/nLists of the corpus.
    */
  def save(index: Index, path: String): Unit = {
    index.assigned.write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$path/assigned")
    writeCentroids(index, path)
  }

  private def writeCentroids(index: Index, path: String): Unit = {
    val spark = index.assigned.sparkSession
    spark.createDataFrame(
      index.centroids.zipWithIndex.map { case (c, i) => (i.toLong, c) })
      .toDF("cell_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** The centroid parquet layout (cell_id, centroid) decoded in ONE
    * place — load and appendToSaved must always agree on it.
    */
  private def readCentroids(
      spark: org.apache.spark.sql.SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell_id")
      .collect()
      .map(_.getSeq[Double](1).toSeq)
      .toSeq

  /** Incremental index growth for continuous ingestion: new vectors are
    * assigned with the EXISTING quantizer (map-only — the new batch is
    * the only thing scanned) and appended to the durable index's
    * cell-partitioned parquet; the already-indexed corpus is never
    * touched or rewritten. The quantizer itself is frozen — the standard
    * IVF operational contract: append while the data distribution holds,
    * retrain + rebuild when recall degrades. Fails fast on a batch whose
    * vector dimension differs from the quantizer's (the nearest-centroid
    * expression would otherwise silently prefix-truncate and corrupt the
    * durable index with garbage assignments).
    */
  def appendToSaved(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      newRows: DataFrame,
      idCol: String,
      vecCol: String): Unit = {
    val cents = readCentroids(spark, path)
    val dim = cents.head.length
    val badDim = newRows
      .where(col(vecCol).isNotNull && size(col(vecCol)) =!= dim)
      .limit(1).count()
    require(badDim == 0L,
      s"appendToSaved: batch contains vectors whose dimension != $dim " +
        s"(the saved quantizer's) — rebuild the index or fix the batch")
    // append to every representation that exists — a saveQuantized-only
    // index must not silently grow an unread float directory (the appended
    // vectors would be invisible to loadQuantized searches)
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(sub: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      p.getFileSystem(hconf).exists(p)
    }
    val (hasFloat, hasQ) = (exists("assigned"), exists("assigned_q"))
    require(hasFloat || hasQ, s"appendToSaved: no index artifact under $path")
    val assignedPlan = assign(
      newRows.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
      "__cv", cents)
      .where(col("cell_id").isNotNull)
    // when BOTH representations exist, the two writes are two jobs; a
    // non-deterministic batch source re-read between them would leave the
    // float and int8 indexes disagreeing about the same append — pin ONE
    // materialization and feed it to both writes
    val assigned =
      if (hasFloat && hasQ) assignedPlan.localCheckpoint(true) else assignedPlan
    if (hasFloat)
      assigned.write.mode("append").partitionBy("cell_id").parquet(s"$path/assigned")
    if (hasQ)
      assigned
        .withColumn("__qs", Quantize.scaleOf(col("__cv")))
        .withColumn("__qv", Quantize.quantizeVec(col("__cv"), col("__qs")))
        .drop("__cv")
        .write.mode("append").partitionBy("cell_id").parquet(s"$path/assigned_q")
  }

  /** `foreachBatch` sink for continuous index maintenance (D16): each
    * microbatch of an embedding stream appends to the saved index via
    * [[appendToSaved]] — frozen quantizer, map-only assignment, so
    * per-batch work is bounded by the batch alone and the indexed corpus
    * is never rescanned. All stored representations (float and/or int8)
    * grow together, from one pinned materialization per batch. The
    * StreamingSpec D16 gate: post-stream index contents == a one-shot
    * [[appendToSaved]] over the same rows.
    */
  def appendSink(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      idCol: String,
      vecCol: String): (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, _) => appendToSaved(spark, path, batch.toDF(), idCol, vecCol)

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    // partition-column type inference yields int for small cell ids; cast
    // back to the in-memory index's long for schema parity
    Index(readCentroids(spark, path), spark.read.parquet(s"$path/assigned")
      .withColumn("cell_id", col("cell_id").cast("long")))
  }

  /** [[save]] with the vectors int8-quantized ([[Quantize]]): the durable
    * index artifact shrinks ~4x — at 100 TB that is 4x more of each probed
    * cell in page cache and 4x less IO per query batch, for a bounded,
    * spec-measured recall cost. Cell assignments are computed on the FULL-
    * precision vectors before quantization, so cell membership is
    * identical to [[save]]'s; only in-cell scoring sees quantized data.
    */
  def saveQuantized(index: Index, path: String): Unit = {
    index.assigned
      .withColumn("__qs", Quantize.scaleOf(col("__cv")))
      .withColumn("__qv", Quantize.quantizeVec(col("__cv"), col("__qs")))
      .drop("__cv")
      .write.mode("overwrite").partitionBy("cell_id").parquet(s"$path/assigned_q")
    writeCentroids(index, path)
  }

  /** Loads a [[saveQuantized]] index. Dequantization is lazy — a transform
    * at the scan — so [[search]] plans (partition pruning included) are
    * byte-identical in shape to the float path's.
    */
  def loadQuantized(spark: org.apache.spark.sql.SparkSession, path: String): Index =
    Index(readCentroids(spark, path), spark.read.parquet(s"$path/assigned_q")
      .withColumn("cell_id", col("cell_id").cast("long"))
      .withColumn("__cv", Quantize.dequantizeVec(col("__qv"), col("__qs")))
      .drop("__qv", "__qs"))

  /** Approximate top-k: queries probe their `nProbe` nearest cells and
    * score only vectors assigned there. Builds a throwaway index; use
    * [[buildIndex]] + [[search]] to amortize training over many query
    * batches.
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      corpusIdCol: String,
      corpusVecCol: String,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      iters: Int = 5,
      excludeSelf: Boolean = true): DataFrame =
    search(buildIndex(corpus, corpusIdCol, corpusVecCol, nLists, iters),
      queries, queryIdCol, queryVecCol, k, nProbe, excludeSelf)

  /** Query-batch contract: with `broadcastQueries = true` (default) the
    * probe rows (query_id, vector, × nProbe) are broadcast — the right
    * plan while the batch fits comfortably in driver/executor memory
    * (interactive batches, ≲ 10^5 queries at typical dims). For bulk
    * batches beyond that, pass false: the join becomes a shuffle hash
    * join on cell_id, which scales with executors instead of OOMing the
    * broadcast.
    */
  def search(
      index: Index,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true,
      broadcastQueries: Boolean = true): DataFrame =
    searchImpl(index, queries, queryIdCol, queryVecCol, k, nProbe,
      excludeSelf, broadcastQueries, allowed = None)

  /** Metadata-FILTERED approximate search: top-k among corpus vectors
    * whose id appears in `allowed` — the vector-database "filtered
    * search" workload (top-k documents of one language / one source /
    * one tenant). Any metadata predicate reduces to an allowed-id table
    * computed on the metadata side, so the index stays slim (no schema
    * coupling) and the filter is a semi-join on the probed candidates
    * BEFORE ranking — post-filtering an unfiltered top-k list would
    * return fewer than k matching rows (or none, for selective
    * predicates), the classic filtered-ANN bug.
    *
    * Recall contract: filtering shrinks each probed cell's matching
    * population, so a selective predicate needs a HIGHER `nProbe` to
    * keep recall (at selectivity s, the expected matching candidates
    * per probe drop to s·|cell|). `nProbe = nLists` degenerates to
    * EXACT filtered search (every cell probed ⇒ candidates = corpus ∩
    * allowed, and in-cell scoring is exact) — the spec pins that
    * equality against the filtered brute-force.
    */
  def searchFiltered(
      index: Index,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      allowed: DataFrame,
      allowedIdCol: String,
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true,
      broadcastQueries: Boolean = true): DataFrame =
    searchImpl(index, queries, queryIdCol, queryVecCol, k, nProbe,
      excludeSelf, broadcastQueries,
      allowed = Some(allowed.select(col(allowedIdCol).as("neighbor_id")).distinct()))

  private def searchImpl(
      index: Index,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      nProbe: Int,
      excludeSelf: Boolean,
      broadcastQueries: Boolean,
      allowed: Option[DataFrame]): DataFrame = {
    // probe list is map-only too (no crossJoin/window over the query batch
    // — it can be large at scale); ordering inside the expression matches
    // the old (sim desc, cell_id) window tiebreak
    val probes = queries
      .select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv"))
      .select(col("query_id"), col("__qv"),
        explode(GraftFunctions.nearestCells(col("__qv"), index.centroids, nProbe)).as("cell_id"))

    // the allowed-id filter prunes the assigned corpus BEFORE the probe
    // join: candidates that can never rank drop at the scan, not after
    // paying the cosine
    val candidates = allowed match {
      case Some(ids) => index.assigned.join(ids, Seq("neighbor_id"), "left_semi")
      case None => index.assigned
    }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    candidates
      .join(if (broadcastQueries) broadcast(probes) else probes, Seq("cell_id"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), graft.functions.ExactMath.hashRound(col("sim"), 4).as("sim"))
  }
}

/** Random-hyperplane LSH ANN — the CHEAP / LOW-RECALL option (measured
  * recall@5 ≈ 0.3 on near-uniform 64-dim data at the defaults; [[IvfKNN]]
  * is the library's default ANN path at ≈ 0.58). Use LSH when candidate
  * generation must be a pure projection (no training pass at all) and
  * recall is secondary. Sign-bit signature; candidates share the query's
  * bucket or any bucket within hamming distance 2 (multiprobe). Expected
  * candidates/query ≈ 37 · |corpus| / 2^8. Bits/probes trade recall for
  * candidate count: more corpus per bucket → raise NumPlanes (the
  * signature is cheap; the knob is load-dependent, not data-dependent).
  */
object LshKNN {
  val NumPlanes = 8
  val Dim = 64

  /** Fixed seeded hyperplanes. */
  lazy val planes: Seq[Seq[Double]] = {
    val r = new scala.util.Random(7)
    Seq.fill(NumPlanes)(Seq.fill(Dim)(r.nextGaussian()))
  }

  def bucketOf(vecCol: Column): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        when(GraftFunctions.dot(vecCol, typedlit(p)) > 0d, lit(1 << i)).otherwise(lit(0))
      }
      .reduce(_ + _)

  /** Query probe set: own bucket + all buckets within hamming distance 2. */
  private def probeBuckets(bucket: Column): Column = {
    val flips1 = (0 until NumPlanes).map(i => bucket.bitwiseXOR(lit(1 << i)))
    val flips2 = for {
      i <- 0 until NumPlanes; j <- (i + 1) until NumPlanes
    } yield bucket.bitwiseXOR(lit((1 << i) | (1 << j)))
    array(bucket +: (flips1 ++ flips2): _*)
  }

  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      corpusIdCol: String,
      corpusVecCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(
      col(corpusIdCol).as("neighbor_id"),
      col(corpusVecCol).as("__cv"),
      bucketOf(col(corpusVecCol)).as("bucket"))
    val q = queries
      .select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv"), bucketOf(col(queryVecCol)).as("qb"))
      .select(col("query_id"), col("__qv"), explode(probeBuckets(col("qb"))).as("bucket"))
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", GraftFunctions.cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), graft.functions.ExactMath.hashRound(col("sim"), 4).as("sim"))
  }
}
