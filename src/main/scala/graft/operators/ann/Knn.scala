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
      .select(col("query_id"), col("rnk"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }
}

/** IVF (inverted-file) ANN: a coarse k-means quantizer partitions the
  * corpus into `nLists` cells; queries score only the `nProbe` nearest
  * cells. Candidates/query ≈ nProbe/nLists of the corpus.
  *
  * Training is distributed Lloyd's: assignment is a broadcast join against
  * the (tiny) centroid set, the update is one groupBy — per iteration one
  * shuffle of (cell, vector) pairs. Centroid init is a deterministic
  * hash-sample of the corpus. At 100 TB: train on a sample, assign the
  * full corpus once, store cell ids alongside the vectors (partition by
  * cell) so queries touch nProbe partitions only.
  */
object IvfKNN {
  import graft.functions.GraftFunctions.cosine

  /** Assigns each row its nearest centroid: broadcast join + argmax via
    * partial-aggregating min(struct) — each map task reduces the nLists
    * candidate rows per input row before any shuffle (a per-row window
    * would shuffle and sort corpus×nLists rows instead). Output = df
    * columns + `cell_id`; ties go to the lowest cell id.
    */
  def assign(df: DataFrame, vecCol: String, centroids: DataFrame): DataFrame = {
    val payload = df.columns.toIndexedSeq
    val scored = df
      .withColumn("__rid", monotonically_increasing_id())
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", cosine(col(vecCol), col("centroid")))
      // cosine is null for zero-norm input; a null negSim would win min()
      // and collapse the whole corpus into one cell
      .where(col("__sim").isNotNull)
    scored
      .groupBy("__rid")
      .agg(
        min(struct((-col("__sim")).as("negSim"), col("cell_id"))).as("__best"),
        payload.map(c => first(col(c)).as(c)): _*)
      .select(payload.map(col) :+ col("__best.cell_id").as("cell_id"): _*)
  }

  /** Trains the coarse quantizer: deterministic hash-sample init, then
    * `iters` Lloyd's rounds (assign = broadcast join; update = elementwise
    * mean via posexplode + groupBy). Returns (cell_id, centroid:
    * array<double>) for non-empty cells.
    */
  def train(corpus: DataFrame, vecCol: String, nLists: Int, iters: Int = 5): DataFrame = {
    val asDouble = transform(col(vecCol), v => v.cast("double"))
    // distributed TakeOrdered for the seed sample (a global row_number
    // window would drag the whole corpus into one partition); the window
    // below ranks only the nLists sampled rows
    val seed = corpus
      .select(asDouble.as("centroid"))
      .withColumn("__h", xxhash64(col("centroid").cast("array<string>")))
      .orderBy("__h")
      .limit(nLists)
    val initW = org.apache.spark.sql.expressions.Window.orderBy("__h")
    var centroids = seed
      .withColumn("cell_id", row_number().over(initW).cast("long") - 1L)
      .select(col("cell_id"), col("centroid"))
      .localCheckpoint(true)

    val vectors = corpus.select(asDouble.as("__v"))
    var i = 0
    while (i < iters) {
      val assigned = assign(vectors, "__v", centroids)
      val updated = assigned
        .select(col("cell_id"), posexplode(col("__v")))
        .groupBy("cell_id", "pos")
        .agg(avg(col("col")).as("m"))
        .groupBy("cell_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell_id"), transform(col("pm"), x => x.getField("m")).as("centroid"))
      centroids = updated.localCheckpoint(true)
      i += 1
    }
    centroids
  }

  /** A built IVF index: the trained quantizer plus the cell-assigned
    * corpus. Build once, search many — at 100 TB the assigned corpus is
    * what you persist, partitioned by cell_id, so each query touches only
    * its probed cells' partitions.
    */
  final case class Index(centroids: DataFrame, assigned: DataFrame)

  def buildIndex(
      corpus: DataFrame,
      corpusIdCol: String,
      corpusVecCol: String,
      nLists: Int = 16,
      iters: Int = 5): Index = {
    val centroids = train(corpus, corpusVecCol, nLists, iters)
    val assigned = assign(
      corpus.select(col(corpusIdCol).as("neighbor_id"), col(corpusVecCol).as("__cv")),
      "__cv", centroids)
      .localCheckpoint(true)
    Index(centroids, assigned)
  }

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

  def search(
      index: Index,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    val centroids = index.centroids
    val assigned = index.assigned

    val qw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__sim").desc, col("cell_id"))
    val probes = queries
      .select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", cosine(col("__qv"), col("centroid")))
      .withColumn("__rn", row_number().over(qw))
      .where(col("__rn") <= nProbe)
      .select(col("query_id"), col("__qv"), col("cell_id"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    assigned
      .join(broadcast(probes), Seq("cell_id"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }
}

/** Random-hyperplane LSH ANN: sign-bit signature; candidates share the
  * query's bucket or any bucket within hamming distance 2 (multiprobe).
  * Expected candidates/query ≈ 37 · |corpus| / 2^8. Bits/probes trade
  * recall for candidate count: more corpus per bucket → raise NumPlanes
  * (the signature is cheap; the knob is load-dependent, not data-dependent).
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
      .select(col("query_id"), col("rnk"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }
}
