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
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv")))
    val c = corpus.select(col(corpusIdCol).as("neighbor_id"), col(corpusVecCol).as("__cv"))
    val scored = c
      .crossJoin(q)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", GraftFunctions.cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
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
      k: Int): DataFrame = {
    val c = corpus.select(
      col(corpusIdCol).as("neighbor_id"),
      col(corpusVecCol).as("__cv"),
      bucketOf(col(corpusVecCol)).as("bucket"))
    val q = queries
      .select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv"), bucketOf(col(queryVecCol)).as("qb"))
      .select(col("query_id"), col("__qv"), explode(probeBuckets(col("qb"))).as("bucket"))
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", GraftFunctions.cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }
}
