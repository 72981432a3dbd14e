package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Exact deduplication by content hash: hash-partitioned groupBy, keep the
  * lowest id per content key. One shuffle on the (high-cardinality, evenly
  * distributed) hash — the canonical 100 TB-safe exact dedup.
  */
object ExactDedup {
  def groups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(lower(col(contentCol))).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Survivors only (keep-first). */
  def dedupe(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.join(groups(df, idCol, contentCol).select(idCol), Seq(idCol), "left_semi")
}

private[dedup] object Shingling {
  /** Distinct word n-gram shingles of the lowercased text; texts shorter
    * than the shingle size collapse to a single whole-text shingle.
    */
  def shingles(textCol: Column, n: Int): Column = {
    val words = split(lower(textCol), " ")
    when(
      size(words) >= n,
      array_distinct(
        transform(sequence(lit(0), size(words) - n), i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", words)))
  }

  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")
}

/** MinHash + LSH near-duplicate detection.
  *
  * Pipeline: word-shingles → xxhash64 per shingle → 64-slot MinHash
  * signature (native expression, one pass) → 16 bands of 4 rows → banded
  * bucket self-join → exact Jaccard verify on candidates only.
  *
  * Scale: the only shuffle is on (band, bucket) — near-uniform keys; the
  * quadratic verify runs per bucket, never on the corpus. `maxBucketSize`
  * drops degenerate buckets (boilerplate shingle sets) the way production
  * dedup pipelines do, keeping worst-case candidates bounded.
  */
object MinHashDedup {
  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4
  val DefaultShingle = 3

  /** Fixed seeded multiply-shift coefficients (odd multipliers). */
  lazy val coeffs: Seq[(Long, Long)] = {
    val r = new scala.util.Random(42)
    Seq.fill(NumHashes)((r.nextLong() | 1L, r.nextLong()))
  }

  def signature(textCol: Column, shingle: Int = DefaultShingle): Column =
    GraftFunctions.minhashSig(transform(Shingling.shingles(textCol, shingle), s => xxhash64(s)))

  /** Candidate pairs (id_a < id_b) from banded LSH buckets, with exact
    * Jaccard over shingle sets attached.
    */
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingle: Int = DefaultShingle,
      maxBucketSize: Int = 1000): DataFrame = {
    val base = df.select(
      col(idCol).as("id"),
      signature(col(textCol), shingle).as("sig"),
      Shingling.shingles(col(textCol), shingle).as("sh"))

    val bandCols = (0 until Bands).map { k =>
      struct(lit(k).as("band"), xxhash64(lit(k), slice(col("sig"), k * RowsPerBand + 1, RowsPerBand)).as("bucket"))
    }
    val banded = base
      .select(col("id"), col("sh"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    // Cap degenerate buckets before the self-join (skew guard).
    val sized = banded.withColumn(
      "bsz",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
    val bounded = sized.where(col("bsz") <= maxBucketSize).drop("bsz")

    val l = bounded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = bounded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", Shingling.jaccard(col("sh_a"), col("sh_b")))
      .drop("sh_a", "sh_b")
  }

  def duplicatePairs(df: DataFrame, idCol: String, textCol: String, threshold: Double = 0.5): DataFrame =
    candidatePairs(df, idCol, textCol).where(col("jaccard") >= threshold)

  /** Keep-first survivors: drop any doc near-matching a lower-id doc. */
  def dedupe(df: DataFrame, idCol: String, textCol: String, threshold: Double = 0.5): DataFrame = {
    val losers = duplicatePairs(df, idCol, textCol, threshold).select(col("id_b").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}

/** SimHash near-duplicate detection: 64-bit signature (native expression),
  * 4×16-bit chunk pigeonhole banding (any pair within hamming distance 3
  * shares at least one exact chunk), popcount verify on candidates.
  */
object SimHashDedup {
  val Chunks = 4
  val ChunkBits = 16

  def signature(textCol: Column): Column =
    GraftFunctions.simhash(split(lower(textCol), " "))

  def candidatePairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), signature(col(textCol)).as("sig"))
    val chunkCols = (0 until Chunks).map { c =>
      struct(lit(c).as("band"), shiftrightunsigned(col("sig"), c * ChunkBits).bitwiseAND(lit(0xFFFFL)).as("bucket"))
    }
    val banded = base
      .select(col("id"), col("sig"), explode(array(chunkCols: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .drop("sig_a", "sig_b")
  }

  def duplicatePairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame =
    candidatePairs(df, idCol, textCol).where(col("hamming") <= maxHamming)

  def dedupe(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val losers = duplicatePairs(df, idCol, textCol, maxHamming).select(col("id_b").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}

/** n-gram Jaccard near-dup: candidates = pairs sharing ≥1 exact shingle
  * (exploded-shingle equi-join), then exact Jaccard verify. More recall
  * than MinHash banding, more candidates — the scale guard is the shared-
  * shingle frequency cap.
  */
object NGramJaccardDedup {
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingle: Int = 5,
      maxShingleFreq: Int = 100): DataFrame = {
    val base = df.select(col(idCol).as("id"), Shingling.shingles(col(textCol), shingle).as("sh"))
    val exploded = base.select(col("id"), col("sh"), explode(col("sh")).as("s"))
    val bounded = exploded
      .withColumn("freq", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("s")))
      .where(col("freq") <= maxShingleFreq)
    val l = bounded.select(col("s"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = bounded.select(col("s"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("s"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", Shingling.jaccard(col("sh_a"), col("sh_b")))
      .drop("sh_a", "sh_b")
  }

  /** Per-doc candidate stats (total, always one row per doc). */
  def stats(df: DataFrame, idCol: String, textCol: String, shingle: Int = 5): DataFrame = {
    val pairs = candidatePairs(df, idCol, textCol, shingle)
    val perDoc = pairs
      .select(col("id_a").as("id"), col("jaccard"))
      .unionAll(pairs.select(col("id_b").as("id"), col("jaccard")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_candidates"), max(col("jaccard")).as("max_jaccard"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"))
  }
}

/** Embedding-cosine near-dup: exact pairwise above a threshold. At test SF
  * this is a (broadcast) self-join; the 100 TB path routes candidates
  * through [[graft.operators.ann.LshKNN]] buckets first — same verify.
  */
object EmbeddingDedup {
  def duplicatePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", GraftFunctions.cosine(col("v_a"), col("v_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }
}
