package graft.operators.layout

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Data-layout tools for write-time optimization — at 100 TB the layout
  * of the files IS the index: a reader prunes on parquet footer min/max,
  * so what matters is how tight each file's min/max is on the columns
  * queries filter by.
  *
  * A linear sort gives perfect pruning on ONE column and none on the
  * others; z-ordering interleaves the range-bucket bits of k columns
  * ([[graft.functions.ZValue]]) so every file covers a small hyper-cube —
  * pruning works on ANY filtered subset of the z columns (the
  * Delta/Iceberg `OPTIMIZE ZORDER` shape, built here from public Spark
  * primitives: approx-quantile boundaries + a codegen'd Morton
  * expression + repartitionByRange).
  */
object Layout {

  /** Returns `df` range-partitioned and sorted by the z-value of
    * `colNames` — write the result as-is to get z-ordered files.
    *
    * Boundaries are per-column approx-quantiles (one distributed sketch
    * pass, driver receives k·(2^bits − 1) doubles — driver-sized by
    * construction) so heavily skewed columns still spread across all
    * 2^bits buckets. The z-value itself is map-side; the only corpus
    * shuffle is the range exchange every sorted write needs. An all-null
    * column degrades to bucket 0 for every row (no boundaries to learn)
    * rather than failing the write.
    */
  def zOrder(
      df: DataFrame,
      colNames: Seq[String],
      nPartitions: Int,
      bits: Int = 8,
      quantileErr: Double = 0.001): DataFrame = {
    require(colNames.nonEmpty, "need at least one z column")
    require(bits >= 1 && bits * colNames.length <= 63,
      s"bits($bits) * cols(${colNames.length}) must fit a long")
    require(nPartitions >= 1, s"nPartitions must be >= 1, got $nPartitions")
    val nb = (1 << bits) - 1
    val probs = (1 to nb).map(_.toDouble / (1 << bits)).toArray
    val casted = colNames.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"__zc$i") }
    val bnds = df.select(casted: _*)
      .stat.approxQuantile(colNames.indices.map(i => s"__zc$i").toArray, probs, quantileErr)
      .map(b => if (b.isEmpty) Array.fill(nb)(0.0) else b)
    val z = GraftFunctions.zvalue(colNames.map(c => col(c).cast("double")), bnds.map(_.toSeq).toSeq)
    df.withColumn("__z", z)
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Convenience: z-order and write parquet in one call. */
  def writeZOrdered(
      df: DataFrame,
      colNames: Seq[String],
      outDir: String,
      nFiles: Int,
      bits: Int = 8): Unit =
    zOrder(df, colNames, nFiles, bits).write.mode("overwrite").parquet(outDir)

  /** Write `df` as a BUCKETED catalog table — the co-located-join
    * layout SURVEY §4 prescribes for repeated big-to-big equi-joins:
    * both sides pre-hashed into the SAME bucket count on the join key
    * (and sorted within buckets), so the sort-merge join consumes the
    * files' bucketing directly and the plan carries NO Exchange on
    * either side — the shuffle is paid ONCE at write time and amortized
    * over every subsequent join/aggregation on the key (the LayoutSpec
    * plan-pins exactly that: zero exchanges under the bucketed join,
    * two under the plain-parquet control).
    *
    * Spark only honors bucketing through the session catalog, so this
    * writes an EXTERNAL table at `path` via `saveAsTable` (parquet
    * format; `spark.table(name)` reads it back bucket-aware). Bucket
    * counts must MATCH across join sides — the caller owns that
    * contract (mismatched counts silently fall back to a shuffle).
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      nBuckets: Int,
      keyCols: Seq[String]): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(keyCols.nonEmpty, "need at least one bucket key column")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(tableName)
  }

  /** Per-file min/max audit of a parquet directory: one row per data
    * file with `file, n_rows, <col>_min, <col>_max` for each requested
    * column — the view a footer-stats pruning reader has of the layout.
    * Run it after [[writeZOrdered]] (or any compaction) to see how tight
    * each file's ranges actually are, and therefore what fraction of
    * files a given predicate would touch.
    *
    * One distributed pass: the scan's `input_file_name` groups the
    * aggregate, so output is file-count-sized regardless of data size.
    */
  def fileStats(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      colNames: Seq[String]): DataFrame = {
    require(colNames.nonEmpty, "need at least one column to audit")
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Rewrites a parquet directory into ~`targetFileBytes` files — the
    * small-files compaction every long-lived ingestion pipeline needs
    * (a 100 TB table fed by per-batch appends decays into millions of
    * KB-sized files; footer-listing alone then dominates query startup).
    *
    * File count comes from the CURRENT on-disk bytes (the source listing
    * the read already performs — no data pass), so compression ratio is
    * preserved rather than re-guessed from row counts. The rewrite is one
    * round-robin repartition (no keys, no sort — layout-preserving
    * compaction; run [[writeZOrdered]] instead when re-clustering is
    * wanted). Writes to `outDir`, never in place: swapping the directory
    * atomically is the caller's (catalog's) concern.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    val hconf = spark.sparkContext.hadoopConfiguration
    // in-place guard must compare FS-resolved qualified paths: java.io.File
    // canonicalization would treat "file:///t" and "/t" (or an hdfs path
    // and its default-FS spelling) as different, and the overwrite would
    // delete the directory the lazy read is about to scan
    def qualified(p: String) = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(hconf).makeQualified(path)
    }
    require(qualified(inDir) != qualified(outDir),
      s"compact never rewrites in place (${qualified(inDir)}) — write to a new directory and swap")
    val fs = qualified(inDir).getFileSystem(hconf)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inDir)).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir).repartition(nFiles).write.mode("overwrite").parquet(outDir)
  }
}
