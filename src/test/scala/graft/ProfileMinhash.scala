package graft

// scratch profiler (test scope, not shipped): sbt "Test/runMain graft.ProfileMinhash"
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.dedup._
    val spark = GraftSession.local(32)
    val docs = graft.sources.Snapshot(spark, "/root/testdata/sf0.1").documents
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("docs count")(docs.count())
    val sh = docs.select(col("doc_id"), MinHashDedup.signature(col("text")).as("sig"))
    time("signatures")(sh.count())
    time("signatures again")(sh.count())
    // bisect candidatePairs
    val banded = docs
      .select(col("doc_id").as("id"),
        graft.functions.GraftFunctions.bandBuckets(MinHashDedup.signature(col("text"))).as("bs"))
      .select(col("id"), posexplode(col("bs")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("banded")(banded.count())
    val sized = banded.withColumn("bsz",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
    val bounded = sized.where(col("bsz") <= 1000).drop("bsz")
    time("bounded (window)")(bounded.count())
    val pairs = bounded.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(bounded.select(col("band"), col("bucket"), col("id").as("id_b")), Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
    time("pairs (self-join)")(pairs.count())
    val cand = MinHashDedup.candidatePairs(docs, "doc_id", "text")
    time("candidatePairs")(cand.count())
    val dup = MinHashDedup.duplicatePairs(docs, "doc_id", "text", 0.5)
    time("duplicatePairs")(dup.count())
    time("dedupe")(MinHashDedup.dedupe(docs, "doc_id", "text", 0.5).count())
    time("ngram stats")(NGramJaccardDedup.stats(docs, "doc_id", "text").count())
    spark.stop()
  }
}
