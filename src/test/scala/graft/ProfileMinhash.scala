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
    // force signature evaluation (count() alone would prune the column)
    val sh = docs.select(col("doc_id"), MinHashDedup.signature(col("text")).as("sig"))
    time("signatures (forced)")(sh.agg(max(element_at(col("sig"), 1))).count())
    // one execution only: the hash-agg head() already forces every column
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
        .agg(sum("h"), count(lit(1))).head().getLong(1)
    }
    val cand = MinHashDedup.candidatePairs(docs, "doc_id", "text")
    time("candidatePairs")(force(cand))
    time("dedupe")(force(MinHashDedup.dedupe(docs, "doc_id", "text", 0.5)))
    val np = NGramJaccardDedup.candidatePairs(docs, "doc_id", "text")
    time("ngram candidatePairs")(force(np))
    time("ngram stats")(force(NGramJaccardDedup.stats(docs, "doc_id", "text")))
    spark.stop()
  }
}
