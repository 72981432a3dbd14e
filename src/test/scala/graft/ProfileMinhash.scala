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
    val cand = MinHashDedup.candidatePairs(docs, "doc_id", "text")
    time("candidatePairs")(cand.count())
    val dup = MinHashDedup.duplicatePairs(docs, "doc_id", "text", 0.5)
    time("duplicatePairs")(dup.count())
    time("dedupe")(MinHashDedup.dedupe(docs, "doc_id", "text", 0.5).count())
    time("ngram stats")(NGramJaccardDedup.stats(docs, "doc_id", "text").count())
    spark.stop()
  }
}
