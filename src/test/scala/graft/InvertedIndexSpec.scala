package graft

import org.apache.spark.sql.functions._

import graft.operators.text.InvertedIndex
import graft.sources.Snapshot

class InvertedIndexSpec extends SparkSpecBase {
  import spark.implicits._

  test("build: distinct postings, tokenizer parity, null/empty hygiene") {
    val docs = Seq(
      (Option(1L), Option("Spark spark  JOIN")), // dup token collapses; double space -> empty dropped
      (Option(2L), Option("stream")),
      (Option(3L), Option.empty[String]), // null text -> nothing
      (Option.empty[Long], Option("spark")) // null id -> nothing
    ).toDF("doc_id", "text")
    val got = InvertedIndex.build(docs, "doc_id", "text", 8)
      .select("term", "doc_id").as[(String, Long)].collect().toSet
    assert(got == Set(("spark", 1L), ("join", 1L), ("stream", 2L)))
    // bucket column matches the driver-side bucket function everywhere
    InvertedIndex.build(docs, "doc_id", "text", 8)
      .collect().foreach { r =>
        assert(r.getAs[Long]("bucket") == InvertedIndex.bucketOf(r.getAs[String]("term"), 8))
      }
  }

  test("searchAnd: AND semantics, absent term empties, duplicate terms rejected") {
    val docs = Seq(
      (1L, "spark stream join"),
      (2L, "spark only here"),
      (3L, "stream alone"),
      (4L, "spark stream")
    ).toDF("doc_id", "text")
    val postings = InvertedIndex.build(docs, "doc_id", "text", 8)
    assert(InvertedIndex.searchAnd(postings, Seq("spark", "stream"))
      .as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(InvertedIndex.searchAnd(postings, Seq("spark"))
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    assert(InvertedIndex.searchAnd(postings, Seq("spark", "nosuchterm")).count() == 0L)
    intercept[IllegalArgumentException] {
      InvertedIndex.searchAnd(postings, Seq("spark", "spark"))
    }
  }

  test("phrase search: adjacency and order matter, repeated terms count correctly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a window join b window join"), // 2 adjacent occurrences
      (2L, "window x join"),               // terms present, not adjacent
      (3L, "join window"),                 // wrong order
      (4L, "go go go"),                    // repeated-term phrase
      (5L, "a b a b a")                    // 3-term phrase with overlap
    ).toDF("doc_id", "text")
    val post = InvertedIndex.buildPositional(docs, "doc_id", "text", nBuckets = 8)
    def got(terms: Seq[String]) = InvertedIndex.searchPhrase(post, terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(Seq("window", "join")) == Map(1L -> 2L))
    assert(got(Seq("go", "go")) == Map(4L -> 2L))
    assert(got(Seq("a", "b", "a")) == Map(5L -> 2L))
    assert(got(Seq("b", "a", "b")) == Map(5L -> 1L))
    intercept[IllegalArgumentException] { InvertedIndex.searchPhrase(post, Seq("a")) }
  }

  test("written index: search through openPostings equals the in-memory path and prunes partitions") {
    val docs = Snapshot(spark, sf()).documents
    val dir = "/tmp/graft-invidx-spec"
    InvertedIndex.writeIndex(docs, "doc_id", "text", dir, nBuckets = 16)

    val terms = Seq("spark", "stream")
    val viaIndex = InvertedIndex
      .searchAnd(InvertedIndex.openPostings(spark, dir, terms, 16), terms)
    val viaMemory = InvertedIndex
      .searchAnd(InvertedIndex.build(docs, "doc_id", "text", 16), terms)
    val a = viaIndex.as[Long].collect().sorted.toSeq
    val b = viaMemory.as[Long].collect().sorted.toSeq
    assert(a.nonEmpty && a == b)

    // the scan must prune to the terms' bucket partitions: PartitionFilters
    // carries the bucket predicate (the IvfKNN cell_id pattern), so only
    // those directories' files are read
    val opened = InvertedIndex.openPostings(spark, dir, terms, 16)
    opened.collect()
    val plan = opened.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).nonEmpty, plan.take(2000))
    // and the term filter is pushed to the parquet scan inside the buckets
    assert(plan.contains("PushedFilters") && plan.contains("term"), plan.take(2000))
  }
}
