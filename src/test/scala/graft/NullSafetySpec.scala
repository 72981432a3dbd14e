package graft

import org.apache.spark.sql.functions._

import graft.operators.dedup.{ExactDedup, MinHashDedup, SimHashDedup}
import graft.operators.text.TextStats

/** Documents-with-null-text behavior: null rows flow through expressions as
  * null and drop out of dedup candidate generation (never crash, never
  * pair). Real 100 TB corpora always contain malformed rows.
  */
class NullSafetySpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  test("minhash dedup survives null and empty text") {
    val survivors = MinHashDedup.dedupe(corpus, "doc_id", "text", 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors.contains(2L) && survivors.contains(3L)) // null/empty never pair
    assert(survivors.contains(1L) && !survivors.contains(4L)) // real dup still caught
  }

  test("simhash dedup survives null and empty text") {
    val survivors = SimHashDedup.dedupe(corpus, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors.contains(2L) && !survivors.contains(4L))
  }

  test("exact dedup groups nulls together without crashing") {
    val groups = ExactDedup.groups(corpus, "doc_id", "text")
    assert(groups.count() >= 2)
    // null text hashes to null -> one null-key group retaining min id
    val nullGroup = groups.where(col("content_hash").isNull).collect()
    assert(nullGroup.length == 1 && nullGroup.head.getAs[Long]("doc_id") == 2L)
  }

  test("text stats yield null rows, not exceptions, for null text") {
    val q = TextStats.quality(corpus, "doc_id", "text").where(col("doc_id") === 2L).collect().head
    assert(q.isNullAt(q.fieldIndex("n_chars")))
    val t = TextStats.tokenCounts(corpus, "doc_id", "text").where(col("doc_id") === 2L).collect().head
    assert(t.isNullAt(t.fieldIndex("bpe_tokens")))
  }
}
