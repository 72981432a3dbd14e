package graft

import org.apache.spark.sql.functions._

import graft.operators.text.HtmlExtract
import graft.sources.Snapshot

/** HTML -> text extraction: planted exact-output cases pin the order
  * contract (blocks before tags before entities, `&amp;` last,
  * whitespace collapse), the unclosed-block degradation, the link
  * counter, and the composition that makes extraction useful — an
  * HTML-wrapped doc deduplicates with its plain-text twin downstream.
  */
class HtmlExtractSpec extends SparkSpecBase {
  import spark.implicits._

  private def extract(ss: Seq[String]): Seq[String] =
    ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "html")
      .select(col("id"), HtmlExtract.extractText(col("html")).as("c"))
      .orderBy("id").collect().map(_.getString(1)).toSeq

  test("planted exact outputs: blocks, tags, entities, whitespace") {
    val cases = Seq(
      "<p>Hello</p>" -> "Hello",
      "<SCRIPT a=b>var x<1;</SCRIPT>after" -> "after",
      "<style>p{}</style>text" -> "text",
      "<!-- hidden <p>x</p> -->shown" -> "shown",
      "a&amp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;!" ->
        "a&b <tag> \"q\" 's' !",
      // double-escape decodes exactly one level (&amp; is LAST)
      "&amp;lt;once&amp;gt;" -> "&lt;once&gt;",
      "  a   \n\t b " -> "a b",
      "<div class=\"x\">nested <b>bold</b></div>" -> "nested bold",
      // unclosed script: the block regex cannot match, the tag strips,
      // content degrades to text (documented seam, never a throw)
      "<script>no close" -> "no close",
      // entity-escaped markup is TEXT, never stripped (decode after strip)
      "&lt;script&gt;kept&lt;/script&gt;" -> "<script>kept</script>")
    assert(extract(cases.map(_._1)) == cases.map(_._2))
  }

  test("link counter: case-insensitive anchor tags only") {
    val df = Seq((1L, "<a href=\"x\">y</a><A>z</A> <ab>no</ab> plain a text"))
      .toDF("id", "html")
    assert(df.select(HtmlExtract.linkCount(col("html"))).head().getLong(0) == 2L)
  }

  test("composition: html-wrapped docs dedupe with their plain twins") {
    val docs = Snapshot(spark, sf()).documents
      .where(col("text").isNotNull).limit(50)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val n = docs.count()
    val wrapped = docs.select((col("doc_id") + lit(1000000L)).as("doc_id"),
      concat(lit("<html><body><p>"), col("text"),
        lit("</p><script>var x = 1;</script></body></html>")).as("text"))
    val corpus = docs.unionByName(wrapped)
      .select(col("doc_id"), HtmlExtract.extractText(col("text")).as("text"))
    // every wrapped doc lands in its plain twin's exact-dedup group
    val pairs = graft.operators.dedup.ExactDedup.groups(corpus, "doc_id", "text")
      .where(col("n_copies") >= 2)
    assert(pairs.count() == docs.select(md5(col("text"))).distinct().count())
    // and the cleaned text feeds the quality stack unchanged
    val q = graft.operators.text.TextStats.quality(corpus, "doc_id", "text")
    assert(q.count() == 2 * n && q.where(col("n_words").isNull).count() == 0L)
  }
}
