package graft

import org.apache.spark.sql.functions._

import graft.operators.dedup.WindowDedup
import graft.operators.text.UrlTools

/** Round-13 curation dedup additions: fixed-window exact-substring dedup
  * (C72) and canonical-URL keep-best dedup (C71). Expectations are
  * planted/hand-derived; dup_ratio checks use the operator's own IEEE
  * division.
  */
class WindowDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val W1 = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMN" // 40 chars
  private val W2 = "0123456789!@#$%^&*()0123456789!@#$%^&*()" // 40 chars

  test("windowDedup: exact dup charged to the later doc, owner stays clean") {
    val df = Seq((1L, W1), (2L, W1), (4L, "short")).toDF("doc_id", "text")
    val rows = WindowDedup.windowDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // the sub-window doc carries no windows and drops
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L).getLong(1) == 1L && rows(1L).getLong(2) == 0L &&
      !rows(1L).getBoolean(4))
    assert(rows(2L).getLong(1) == 1L && rows(2L).getLong(2) == 1L &&
      rows(2L).getDouble(3) == 1.0 && rows(2L).getBoolean(4))
  }

  test("windowDedup: partial overlap counts only the shared aligned window") {
    // doc 3 = W1 ++ W2: windows at 0 (=W1, owned by doc 1), 20 (mix), 40 (W2)
    val df = Seq((1L, W1), (3L, W1 + W2)).toDF("doc_id", "text")
    val rows = WindowDedup.windowDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(3L).getLong(1) == 3L && rows(3L).getLong(2) == 1L)
    assert(rows(3L).getDouble(3) == 1.0 / 3.0 && rows(3L).getBoolean(4))
    assert(rows(1L).getLong(2) == 0L)
  }

  test("windowDedup: in-doc repetition does not inflate window counts") {
    // period-20 text: every stride-aligned 40-char window is identical
    val b = "qrstuvwxyz0987654321" // 20 chars
    val df = Seq((6L, b * 4)).toDF("doc_id", "text")
    val r = WindowDedup.windowDedup(df, "doc_id", "text").collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L && !r.getBoolean(4))
  }

  test("windowDedup: custom window/stride geometry enumerates full windows only") {
    // len 10, win 4, stride 3 -> positions 0,3,6 (3 windows; 9..12 would
    // overrun and must not appear)
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val r = WindowDedup.windowDedup(df, "doc_id", "text", winLen = 4, stride = 3)
      .collect().head
    assert(r.getLong(1) == 3L)
  }

  test("dedupKeepBest: variants collapse, best score wins, id breaks ties") {
    val df = Seq(
      (1L, "http://a.com/x?utm_source=z", Some(0.5)),
      (2L, "HTTP://A.COM:80/x", Some(0.9)),
      (3L, "http://a.com/x", Some(0.9)),
      (4L, "http://b.com/y", Some(0.1)),
      (5L, "http://b.com/y", None) // null score: out of contract, drops
    ).toDF("doc_id", "url", "score")
    val rows = UrlTools.dedupKeepBest(df, "url", "doc_id", "score")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("http://a.com/x", "http://b.com/y"))
    val a = rows("http://a.com/x")
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L && a.getDouble(3) == 0.9)
    val b = rows("http://b.com/y")
    assert(b.getLong(1) == 1L && b.getLong(2) == 4L && b.getDouble(3) == 0.1)
  }

  test("windowDedup composes: html-wrapped twin of a plain doc is flagged") {
    // the C52 composition shape: strip the wrapper, the payload windows
    // match the plain original
    val plain = W1 + W2
    val wrapped = Seq((9L, s"<html><body><p>$plain</p></body></html>"))
      .toDF("doc_id", "html")
      .select(col("doc_id"),
        graft.operators.text.HtmlExtract.extractText(col("html")).as("text"))
    assert(wrapped.collect().head.getString(1) == plain) // exact strip
    val both = Seq((1L, plain)).toDF("doc_id", "text").unionByName(wrapped)
    val rows = WindowDedup.windowDedup(both, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(9L).getBoolean(4) && rows(9L).getDouble(3) == 1.0)
  }
}
