package graft

import org.apache.spark.sql.functions._

import graft.operators.text.{TextStats, UrlTools}

/** PII audit (Luhn / IPv4 / phone) and URL canonicalization units. */
class PiiUrlSpec extends SparkSpecBase {
  import spark.implicits._

  test("garbledAudit: planted OCR noise flags, clean prose and CJK behave as documented") {
    val df = Seq(
      (1L, "a clean english sentence with ordinary words"),
      (2L, "@@## %%^^ && ** !! ?? ~~ || ++ == @@## %%^^"), // symbol soup
      (3L, "the strczywczsk protocol mentions xbcdfghjkl runs"), // consonant run
      (4L, "mixed 12 numbers and words only"),
      (5L, "短い中国語のテキスト")) // CJK: symbols under the latin-centric rule
      .toDF("doc_id", "text")
    val rows = TextStats.garbledAudit(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(!byId(1L).getBoolean(5) && !byId(4L).getBoolean(5))
    assert(byId(2L).getBoolean(5), "symbol soup must flag")
    assert(byId(3L).getBoolean(5), "a 9+ consonant run must flag")
    assert(byId(3L).getLong(4) >= 9L)
    assert(byId(5L).getBoolean(5), "CJK flags under the documented latin-centric rule")
    // exact counting: doc 1 has zero symbols
    assert(byId(1L).getLong(2) == 0L &&
      byId(1L).getDouble(3) == 0.0)
    // empty/null texts drop
    val e = TextStats.garbledAudit(
      Seq((9L, ""), (10L, null.asInstanceOf[String]), (11L, "ok")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(e.length == 1 && e.head.getLong(0) == 11L)
  }

  /** Independent Luhn formulation (right-to-left loop) — the spec oracle
    * for the fixed-position column arithmetic.
    */
  private def luhnRef(s: String): Boolean = {
    var sum = 0 // rightmost digit NOT doubled; every 2nd from the right is
    var i = s.length - 1
    var second = false
    while (i >= 0) {
      var d = s.charAt(i) - '0'
      if (second) { d *= 2; if (d > 9) d -= 9 }
      sum += d; second = !second; i -= 1
    }
    sum % 10 == 0
  }

  test("luhnValid16 matches an independent right-to-left Luhn over generated candidates") {
    // classic test PANs + a key-derived family like q_pii_audit's
    val cands = Seq("4111111111111111", "4111111111111112", "5500005555555559") ++
      (0L until 200L).map(k => f"${k % 100000000}%08d${(k * 7919 + 13) % 100000000}%08d")
    val df = cands.toDF("cc")
      .select($"cc", TextStats.luhnValid16($"cc").as("valid")).collect()
    df.foreach(r => assert(r.getBoolean(1) == luhnRef(r.getString(0)), r.getString(0)))
    assert(luhnRef("4111111111111111") && !luhnRef("4111111111111112"))
    // the family must be non-trivially split or the audit column is vacuous
    val nValid = df.count(_.getBoolean(1))
    assert(nValid > 0 && nValid < df.length)
  }

  test("piiAudit counts and validity flags on crafted text") {
    val rows = Seq(
      (1L, "call 25-989-741-2988 or mail bob@x.org card 4111111111111111 ip 10.0.0.1"),
      (2L, "bad ip 999.1.2.3 bad card 4111111111111112 see https://a.b/c?x=1"),
      (3L, "nothing here"),
      (4L, "two ips 1.2.3.4 250.250.250.250 and 300.300.300.300")).toDF("id", "text")
    val out = TextStats.piiAudit(rows, "id", "text").orderBy("id").collect()
    def r(i: Int) = out(i)
    // row 1: one of each, all valid
    assert(r(0).getLong(1) == 1 && r(0).getLong(2) == 0 && r(0).getLong(3) == 1)
    assert(r(0).getLong(4) == 1 && r(0).getLong(5) == 1) // ipv4, valid
    assert(r(0).getLong(6) == 1 && r(0).getLong(7) == 1) // cc, luhn-valid
    // row 2: candidates found but INVALID (range / Luhn)
    assert(r(1).getLong(4) == 1 && r(1).getLong(5) == 0)
    assert(r(1).getLong(6) == 1 && r(1).getLong(7) == 0)
    assert(r(1).getLong(2) == 1) // the url counts
    // row 3: all zero
    assert((1 to 7).forall(j => r(2).getLong(j) == 0))
    // row 4: three ip-shaped candidates, two valid
    assert(r(3).getLong(4) == 3 && r(3).getLong(5) == 2)
    // redaction masks every candidate (valid or not)
    val red = TextStats.piiAudit(rows, "id", "text").orderBy("id")
      .select("redacted").collect().map(_.getString(0))
    assert(red(0) == "call <PHONE> or mail <EMAIL> card <CC> ip <IP>")
    assert(red(1) == "bad ip <IP> bad card <CC> see <URL>")
    assert(red(3) == "two ips <IP> <IP> and <IP>")
  }

  test("canonicalize: ports, case, fragments, tracking params, param order") {
    val cases = Seq(
      "HTTP://Example.COM:80/Path?utm_source=n&id=2#frag" -> "http://example.com/Path?id=2",
      "https://example.com:443/p?id=1&utm_campaign=x" -> "https://example.com/p?id=1",
      "http://EXAMPLE.com/p?b=2&a=1&fbclid=zz" -> "http://example.com/p?a=1&b=2",
      "https://example.com:8443/p?a=1" -> "https://example.com:8443/p?a=1", // non-default port kept
      "http://example.com:80/p" -> "http://example.com/p",
      "http://x.com" -> "http://x.com/", // empty path normalizes
      "http://x.com?gclid=1&ref=feed" -> "http://x.com/", // tracking-only query drops entirely
      "https://x.com/CaseKept/Path" -> "https://x.com/CaseKept/Path")
    val out = cases.map(_._1).toDF("url")
      .select($"url", UrlTools.canonicalize($"url").as("c")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(out(in) == want, s"canonicalize($in)") }
  }

  test("dedupByCanonical collapses raw variants of one resource") {
    val raws = Seq(
      "http://A.com:80/x?b=2&a=1#f", "HTTP://a.COM/x?a=1&b=2&utm_source=s",
      "http://a.com/x?a=1&b=2", // three spellings, one resource
      "http://a.com/y") // a different resource
    val out = UrlTools.dedupByCanonical(raws.toDF("url"), "url")
      .orderBy("canonical_url").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "http://a.com/x?a=1&b=2" &&
      out(0).getLong(1) == 3 && out(0).getLong(2) == 3)
    assert(out(1).getString(0) == "http://a.com/y" && out(1).getLong(1) == 1)
  }

  test("host: scheme-less input yields NULL, matching the oracle's split semantics") {
    // instr = 0 used to make the substring start at char 3 and return
    // garbage where string_split(url, '://')[2] yields NULL (ADVICE r11)
    val got = Seq("example.com/path", "https://Example.COM:443/x", "ftp://a.b/c", "")
      .toDF("url")
      .select(UrlTools.host($"url").as("h"))
      .collect()
      .map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(None, Some("example.com"), Some("a.b"), None))
  }

  test("casingAudit: caps/title/char-class shares and the shouty flag") {
    val df = Seq(
      (1L, "HELLO World this is fine"), // 1 caps, 1 title of 5 — not shouty
      (2L, "SELL NOW BUY GOLD FAST"), // 5/5 caps — shouty
      (3L, "room 42 has 7 chairs"), // digits
      (4L, "   "), // all-whitespace: no words — drops
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextStats.casingAudit(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val r1 = got(0)
    assert(r1.getLong(1) == 5L && r1.getLong(2) == 1L && r1.getLong(3) == 1L)
    assert(r1.getDouble(5) == 1.0 / 5.0 && !r1.getBoolean(8))
    val r2 = got(1)
    assert(r2.getDouble(5) == 1.0 && r2.getBoolean(8))
    val r3 = got(2)
    assert(r3.getLong(1) == 5L && r3.getDouble(7) == 3.0 / 20.0) // "42"+"7" of 20 chars
  }

  test("trackingAudit: canonicalize's drop rule counted per host") {
    val df = Seq(
      "http://a.com/x?utm_source=1&q=2", // 1 tracking of 2 params
      "https://B.com:443/y?fbclid=z&gclid=w", // 2
      "http://a.com/z", // 0
      "HTTP://A.COM/u?ref=home#frag", // 1 (key rule, fragment off first)
      "not-a-url") // scheme-less: NULL host, drops
      .toDF("url")
    val got = UrlTools.trackingAudit(df, "url").orderBy("host").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a.com", "b.com"))
    val a = got(0)
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L && a.getLong(3) == 2L)
    assert(a.getDouble(4) == 2.0 / 3.0)
    val b = got(1)
    assert(b.getLong(1) == 1L && b.getLong(2) == 1L && b.getLong(3) == 2L)
    // scheme-less input with a '?' must count 0, not params of a
    // garbage substring (r14 review finding)
    val stray = Seq("foo?utm_x=1", "utm_a=1&ref=2").toDF("u")
      .select(UrlTools.trackingParamCount(col("u")).as("n")).collect()
    assert(stray.forall(_.getInt(0) == 0))
  }
}
