package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.asof.AsOfJoin
import graft.operators.text.{Decontaminate, TextStats}

class TextAndAsOfSpec extends SparkSpecBase {
  import spark.implicits._

  test("decontaminate flags benchmark-overlapping docs; clean drops exactly those") {
    val bench = Seq(
      (100L, "the secret benchmark question about spark shuffles and joins today")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words the secret benchmark question about spark shuffles and joins today suffix words"),
      (2L, "completely unrelated text with no overlap at all in any five gram window here")
    ).toDF("doc_id", "text")
    val rep = Decontaminate.overlap(corpus, "doc_id", "text", bench, "text")
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, n, c) => id -> ((n, c)) }.toMap
    assert(rep(1L)._2 && rep(1L)._1 > 0, s"doc 1 embeds the benchmark: $rep")
    assert(!rep(2L)._2 && rep(2L)._1 == 0, s"doc 2 is clean: $rep")
    val survivors = Decontaminate.clean(corpus, "doc_id", "text", bench, "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(survivors == Seq(2L))
  }

  test("repetition ratio: boilerplate high, unique text zero") {
    val df = Seq(
      (1L, "x y x y x y x y"),              // 6 trigrams, 2 distinct -> 1 - 2/6
      (2L, "one two three four five six"),  // 4 trigrams, all distinct -> 0.0
      (3L, "hi")                            // shorter than n -> single shingle -> 0.0
    ).toDF("doc_id", "text")
    val got = TextStats.repetition(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 6L, 2L, 1.0 - 2.0 / 6.0)))
    assert(got(2L) == ((2L, 4L, 4L, 0.0)))
    assert(got(3L) == ((3L, 1L, 1L, 0.0)))
  }

  test("cross-doc boilerplate: shared per-source footer flagged, other sources untouched") {
    import spark.implicits._
    val footer = "copyright acme corp all rights reserved terms of use apply here"
    val docs = Seq(
      (1L, s"unique article about spark shuffles and joins $footer", "siteA"),
      (2L, s"another story on watermarks and state stores $footer", "siteA"),
      (3L, s"third piece concerning codegen stages and exchanges $footer", "siteA"),
      (4L, "clean document with no shared chrome at all in it", "siteA"),
      // same footer text, DIFFERENT source: must not count toward siteA's
      // threshold nor be flagged for siteB (only one siteB doc has it)
      (5L, s"unrelated site reusing the words $footer", "siteB")
    ).toDF("doc_id", "text", "source")
    val out = TextStats.boilerplate(docs, "doc_id", "text", "source", minDocs = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // docs 1-3 share the footer's shingles (>= 3 docs of siteA) -> flagged
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).getAs[Long]("n_boilerplate_shingles") > 0, s"doc $id")
      assert(out(id).getAs[Double]("boilerplate_ratio") > 0.3, s"doc $id")
    }
    // the clean doc and the other-source doc carry zero boilerplate
    Seq(4L, 5L).foreach { id =>
      assert(out(id).getAs[Long]("n_boilerplate_shingles") == 0L, s"doc $id")
      assert(out(id).getAs[Double]("boilerplate_ratio") == 0.0, s"doc $id")
    }
  }

  test("langid picks the marker-dominant language with priority tiebreak") {
    val df = Seq(
      (1L, "the cat is on a mat of straw and hay"),
      (2L, "der hund ist und das haus die tur"),
      (3L, "xyzzy plugh") // no markers anywhere -> ties -> first priority: en
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextStats.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "en")
  }

  test("quality features compute known values") {
    val df = Seq((1L, "the fox! runs")).toDF("doc_id", "text")
    val r = TextStats.quality(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_chars") == 13L)
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Double]("punct_ratio") == 1.0 / 13)
    assert(r.getAs[Double]("stopword_ratio") == 1.0 / 3)
  }

  test("token counts: ws vs bpe-ish") {
    val df = Seq((1L, "ab 12 c!")).toDF("doc_id", "text")
    val r = TextStats.tokenCounts(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("ws_tokens") == 3L)
    assert(r.getAs[Long]("bpe_tokens") == 4L) // ab, 12, c, !
  }

  test("pii redaction replaces emails and urls, counts them") {
    val df = Seq(
      (1L, "contact bob.smith@example.com or https://example.com/page now"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val r = TextStats.redactPii(df, "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(r(1L)._1 == "contact <EMAIL> or <URL> now")
    assert(r(1L)._2 == 2L)
    assert(r(2L)._1 == "no pii here at all" && r(2L)._2 == 0L)
  }

  test("quality filter keeps only passing docs") {
    val df = Seq(
      (1L, ("the a is of and " * 10).trim), // 50 words, high stopword ratio
      (2L, "tiny doc")
    ).toDF("doc_id", "text")
    val kept = TextStats.qualityFilter(df, "doc_id", "text", 0.5, 20L)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("entropy: analytic planted cases gate the log2 float (2^k equal words => exactly k)") {
    // the driver hashes only the IEEE-exact columns (n_words/n_distinct/
    // count_sig); the transcendental word_entropy is gated HERE with
    // cases whose values are exact in IEEE arithmetic: p is a dyadic
    // rational and log2(p) an integer, so no libm rounding is involved.
    val df = Seq(
      (1L, "a b c d"),                  // 4 = 2^2 equal words -> exactly 2.0
      (2L, "a a b b c c d d e e f f g g h h"), // 8 = 2^3 equal -> exactly 3.0
      (3L, "same same same same"),      // single word -> 0.0 (and not -0.0)
      (4L, "a a b c")                   // counts (2,1,1), n=4: 0.5*1 + 2*(0.25*2) = 1.5
    ).toDF("doc_id", "text")
    val got = TextStats.entropy(df, "doc_id", "text")
      .select("doc_id", "n_words", "n_distinct", "word_entropy")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 4L, 2.0)))
    assert(got(2L) == ((2L, 16L, 8L, 3.0)))
    assert(got(3L) == ((3L, 4L, 1L, 0.0)))
    assert(got(3L)._4.compareTo(0.0) == 0, "-0.0 must collapse to +0.0")
    assert(got(4L) == ((4L, 4L, 3L, 1.5)))
  }

  test("entropy: count_sig is the word-sorted count vector and distinguishes distributions") {
    // same n_words and n_distinct, different distribution -> different sig;
    // permuted words with the same sorted count vector -> same sig only
    // when the per-word counts (in word order) agree.
    val df = Seq(
      (1L, "a a a b"),   // counts by word: a=3,b=1 -> "3,1"
      (2L, "a b b b"),   // a=1,b=3 -> "1,3" (different sig than doc 1)
      (3L, "b a a a")    // a=3,b=1 -> identical sig to doc 1 (order in text irrelevant)
    ).toDF("doc_id", "text")
    val sig = TextStats.entropy(df, "doc_id", "text")
      .select("doc_id", "count_sig").as[(Long, String)].collect().toMap
    assert(sig(1L) != sig(2L), "skew direction must change the sig")
    assert(sig(1L) == sig(3L), "text order must not change the sig")
  }

  test("fingerprint is order-sensitive") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fps = TextStats.fingerprint(df, "doc_id", "text")
      .select("fingerprint").as[Long].collect()
    assert(fps(0) != fps(1))
  }

  test("asof join picks latest prior ts per key, inclusive on ties") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (10L, 1L, ts("2024-01-01 12:00:00")),
      (11L, 1L, ts("2024-01-01 09:00:00")),
      (12L, 2L, ts("2024-01-01 12:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")), // tie with event 10 -> included
      (2L, ts("2024-01-01 13:00:00"))  // after event 12 -> no match
    ).toDF("user_id", "rts")
    val got = AsOfJoin.latestPriorTs(left, right, "user_id", "ts", "rts", "matched")
      .select("event_id", "matched").as[(Long, Option[Timestamp])].collect().toMap
    assert(got(10L).contains(ts("2024-01-01 12:00:00"))) // tie included
    assert(got(11L).isEmpty) // earliest signup is after 09:00
    assert(got(12L).isEmpty)
  }

  test("latestPriorRow surfaces the matched right row; ties resolve to the greatest id") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (10L, Option(1L), ts("2024-01-01 12:00:00")), // tied rights at 12:00 -> greatest id (7)
      (11L, Option(1L), ts("2024-01-01 09:00:00")), // before every right -> (null, null)
      (12L, Option(2L), ts("2024-01-01 12:00:00")), // plain single match
      (13L, Option.empty[Long], ts("2024-01-01 12:00:00")) // null key -> (null, null)
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option(1L), ts("2024-01-01 12:00:00"), 5L),
      (Option(1L), ts("2024-01-01 12:00:00"), 7L), // tie winner
      (Option(1L), ts("2024-01-01 12:00:00"), 6L),
      (Option(1L), ts("2024-01-01 10:00:00"), 9L), // earlier ts loses to any 12:00
      (Option(2L), ts("2024-01-01 11:00:00"), 3L),
      (Option.empty[Long], ts("2024-01-01 11:59:00"), 4L) // null-key right: invisible
    ).toDF("user_id", "rts", "rid")
      // null-TS right: must also be invisible — the carried struct is
      // non-null even with a null ts inside, so without the explicit
      // filter this row would wrongly match every later left as
      // (matched_ts=NULL, matched_id=8)
      .union(Seq((Option(1L), Option.empty[Timestamp], Option(8L)))
        .toDF("user_id", "rts", "rid"))
    val got = AsOfJoin
      .latestPriorRow(left, right, "user_id", "ts", "rts", "rid", "mts", "mid")
      .select("event_id", "mts", "mid")
      .as[(Long, Option[Timestamp], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) == ((Some(ts("2024-01-01 12:00:00")), Some(7L))))
    assert(got(11L) == ((None, None)))
    assert(got(12L) == ((Some(ts("2024-01-01 11:00:00")), Some(3L))))
    assert(got(13L) == ((None, None)))
  }

  test("forward asof: earliest following ts, inclusive ties, null key/ts lefts unmatched") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (10L, Option(1L), Option(ts("2024-01-01 12:00:00"))), // tie at 12:00 -> matches instantly
      (11L, Option(1L), Option(ts("2024-01-01 13:30:00"))), // between rights -> 14:00
      (12L, Option(1L), Option(ts("2024-01-01 15:00:00"))), // after every right -> null
      (13L, Option(2L), Option(ts("2024-01-01 12:00:00"))), // key with no rights -> null
      (14L, Option.empty[Long], Option(ts("2024-01-01 00:00:00"))), // null key -> null
      (15L, Option(1L), Option.empty[Timestamp]) // null ts -> null, NOT the global min
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option(1L), Option(ts("2024-01-01 12:00:00"))),
      (Option(1L), Option(ts("2024-01-01 14:00:00"))),
      (Option(1L), Option.empty[Timestamp]), // null-ts right: invisible
      (Option.empty[Long], Option(ts("2024-01-01 00:30:00"))) // null-key right: invisible
    ).toDF("user_id", "rts")
    val got = AsOfJoin.earliestFollowingTs(left, right, "user_id", "ts", "rts", "m")
      .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
    assert(got(10L).contains(ts("2024-01-01 12:00:00")))
    assert(got(11L).contains(ts("2024-01-01 14:00:00")))
    assert(got(12L).isEmpty)
    assert(got(13L).isEmpty)
    assert(got(14L).isEmpty)
    assert(got(15L).isEmpty)
  }

  test("nearest asof: exact distance picks the side, distance ties resolve to prior") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (20L, Option(1L), Option(ts("2024-01-01 12:00:00"))), // 11:00 vs 14:00 -> prior 11:00
      (21L, Option(1L), Option(ts("2024-01-01 13:30:00"))), // 11:00 vs 14:00 -> next 14:00
      (22L, Option(1L), Option(ts("2024-01-01 12:30:00"))), // equidistant 90min -> prior 11:00
      (23L, Option(1L), Option(ts("2024-01-01 10:00:00"))), // before every right -> next 11:00
      (24L, Option(1L), Option(ts("2024-01-01 23:00:00"))), // after every right -> prior 14:00
      (25L, Option(2L), Option(ts("2024-01-01 12:00:00"))), // exact-ts right -> itself (prior)
      (26L, Option.empty[Long], Option(ts("2024-01-01 12:00:00"))), // null key -> null
      (27L, Option(1L), Option.empty[Timestamp]) // null ts -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option(1L), Option(ts("2024-01-01 11:00:00"))),
      (Option(1L), Option(ts("2024-01-01 14:00:00"))),
      (Option(2L), Option(ts("2024-01-01 12:00:00"))),
      (Option(1L), Option.empty[Timestamp]), // null-ts right: invisible
      (Option.empty[Long], Option(ts("2024-01-01 12:00:01"))) // null-key right: invisible
    ).toDF("user_id", "rts")
    val got = AsOfJoin.nearestTs(left, right, "user_id", "ts", "rts", "m")
      .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
    assert(got(20L).contains(ts("2024-01-01 11:00:00")))
    assert(got(21L).contains(ts("2024-01-01 14:00:00")))
    assert(got(22L).contains(ts("2024-01-01 11:00:00"))) // tie -> prior
    assert(got(23L).contains(ts("2024-01-01 11:00:00")))
    assert(got(24L).contains(ts("2024-01-01 14:00:00")))
    assert(got(25L).contains(ts("2024-01-01 12:00:00")))
    assert(got(26L).isEmpty)
    assert(got(27L).isEmpty)
  }

  test("forward/nearest asof match a brute-force reference on a randomized event set") {
    // seeded sweep: dense ts collisions (21 instants, 6 keys, 300 rows)
    // exercise every tie path of all three direction variants at once
    val rnd = new scala.util.Random(4242)
    def t(i: Int) = new Timestamp(1700000000000L + i * 60000L)
    val lrows = (0 until 150).map(i => (i.toLong, rnd.nextInt(6).toLong, t(rnd.nextInt(21))))
    val rrows = (0 until 150).map(_ => (rnd.nextInt(6).toLong, t(rnd.nextInt(21))))
    val left = lrows.toDF("event_id", "user_id", "ts")
    val right = rrows.toDF("user_id", "rts")

    val fwd = AsOfJoin.earliestFollowingTs(left, right, "user_id", "ts", "rts", "m")
      .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
    val near = AsOfJoin.nearestTs(left, right, "user_id", "ts", "rts", "m")
      .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
    val byKey = rrows.groupBy(_._1)
    lrows.foreach { case (id, k, lts) =>
      val rs = byKey.getOrElse(k, Seq.empty).map(_._2.getTime)
      val expFwd = rs.filter(_ >= lts.getTime).sorted.headOption.map(new Timestamp(_))
      assert(fwd(id) == expFwd, s"forward mismatch for event $id")
      val prior = rs.filter(_ <= lts.getTime).sorted.lastOption
      val next = rs.filter(_ > lts.getTime).sorted.headOption
      val expNear = (prior, next) match {
        case (None, n) => n
        case (p, None) => p
        case (Some(p), Some(n)) => if (lts.getTime - p <= n - lts.getTime) Some(p) else Some(n)
      }
      assert(near(id) == expNear.map(new Timestamp(_)), s"nearest mismatch for event $id")
    }
  }

  test("tolerance asof: boundary inclusive, beyond null, zero tolerance, null keys never match") {
    def ts(x: String) = Timestamp.valueOf(x)
    val left = Seq(
      (20L, Option(1L), ts("2024-01-01 12:00:00")), // signup exactly 1h before -> kept
      (21L, Option(1L), ts("2024-01-01 12:00:01")), // 1h+1s -> nulled
      (22L, Option(2L), ts("2024-01-01 12:00:00")), // tie at tolerance 0 -> kept
      (23L, Option.empty[Long], ts("2024-01-01 12:00:00")) // null key -> null, never matches null-key right
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option(1L), ts("2024-01-01 11:00:00")),
      (Option(2L), ts("2024-01-01 12:00:00")),
      (Option.empty[Long], ts("2024-01-01 11:59:00")) // null-key right row: invisible
    ).toDF("user_id", "rts")
    val oneHour = AsOfJoin
      .latestPriorTsWithin(left, right, "user_id", "ts", "rts", "m", toleranceSec = 3600L)
      .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
    assert(oneHour(20L).contains(ts("2024-01-01 11:00:00"))) // exactly at the bound: inclusive
    assert(oneHour(21L).isEmpty) // one second past the bound
    assert(oneHour(23L).isEmpty) // null key passes through unmatched
    val zero = AsOfJoin
      .latestPriorTsWithin(left, right, "user_id", "ts", "rts", "m", toleranceSec = 0L)
      .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
    assert(zero(22L).contains(ts("2024-01-01 12:00:00"))) // equal ts survives tolerance 0
    assert(zero(20L).isEmpty)
    // an "effectively unbounded" tolerance is a contract error, not a
    // silently-wrapped negative bound that nulls everything
    assert(intercept[IllegalArgumentException] {
      AsOfJoin.latestPriorTsWithin(left, right, "user_id", "ts", "rts", "m", Long.MaxValue)
    }.getMessage.contains("toleranceSec"))
  }

  test("bucketed asof equals plain asof under a planted hot key, every bucket width") {
    // 80% of rows on one key, deterministic but irregular timestamps so
    // matches cross bucket boundaries in both directions; includes ties
    // (same ts on both sides), right-empty buckets (key 2 has a single
    // early signup), and a left row before every right row
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(offsetSec: Long) = new Timestamp(base + offsetSec * 1000L)
    val left = (0 until 400).map { i =>
      val key = if (i % 5 == 4) 2L else 1L
      (i.toLong, key, ts((i.toLong * 37) % 9001))
    }.toDF("event_id", "user_id", "ts")
    val right = (0 until 60).map { i =>
      val key = if (i == 0) 2L else 1L
      (key, ts(if (i == 0) 3L else (i.toLong * 211) % 9001))
    }.toDF("user_id", "rts")
    val plain = AsOfJoin.latestPriorTs(left, right, "user_id", "ts", "rts", "m")
      .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
    for (nBuckets <- Seq(1, 3, 16, 64, 1000)) {
      val bucketed = AsOfJoin
        .latestPriorTsBucketed(left, right, "user_id", "ts", "rts", "m", nBuckets)
        .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
      assert(bucketed == plain, s"nBuckets=$nBuckets diverges from plain")
    }
  }

  test("bucketed asof edge cases: null keys, ties, empty right, all-null ts") {
    def ts(x: String) = Timestamp.valueOf(x)
    val left = Seq(
      (10L, Option(1L), ts("2024-01-01 12:00:00")), // tie with right -> included
      (11L, Option(1L), ts("2024-01-01 09:00:00")), // before every right -> null
      (12L, Option.empty[Long], ts("2024-01-01 12:00:00")) // null key -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option(1L), ts("2024-01-01 12:00:00")),
      (Option.empty[Long], ts("2024-01-01 11:00:00")) // invisible, as in plain
    ).toDF("user_id", "rts")
    val got = AsOfJoin.latestPriorTsBucketed(left, right, "user_id", "ts", "rts", "m", 4)
      .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
    assert(got(10L).contains(ts("2024-01-01 12:00:00")))
    assert(got(11L).isEmpty)
    assert(got(12L).isEmpty)

    val gotEmpty = AsOfJoin
      .latestPriorTsBucketed(left, right.where(lit(false)), "user_id", "ts", "rts", "m", 4)
      .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
    assert(gotEmpty.size == 3 && gotEmpty.values.forall(_.isEmpty),
      s"empty right must pass every left row through unmatched: $gotEmpty")

    val nullTsLeft = Seq((1L, 1L, Option.empty[Timestamp])).toDF("event_id", "user_id", "ts")
    val nullTsRight = Seq((1L, Option.empty[Timestamp])).toDF("user_id", "rts")
    val gotNull = AsOfJoin
      .latestPriorTsBucketed(nullTsLeft, nullTsRight, "user_id", "ts", "rts", "m", 4)
      .select("event_id", "m").as[(Long, Option[Timestamp])].collect().toMap
    assert(gotNull(1L).isEmpty, "all-NULL timestamps degrade to no matches, not a crash")
  }
}
