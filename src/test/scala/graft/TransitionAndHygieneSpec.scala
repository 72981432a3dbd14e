package graft

import graft.operators.stats.Stats

/** B82 q_markov, B83 q_cramers_v, C65 q_url_blocklist. */
class TransitionAndHygieneSpec extends SparkSpecBase {
  import spark.implicits._

  test("cramers v: perfect association is exactly 1 (zero cells contribute their expected mass)") {
    // [[5,0],[0,5]] — without grid completion the two zero cells'
    // E = 2.5 each are lost and V understates as sqrt(1/2)
    val df = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y"))).toDF("u", "v")
    val got = Stats.cramersV(df, "u", "v").collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((10L, 2L, 2L)))
    assert(got.getDouble(3) == 10.0, s"chi2 ${got.getDouble(3)}")
    assert(got.getLong(4) == 1L)
    assert(got.getDouble(5) == 1.0, s"V ${got.getDouble(5)}")
  }

  test("cramers v: exact independence is exactly 0; dof 0 is NULL") {
    // [[2,4],[3,6]] — every expected equals its observed
    val rows = Seq.fill(2)(("a", "x")) ++ Seq.fill(4)(("a", "y")) ++
      Seq.fill(3)(("b", "x")) ++ Seq.fill(6)(("b", "y"))
    val got = Stats.cramersV(rows.toDF("u", "v"), "u", "v").collect().head
    assert(got.getDouble(3) == 0.0 && got.getDouble(5) == 0.0)
    val degenerate = Stats.cramersV(
      Seq(("a", "x"), ("b", "x")).toDF("u", "v"), "u", "v").collect().head
    assert(degenerate.getLong(4) == 0L && degenerate.isNullAt(5))
  }

  test("cramers v: hand 2x2 agrees with the closed-form phi coefficient") {
    // [[10,20],[30,40]]: chi2 = n(ad-bc)^2 / (r1 r2 c1 c2)
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val got = Stats.cramersV(rows.toDF("u", "v"), "u", "v").collect().head
    val expectChi2 = 100.0 * math.pow(10.0 * 40 - 20.0 * 30, 2) /
      (30.0 * 70.0 * 40.0 * 60.0)
    assert(math.abs(got.getDouble(3) - expectChi2) < 1e-9)
    assert(math.abs(got.getDouble(5) - math.sqrt(expectChi2 / 100.0)) < 1e-9)
  }

  test("sf0.001 q_markov: margins, probability mass, and B32 count parity") {
    val rows = SparkEntry.queries("q_markov")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val k = rows.map(_.getString(1)).distinct.length.toLong
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (from, rs) =>
      val rowTotal = rs.head.getLong(3)
      assert(rs.forall(_.getLong(3) == rowTotal))
      assert(rs.map(_.getLong(2)).sum == rowTotal, s"$from margin")
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-12, s"$from p_raw mass")
      rs.foreach { r =>
        val expect = (r.getLong(2) + 1L).toDouble / (rowTotal + k).toDouble
        assert(r.getDouble(5) == expect, s"$from->${r.getString(1)} p_smooth")
      }
      // smoothed mass over OBSERVED pairs leaves (k - observed) units of
      // (1/(rt+k)) for unseen transitions
      val mass = rs.map(_.getDouble(5)).sum
      assert(mass <= 1.0 + 1e-12 && mass > 0.5, s"$from smoothed mass $mass")
    }
    // one definition: counts equal B32's
    val b32 = SparkEntry.queries("q_event_transitions")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap == b32)
  }

  test("sf0.001 q_session_paths: bounded top-k, ordered cut, segments from the type vocabulary") {
    val rows = SparkEntry.queries("q_session_paths")(spark, sf()).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, "count-desc order")
    val types = sources.Snapshot(spark, sf()).events
      .where($"event_type".isNotNull)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      val segs = r.getString(0).split('>')
      assert(segs.nonEmpty && segs.length <= 8, s"path capped at 8: ${r.getString(0)}")
      assert(segs.forall(types), s"unknown segment in ${r.getString(0)}")
      assert(r.getLong(1) >= 1L)
    }
  }

  test("sf0.001 q_hourly_profile: shares re-add per type; totals re-add to the corpus") {
    val rows = SparkEntry.queries("q_hourly_profile")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getInt(1)
      assert(h >= 0 && h <= 23)
      assert(r.getDouble(4) == r.getLong(2).toDouble / r.getLong(3).toDouble)
    }
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-12, s"$t shares")
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(3), s"$t total")
    }
    val nEvents = sources.Snapshot(spark, sf()).events
      .where($"event_type".isNotNull && $"ts".isNotNull).count()
    assert(rows.map(_.getLong(2)).sum == nEvents)
  }

  test("sf0.001 q_url_blocklist: complete and exact vs a re-derivation from doc ids") {
    val rows = SparkEntry.queries("q_url_blocklist")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val rules = Set("site0.com", "cdn.site0.com", "ads.site2.com",
      "h3.cdn.site4.com")
    def hostOf(id: Long): String = {
      val sub = (id % 3) match { case 0 => "ads"; case 1 => "cdn"; case _ => "www" }
      s"h${id % 7}.$sub.site${id % 5}.com"
    }
    def matches(host: String): Seq[String] = {
      val labels = host.split('.')
      (0 until labels.length - 1)
        .map(i => labels.drop(i).mkString("."))
        .filter(rules)
    }
    val ids = sources.Snapshot(spark, sf()).documents
      .where($"text".isNotNull).select($"doc_id").as[Long].collect()
    val expected = ids.flatMap { id =>
      val ms = matches(hostOf(id))
      if (ms.isEmpty) None
      else Some(id -> ((hostOf(id), ms.length.toLong, ms.maxBy(r => (r.length, r)))))
    }.toMap
    val got = rows.map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected, "blocklist output must equal the exhaustive re-derivation")
    // every rule fires at this SF, and the overlap (cdn.site0.com under
    // site0.com) exercises the most-specific tiebreak
    assert(rows.map(_.getString(3)).toSet == rules)
    assert(rows.exists(_.getLong(2) == 2L), "some host matches two nested rules")
  }
}
