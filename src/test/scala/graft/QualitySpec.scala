package graft

import org.apache.spark.sql.functions._

import graft.operators.quality.{Constraints, Reconcile}
import graft.operators.quantile.Outliers
import graft.operators.stats.Drift

/** Round-7 quality operators: declarative constraint audit, snapshot
  * reconciliation, robust MAD outliers.
  */
class QualitySpec extends SparkSpecBase {
  import Constraints._

  test("constraint audit: every check type counts planted violations") {
    val s2 = spark; import s2.implicits._
    val child = Seq(
      (1L, Option(10L), "en", 5.0),
      (2L, Option(10L), "en", 5.0),
      (3L, Option(99L), "xx", 500.0), // orphan fk, bad lang, out of range
      (4L, None, null, 1.0) // null fk skipped, null lang passes accepted
    ).toDF("id", "fk", "lang", "v")
    val dup = child.unionAll(child.where($"id" === 1L)) // id 1 duplicated
    val parent = Seq(10L, 11L).toDF("pk")
    val fd = Seq(("b1", "t1"), ("b1", "t2"), ("b2", "t1"), (null, "t9"))
      .toDF("det", "dep")
    val got = audit(Seq(
      Unique("u", dup, Seq("id")),
      NotNull("nn", child, "lang"),
      AcceptedValues("av", child, "lang", Seq("en", "de")),
      InRange("ir", child, "v", 0.0, 100.0),
      Referential("ref", child, "fk", parent, "pk"),
      FunctionalDep("fd", fd, Seq("det"), "dep")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("u") == ((5L, 2L)), s"dup id counts both copies: $got")
    assert(got("nn") == ((4L, 1L)))
    assert(got("av") == ((4L, 1L)), "null lang is not an accepted-values violation")
    assert(got("ir") == ((4L, 1L)))
    assert(got("ref") == ((3L, 1L)), "null fk skipped from n_checked; one orphan row")
    assert(got("fd") == ((2L, 1L)), "null determinant skipped; b1 maps to 2 deps")
  }

  test("constraint audit: duplicate check names rejected; result ordered by name") {
    val s2 = spark; import s2.implicits._
    val df = Seq(1L).toDF("x")
    intercept[IllegalArgumentException] {
      audit(Seq(NotNull("same", df, "x"), NotNull("same", df, "x")))
    }
    val names = audit(Seq(
      NotNull("zz", df, "x"), NotNull("aa", df, "x"), NotNull("mm", df, "x")))
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("aa", "mm", "zz"))
  }

  test("reconcile: added/removed/changed/unchanged; null-swapped fields differ") {
    val s2 = spark; import s2.implicits._
    val a = Seq(
      (1L, Option("x"), Option(1.0)), // unchanged
      (2L, Option("x"), Option(2.0)), // changed (value)
      (3L, Option("x"), None), // removed
      (4L, Option("p"), None), // changed vs (None, Some) — null swap
      (5L, None, Option(9.9)) // the mirrored null swap
    ).toDF("k", "s", "v")
    val b = Seq(
      (1L, Option("x"), Option(1.0)),
      (2L, Option("y"), Option(2.0)),
      (4L, Option.empty[String], Option(7.0)),
      (5L, Option("q"), Option.empty[Double]),
      (6L, Option("new"), Option(0.0)) // added
    ).toDF("k", "s", "v")
    val got = Reconcile.diff(a, b, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "changed", 6L -> "added"), s"got $got")
  }

  test("reconcile: null keys never match — they classify as removed + added") {
    val s2 = spark; import s2.implicits._
    val a = Seq((Option(1L), "x"), (None, "x")).toDF("k", "s")
    val b = Seq((Option(1L), "x"), (None, "x")).toDF("k", "s")
    val got = Reconcile.diff(a, b, Seq("k"), Seq("s"))
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("unchanged" -> 1L, "removed" -> 1L, "added" -> 1L), s"got $got")
  }

  test("mad audit: planted extremes flagged, fences are the rounded contract") {
    val s2 = spark; import s2.implicits._
    // 1..101 (median 51, MAD = median(|x-51|) = 25) plus two extremes;
    // fences = 51 ± 3.5*1.4826*25 ≈ [-78.7, 180.7]
    val rows = ((1 to 101).map(i => ("a", i.toDouble)) ++
      Seq(("a", 1000.0), ("a", -1000.0)) ++
      (1 to 101).map(i => ("b", i.toDouble))).toDF("g", "v")
    val out = Outliers.madAudit(rows, "g", "v").orderBy("g").collect()
    val a = out(0); val b = out(1)
    assert(a.getLong(1) == 103 && a.getLong(2) == 2)
    assert(a.getDouble(5) == -1000.0 && a.getDouble(6) == 1000.0)
    assert(b.getLong(1) == 101 && b.getLong(2) == 0)
    assert(b.isNullAt(5) && b.isNullAt(6))
    assert(b.getDouble(3) == round4(51.0 - 3.5 * 1.4826 * 25.0) &&
      b.getDouble(4) == round4(51.0 + 3.5 * 1.4826 * 25.0))
  }

  test("mad audit beats iqr on contaminated groups; MAD=0 flags off-median only") {
    val s2 = spark; import s2.implicits._
    // 30% contamination at 500: quartiles move (p75 lands in the cloud),
    // median/MAD do not — MAD still flags the cloud, IQR's upper fence
    // is dragged above it
    val contaminated = ((1 to 70).map(i => ("g", i.toDouble)) ++
      (1 to 30).map(_ => ("g", 500.0))).toDF("g", "v")
    val mad = Outliers.madAudit(contaminated, "g", "v").collect().head.getLong(2)
    val iqr = Outliers.iqrAudit(contaminated, "g", "v").collect().head.getLong(2)
    assert(mad == 30 && iqr == 0, s"mad=$mad iqr=$iqr")
    // constant group: MAD=0, lo=hi=median, nothing deviates → 0 outliers
    val const = (1 to 10).map(_ => ("c", 7.0)).toDF("g", "v")
    val c = Outliers.madAudit(const, "g", "v").collect().head
    assert(c.getLong(2) == 0 && c.getDouble(3) == 7.0 && c.getDouble(4) == 7.0)
  }

  test("diff plan: exchanges carry fingerprints, never the payload columns") {
    // the 100 TB claim — the wide row reduces to (key, hash, present) AT
    // THE SCAN, so no Exchange line may mention a compare column
    val df = SparkEntry.queries("q_dataset_diff")(spark, sf())
    df.collect() // AQE finalizes only after execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("xxhash64"), p.take(2000))
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, p.take(2000))
    exchanges.foreach { l =>
      assert(!l.contains("o_totalprice") && !l.contains("o_orderstatus"),
        s"payload column shuffled: $l")
    }
  }

  test("referential check plan: child scan prunes to the fk column only") {
    // the fact side contributes one pre-aggregated slim column — the
    // parquet scan must read nothing but l_orderkey
    val sn = graft.sources.Snapshot(spark, sf())
    val df = Constraints.audit(Seq(
      Referential("fk", sn.lineitem, "l_orderkey", sn.orders, "o_orderkey")))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"), p.take(3000))
    assert(p.contains("partial"), p.take(3000))
  }

  test("drift psi: identical snapshots score zero; a planted shift crosses 0.25") {
    val s2 = spark; import s2.implicits._
    val base = (1 to 1000).map(i => i % 100 * 1.0).toDF("v")
    val same = Drift.psiByBins(base, base, "v", 10).collect()
    assert(same.length == 10)
    assert(same.forall(r => math.abs(r.getDouble(5)) == 0.0),
      "identical distributions must contribute exactly zero per bin")
    // current mass concentrated in the top decile: textbook "shifted"
    val shifted = (1 to 1000).map(i => 90.0 + i % 10).toDF("v")
    val psi = Drift.psiByBins(base, shifted, "v", 10)
      .agg(sum("psi_contrib")).head().getDouble(0)
    assert(psi > 0.25, s"planted shift must exceed the 0.25 'shifted' bar, got $psi")
  }

  test("drift psi: out-of-range current values clamp to edge bins; empty bins stay finite") {
    val s2 = spark; import s2.implicits._
    val base = (1 to 100).map(_.toDouble).toDF("v")
    val cur = Seq(-500.0, -500.0, 600.0).toDF("v")
    val rows = Drift.psiByBins(base, cur, "v", 10)
      .orderBy("bin").collect()
    assert(rows(0).getLong(2) == 2 && rows(9).getLong(2) == 1,
      "range excursions must land in the edge bins, not vanish")
    // bins 1..8 have zero current mass — smoothing keeps every contrib finite
    assert(rows.forall(r => !r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
  }

  private def round4(x: Double): Double =
  // the operator rounds with the hashRound floor formula (r12)
    math.floor(x * 10000.0 + 0.5) / 10000.0
}
