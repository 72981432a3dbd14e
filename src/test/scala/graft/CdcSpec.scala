package graft

import org.apache.spark.sql.functions._

import graft.operators.cdc.{CdcApply, Scd}
import graft.sources.Snapshot

/** SCD-2 history building and snapshot+changelog application. */
class CdcSpec extends SparkSpecBase {

  import java.sql.Timestamp
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("scd2: runs collapse, versions chain, only the last is current") {
    val s2 = spark; import s2.implicits._
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "new"),
      (1L, ts("2024-01-02 00:00:00"), 11L, "new"),      // duplicate run → collapses
      (1L, ts("2024-01-03 00:00:00"), 12L, "active"),
      (1L, ts("2024-01-04 00:00:00"), 13L, "new"),      // state may RECUR as a new run
      (2L, ts("2024-01-05 00:00:00"), 14L, "active")    // single-row key
    ).toDF("k", "t", "id", "st")
    val h = Scd.history(log, "k", "t", "id", "st")
      .orderBy("k", "version")
      .select("k", "version", "st", "effective_from", "effective_to", "is_current")
      .collect()
    assert(h.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 1L, "new"), (1L, 2L, "active"), (1L, 3L, "new"), (2L, 1L, "active")))
    // effective_to chains to the NEXT version's effective_from
    assert(h(0).getTimestamp(4) == h(1).getTimestamp(3))
    assert(h(1).getTimestamp(4) == h(2).getTimestamp(3))
    // exactly the last version per key is open/current
    assert(h.map(_.getBoolean(5)).toSeq == Seq(false, false, true, true))
    // a run opens at the FIRST row of the run, not the last
    assert(h(0).getTimestamp(3) == ts("2024-01-01 00:00:00"))
  }

  test("scd2: null states collapse null-safely and the first row always survives") {
    val s2 = spark; import s2.implicits._
    val log = Seq(
      (1L, 1L, 10L, Option.empty[String]), // first row, null state → must survive
      (1L, 2L, 11L, Option.empty[String]), // null == null → collapses
      (1L, 3L, 12L, Some("a")),
      (1L, 4L, 13L, Option.empty[String])  // a → null is a change
    ).toDF("k", "t", "id", "st")
    val h = Scd.history(log, "k", "t", "id", "st").orderBy("version")
      .select("version", "st").collect()
    assert(h.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ==
      Seq((1L, None), (2L, Some("a")), (3L, None)))
  }

  test("scd2: ties on the ordering column resolve by the tiebreak column") {
    val s2 = spark; import s2.implicits._
    val log = Seq((1L, 5L, 2L, "b"), (1L, 5L, 1L, "a")).toDF("k", "t", "id", "st")
    val h = Scd.history(log, "k", "t", "id", "st").orderBy("version")
      .select("st", "is_current").collect()
    assert(h.map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("a", false), ("b", true)))
  }

  test("cdc apply: upsert wins, inserts land, tombstones delete, base-only keys survive") {
    val s2 = spark; import s2.implicits._
    val base = Seq(
      (1L, 10L, 100L, "v1", false),
      (2L, 10L, 101L, "v1", false),
      (3L, 10L, 102L, "v1", false)
    ).toDF("k", "t", "id", "payload", "is_delete")
    val changes = Seq(
      (1L, 20L, 200L, "v2", false),  // upsert over base
      (1L, 15L, 201L, "stale", false), // older change loses to the newer one
      (2L, 20L, 202L, "gone", true), // tombstone deletes key 2
      (4L, 20L, 203L, "new", false)  // insert of an unseen key
    ).toDF("k", "t", "id", "payload", "is_delete")
    val out = CdcApply.applyChanges(base, changes, Seq("k"),
      Seq(col("t").desc, col("id").desc), "is_delete", strict = true)
      .orderBy("k").select("k", "payload").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "v2"), (3L, "v1"), (4L, "new")))
    // the delete flag column does not leak into the result
    assert(!CdcApply.applyChanges(base, changes, Seq("k"),
      Seq(col("t").desc, col("id").desc), "is_delete", strict = true)
      .columns.contains("is_delete"))
  }

  test("cdc apply: a tombstoned key can be resurrected by a later change") {
    val s2 = spark; import s2.implicits._
    val base = Seq((1L, 10L, 100L, "v1", false)).toDF("k", "t", "id", "payload", "is_delete")
    val changes = Seq(
      (1L, 20L, 200L, "dead", true),
      (1L, 30L, 300L, "reborn", false)
    ).toDF("k", "t", "id", "payload", "is_delete")
    val out = CdcApply.applyChanges(base, changes, Seq("k"),
      Seq(col("t").desc, col("id").desc), "is_delete", strict = true).collect()
    assert(out.map(_.getAs[String]("payload")).toSeq == Seq("reborn"))
  }

  test("cdc apply on events ≡ latest-overall minus tombstones (the oracle identity)") {
    val sn = Snapshot(spark, sf())
    val ev = sn.events.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"), (col("event_type") === "error").as("is_delete"))
    val cutoff = lit("2024-01-16").cast("timestamp")
    val base = graft.plans.TopKPerKey(ev.where(col("ts") < cutoff), Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc), 1, strict = true)
    val applied = CdcApply.applyChanges(base, ev.where(col("ts") >= cutoff),
      Seq("user_id"), Seq(col("ts").desc, col("event_id").desc), "is_delete", strict = true)
      .select("user_id", "event_id").orderBy("user_id").collect()
    val expected = graft.plans.TopKPerKey(ev, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc), 1, strict = true)
      .where(col("event_type") =!= "error")
      .select("user_id", "event_id").orderBy("user_id").collect()
    assert(applied.toSeq == expected.toSeq)
    assert(applied.nonEmpty)
  }
}
