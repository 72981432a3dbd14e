package graft.operators.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key of two dataset versions
  * as `added` / `removed` / `changed` / `unchanged` — the audit a
  * pipeline runs after a backfill, a CDC apply (`CdcApply`), or a
  * migration, and the batch shape of "what did this rebuild actually
  * touch?". The reference mutates its one table in place and keeps no
  * before-image to compare (`/root/reference/langchain/my_toolkit.py`
  * overwrites the intermediary); at warehouse scale the comparable
  * capability is an immutable-snapshot diff.
  *
  * Scale design: the wide payload NEVER shuffles. Each side is reduced
  * at the scan to `(key, fingerprint, present)` where the fingerprint
  * is `xxhash64(to_json(struct(compareCols)))` — 8 bytes however wide
  * the row — and the diff is one co-partitioned full outer join on the
  * key. Diffing two 100 TB snapshots moves keys + 8 bytes per row.
  * `to_json` keeps the fingerprint unambiguous under nulls: a null
  * field is DROPPED with its name, so `(a=null, b=1)` and `(a=1,
  * b=null)` serialize to different objects (a naive concat of values
  * cannot tell them apart), and Jackson's shortest-round-trip float
  * rendering is injective on doubles.
  *
  * Contracts:
  *  - equal fingerprints ⇒ `unchanged`: a 64-bit collision (p ≈ n²/2⁶⁵
  *    per key — negligible below trillions of MODIFIED rows) would
  *    misreport one changed key as unchanged; callers needing certainty
  *    re-verify the `changed`+`unchanged` partition with a value join
  *    (the driver gate does exactly that: the DuckDB oracle classifies
  *    from raw values, so the fingerprint path is cross-checked against
  *    a value compare every round);
  *  - null keys never equi-match (SQL join semantics): a null-keyed row
  *    classifies as `removed` (old side) or `added` (new side);
  *  - keys are assumed unique per side (snapshot semantics — assert
  *    with `Constraints.Unique` first; duplicate keys fan out through
  *    the join).
  *
  * Output: keyCols..., `status`. Aggregate for a summary, semi-join the
  * `changed` keys back to either snapshot to fetch payloads.
  */
object Reconcile {

  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    require(compareCols.nonEmpty, "diff needs at least one compare column")
    // both snapshots often derive from ONE source (a time-travel read, a
    // filtered base table) — rename each side's keys to fresh names so
    // the self-join is unambiguous by construction
    def slim(df: DataFrame, side: String): DataFrame =
      df.select(
        keyCols.zipWithIndex.map { case (k, i) => col(k).as(s"__${side}_k$i") } ++ Seq(
          xxhash64(to_json(struct(compareCols.map(col): _*))).as(s"__fp_$side"),
          lit(true).as(s"__$side")): _*)
    val o = slim(oldDf, "old")
    val n = slim(newDf, "new")
    val cond: Column = keyCols.indices
      .map(i => col(s"__old_k$i") === col(s"__new_k$i")).reduce(_ && _)
    val status = when(col("__old").isNull, "added")
      .when(col("__new").isNull, "removed")
      .when(col("__fp_old") =!= col("__fp_new"), "changed")
      .otherwise("unchanged")
    o.join(n, cond, "full_outer")
      .select(
        keyCols.zipWithIndex.map { case (k, i) =>
          coalesce(col(s"__old_k$i"), col(s"__new_k$i")).as(k)
        } :+ status.as("status"): _*)
  }
}
