package graft.operators.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: build a slowly-changing-dimension
  * type-2 history from an ordered changelog, and apply a changelog to a
  * standing snapshot (upsert + tombstone semantics).
  *
  * The reference keeps one mutable SQLite table and overwrites rows in
  * place (`/root/reference/langchain/my_toolkit.py` materializes each
  * intermediary as the latest state only); at warehouse scale the same
  * capability is the immutable changelog + derived snapshot/history pair
  * below — declarative window/union plans Catalyst can optimize, no
  * in-place mutation anywhere.
  */
object Scd {

  /** Collapse an ordered changelog into SCD-2 versioned history: one row
    * per (key, run of equal state), with `version` (1-based per key),
    * `effective_from` (the ordering value opening the run),
    * `effective_to` (the next run's opening value, null while current)
    * and `is_current`.
    *
    * A row opens a new version iff it is the key's first row or its
    * state differs null-safely from the previous row's state —
    * consecutive duplicates collapse away, so the history is minimal.
    *
    * Plan shape: one shuffle on the key; both windows share the same
    * (key, ord, tie) sort so Catalyst plans a single Exchange. Per-key
    * sequential scan — the same hot-key bound as every per-key window
    * (documented in SURVEY §4); key cardinality ≫ one pathological key
    * is the contract, as for sessionize.
    *
    * `tieCol` must be unique within a key (CLAUDE.md determinism rule) —
    * it makes the run decomposition reproducible when `ordCol` ties.
    */
  def history(
      df: DataFrame,
      keyCol: String,
      ordCol: String,
      tieCol: String,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(ordCol), col(tieCol))
    val changes = df
      .withColumn("__prev_state", lag(col(stateCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 || !(col("__prev_state") <=> col(stateCol)))
      .drop("__prev_state", "__rn")
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("effective_from", col(ordCol))
      .withColumn("effective_to", lead(col(ordCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }
}

/** Apply a changelog to a standing snapshot: the latest version per key
  * wins; a winning row flagged as a delete tombstones the key out of the
  * result entirely.
  */
object CdcApply {

  /** `base` (≤1 row per key — a prior snapshot) ∪ `changes` (any number
    * of rows per key) → latest row per key by `orderBy` (give DESCENDING
    * columns: the FIRST row under this order wins), minus keys whose
    * winner has `deleteCol` true.
    *
    * Plan shape: union is free (no shuffle), then `TopKPerKey(k=1)` —
    * bounded per-key heaps on the clustering shuffle, never a full
    * sort. The snapshot is only ever read, never rewritten in place;
    * emitting the result as the next snapshot gives exactly-once
    * changelog application (the D6/D9 streaming seam's batch half).
    *
    * `strict = true` skips the TopKPerKey preflight — right when key
    * cardinality is known-bounded; leave false to auto-degrade to the
    * window fallback when keys·1 could overflow the heap contract.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[Column],
      deleteCol: String,
      strict: Boolean = false): DataFrame = {
    val all = base.unionByName(changes)
    graft.plans.TopKPerKey(all, keyCols, orderBy, 1, strict = strict)
      .where(!col(deleteCol))
      .drop(deleteCol)
  }
}
