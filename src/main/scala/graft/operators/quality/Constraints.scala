package graft.operators.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the Deequ-shaped check
  * suite a curation pipeline runs before trusting a snapshot (the
  * reference validates its loaded table ad hoc before charting,
  * `/root/reference/langchain/my_toolkit.py:41` re-checks column
  * presence per tool call; at warehouse scale the same need is a
  * declared constraint suite evaluated in bulk).
  *
  * Each check reduces to ONE aggregation at the grain of its own key —
  * never a collect, never a sort:
  *
  *  - row checks (`NotNull` / `AcceptedValues` / `InRange`) are a single
  *    conditional partial-aggregated scan (the `q_null_audit` shape);
  *    checks over the same DataFrame still run as separate branches —
  *    Catalyst reuses the scan, and each branch is one map-side-combined
  *    agg of one row;
  *  - `Unique` shuffles only the candidate key (groupBy + count, partial
  *    aggregation makes the exchange carry one row per distinct key per
  *    map partition);
  *  - `Referential` aggregates the child to (fk, count) FIRST — the
  *    exchange grain is distinct fk values, not child rows — then
  *    left-joins the parent's distinct keys and sums counts of the
  *    unmatched (orphan) side. The 100 TB fact table contributes one
  *    slim pre-aggregated column to the join;
  *  - `FunctionalDep` is groupBy(determinant) + countDistinct(dependent)
  *    — the exchange again carries determinant grain.
  *
  * The audit result is the union of one-row aggregates: `check_name`,
  * `n_checked`, `n_violations` (named `check_name`, not `constraint` —
  * a reserved word the oracle harness cannot project unquoted) — tiny however large the inputs.
  *
  * Null semantics (documented contract):
  *  - `Unique`: null key values participate (two all-null keys are
  *    duplicates of each other — SQL GROUP BY semantics);
  *  - `AcceptedValues` / `InRange`: null values are not violations
  *    (pair with `NotNull` to reject them) — `n_checked` counts all rows;
  *  - `Referential`: null foreign keys are skipped (`n_checked` counts
  *    rows with a non-null fk — a null fk is an absence, not an orphan);
  *  - `FunctionalDep`: rows with a null determinant are skipped;
  *    `n_checked` is the number of determinant groups, `n_violations`
  *    the number of groups with more than one distinct dependent.
  */
object Constraints {

  sealed trait Check { def name: String }

  /** `cols` is a candidate key: violations = rows sharing their key
    * tuple with at least one other row.
    */
  final case class Unique(name: String, df: DataFrame, cols: Seq[String]) extends Check

  final case class NotNull(name: String, df: DataFrame, column: String) extends Check

  /** Violations = non-null values outside `values`. */
  final case class AcceptedValues(
      name: String, df: DataFrame, column: String, values: Seq[String]) extends Check

  /** Violations = non-null values outside [lo, hi] (inclusive). */
  final case class InRange(
      name: String, df: DataFrame, column: String, lo: Double, hi: Double) extends Check

  /** Violations = child rows whose non-null `fk` has no match in
    * `parent.pk` (orphans).
    */
  final case class Referential(
      name: String, child: DataFrame, fk: String, parent: DataFrame, pk: String) extends Check

  /** Violations = determinant groups mapping to >1 distinct dependent —
    * the profiling question "does det functionally determine dep?".
    */
  final case class FunctionalDep(
      name: String, df: DataFrame, determinant: Seq[String], dependent: String) extends Check

  /** One row per check: `check_name, n_checked, n_violations`, ordered
    * by check name.
    */
  def audit(checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique — they are the result key")
    checks.map(evaluate).reduce(_ unionAll _).orderBy("check_name")
  }

  private def evaluate(check: Check): DataFrame = check match {
    case Unique(name, df, cols) =>
      df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(
          coalesce(sum(col("__c")), lit(0L)).as("n_checked"),
          coalesce(sum(when(col("__c") > 1, col("__c")).otherwise(0L)), lit(0L))
            .as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
    case NotNull(name, df, c) =>
      df.agg(
          count(lit(1)).as("n_checked"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
    case AcceptedValues(name, df, c, values) =>
      df.agg(
          count(lit(1)).as("n_checked"),
          sum(when(col(c).isNotNull && !col(c).isin(values: _*), 1L).otherwise(0L))
            .as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
    case InRange(name, df, c, lo, hi) =>
      df.agg(
          count(lit(1)).as("n_checked"),
          sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
            .as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
    case Referential(name, child, fk, parent, pk) =>
      val cnts = child
        .where(col(fk).isNotNull)
        .groupBy(col(fk).as("__fk"))
        .agg(count(lit(1)).as("__c"))
      val keys = parent
        .where(col(pk).isNotNull)
        .select(col(pk).as("__pk"))
        .distinct()
        .withColumn("__present", lit(1))
      cnts
        .join(keys, cnts("__fk") === keys("__pk"), "left")
        .agg(
          coalesce(sum(col("__c")), lit(0L)).as("n_checked"),
          coalesce(sum(when(col("__present").isNull, col("__c")).otherwise(0L)), lit(0L))
            .as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
    case FunctionalDep(name, df, det, dep) =>
      df.where(det.map(col(_).isNotNull).reduce(_ && _))
        .groupBy(det.map(col): _*)
        .agg(countDistinct(col(dep)).as("__nd"))
        .agg(
          count(lit(1)).as("n_checked"),
          coalesce(sum(when(col("__nd") > 1, 1L).otherwise(0L)), lit(0L)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
  }
}
