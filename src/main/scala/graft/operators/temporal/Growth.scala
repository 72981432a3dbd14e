package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monthly growth accounting — the classic MAU decomposition every
  * activity dashboard runs: each active (user, month) is exactly one of
  *
  *   new          first month ever seen;
  *   retained     also active the previous calendar month;
  *   resurrected  active before, but not the previous month;
  *
  * and `churned` counts a user into the month AFTER their last
  * consecutive active month (next activity missing or later than
  * month+1), bounded by the corpus' last month — nobody churns out of
  * the observation window. The identities
  * MAU(m) = new+retained+resurrected and
  * MAU(m−1) = retained(m) + churned(m) hold exactly (spec-pinned).
  *
  * Determinism & engine parity: calendar months become an INTEGER
  * month index y·12+(m−1) up front, so every comparison and the ±1
  * month arithmetic is exact int math — never DATE + INTERVAL, whose
  * result TYPE differs across engines — and the output month
  * reconstructs via make_date. All counts exact BIGINTs.
  *
  * Scale shape: one distinct to the (user, month) activity grain
  * (user-keyed exchange), per-user lag/lead windows over that slim
  * grain (months per user is bounded), a 1-row max-month broadcast,
  * and one month-grain count agg. The event log itself is touched once.
  */
object Growth {

  def monthlyAccounting(
      df: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val um = df
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        (year(col(tsCol)) * 12 + month(col(tsCol)) - 1).as("__mi"))
      .distinct()
    accountingFromGrain(um)
  }

  /** The accounting computation over the distinct (user, month-index)
    * grain — ONE definition shared by the batch and from-state paths so
    * state-maintained == one-shot is structural. */
  private def accountingFromGrain(um: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__mi"))
    val lagged = um
      .withColumn("__prev", lag(col("__mi"), 1).over(w))
      .withColumn("__next", lead(col("__mi"), 1).over(w))
    val maxMonth = um.agg(max(col("__mi")).as("__max_mi"))
    val classified = lagged.select(
      col("__mi"),
      when(col("__prev").isNull, lit("new"))
        .when(col("__prev") === col("__mi") - 1, lit("retained"))
        .otherwise(lit("resurrected")).as("__kind"))
    val churned = lagged.crossJoin(broadcast(maxMonth))
      .where(col("__mi") < col("__max_mi") &&
        (col("__next").isNull || col("__next") > col("__mi") + 1))
      .select((col("__mi") + 1).as("__mi"), lit("churned").as("__kind"))
    classified.unionByName(churned)
      .groupBy(col("__mi"))
      .agg(
        sum(when(col("__kind") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__kind") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("__kind") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("__kind") === "churned", 1L).otherwise(0L)).as("n_churned"))
      .select(
        make_date(expr("__mi div 12"), col("__mi") % 12 + 1, lit(1)).as("month"),
        col("n_new"), col("n_retained"), col("n_resurrected"), col("n_churned"))
  }


  /** Per-user activity state for streaming maintenance (D23, the
    * D19/D22 shape): one row per user carrying the SORTED DISTINCT
    * month-index array. Merging is SET union — order-free and
    * idempotent, so microbatch arrival order and replays are both
    * immaterial (strictly stronger than D22's multiset contract:
    * activity is a set, re-observing a (user, month) changes nothing).
    * State size is months-per-user, bounded by the corpus epoch — the
    * operator's own window-cost bound.
    */
  def activityState(df: DataFrame, userCol: String, tsCol: String): DataFrame =
    df.where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        (year(col(tsCol)) * 12 + month(col(tsCol)) - 1).as("__mi"))
      .groupBy(col("__u"))
      .agg(array_sort(collect_set(col("__mi"))).as("months"))

  /** Set-union merge of two [[activityState]]s (associative,
    * commutative, idempotent). */
  def mergeActivityState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("__u"))
      .agg(array_sort(array_distinct(flatten(collect_list(col("months")))))
        .as("months"))

  /** [[monthlyAccounting]] recomputed from carried state — explodes the
    * month sets back to (user, month) rows and runs the identical
    * computation, so state-maintained == one-shot EXACTLY (D23 spec).
    * The exploded rows feed the month-index branch directly (state
    * already holds indices, no timestamp reconstruction).
    */
  def monthlyAccountingFromState(state: DataFrame): DataFrame =
    accountingFromGrain(
      state.select(col("__u"), explode(col("months")).as("__mi")).distinct())
}
