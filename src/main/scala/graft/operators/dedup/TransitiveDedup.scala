package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over duplicate-pair edges, for transitive dedup
  * clusters (A~B, B~C ⇒ {A,B,C} one cluster even without an A~C edge).
  *
  * Iterative min-label propagation: each round every node takes the
  * minimum label among itself and its neighbors — one hop per round, so
  * convergence is O(diameter); near-dup clusters have tiny diameters in
  * practice (hitting maxIter leaves distant chain ends unmerged). Each
  * round is one shuffle on node id; `localCheckpoint` cuts lineage so
  * plans don't grow with iterations (the classic iterative-Spark failure
  * mode).
  *
  * Fault-tolerance tradeoff (deliberate): `localCheckpoint` stores
  * non-replicated executor-local blocks — on a real cluster a lost
  * executor makes the truncated lineage unrecoverable and fails the job,
  * which Spark then retries from scratch. That is the right default for
  * an iterative job whose per-round state is small (the label table, two
  * longs per node — NOT the corpus). For long multi-hour cluster runs
  * where a retry-from-scratch is unacceptable, swap in a reliable
  * `sparkContext.setCheckpointDir` + `.checkpoint()` (HDFS/S3-backed) or
  * `persist(MEMORY_AND_DISK_2)` at ~2× the per-round I/O cost.
  */
object TransitiveDedup {

  /** (id, component) for every id appearing in `pairs` (id_a/id_b). */
  def components(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("component")).as("nbr_min"))
      val updated = labels
        .join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"), least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"),
          (col("nbr_min") < col("component")).as("changed"))
        .localCheckpoint(true)
      converged = updated.where(col("changed")).isEmpty
      labels = updated.select("id", "component")
      iter += 1
    }
    labels
  }

  /** Survivors after transitive dedup: the minimum id of each component
    * plus every id with no duplicate edge at all.
    */
  def dedupe(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = components(pairs)
    val losers = comp.where(col("id") =!= col("component")).select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware survivor selection: within each duplicate component
    * keep the row with the HIGHEST `scoreCol` (ties → lowest id) instead
    * of the lowest id — the "keep the best copy" policy a training-data
    * pipeline actually wants (e.g. `TextStats.quality`'s score). Rows
    * with no duplicate edge are untouched. Winner selection is a
    * bounded-heap `TopKPerKey(k=1)` over only the component members —
    * never a component-wide sort; auto mode because component
    * cardinality is data-dependent.
    */
  def dedupeKeepBest(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      scoreCol: org.apache.spark.sql.Column): DataFrame = {
    val comp = components(pairs)
    val scored = df
      .select(col(idCol).as("id"), scoreCol.as("__score"))
      .join(comp, Seq("id"))
    val winners = graft.plans.TopKPerKey(
      scored, Seq("component"), Seq(col("__score").desc, col("id").asc), 1)
      .select("id")
    val losers = comp.select("id")
      .join(winners, Seq("id"), "left_anti")
      .withColumnRenamed("id", idCol)
    df.join(losers, Seq(idCol), "left_anti")
  }
}
