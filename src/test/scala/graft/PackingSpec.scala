package graft

import org.apache.spark.sql.functions._

import graft.operators.sample.Packing
import graft.sources.Snapshot

class PackingSpec extends SparkSpecBase {

  private val budget = 2048L

  test("distributed prefix-sum packing matches the global-window formulation") {
    val docs = Snapshot(spark, sf()).documents.where(col("text").isNotNull)
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      docs
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("__prefix", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .withColumn("shard_id", floor(col("__prefix") / lit(budget.toDouble)).cast("long"))
        .select("doc_id", "n_tokens", "shard_id")
        .orderBy("doc_id").collect().toSeq
    }
    val viaPacking = Packing
      .assignShards(docs, "doc_id", size(split(col("text"), " ")), budget)
      .orderBy("doc_id").collect().toSeq
    assert(viaPacking == viaWindow)
  }

  test("every full shard lands within one document of the token budget") {
    val docs = Snapshot(spark, sf()).documents.where(col("text").isNotNull)
    val toks = size(split(col("text"), " "))
    val maxDoc = docs.agg(max(toks.cast("long"))).head().getLong(0)
    val shards = Packing.assignShards(docs, "doc_id", toks, budget)
      .groupBy("shard_id").agg(sum(col("n_tokens")).as("t"))
      .orderBy("shard_id").collect()
    // all but the last shard must be filled to the budget, give or take
    // the one document that straddles the boundary
    shards.dropRight(1).foreach { r =>
      val t = r.getLong(1)
      assert(t >= budget - maxDoc && t <= budget + maxDoc,
        s"shard ${r.getLong(0)} holds $t tokens (budget $budget, max doc $maxDoc)")
    }
    // packing is a partition of the corpus: token totals add up exactly
    val total = docs.agg(sum(toks.cast("long"))).head().getLong(0)
    assert(shards.map(_.getLong(1)).sum == total)
  }

  test("written shards are readable per shard with partition pruning at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toFile
    dir.deleteOnExit()
    val docs = Snapshot(spark, sf()).documents.where(col("text").isNotNull)
    val toks = size(split(col("text"), " "))
    Packing.writeShards(docs, "doc_id", toks, budget, dir.getAbsolutePath)
    val assigned = Packing.assignShards(docs, "doc_id", toks, budget)
    val shard0 = spark.read.parquet(dir.getAbsolutePath).where(col("shard_id") === 0)
    shard0.collect() // CLAUDE.md plan-assertion rule: AQE finalizes after execution
    val p = shard0.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(shard_id"), p.take(2000))
    assert(shard0.count() == assigned.where(col("shard_id") === 0).count())
    // the artifact is a partition of the corpus: nothing lost or doubled
    assert(spark.read.parquet(dir.getAbsolutePath).count() == docs.count())
  }

  test("packing plans no global (empty-partition) window") {
    val docs = Snapshot(spark, sf()).documents.where(col("text").isNotNull)
    val df = Packing.assignShards(docs, "doc_id", size(split(col("text"), " ")), budget)
    df.collect()
    // every Window node must carry a partition spec (the __pid clustering)
    // — an empty one would be the single-task global running total this
    // operator exists to avoid
    import org.apache.spark.sql.execution.SparkPlan
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    def hasGlobalWindow(p: SparkPlan): Boolean = {
      val here = p match {
        case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.isEmpty
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
          w.partitionSpec.isEmpty
        case _ => false
      }
      here || kids(p).exists(hasGlobalWindow)
    }
    assert(!hasGlobalWindow(df.queryExecution.executedPlan),
      df.queryExecution.executedPlan.toString.take(2000))
  }
}
