package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey
import graft.sources.Snapshot

class TopKPerKeySpec extends SparkSpecBase {

  test("matches the window row_number formulation") {
    val sn = Snapshot(spark, sf())
    val c = sn.customer.join(broadcast(sn.nation), col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_acctbal")

    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("n_name").orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.withColumn("rn", row_number().over(w)).where(col("rn") <= 3).drop("rn")
        .orderBy("n_name", "c_custkey").collect().toSeq
    }
    val viaTopK = TopKPerKey(c, Seq("n_name"), Seq(col("c_acctbal").desc, col("c_custkey").asc), 3)
      .orderBy("n_name", "c_custkey").collect().toSeq
    assert(viaTopK == viaWindow)
  }

  test("plans one clustering exchange and no sort of the full input") {
    val sn = Snapshot(spark, sf())
    val df = TopKPerKey(
      sn.customer.select("c_nationkey", "c_custkey", "c_acctbal"),
      Seq("c_nationkey"), Seq(col("c_acctbal").desc), 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p.take(1500)) // nodeName strips "Exec"
    assert(!p.contains("Sort "), s"full-input sort should be absent:\n${p.take(1500)}")
  }

  test("k larger than group size returns whole groups") {
    val sn = Snapshot(spark, sf())
    val small = sn.region // 5 rows, distinct keys
    val got = TopKPerKey(small, Seq("r_regionkey"), Seq(col("r_name").asc), 10).count()
    assert(got == 5)
  }

  test("auto mode degrades to the window plan when keys*k exceeds the heap contract") {
    // every order key is distinct -> the preflight estimate rejects the
    // bounded heap and the call must return the sort-based window plan
    // with identical rows, not fail
    val orders = Snapshot(spark, sf()).orders.select("o_orderkey", "o_totalprice")
    val df = TopKPerKey(orders, Seq("o_orderkey"), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 1,
      maxRetainedPerPartition = 10L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("TopKPerKey"), p.take(1500))
    assert(p.contains("Window"), p.take(1500))
    assert(df.count() == orders.count())
    // strict mode keeps the fail-fast contract for the same inputs (below)
  }

  test("auto mode under a planted hot key: heap path when the contract holds, window parity when it can't") {
    // 80% of rows concentrated on ONE key among ~1000 — the skew shape a
    // hash-partitioned clustering shuffle sends to a single partition.
    // The preflight's worst-case-placement assumption must stay immune to
    // WHERE the keys land, only to how many there are.
    val skewed = spark.range(0, 50000).select(
      when(col("id") % 5 === 0, col("id") % 997).otherwise(lit(777L)).as("k"),
      col("id").as("v"))
    val order = Seq(col("v").desc, col("v").asc)
    def viaWindow(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy(col("v").desc)
      df.withColumn("rn", row_number().over(w)).where(col("rn") <= 3).drop("rn")
        .orderBy("k", "v").collect().toSeq
    }
    // (a) ~998 keys * 3 fits the default contract: heap path, despite the
    // hot key owning 40k of 50k rows (the heap retains 3 per key, so the
    // hot partition's footprint is keys-resident-there * 3, never 40k)
    val heap = TopKPerKey(skewed, Seq("k"), order, 3)
    heap.collect()
    assert(heap.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(heap.orderBy("k", "v").collect().toSeq == viaWindow(skewed))
    // (b) a cap under keys*k: the same skewed input degrades to the
    // spillable window plan and still returns identical rows
    val degraded = TopKPerKey(skewed, Seq("k"), order, 3, maxRetainedPerPartition = 1000L)
    degraded.collect()
    val p = degraded.queryExecution.executedPlan.toString
    assert(!p.contains("TopKPerKey") && p.contains("Window"), p.take(1500))
    assert(degraded.orderBy("k", "v").collect().toSeq == viaWindow(skewed))
  }

  test("retained-row bound fails fast with guidance on high-cardinality keys (strict)") {
    // every order key is distinct -> keys*k blows a tiny bound immediately
    val orders = Snapshot(spark, sf()).orders.select("o_orderkey", "o_totalprice")
    val df = TopKPerKey(orders, Seq("o_orderkey"), Seq(col("o_totalprice").desc), 1,
      maxRetainedPerPartition = 10L, strict = true)
    val e = intercept[Exception](df.collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxRetainedPerPartition")), e.toString)
    // default bound leaves the normal path untouched
    assert(TopKPerKey(orders, Seq("o_orderkey"), Seq(col("o_totalprice").desc), 1).count() ==
      orders.count())
  }
}
