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
