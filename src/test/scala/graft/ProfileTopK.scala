package graft

// scratch profiler: sbt "Test/runMain graft.ProfileTopK"
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.local(32)
    val li = graft.sources.Snapshot(spark, "/root/testdata/sf0.1").lineitem
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    li.count() // warm the scan
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey").orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    for (_ <- 1 to 3) {
      time("window row_number") {
        li.withColumn("rn", row_number().over(w)).where(col("rn") <= 3).count()
      }
      time("TopKPerKey") {
        graft.plans.TopKPerKey(li, Seq("l_suppkey"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc), 3).count()
      }
    }
    spark.stop()
  }
}
