package graft

import org.apache.spark.sql.functions._

// Where does q_column_profile's ~4s at sf0.1 go? Times the catalog
// query, a distinct-free variant, and per-column single-distinct runs
// to separate Expand cost from aggregate-count cost.
//   sbt "Test/runMain graft.ProfileProfile [reps]"
object ProfileProfile {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(32)
    val sfDir = "/root/testdata/sf0.1"
    val orders = graft.sources.Snapshot(spark, sfDir).orders
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h")).agg(sum("h")).head()

    (1 to reps).foreach { i =>
      time(s"full catalog query rep$i")(
        force(SparkEntry.queries("q_column_profile")(spark, sfDir)))
    }
    (1 to reps).foreach { i =>
      time(s"approx variant rep$i")(
        force(graft.operators.stats.Profiling.columnProfile(orders, cols, approx = true)))
    }
    time("count-distinct only (6 cols)")(
      force(orders.agg(countDistinct(col(cols.head)).as("d0"),
        cols.tail.zipWithIndex.map { case (c, i) => countDistinct(col(c)).as(s"d${i + 1}") }: _*)))
    time("min/max/count only (no distinct)")(
      force(orders.agg(count(lit(1)).as("n"),
        cols.flatMap(c => Seq(count(col(c)).as(s"nn_$c"))) ++
          Seq(min(col("o_orderkey")).as("mn"), max(col("o_orderkey")).as("mx")): _*))
    )
    println(SparkEntry.queries("q_column_profile")(spark, sfDir)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Expand") || l.contains("Aggregate") || l.contains("Exchange"))
      .take(12).mkString("\n"))
    spark.stop()
  }
}
