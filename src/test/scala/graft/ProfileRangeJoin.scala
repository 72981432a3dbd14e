package graft

// Adjudicates the round-3 bench flag on q_range_join (0.35s -> 1.01s with
// unchanged code): per-rep timings in ONE JVM, alongside a control query
// with the same scan+decimal-agg shape (q_big_orders) to separate
// plan cost from janino-compile + box noise.
//   sbt "Test/runMain graft.ProfileRangeJoin [reps]"
object ProfileRangeJoin {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.local(32)
    val sfDir = "/root/testdata/sf0.1"

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
        .agg(sum("__h")).head()
      (System.nanoTime() - t0) / 1e9
    }

    Seq("q_range_join", "q_big_orders", "q_deciles", "q_deciles_by_group").foreach { name =>
      val ts = (1 to reps).map(_ => once(name))
      println(f"[rangejoin] $name%-14s reps=${ts.map(t => f"$t%.3f").mkString(", ")}")
      println(f"[rangejoin] $name%-14s first=${ts.head}%.3f steady-median=${
        ts.tail.sorted.apply(ts.tail.size / 2)}%.3f")
    }
    spark.stop()
  }
}
