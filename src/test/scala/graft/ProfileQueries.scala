package graft

// Generic steady-state profiler for adjudicating bench flags on ANY
// query — the ProfileNoiseMagnets recipe (warmed interleaved reps,
// Bench's median definition) without the hardcoded query set. Pass the
// flagged query plus one or two same-scan controls:
//
//   sbt "Test/runMain graft.ProfileQueries <reps> <query> [query ...]"
//
// Reading: if the flagged query's steady median moved but its control's
// did not, the delta is plan-specific — investigate; if both moved, or
// the bench flag's own spread overlaps the steady interval printed
// here, it is the box — dismiss (SURVEY §6 adjudication recipe).
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    require(args.length >= 2, "usage: ProfileQueries <reps> <query> [query ...]")
    val reps = args.head.toInt
    val names = args.tail.toSeq
    names.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query $n"))
    val spark = GraftSession.local(32)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
        .agg(sum("__h")).head()
      (System.nanoTime() - t0) / 1e9
    }

    val warm = names.map(n => n -> once(n)).toMap
    val runs = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefault(_ => Vector())
    for (_ <- 1 to reps; n <- names)
      runs(n) = runs(n) :+ once(n)

    def stats(ts: Vector[Double]): (Double, Double, Double) = {
      val s = ts.sorted
      val med = if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      (ts.min, med, ts.max)
    }
    names.foreach { n =>
      val ts = runs(n)
      val (mn, md, mx) = stats(ts)
      println(f"[profile] $n%-24s warmup=${warm(n)}%.3f min=$mn%.3f median=$md%.3f max=$mx%.3f reps=${ts.map(t => f"$t%.3f").mkString(", ")}")
    }
    spark.stop()
  }
}
