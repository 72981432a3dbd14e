package graft

/** Ad-hoc plan inspection main (test scope, like the Profile* mains):
  * prints the executed plans of the named queries at sf0.01.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_bloom_prefilter", "q_boilerplate", "q_dedup_incremental")
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
