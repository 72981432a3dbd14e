package graft

/** Manual plan-audit harness (not a spec): prints the executed plan of
  * the named queries so a human can check shuffle/broadcast shapes.
  * Run: sbt 'Test/runMain graft.ExplainAudit [query names...]'
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_token_chunks", "q_embedding_quantize", "q_balanced_mix", "q_target_mix")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      df.collect() // AQE finalizes after execution
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
