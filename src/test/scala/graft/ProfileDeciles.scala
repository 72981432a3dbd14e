package graft

object ProfileDeciles {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    for (q <- Seq("q_deciles", "q_deciles_by_group")) run(q) // warm
    for (rep <- 1 to 5; q <- Seq("q_deciles", "q_deciles_by_group"))
      println(f"[deciles] rep$rep $q%-22s ${run(q)}%6.2f s")
    spark.stop()
  }
}
