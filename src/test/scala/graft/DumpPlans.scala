package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Plan-shape census for the optimization rounds (guide §1.1/§7.2): for
  * every (or each named) catalog query, executes it once (so AQE
  * finalizes), writes the formatted explain to <outDir>/<name>.txt, and
  * prints one summary line per query with the counts that matter for
  * scale review: Exchange nodes, join strategies, scans, codegen spans.
  *
  * Run: sbt 'Test/runMain graft.DumpPlans <sfDir> <outDir> [names...]'
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpPlans <sfDir> <outDir> [names...]")
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    Files.createDirectories(outDir)
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    // QueryStageExec wraps its subtree in `plan` (children is Nil), so a
    // children-only walk sees nothing below the first stage boundary
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: (kids ++ p.subqueries).flatMap(walk)
    }

    val summary = new StringBuilder
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.collect()
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"$n.txt"), formatted)
        val nodes = walk(finalPlan(df.queryExecution.executedPlan)).map(_.nodeName)
        def c(sub: String) = nodes.count(_.contains(sub))
        val line = f"$n%-32s exch=${c("Exchange")}%2d bcast=${c("BroadcastExchange")}%2d " +
          f"smj=${c("SortMergeJoin")}%2d bhj=${c("BroadcastHashJoin")}%2d shj=${c("ShuffledHashJoin")}%2d " +
          f"bnlj=${c("BroadcastNestedLoop")}%2d cart=${c("CartesianProduct")}%2d " +
          f"win=${c("Window")}%2d sort=${c("Sort")}%2d scan=${c("Scan")}%2d"
        summary.append(line).append('\n')
        println(s"[plans] $line")
      } catch {
        case e: Throwable =>
          println(s"[plans] $n FAILED: ${e.getMessage}")
          summary.append(s"$n FAILED\n")
      }
    }
    Files.writeString(outDir.resolve("_summary.txt"), summary.toString)
    spark.stop()
  }
}
