package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import scala.collection.mutable

/** Per-stage task-parallelism profiler (guide §1/§2.6): runs each named
  * query with Bench's hash-reduce action and prints, per stage, the task
  * count, wall clock, summed task time and the MAX single task — the
  * number that exposes a stage whose work runs on one core (single-file
  * scan fused with a heavy generator, unsplit window, etc.).
  *
  * Run: sbt 'Test/runMain graft.ProfileStages <sfDir> <query> [query...]'
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    require(args.length >= 2, "usage: ProfileStages <sfDir> <query> [query...]")
    val sfDir = args.head
    val names = args.tail.toSeq
    names.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query $n"))
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    case class St(var name: String, var tasks: Int = 0, var taskMs: Long = 0L,
      var maxTaskMs: Long = 0L, var wallMs: Long = 0L)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val st = stages.getOrElseUpdate(t.stageId, St(""))
        st.tasks += 1
        val d = t.taskInfo.duration
        st.taskMs += d
        if (d > st.maxTaskMs) st.maxTaskMs = d
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
        val info = s.stageInfo
        val st = stages.getOrElseUpdate(info.stageId, St(""))
        st.wallMs = info.completionTime.getOrElse(0L) - info.submissionTime.getOrElse(0L)
        val nm = info.name.takeWhile(_ != '\n')
        st.name = nm.take(70)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      // warm run (codegen/jit), then the measured run
      def run(): Double = {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
          .agg(sum("__h")).head()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      stages.synchronized(stages.clear())
      val wall = run()
      Thread.sleep(200) // let listener events drain
      println(f"===== $n  total=${wall}%.3f s =====")
      stages.synchronized {
        stages.toSeq.sortBy(-_._2.maxTaskMs).take(14).foreach { case (id, st) =>
          println(f"  stage $id%4d tasks=${st.tasks}%4d wall=${st.wallMs}%6d ms taskSum=${st.taskMs}%7d ms maxTask=${st.maxTaskMs}%6d ms  ${st.name}")
        }
      }
    }
    spark.stop()
  }
}
