package graft

import org.apache.spark.sql.functions._

// Where does q_graph_bfs's ~6.4s at sf0.1 go? Separates edge-build
// cost (co-occurrence self-join) from the per-hop frontier loop.
//   sbt "Test/runMain graft.ProfileBfs [reps]"
object ProfileBfs {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(32)
    val sfDir = "/root/testdata/sf0.1"
    val li = graft.sources.Snapshot(spark, sfDir).lineitem

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bfs] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to reps).foreach { i =>
      time(s"full q_graph_bfs rep$i") {
        SparkEntry.queries("q_graph_bfs")(spark, sfDir).count()
      }
    }
    val edges = time("edges build+count") {
      val e = graft.operators.graph.Graph
        .coOccurrenceEdges(li, "l_orderkey", "l_partkey")
        .localCheckpoint(true)
      println(s"[bfs]   edge rows: ${e.count()}")
      e
    }
    val src = li.agg(min(col("l_partkey")).as("node"))
    (1 to reps).foreach { i =>
      time(s"bfs over prebuilt edges rep$i") {
        graft.operators.graph.Graph
          .bfsHops(edges, "node_a", "node_b", src, 3, dedupEdges = false)
          .count()
      }
    }
    spark.stop()
  }
}
