package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

// Per-stage breakdown of q_graph_bfs (the bench catalog max, ~6s at
// sf0.1): where does the time go — edge build, symmetrize+distinct,
// or the per-hop frontier loop? Also times candidate variants so any
// Graph rewrite is measured, not guessed.
//   sbt "Test/runMain graft.ProfileBfs [reps]"
object ProfileBfs {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.local(32)
    val sfDir = "/root/testdata/sf0.1"

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bfs] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    def fullQuery(): Unit = {
      val df = SparkEntry.queries("q_graph_bfs")(spark, sfDir)
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
        .agg(sum("__h")).head()
    }

    (1 to reps).foreach { i =>
      time(s"full q_graph_bfs rep$i")(fullQuery())
    }

    // stage breakdown (one pass)
    val li = graft.sources.Snapshot(spark, sfDir).lineitem
    val slim = li.select(col("l_orderkey").as("__g"), col("l_partkey").as("__n"))
    val half = time("edges: self-join+distinct") {
      val e = slim.join(slim.withColumnRenamed("__n", "__m"), "__g")
        .where(col("__n") < col("__m"))
        .select(col("__n").as("node_a"), col("__m").as("node_b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[bfs]   half-edges = ${e.count()}")
      e
    }
    val sym = time("sym: union+distinct") {
      val s2 = half.select(col("node_a").as("s"), col("node_b").as("d"))
        .unionAll(half.select(col("node_b").as("s"), col("node_a").as("d")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[bfs]   sym-edges = ${s2.count()}")
      s2
    }
    val symNoDistinct = time("sym: union only (no distinct)") {
      val s2 = half.select(col("node_a").as("s"), col("node_b").as("d"))
        .unionAll(half.select(col("node_b").as("s"), col("node_a").as("d")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[bfs]   sym-edges (nodup) = ${s2.count()}")
      s2
    }

    def loop(edges: DataFrame, label: String): Unit = time(s"loop: $label") {
      var frontier = li.agg(min(col("l_partkey")).as("node"))
        .withColumn("hops", lit(0)).localCheckpoint(true)
      var visited = frontier
      (1 to 3).foreach { h =>
        val next = time(s"  hop $h ($label)") {
          frontier.join(edges, frontier("node") === edges("s"))
            .select(edges("d").as("node"))
            .distinct()
            .join(visited, Seq("node"), "left_anti")
            .withColumn("hops", lit(h))
            .localCheckpoint(true)
        }
        visited = visited.unionAll(next)
        frontier = next
      }
      println(s"[bfs]   reached = ${visited.count()} ($label)")
    }

    loop(sym, "deduped sym")
    loop(symNoDistinct, "raw sym")

    // variant: per-group collect_set -> explode ordered pairs (one
    // groupBy shuffle instead of a co-partitioned self-join), then ONE
    // global distinct over both directions at once
    val symAgg = time("agg-explode sym (1 distinct)") {
      val grouped = slim.groupBy("__g").agg(collect_set(col("__n")).as("ns"))
        .where(size(col("ns")) > 1)
      val pairs = grouped.select(explode(col("ns")).as("s"), col("ns"))
        .select(col("s"), explode(col("ns")).as("d"))
        .where(col("s") =!= col("d"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[bfs]   sym-edges (agg) = ${pairs.count()}")
      pairs
    }
    loop(symAgg, "agg sym")
    half.unpersist(); sym.unpersist(); symNoDistinct.unpersist(); symAgg.unpersist()
    spark.stop()
  }
}
