package graft

import graft.operators.stats.{RankedSpine, Stats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

// A/B profile for the q_spearman shared-input pin (VERDICT r14 #2):
// the COMMITTED Stats.spearmanByGroup localCheckpoints the SLIM
// (group, x, y) projection once — the two rankSpine aggregates and the
// two re-attach equi-joins all read the pinned projection instead of
// re-deriving the cleaned input ~4x from the source (the q_rfm lesson,
// CLAUDE.md r8). The LEGACY shape kept here is the pre-r15 form without
// the pin. Outputs are asserted EXACTLY equal (the pin is plan-only;
// identical integers flow through identical folds), then both shapes
// are timed warmed (the ProfileQueries recipe).
//
//   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ProfileSpearmanShave <reps>"
object ProfileSpearmanShave {

  /** The LEGACY (pre-r15) shape: no localCheckpoint — every consumer
    * re-derives the cleaned projection from the source plan.
    */
  def spearmanLegacy(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    val g = groupCols.map(col)
    val clean = df.where(
      (g.map(_.isNotNull) ++ Seq(col(xCol).isNotNull, col(yCol).isNotNull))
        .reduce(_ && _))
    def rankSpine(c: String, out: String): DataFrame =
      RankedSpine
        .exclusivePrefix(
          clean.groupBy((g :+ col(c)): _*).agg(count(lit(1)).as("__cnt")),
          groupCols, c, Seq("__cnt" -> "__bef"))
        .select((g :+ col(c)) :+
          (lit(2L) * col("__bef") + col("__cnt") + lit(1L)).as(out): _*)
    val ranked = clean
      .join(rankSpine(xCol, "__rx"), groupCols :+ xCol)
      .join(rankSpine(yCol, "__ry"), groupCols :+ yCol)
    Stats.regression(ranked, "__rx", "__ry", groupCols)
      .select(g ++ Seq(col("n_pairs"), col("corr").as("rho")): _*)
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val spark = GraftSession.local(32)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val orders = graft.sources.Snapshot(spark, sfDir).orders
    val gc = Seq("o_custkey")

    def pinned() = Stats.spearmanByGroup(orders, gc, "o_orderdate", "o_totalprice")
    def legacy() = spearmanLegacy(orders, gc, "o_orderdate", "o_totalprice")

    // parity gate first: the pin must be plan-only
    val a = pinned().orderBy("o_custkey").collect()
    val b = legacy().orderBy("o_custkey").collect()
    require(a.length == b.length, s"row counts differ: ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (x, y) => require(x == y, s"row mismatch: $x vs $y") }
    println(s"[profile] parity OK over ${a.length} rows")

    def time(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      val df = fn()
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
        .agg(sum("__h")).head()
      (System.nanoTime() - t0) / 1e9
    }
    def stats(ts: Seq[Double]): String = {
      val s = ts.sorted
      val med = if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      f"min=${s.head}%.3f median=$med%.3f max=${s.last}%.3f reps=${ts.map(t => f"$t%.3f").mkString(", ")}"
    }
    time(pinned _); time(legacy _) // warm
    val (ps, ls) = (collection.mutable.ArrayBuffer[Double](), collection.mutable.ArrayBuffer[Double]())
    for (_ <- 1 to reps) { ps += time(pinned _); ls += time(legacy _) }
    println(s"[profile] pinned  ${stats(ps.toSeq)}")
    println(s"[profile] legacy  ${stats(ls.toSeq)}")
    spark.stop()
  }
}
