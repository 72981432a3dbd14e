package graft

import graft.sources.Snapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

// A/B profile for the q_bootstrap_ci generator shape (r13 verdict
// item 6, adjudicated r14): the COMMITTED Bootstrap.repState folds the
// eight weights of a (row, 8-rep block) into per-BLOCK partial sums
// inside the aggregate (one generator row per block, 16 sum columns,
// R/8 hash-map keys); the LEGACY shape kept here posexplodes EIGHT
// (row, rep) rows per block and aggregates by rep (8x row
// amplification through the local agg). Outputs are asserted EXACTLY
// equal (associative decimal sums regrouped, same md5 slices), then
// both shapes are timed warmed (the ProfileQueries recipe). Measured
// r14 @ sf0.1: legacy 5.8/5.9 s median vs blocked 5.1/4.9 s —
// consistent across interleaved passes, swap committed.
//
//   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ProfileBootstrap <reps>"
object ProfileBootstrap {

  private val CdfHex = Seq("5e2d", "bc5a", "eb71", "fb23")

  /** The LEGACY (pre-r14) shape: one digest per (row, block) chunked
    * into 8 hex slices via regexp+split, posexploded to (row, rep)
    * rows, partial-aggregated by rep.
    */
  def repStateLegacy(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      reps: Int,
      seed: String): DataFrame = {
    val dec = graft.functions.ExactMath.ValueDecimal
    val clean = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"),
        col(valueCol).cast(dec).as("__v"))
    def weightOf(slice: org.apache.spark.sql.Column) =
      when(slice < CdfHex(0), 0)
        .when(slice < CdfHex(1), 1)
        .when(slice < CdfHex(2), 2)
        .when(slice < CdfHex(3), 3)
        .otherwise(4)
    val hexSlices = slice(split(regexp_replace(
      md5(concat(lit(seed + ":"), col("__k"), lit(":"),
        col("__blk").cast("string"))),
      "(....)", "$1,"), ","), 1, 8)
    clean
      .select(col("__k"), col("__v"),
        explode(sequence(lit(0), lit(reps / 8 - 1))).as("__blk"))
      .select(col("__v"), col("__blk"), posexplode(hexSlices))
      .select(col("__v"), (col("__blk") * 8 + col("pos")).as("__r"),
        weightOf(col("col")).as("__w"))
      .groupBy("__r")
      .agg(
        sum((col("__v").cast(dec) * col("__w").cast(dec)).cast(dec)).as("__swv"),
        sum(col("__w").cast("long")).as("__sw"))
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 64
    val spark = GraftSession.local(32)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val orders = Snapshot(spark, sfDir).orders

    // exact-equality gate first: the regrouped decimal sums must be
    // bit-identical state rows
    val a = graft.operators.sample.Bootstrap
      .repState(orders, "o_orderkey", "o_totalprice", reps)
      .orderBy("__r").collect().map(_.toSeq).toSeq
    val b = repStateLegacy(orders, "o_orderkey", "o_totalprice", reps, "boot")
      .orderBy("__r").collect().map(_.toSeq).toSeq
    require(a == b, s"state mismatch: committed=${a.take(3)} legacy=${b.take(3)}")
    println(s"[profile] state parity OK (${a.size} rep rows)")

    def time(tag: String, mk: () => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = mk()
        df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
          .agg(sum("__h")).head()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = once()
      val ts = (1 to 5).map(_ => once()).sorted
      println(f"[profile] $tag%-22s warmup=$warm%.3f min=${ts.head}%.3f " +
        f"median=${ts(2)}%.3f max=${ts.last}%.3f")
    }
    for (_ <- 1 to 2) {
      time("repState(committed)", () => graft.operators.sample.Bootstrap
        .repState(orders, "o_orderkey", "o_totalprice", reps))
      time("repStateLegacy", () =>
        repStateLegacy(orders, "o_orderkey", "o_totalprice", reps, "boot"))
    }
    spark.stop()
  }
}
