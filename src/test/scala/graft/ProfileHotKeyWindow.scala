package graft

// Planted-hot-key stress for the per-key WINDOW operators (test scope,
// not shipped):
//   sbt "Test/runMain graft.ProfileHotKeyWindow [factor]"
// The salted-join profile (ProfileScaleUp) measured the hot-key regime
// for equi-joins; this is the same measurement for the two window-by-key
// operators whose documented bound is "one key's history sorts in one
// task": AsOfJoin.latestPriorTs and EventStreams.sessionizeBatch.
// Amplifies sf0.1 events FACTOR x, then rewrites user_id so HALF of all
// rows land on one user. Times each operator uniform vs hot, and the
// bucketed as-of rewrite on both — evidence for the SURVEY §4 row that
// says when to switch paths.
object ProfileHotKeyWindow {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val factor = args.headOption.map(_.toInt).getOrElse(64)
    val spark = GraftSession.local(32)
    val sn = graft.sources.Snapshot(spark, "/root/testdata/sf0.1")

    val tmp = java.nio.file.Files.createTempDirectory("graft_hotkey").toFile
    tmp.deleteOnExit()
    val ev0 = sn.events.select("event_id", "ts", "user_id", "event_type")
    val amplified = (0 until factor)
      .map(i => ev0
        .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L))
        // spread copies over time so amplification widens the time range
        // instead of stacking identical timestamps
        .withColumn("ts", timestamp_micros(unix_micros(col("ts")) + lit(i.toLong * 1000000L))))
      .reduce(_ unionAll _)
    amplified.write.mode("overwrite").parquet(s"$tmp/uniform")
    // hot: half of all rows funnel into user 1, rest keep their user
    amplified
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(2)) === 0, lit(1L)).otherwise(col("user_id")))
      .write.mode("overwrite").parquet(s"$tmp/hot")

    def force(df: DataFrame): Long =
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
        .agg(sum("h"), count(lit(1))).head().getLong(1)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[hotkey x$factor] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warmup: run every operator once unmeasured so janino codegen
    // compile and OS file cache don't land on whichever variant runs
    // first (they did: uniform-first measured 2.5x slower than hot)
    locally {
      val ev = spark.read.parquet(s"$tmp/uniform").where(pmod(col("event_id"), lit(16)) === 0)
      val p = ev.where(col("event_type") === "purchase")
      val g = ev.where(col("event_type") === "signup")
      force(graft.operators.asof.AsOfJoin.latestPriorTs(p, g, "user_id", "ts", "ts", "m"))
      force(graft.operators.asof.AsOfJoin
        .latestPriorTsBucketed(p, g, "user_id", "ts", "ts", "m", 64))
      force(graft.streaming.EventStreams.sessionizeBatch(ev))
    }

    for (variant <- Seq("uniform", "hot")) {
      val ev = spark.read.parquet(s"$tmp/$variant")
      val purchases = ev.where(col("event_type") === "purchase")
      val signups = ev.where(col("event_type") === "signup")
      time(s"$variant: asof plain")(
        force(graft.operators.asof.AsOfJoin
          .latestPriorTs(purchases, signups, "user_id", "ts", "ts", "m")))
      time(s"$variant: asof bucketed(64)")(
        force(graft.operators.asof.AsOfJoin
          .latestPriorTsBucketed(purchases, signups, "user_id", "ts", "ts", "m", 64)))
      time(s"$variant: sessionize")(
        force(graft.streaming.EventStreams.sessionizeBatch(ev)))
      val hotN = ev.where(col("user_id") === 1L).count()
      println(f"[hotkey x$factor] $variant hot-user share: $hotN of ${ev.count()}")
    }
    spark.stop()
  }
}
