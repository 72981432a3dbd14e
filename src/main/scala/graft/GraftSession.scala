package graft

import org.apache.spark.sql.SparkSession

/** Session factory / tuner for the graft engine.
  *
  * Defaults chosen for correctness-parity with the DuckDB oracle and for
  * scale: AQE on (runtime skew-join + partition coalescing), ANSI off
  * (legacy arithmetic: wrapping longs for hash math, lenient casts), UTC
  * session time zone, shuffle partitions sized to the local core count
  * rather than Spark's default 200.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32): SparkSession = {
    val s = tune(builder(s"local[$cores]").getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Idempotently applies graft runtime settings + function registrations to
    * an externally-created session (the driver's Verify/Bench sessions).
    * Only runtime-settable confs are touched.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // testdata events.parquet uses TIMESTAMP(NANOS); read as long + convert
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
