package graft

import graft.sources.{DataShape, Snapshot}

/** Tripwire: fails loudly (naming the offending column) when the driver
  * regenerates testdata with a new physical encoding — the round-5
  * failure mode where events.ts silently became TIMESTAMP_NTZ. */
class DataShapeSpec extends SparkSpecBase {

  test("every snapshot table surfaces the catalog's expected logical types") {
    for (dir <- Seq("sf0.001", "sf0.01")) {
      val v = DataShape.violations(spark, sf(dir))
      assert(v.isEmpty, s"shape drift at $dir: ${v.mkString("; ")}")
    }
  }

  test("events.ts is a session-TZ timestamp after Snapshot normalization") {
    val ty = Snapshot(spark, sf()).events.schema("ts").dataType
    assert(ty == org.apache.spark.sql.types.TimestampType,
      s"events.ts surfaced as ${ty.simpleString}, expected timestamp — " +
        "Snapshot normalization missing a parquet encoding case")
  }

  test("raw footer types match the encodings the normalization was validated against") {
    for (dir <- Seq("sf0.001", "sf0.01")) {
      val v = DataShape.rawViolations(spark, sf(dir))
      assert(v.isEmpty, s"raw encoding drift at $dir: ${v.mkString("; ")}")
      // the spec pins the branch that FIRED, not just "no violation":
      // events.ts raw must be the NTZ encoding the round-5+ branch eats
      val rawTs = DataShape.rawEncodings(spark, sf(dir))("events")
        .collectFirst { case ("ts", ty) => ty }
      assert(rawTs.contains("timestamp_ntz"),
        s"$dir: events.ts raw footer surfaced as $rawTs — a different " +
          "normalization branch fired than the one the catalog was validated on")
    }
  }

  test("a THIRD events.ts encoding is named by rawViolations even when normalization absorbs it") {
    // plant an adjusted-UTC micros encoding: raw surfaces as plain
    // `timestamp`, which the normalized check ABSORBS (expected
    // normalized type is `timestamp` too) — only the raw tripwire can
    // name it
    val tmp = java.nio.file.Files.createTempDirectory("raw_drift").toFile
    tmp.deleteOnExit()
    val e = Snapshot(spark, sf()).events.limit(5)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      e.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        .write.mode("overwrite").parquet(s"${tmp.getAbsolutePath}/events.parquet")
    } finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    Snapshot.tableNames.filterNot(_ == "events").foreach { t =>
      Snapshot(spark, sf()).table(t).limit(1)
        .write.mode("overwrite").parquet(s"${tmp.getAbsolutePath}/$t.parquet")
    }
    val normalized = DataShape.violations(spark, tmp.getAbsolutePath)
    assert(!normalized.exists(_.contains("events.ts")),
      s"premise broken: the normalized check was supposed to absorb this encoding: $normalized")
    val raw = DataShape.rawViolations(spark, tmp.getAbsolutePath)
    assert(raw.exists(v => v.contains("events.ts RAW footer type timestamp") &&
      v.contains("timestamp_ntz")), s"raw drift not named: $raw")
  }

  test("violations names the offending column on a drifted shape") {
    // Simulate drift: a snapshot-shaped table with a wrong-typed column.
    val tmp = java.nio.file.Files.createTempDirectory("shape_drift").toFile
    tmp.deleteOnExit()
    import spark.implicits._
    Snapshot(spark, sf()).region
      .withColumn("r_regionkey", org.apache.spark.sql.functions.col("r_regionkey").cast("string"))
      .write.mode("overwrite").parquet(s"${tmp.getAbsolutePath}/region.parquet")
    Snapshot.tableNames.filterNot(_ == "region").foreach { t =>
      Snapshot(spark, sf()).table(t).limit(1)
        .write.mode("overwrite").parquet(s"${tmp.getAbsolutePath}/$t.parquet")
    }
    val v = DataShape.violations(spark, tmp.getAbsolutePath)
    assert(v.exists(_.contains("region.r_regionkey surfaced as string, expected int")),
      s"drift not named: $v")
  }
}
