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
