package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.multimodal.BinaryPipeline
import graft.sources.Snapshot

class MultimodalAndSourcesSpec extends SparkSpecBase {
  import spark.implicits._

  test("stub decoder agrees with the SQL manifest on every field") {
    val d = Snapshot(spark, sf()).documents.limit(100)
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val viaSql = BinaryPipeline.manifest(d, "doc_id", "payload")
      .orderBy("doc_id").collect().toSeq
    val viaMap = BinaryPipeline.decodeImagesStub(d, "doc_id", "payload")
      .toDF().select("doc_id", "n_bytes", "sha256", "width", "height")
      .orderBy("doc_id").collect().toSeq
    assert(viaSql == viaMap)
  }

  test("csv and json round-trip through the engine") {
    val tmp = Files.createTempDirectory("graft_io").toFile
    tmp.deleteOnExit()
    val src = Snapshot(spark, sf()).nation
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    src.write.mode("overwrite").json(s"$tmp/json")
    val fromCsv = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$tmp/csv")
    val fromJson = spark.read.json(s"$tmp/json")
    assert(fromCsv.count() == src.count())
    assert(fromJson.count() == src.count())
    assert(fromJson.select("n_name").as[String].collect().toSet ==
      src.select("n_name").as[String].collect().toSet)
  }

  test("intermediary view is queryable via spark.sql") {
    SparkEntry.queries("q_intermediary")(spark, sf()).count()
    assert(spark.sql("SELECT COUNT(*) FROM intermediary_table").head().getLong(0) > 0)
  }
}
