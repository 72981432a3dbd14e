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

  test("resize plan preserves aspect ratio; frame sampling strides deterministically") {
    val d = Snapshot(spark, sf()).documents.limit(20)
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val meta = BinaryPipeline.decodeImagesStub(d, "doc_id", "payload")
    val resized = BinaryPipeline.resizePlan(meta, 256).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(math.min(r.out_width, r.out_height) >= 256)
      assert(math.min(r.out_width, r.out_height) < 256 + 256) // shorter side ~target
    }
    val frames = BinaryPipeline.sampleFramesStub(d, "doc_id", "payload", 8)
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).forall(_ % 8 == 0))
      assert(fs.map(_.frame_sha).distinct.length == fs.length) // per-frame digests differ
    }
    // determinism: same input -> same frames
    val again = BinaryPipeline.sampleFramesStub(d, "doc_id", "payload", 8).collect()
    assert(again.sortBy(f => (f.doc_id, f.frame_idx)).toSeq ==
      frames.collect().sortBy(f => (f.doc_id, f.frame_idx)).toSeq)
  }

  test("GraftExtensions injects the planner strategy") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e)
    val strategies = org.apache.spark.sql.GraftPlanBridge.plannerStrategies(e, spark)
    assert(strategies.contains(graft.plans.TopKPerKeyStrategy))
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

  test("orc round-trips through the engine with schema intact") {
    val tmp = Files.createTempDirectory("graft_orc").toFile
    tmp.deleteOnExit()
    val src = Snapshot(spark, sf()).nation
    src.write.mode("overwrite").orc(s"$tmp/orc")
    val fromOrc = spark.read.orc(s"$tmp/orc")
    assert(fromOrc.count() == src.count())
    assert(fromOrc.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)))
  }

  test("intermediary registration is explicit, named or generated, and queryable") {
    val df = SparkEntry.queries("q_intermediary")(spark, sf())
    val named = graft.api.Procurement.registerIntermediary(df, Some("intermediary_table"))
    assert(named == "intermediary_table")
    assert(spark.sql("SELECT COUNT(*) FROM intermediary_table").head().getLong(0) > 0)
    // generated names are unique per call — no clobbering between queries
    val g1 = graft.api.Procurement.registerIntermediary(df)
    val g2 = graft.api.Procurement.registerIntermediary(df.limit(1))
    assert(g1 != g2)
    assert(spark.sql(s"SELECT COUNT(*) FROM $g2").head().getLong(0) == 1)
  }
}
