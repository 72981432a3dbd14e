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

  // real images for the REAL decode path: tiny solid/gradient PNGs+JPEGs
  // generated with the same pure-JDK imageio the operator uses
  private def makeImage(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  test("real image decode: dimensions, format, and luma from actual pixels") {
    val rows = Seq(
      (1L, makeImage(40, 30, 0xFFFFFF, "png")),  // white png
      (2L, makeImage(16, 64, 0x000000, "jpg")),  // black jpeg
      (3L, makeImage(20, 20, 0x808080, "png")),  // mid gray
      (4L, "not an image at all".getBytes("UTF-8")), // corrupt row
      (5L, null: Array[Byte]) // NULL payload: degrade, don't NPE the task
    ).toDF("doc_id", "payload")
    val meta = BinaryPipeline.decodeImages(rows, "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).width == 40L && meta(1L).height == 30L)
    assert(meta(1L).format == "png" && meta(1L).mean_luma > 0.99)
    assert(meta(2L).width == 16L && meta(2L).height == 64L)
    assert(meta(2L).format.startsWith("jp") && meta(2L).mean_luma < 0.05)
    assert(math.abs(meta(3L).mean_luma - 0x80 / 255.0) < 0.02)
    // corrupt bytes degrade gracefully instead of failing the task
    assert(meta(4L).format == "unknown" && meta(4L).width == -1L)
    assert(meta(4L).n_bytes == "not an image at all".getBytes("UTF-8").length)
    assert(meta(5L).format == "unknown" && meta(5L).n_bytes == 0L)
  }

  test("real image resize: shorter side hits the target, output decodes back") {
    val rows = Seq(
      (1L, makeImage(100, 40, 0x336699, "png")),
      (2L, makeImage(30, 90, 0x996633, "png")),
      (3L, "corrupt".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = BinaryPipeline.resizeImages(rows, "doc_id", "payload", 20)
    val got = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(3L)) // undecodable rows dropped, not failed
    assert(got(1L).getLong(2) == 50L && got(1L).getLong(3) == 20L) // 100x40 -> 50x20
    assert(got(2L).getLong(2) == 20L && got(2L).getLong(3) == 60L) // 30x90 -> 20x60
    // the emitted PNG bytes are themselves decodable at the new dims
    val redecoded = BinaryPipeline.decodeImages(
      out.select(col("doc_id"), col("png_bytes")), "doc_id", "png_bytes")
      .collect().map(m => m.doc_id -> m).toMap
    assert(redecoded(1L).width == 50L && redecoded(1L).height == 20L)
    assert(redecoded(1L).format == "png")
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
