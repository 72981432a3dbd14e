package graft

import org.apache.spark.sql.functions._

import graft.operators.ann.Projection
import graft.sources.Snapshot

class ProjectionSpec extends SparkSpecBase {
  import spark.implicits._

  test("sign matrix is deterministic, balanced, and seed-sensitive") {
    val a = (0 until 64).flatMap(i => (0 until 16).map(j => Projection.sign("graft5", i, j)))
    val b = (0 until 64).flatMap(i => (0 until 16).map(j => Projection.sign("graft5", i, j)))
    assert(a == b)
    // md5 nibbles are uniform: the 1024-entry matrix must not be lopsided
    val plus = a.count(_ == 1.0)
    assert(plus > 400 && plus < 624, s"+1 count $plus of 1024")
    val other = (0 until 64).flatMap(i => (0 until 16).map(j => Projection.sign("other", i, j)))
    assert(other != a)
  }

  test("projection preserves squared norms in expectation (measured distortion band)") {
    val e = Snapshot(spark, sf()).embeddings
    val p = Projection.projectToVector(e, "embedding", 64, 16, "graft5", "proj")
    val stats = p.select(
      (GraftDot(col("proj"), col("proj")) / GraftDot(col("embedding"), col("embedding")))
        .as("ratio"))
      .agg(avg("ratio").as("mean"), expr("percentile(ratio, 0.5)").as("med"),
        min("ratio"), max("ratio"))
      .head()
    val (mean, med) = (stats.getDouble(0), stats.getDouble(1))
    // E[ratio] = 1 exactly; 16 components give a loose but real band
    assert(mean > 0.8 && mean < 1.2, s"mean distortion $mean")
    assert(med > 0.7 && med < 1.3, s"median distortion $med")
  }

  private def GraftDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.dot(a, b)

  test("power-of-two input scaling scales projections EXACTLY (IEEE structural)") {
    val e = Snapshot(spark, sf()).embeddings.limit(50)
    val doubled = e.withColumn("embedding",
      transform(col("embedding"), x => x * lit(2.0f)))
    val p1 = Projection.project(e, "embedding", 64, 4, "graft5")
      .select(col("vec_id"), col("p0"), col("p1"), col("p2"), col("p3"))
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    val p2 = Projection.project(doubled, "embedding", 64, 4, "graft5")
      .select(col("vec_id"), col("p0"), col("p1"), col("p2"), col("p3"))
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    // multiplying every operand by 2 is exact in IEEE and distributes
    // exactly through products, sums and the final division — bitwise
    p1.zip(p2).foreach { case ((id1, a0, a1, a2, a3), (id2, b0, b1, b2, b3)) =>
      assert(id1 == id2)
      assert(b0 == 2 * a0 && b1 == 2 * a1 && b2 == 2 * a2 && b3 == 2 * a3)
    }
  }

  test("identical vectors stay identical through projection: twin recall via projected ANN") {
    val e = Snapshot(spark, sf()).embeddings
    val twins = e.limit(20).withColumn("vec_id", col("vec_id") + 1000000000L)
    val corpus = e.unionByName(twins)
    val proj = Projection.projectToVector(corpus, "embedding", 64, 16, "graft5", "proj")
      .select(col("vec_id"), col("proj"))
    // projected brute-force top-1 for each planted twin must be its
    // original at sim ~ 1 (identical input => identical projection)
    val queries = proj.where(col("vec_id") >= 1000000000L)
    val got = graft.operators.ann.BruteForceKNN
      .topK(queries, proj.where(col("vec_id") < 1000000000L),
        "vec_id", "proj", "vec_id", "proj", 1, excludeSelf = false)
      .collect()
    assert(got.length == 20)
    got.foreach { r =>
      val q = r.getLong(r.fieldIndex("query_id"))
      val n = r.getLong(r.fieldIndex("neighbor_id"))
      assert(n == q - 1000000000L, s"twin of $q resolved to $n")
    }
  }
}
