package graft

import org.apache.spark.sql.functions._
import graft.operators.text.Novelty

/** C66 q_novelty and C67 q_embedding_outliers. */
class NoveltySpec extends SparkSpecBase {
  import spark.implicits._

  test("novelty: copies score 0, fresh docs 1, collages the overlap fraction") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"   // 8 words, 4 shingles
    val fresh = "one two three four five six seven eight"        // disjoint, 4 shingles
    val df = Seq(
      (1L, base),
      (2L, base),                                   // exact copy: all shingles seen
      (3L, fresh),
      // collage: first 5 words of base (1 old shingle) + 5 fresh words
      // => shingles at positions 1..6; position 1 is base's first
      (4L, "alpha beta gamma delta epsilon nine ten eleven twelve thirteen"))
      .toDF("doc_id", "text")
    val got = Novelty.firstOccurrenceNovelty(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) == ((1L, 4L, 4L, 1.0)), s"first doc fully novel: ${got(0)}")
    assert(got(1) == ((2L, 4L, 0L, 0.0)), s"exact copy fully stale: ${got(1)}")
    assert(got(2) == ((3L, 4L, 4L, 1.0)))
    assert(got(3) == ((4L, 6L, 5L, 5.0 / 6.0)), s"collage: ${got(3)}")
  }

  test("novelty: short docs shingle as whole text; repeated shingles count once") {
    val df = Seq(
      (1L, "tiny doc"),
      (2L, "tiny doc"),
      (3L, "rep rep rep rep rep rep rep rep rep"))  // all 5 shingles identical
      .toDF("doc_id", "text")
    val got = Novelty.firstOccurrenceNovelty(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 1L), (2L, 1L, 0L), (3L, 1L, 1L)))
  }

  test("sf0.001 catalog q_novelty: min doc fully novel, totals re-add to the distinct shingle count") {
    val rows = SparkEntry.queries("q_novelty")(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.minBy(_.getLong(0)).getDouble(3) == 1.0, "the first doc is all-novel")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // every distinct shingle is novel for exactly one doc
    val docs = sources.Snapshot(spark, sf()).documents.where($"text".isNotNull)
    val ws = split(lower($"text"), " ")
    val distinctShingles = docs.select(explode(array_distinct(
      when(size(ws) >= 5,
        transform(sequence(lit(1), size(ws) - 4), i => array_join(slice(ws, i, lit(5)), " ")))
        .otherwise(array(array_join(ws, " "))))).as("s"))
      .select("s").distinct().count()
    assert(rows.map(_.getLong(2)).sum == distinctShingles)
  }

  test("sf0.001 catalog q_embedding_outliers: 25 ascending rows matching the brute-force bottom set") {
    val rows = SparkEntry.queries("q_embedding_outliers")(spark, sf()).collect()
    assert(rows.length == 25)
    val cs = rows.map(_.getDouble(2))
    assert(cs.zip(cs.tail).forall { case (a, b) => a <= b }, "ascending by cosine")
    assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
    // independent bottom-25: score every vector in local scala
    val emb = sources.Snapshot(spark, sf()).embeddings
      .where($"embedding".isNotNull && size($"embedding") === 64)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    // the operator's exact numeric path: double -> DECIMAL(28,12)
    // (HALF_UP, canonical-string repr like Spark's Decimal), exact
    // decimal sum, correctly-rounded toDouble, IEEE division, then the
    // hashRound floor formula at 4 (r12)
    val dims = Array.tabulate(64) { d =>
      val s = emb.map(e => BigDecimal(e._2(d).toDouble)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      val mean = s.toDouble / emb.length.toDouble
      math.floor(mean * 10000.0 + 0.5) / 10000.0
    }
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
    val scored = emb.map { case (id, v) =>
      val vd = v.map(_.toDouble)
      val c = dot(vd, dims) / (math.sqrt(dot(vd, vd)) * math.sqrt(dot(dims, dims)))
      (id, math.floor(c * 10000.0 + 0.5) / 10000.0)
    }
    val expect = scored.sortBy { case (id, c) => (c, id) }.take(25).toSeq
    assert(rows.map(r => (r.getLong(0), r.getDouble(2))).toSeq == expect)
  }

  test("hashed novelty twin: full-output parity with the string-keyed form at sf0.001") {
    // identical semantics modulo 64-bit shingle collisions — absent on
    // this corpus, so the outputs must be row-identical (the r11 item-5
    // slim-path gate); collisions could only MERGE shingles, never split
    val docs = sources.Snapshot(spark, sf()).documents
    val a = Novelty.firstOccurrenceNovelty(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Novelty.firstOccurrenceNoveltyHashed(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b, s"string vs hashed novelty diverged: ${a.diff(b).take(3)}")
  }

  test("hashed novelty twin: no string-typed attribute crosses any exchange") {
    // the point of the slim path — the spine agg's shuffle carries
    // (long, long), never the ~30-byte shingle strings. collect() first
    // so AQE finalizes the plan (the PlanSpec convention)
    val docs = sources.Snapshot(spark, sf()).documents
    val q = Novelty.firstOccurrenceNoveltyHashed(docs, "doc_id", "text")
    q.collect()
    def sparkPlanOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      Seq(p) ++ p.children.flatMap(sparkPlanOf) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          sparkPlanOf(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          sparkPlanOf(s.plan)
        case _ => Seq.empty
      })
    val plan = q.queryExecution.executedPlan
    val exchanges = sparkPlanOf(plan).filter(_.nodeName.contains("Exchange"))
    assert(exchanges.nonEmpty, "expected at least one exchange in the plan")
    exchanges.foreach { ex =>
      val stringy = ex.output.filter(_.dataType ==
        org.apache.spark.sql.types.StringType)
      assert(stringy.isEmpty,
        s"string attributes ${stringy.map(_.name)} cross an exchange in the " +
          "hashed novelty plan — the slim path must shuffle 64-bit keys only")
    }
  }
}
