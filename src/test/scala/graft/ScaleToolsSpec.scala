package graft

import org.apache.spark.sql.functions._

import graft.api.Procurement
import graft.operators.join.SkewTools
import graft.sources.{Bucketing, Snapshot}

class ScaleToolsSpec extends SparkSpecBase {

  test("dataset split: exhaustive, disjoint, and stable under corpus growth") {
    import org.apache.spark.sql.functions._
    import graft.operators.sample.Sampling
    val docs = graft.sources.Snapshot(spark, sf()).documents
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = docs.select(col("doc_id"),
      Sampling.assignSplit(col("doc_id"), splits).as("split"))
    // every doc gets exactly one split
    assert(assigned.where(col("split").isNull).isEmpty)
    assert(assigned.count() == docs.count())
    // stability: a doc's split is unchanged when assigned within a subset
    val subset = docs.where(col("doc_id") % 2 === 0).select(col("doc_id"),
      Sampling.assignSplit(col("doc_id"), splits).as("split2"))
    assert(assigned.join(subset, Seq("doc_id"))
      .where(col("split") =!= col("split2")).isEmpty)
    // rough proportions on the full corpus
    val n = docs.count().toDouble
    val train = assigned.where(col("split") === "train").count().toDouble
    assert(train / n > 0.6 && train / n < 0.95, s"train share ${train / n}")
  }

  test("group split: no group straddles a split boundary (leakage guard)") {
    import graft.operators.sample.Sampling
    val docs = graft.sources.Snapshot(spark, sf()).documents
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.groupSplit(docs, "source", splits)
    // THE guard: every source maps to exactly one split — a straddling
    // source is eval contamination (its near-dups would sit in two splits)
    val straddlers = assigned.groupBy("source")
      .agg(countDistinct(col("split")).as("k")).where(col("k") > 1).count()
    assert(straddlers == 0L)
    // exhaustive, and per-split distinct-group counts sum to the total
    assert(assigned.where(col("split").isNull).isEmpty)
    val perSplit = assigned.groupBy("split")
      .agg(countDistinct(col("source")).as("g")).agg(sum("g")).head().getLong(0)
    assert(perSplit == docs.select("source").distinct().count())
    // group keying is what provides the guard: the row-keyed split DOES
    // straddle sources on this corpus (the bug the operator exists for)
    val rowKeyed = docs.select(col("source"),
      Sampling.assignSplit(col("doc_id"), splits).as("split"))
    val rowStraddlers = rowKeyed.groupBy("source")
      .agg(countDistinct(col("split")).as("k")).where(col("k") > 1).count()
    assert(rowStraddlers > 0L, "control: row-keyed split should straddle sources")
  }

  test("salted join equals plain join") {
    val sn = Snapshot(spark, sf())
    val li = sn.lineitem.select("l_orderkey", "l_linenumber", "l_quantity")
    val o = sn.orders.select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, "l_orderkey")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val salted = SkewTools.saltedJoin(li, o, "l_orderkey", 8, "l_linenumber")
      .select(plain.headOption.map(_ => li.join(o, "l_orderkey").columns).getOrElse(Array[String]()).map(col): _*)
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(salted == plain)
  }

  test("bloom-prefiltered join equals plain join and sheds rows at the scan") {
    import graft.operators.join.BloomJoin
    val sn = Snapshot(spark, sf())
    val dim = sn.part.where(col("p_brand") === "Brand#11")
      .select(col("p_partkey"), col("p_name"))
    val plain = sn.lineitem.join(dim, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_partkey")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val viaBloom = BloomJoin.prefilteredJoin(
      sn.lineitem, dim, "l_partkey", "p_partkey", expectedItems = 1024)
      .select("l_orderkey", "l_linenumber", "p_partkey")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(viaBloom == plain)
    assert(plain.nonEmpty)
    // the probe itself is selective: far fewer fact rows survive than exist
    val bloom = BloomJoin.buildKeyBloom(dim, "p_partkey", 1024, 0.01)
    val kept = sn.lineitem.where(BloomJoin.mightContain(bloom, col("l_partkey"))).count()
    val total = sn.lineitem.count()
    assert(kept < total / 2, s"bloom kept $kept of $total")
    assert(kept >= plain.size.toLong) // never sheds a true match
    // and it is applied at the scan, below the join
    val q = BloomJoin.prefilteredJoin(
      sn.lineitem, dim, "l_partkey", "p_partkey", expectedItems = 1024)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(2000))
    // empty build side -> empty result, not a crash
    assert(BloomJoin.prefilteredJoin(
      sn.lineitem, dim.where(lit(false)), "l_partkey", "p_partkey", 1024).isEmpty)
    // key-type mismatch would make xxhash64 shed TRUE matches -> loud failure
    val intDim = dim.select(col("p_partkey").cast("int").as("p_partkey"), col("p_name"))
    val e = intercept[IllegalArgumentException] {
      BloomJoin.prefilteredJoin(sn.lineitem, intDim, "l_partkey", "p_partkey", 1024)
    }
    assert(e.getMessage.contains("same type"))
  }

  test("interval join: bucketed plan is row-identical to the plain non-equi join") {
    import org.apache.spark.sql.functions._
    val sn = graft.sources.Snapshot(spark, sf())
    val points = sn.lineitem.select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"))
    val iv = sn.orders.where(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_orderdate").as("start_d"),
        date_add(col("o_orderdate"), 30).as("end_d"))
    // sweep bucket widths: result identity must not depend on the width
    // (only the intermediate size does) — incl. width 1 and width >> span
    Seq(1, 7, 90).foreach { w =>
      val bucketed = graft.operators.join.IntervalJoin
        .pointInInterval(points, "l_shipdate", iv, "start_d", "end_d", bucketDays = w)
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .orderBy("o_orderkey").collect().toSeq
      val plain = points.join(iv,
          col("l_shipdate") >= col("start_d") && col("l_shipdate") < col("end_d"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .orderBy("o_orderkey").collect().toSeq
      assert(bucketed == plain, s"bucketDays=$w")
      assert(bucketed.nonEmpty)
    }
    // degenerate interval (end <= start) matches nothing, never resurrects
    // phantom rows through a descending bucket sequence
    val bad = iv.withColumn("end_d", date_sub(col("start_d"), 5))
    assert(graft.operators.join.IntervalJoin
      .pointInInterval(points, "l_shipdate", bad, "start_d", "end_d").count() == 0L)
  }

  test("overlap join: first-common-bucket emission is duplicate-free and matches the plain join") {
    import org.apache.spark.sql.functions._
    val sn = graft.sources.Snapshot(spark, sf())
    val a = sn.orders.where(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey").as("a_key"), col("o_orderdate").as("a_start"),
        date_add(col("o_orderdate"), 7).as("a_end"))
    val b = sn.orders.where(col("o_orderkey") % 13 === 7)
      .select(col("o_orderkey").as("b_key"), col("o_orderdate").as("b_start"),
        date_add(col("o_orderdate"), 10).as("b_end"))
    val plain = a.join(b, col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("a_key", "b_key").orderBy("a_key", "b_key").collect().toSeq
    // width 1 (every pair shares many buckets — the dedup condition does
    // all the work) and width 30 (most pairs share one bucket)
    Seq(1, 7, 30).foreach { w =>
      val bucketed = graft.operators.join.IntervalJoin
        .overlapJoin(a, "a_start", "a_end", b, "b_start", "b_end", bucketDays = w)
        .select("a_key", "b_key").orderBy("a_key", "b_key").collect().toSeq
      assert(bucketed == plain, s"bucketDays=$w")
    }
    assert(plain.nonEmpty && plain.size == plain.distinct.size)
  }

  test("bucketed join plans without a shuffle exchange") {
    val sn = Snapshot(spark, sf())
    // in-memory catalog is fresh each JVM but the warehouse dir persists:
    // clear both before re-creating the managed tables
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Bucketing.writeBucketed(sn.orders, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(
      sn.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 8)
    val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(joined.count() == sn.lineitem.count())
  }

  test("cosine expression runs inside whole-stage codegen (no fallback)") {
    val e = Snapshot(spark, sf()).embeddings
    val df = e.limit(50).crossJoin(e.limit(50).select(col("vec_id").as("v2"), col("embedding").as("e2")))
      .select(graft.functions.GraftFunctions.cosine(col("embedding"), col("e2")).as("sim"))
      .agg(sum("sim"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p.take(1500)) // codegen stage present
  }

  test("codegen and interpreted cosine agree bit-exactly") {
    val e = Snapshot(spark, sf()).embeddings.limit(20)
    val pairs = e.crossJoin(e.select(col("vec_id").as("v2"), col("embedding").as("e2")))
    val viaCodegen = pairs
      .select(graft.functions.GraftFunctions.cosine(col("embedding"), col("e2")).as("sim"))
      .collect().map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    // interpreted path: expression evaluated row-by-row via eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    val rows = pairs.select("embedding", "e2").collect()
    val conv = CatalystTypeConverters.createToCatalystConverter(
      pairs.select("embedding").schema.head.dataType)
    val viaEval = rows.map { r =>
      val a = Literal.create(conv(r.getSeq[Float](0)),
        pairs.schema("embedding").dataType)
      val b = Literal.create(conv(r.getSeq[Float](1)),
        pairs.schema("embedding").dataType)
      val res = graft.functions.CosineSim(a, b).eval(null)
      if (res == null) Double.NaN else res.asInstanceOf[Double]
    }
    assert(viaCodegen.length == viaEval.length)
    viaCodegen.zip(viaEval).foreach { case (c, i) =>
      assert(c == i || (c.isNaN && i.isNaN), s"codegen $c != interpreted $i")
    }
  }

  test("insights text formats the reference-style summary") {
    val sn = Snapshot(spark, sf())
    val joined = sn.orders
      .join(sn.customer, col("o_custkey") === col("c_custkey"))
      .join(sn.nation, col("c_nationkey") === col("n_nationkey"))
    val text = Procurement.insightsText(joined, "n_name", "o_totalprice")
    assert(text.contains("Data Insights:"))
    assert(text.contains("Total number of groups: 25"))
    assert(text.contains("Grand total:"))
  }
}
