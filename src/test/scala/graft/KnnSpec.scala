package graft

import org.apache.spark.sql.functions._

import graft.operators.ann.{BruteForceKNN, LshKNN}
import graft.sources.Snapshot

class KnnSpec extends SparkSpecBase {
  import spark.implicits._

  test("bruteforce topK is exhaustive, ranked, and self-excluding") {
    val e = Snapshot(spark, sf()).embeddings
    val res = BruteForceKNN.topK(
      e.where($"vec_id" < 3), e, "vec_id", "embedding", "vec_id", "embedding", 5)
    val rows = res.collect()
    assert(rows.length == 15) // 3 queries x 5
    assert(!rows.exists(r => r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
    // ranks 1..5 per query, sims non-increasing
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val sims = sorted.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh recall@5 vs bruteforce is usable") {
    val e = Snapshot(spark, sf()).embeddings
    val q = e.where($"vec_id" < 20)
    val exact = BruteForceKNN.topK(q, e, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = LshKNN.topK(q, e, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"lsh recall@5 = $recall")
    assert(recall >= 0.3, s"recall $recall too low for 37-probe 8-plane LSH")
  }

  test("ivf recall@5 vs bruteforce is usable and beats cell fraction") {
    val e = Snapshot(spark, sf()).embeddings
    val q = e.where($"vec_id" < 20)
    val exact = BruteForceKNN.topK(q, e, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = graft.operators.ann.IvfKNN.topK(
      q, e, "vec_id", "embedding", "vec_id", "embedding", 5, nLists = 16, nProbe = 4, iters = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"ivf recall@5 = $recall")
    // IVF is the default ANN path — held to the >=0.5 floor (LSH is the
    // explicitly cheap/low-recall option with the 0.3 floor above)
    assert(recall >= 0.5, s"recall $recall too low for 4/16-probe IVF (default ANN path)")
  }

  test("filtered IVF search: only allowed ids, exact at full probe, usable recall over-probed") {
    import graft.operators.ann.IvfKNN
    val e = Snapshot(spark, sf()).embeddings
    val q = e.where($"vec_id" < 20)
    val allowed = e.where($"label".isin(2, 5)).select($"vec_id")
    val allowedSet = allowed.as[Long].collect().toSet
    val exact = BruteForceKNN.topK(q, e.where($"label".isin(2, 5)),
      "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("query_id", "rnk", "neighbor_id", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val idx = IvfKNN.buildIndex(e, "vec_id", "embedding", nLists = 8, iters = 2)

    // every returned neighbor passes the filter, at ANY probe depth
    val shallow = IvfKNN.searchFiltered(idx, q, "vec_id", "embedding",
      allowed, "vec_id", 5, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(shallow.forall(p => allowedSet(p._2)),
      "a filtered search returned a neighbor outside the allowed set")

    // nProbe = nLists degenerates to EXACT filtered search: candidates =
    // corpus ∩ allowed, in-cell scoring is exact => identical rows to the
    // filtered brute force (the q_ann_filtered oracle semantics)
    val full = IvfKNN.searchFiltered(idx, q, "vec_id", "embedding",
      allowed, "vec_id", 5, nProbe = 8)
      .select("query_id", "rnk", "neighbor_id", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(full == exact, "full-probe filtered IVF must equal filtered brute force")

    // selective filter + moderate over-probe keeps usable recall (the
    // documented contract: selectivity shrinks per-cell candidates, so
    // probe deeper than the unfiltered default)
    val overProbed = IvfKNN.searchFiltered(idx, q, "vec_id", "embedding",
      allowed, "vec_id", 5, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map(r => (r._1, r._3))
    val recall = (exactPairs & overProbed).size.toDouble / exactPairs.size
    info(s"filtered ivf recall@5 at nProbe=4/8 = $recall")
    assert(recall >= 0.5, s"filtered recall $recall below the IVF floor")
  }

  test("zero-norm and all vectors are retained in the IVF index") {
    val vecs = Seq(
      (1L, Array.fill(4)(0.0f)),
      (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0.9f, 0.1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val idx = graft.operators.ann.IvfKNN.buildIndex(vecs, "vec_id", "embedding", nLists = 2, iters = 1)
    // the zero-norm row is routed to cell 0, not silently dropped
    assert(idx.assigned.count() == 4)
    val zeroCell = idx.assigned.where($"neighbor_id" === 1L).select("cell_id").as[Long].head()
    assert(zeroCell == 0L)
  }

  test("ivf prebuilt index gives identical results to throwaway topK") {
    val e = Snapshot(spark, sf()).embeddings
    val q = e.where($"vec_id" < 10)
    val direct = graft.operators.ann.IvfKNN.topK(
      q, e, "vec_id", "embedding", "vec_id", "embedding", 5, nLists = 8, iters = 2)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    val index = graft.operators.ann.IvfKNN.buildIndex(e, "vec_id", "embedding", nLists = 8, iters = 2)
    val viaIndex = graft.operators.ann.IvfKNN.search(index, q, "vec_id", "embedding", 5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(direct == viaIndex)
  }

  test("saved ivf index loads with identical results and prunes by cell at the scan") {
    import graft.operators.ann.IvfKNN
    val e = Snapshot(spark, sf()).embeddings
    val q = e.where($"vec_id" < 5)
    val idx = IvfKNN.buildIndex(e, "vec_id", "embedding", nLists = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toFile
    dir.deleteOnExit()
    IvfKNN.save(idx, dir.getAbsolutePath)
    val loaded = IvfKNN.load(spark, dir.getAbsolutePath)
    assert(loaded.centroids == idx.centroids)
    val a = IvfKNN.search(idx, q, "vec_id", "embedding", 5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    val b = IvfKNN.search(loaded, q, "vec_id", "embedding", 5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(a == b)
    // the durable artifact is partitioned by cell: a cell predicate reaches
    // the scan as a partition filter (queries read nProbe/nLists of data)
    val probe = loaded.assigned.where(col("cell_id") === 0L)
    probe.collect()
    val p = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell_id".r.findFirstIn(p).nonEmpty, p.take(2000))
  }

  test("appendToSaved grows the durable index without retraining or rewrites") {
    import graft.operators.ann.IvfKNN
    val e = Snapshot(spark, sf()).embeddings
    val half1 = e.where($"vec_id" % 2 === 0)
    val half2 = e.where($"vec_id" % 2 === 1)
    val idx = IvfKNN.buildIndex(half1, "vec_id", "embedding", nLists = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toFile
    dir.deleteOnExit()
    IvfKNN.save(idx, dir.getAbsolutePath)
    IvfKNN.appendToSaved(spark, dir.getAbsolutePath, half2, "vec_id", "embedding")
    val grown = IvfKNN.load(spark, dir.getAbsolutePath)
    assert(grown.centroids == idx.centroids) // quantizer frozen
    assert(grown.assigned.count() == e.count())
    // search over the grown index == search over a one-shot full assign
    // with the same centroids (append must not change any assignment)
    val q = e.where($"vec_id" < 5)
    val full = IvfKNN.Index(idx.centroids,
      IvfKNN.assign(
        e.select($"vec_id".as("neighbor_id"), $"embedding".as("__cv")), "__cv", idx.centroids)
        .where(col("cell_id").isNotNull))
    val a = IvfKNN.search(grown, q, "vec_id", "embedding", 5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    val b = IvfKNN.search(full, q, "vec_id", "embedding", 5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(a == b)
    // a mis-dimensioned batch must fail fast, never corrupt the index
    val badBatch = half2.withColumn("embedding",
      org.apache.spark.sql.functions.slice($"embedding", 1, 8))
    val err = intercept[IllegalArgumentException](
      IvfKNN.appendToSaved(spark, dir.getAbsolutePath, badBatch, "vec_id", "embedding"))
    assert(err.getMessage.contains("dimension"), err.getMessage)
  }

  test("quantizer trains on a bounded deterministic hash-sample for large corpora") {
    import graft.operators.ann.IvfKNN
    val e = Snapshot(spark, sf()).embeddings
    val c1 = IvfKNN.trainCentroids(e, "embedding", 4, iters = 1, maxTrainRows = 50L)
    val c2 = IvfKNN.trainCentroids(e, "embedding", 4, iters = 1, maxTrainRows = 50L)
    assert(c1.length == 4 && c1.forall(_.length == 64))
    assert(c1 == c2) // hash-sample, not rand(): reproducible across runs
  }

  test("ivf training produces <= nLists centroids of the right dimension") {
    val e = Snapshot(spark, sf()).embeddings
    val c = graft.operators.ann.IvfKNN.train(e, "embedding", 8, iters = 2).collect()
    assert(c.length <= 8 && c.nonEmpty)
    assert(c.forall(_.getAs[Seq[Double]]("centroid").length == 64))
  }

  test("cross-table KNN with excludeSelf=false keeps coinciding ids") {
    val q = Seq((7L, Array(1.0f, 0.0f))).toDF("kw_id", "vec")
    val c = Seq((7L, Array(1.0f, 0.01f)), (8L, Array(0.0f, 1.0f))).toDF("doc_id", "vec")
    val got = BruteForceKNN.topK(q, c, "kw_id", "vec", "doc_id", "vec", 1, excludeSelf = false)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(7L)) // doc 7 IS the nearest — unrelated id space
  }

  test("shingle sizes other than 3/5 work through the expression bridge") {
    val df = Seq((1L, "a b c d e f")).toDF("id", "text")
    val n4 = df.select(org.apache.spark.sql.functions.size(
      graft.functions.GraftFunctions.shingleHashes(
        org.apache.spark.sql.functions.split($"text", " "), 4)).as("n"))
      .as[Int].head()
    assert(n4 == 3) // 6 words -> 3 windows of 4
  }

  test("lsh probes include own bucket so close vectors are found") {
    val vecs = Seq(
      (1L, Array.fill(64)(0.5f)),
      (2L, Array.fill(64)(0.51f))
    ).toDF("vec_id", "embedding")
    val res = LshKNN.topK(vecs.where($"vec_id" === 1L), vecs,
      "vec_id", "embedding", "vec_id", "embedding", 1)
    assert(res.select("neighbor_id").as[Long].collect().toSeq == Seq(2L))
  }
}
