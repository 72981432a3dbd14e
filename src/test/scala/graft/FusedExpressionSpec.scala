package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.dedup.MinHashDedup
import graft.sources.Snapshot

class FusedExpressionSpec extends SparkSpecBase {
  import spark.implicits._

  test("fused MinHashBands equals the three-stage pipeline") {
    val docs = Snapshot(spark, sf()).documents.limit(100)
    val words = split(lower(col("text")), " ")
    val fused = docs.select(col("doc_id"), GraftFunctions.minhashBands(words).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    val staged = docs.select(col("doc_id"),
      GraftFunctions.bandBuckets(
        GraftFunctions.minhashSig(GraftFunctions.shingleHashes(words, 3))).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused == staged)
  }

  test("simhash codegen equals interpreted eval") {
    val docs = Snapshot(spark, sf()).documents.limit(100)
    val words = split(lower(col("text")), " ")
    // codegen path (whole-stage)
    val viaCodegen = docs.select(col("doc_id"), GraftFunctions.simhash(words).as("s"))
      .as[(Long, Long)].collect().toMap
    // interpreted path: eval() on the expression directly
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val viaEval = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().map {
      case (id, text) =>
        val arr = new GenericArrayData(
          text.toLowerCase.split(" ", -1).map(w => UTF8String.fromString(w)).toArray[Any])
        id -> graft.functions.SimHash64(Literal.create(arr, ArrayType(StringType)))
          .eval(null).asInstanceOf[Long]
    }.toMap
    assert(viaCodegen == viaEval)
  }

  test("hash-expression codegen equals interpreted eval (bands/sig/shingles/buckets/fingerprint)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{BandBuckets, MinHashBands, MinHashSig, RollingFingerprint, ShingleHashes}

    val docs = Snapshot(spark, sf()).documents.limit(100)
    val words = split(lower(col("text")), " ")
    // codegen path (whole-stage projection)
    val viaCodegen = docs.select(col("doc_id"),
        GraftFunctions.minhashBands(words).as("mb"),
        GraftFunctions.shingleHashes(words, 3).as("sh"),
        GraftFunctions.bandBuckets(GraftFunctions.minhashSig(
          GraftFunctions.shingleHashes(words, 3))).as("bb"),
        GraftFunctions.fingerprint(words).as("fp"))
      .as[(Long, Seq[Long], Seq[Long], Seq[Long], Long)].collect().toSeq.sortBy(_._1)
    // interpreted path: eval() on the expressions directly
    val viaEval = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().map {
      case (id, text) =>
        val arr = new GenericArrayData(
          text.toLowerCase.split(" ", -1).map(w => UTF8String.fromString(w)).toArray[Any])
        val lit = Literal.create(arr, ArrayType(StringType))
        def longs(a: Any): Seq[Long] = a.asInstanceOf[ArrayData].toLongArray().toSeq
        val mb = longs(MinHashBands(lit, MinHashDedup.coeffs,
          MinHashDedup.Bands, MinHashDedup.RowsPerBand, MinHashDedup.DefaultShingle).eval(null))
        val shE = ShingleHashes(lit, 3)
        val sh = longs(shE.eval(null))
        val sig = MinHashSig(shE, MinHashDedup.coeffs)
        val bb = longs(BandBuckets(sig, MinHashDedup.Bands, MinHashDedup.RowsPerBand).eval(null))
        val fp = RollingFingerprint(lit).eval(null).asInstanceOf[Long]
        (id, mb, sh, bb, fp)
    }.toSeq.sortBy(_._1)
    assert(viaCodegen == viaEval)
  }

  test("centroid expressions codegen equals interpreted eval") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.functions.{NearestCells, NearestCentroid}
    import graft.operators.ann.IvfKNN

    val e = Snapshot(spark, sf()).embeddings.limit(50)
    val cents = IvfKNN.trainCentroids(e, "embedding", 4, iters = 1)
    val viaCodegen = e.select(col("vec_id"),
        GraftFunctions.nearestCentroid(col("embedding"), cents).as("c"),
        GraftFunctions.nearestCells(col("embedding"), cents, 3).as("cs"))
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val viaEval = e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect().map {
      case (id, v) =>
        val arr = new GenericArrayData(v.map(Float.box).toArray[Any])
        val lit = Literal.create(arr, ArrayType(FloatType))
        val c = NearestCentroid(lit, cents).eval(null).asInstanceOf[Long]
        val cs = NearestCells(lit, cents, 3).eval(null)
          .asInstanceOf[ArrayData].toLongArray().toSeq
        (id, c, cs)
    }.sortBy(_._1).toSeq
    assert(viaCodegen == viaEval)
  }

  test("dedupe results unchanged by fusion (known dup corpus)") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "completely different content about spark partitions and shuffle behavior")
    ).toDF("doc_id", "text")
    val survivors = MinHashDedup.dedupe(corpus, "doc_id", "text", 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 3L))
  }
}
