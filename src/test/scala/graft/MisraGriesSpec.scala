package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.sketch.MisraGries
import graft.sources.Snapshot

/** Misra–Gries guarantees: no over-count, bounded under-count, every
  * true heavy hitter survives — under adversarial stream orders and
  * arbitrary merge trees (the properties the q_heavy_hitters_sketch
  * verdict oracle rides on).
  */
class MisraGriesSpec extends SparkSpecBase {

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (t, g) => t -> g.size.toLong }

  private def assertGuarantees(
      sketch: Map[String, Long], xs: Seq[String], k: Int): Unit = {
    val exact = exactCounts(xs)
    val bound = xs.size.toLong / (k + 1) // floor — counts are integers
    sketch.foreach { case (t, est) =>
      assert(est <= exact(t), s"over-count: $t est $est > true ${exact(t)}")
      assert(exact(t) - est <= bound, s"under-count beyond n/(k+1): $t")
    }
    exact.foreach { case (t, n) =>
      if (n > bound)
        assert(sketch.contains(t), s"true heavy hitter $t (n=$n, bound=$bound) missing")
      if (!sketch.contains(t))
        assert(n <= bound, s"evicted term $t had true count $n > $bound")
    }
  }

  private def runLocal(mg: MisraGries, xs: Seq[String]): mutable.HashMap[String, Long] =
    xs.foldLeft(mg.zero)(mg.reduce)

  test("guarantees hold under ascending, descending, and shuffled orders") {
    val rnd = new Random(42)
    // zipf-ish: term i appears ~ 2000/i times
    val stream = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
    for (k <- Seq(2, 5, 16); xs <- Seq(stream, stream.reverse, rnd.shuffle(stream))) {
      val mg = new MisraGries(k)
      assertGuarantees(mg.finish(runLocal(mg, xs)).entries, stream, k)
    }
  }

  test("merge preserves the guarantees for any partitioning and merge order") {
    val rnd = new Random(7)
    val stream = rnd.shuffle((1 to 30).flatMap(i => Seq.fill(900 / i)(s"t$i")))
    for (k <- Seq(3, 8); nParts <- Seq(2, 7)) {
      val mg = new MisraGries(k)
      val parts = stream.grouped(math.max(1, stream.size / nParts)).toSeq
        .map(p => runLocal(mg, p))
      // left fold and right fold — different merge trees, same bounds
      val leftMerged = parts.reduceLeft(mg.merge)
      assertGuarantees(mg.finish(leftMerged).entries, stream, k)
    }
  }

  test("merge eviction keeps at most k counters and never invents counts") {
    val mg = new MisraGries(3)
    val b1 = runLocal(mg, Seq("a", "a", "b", "c"))
    val b2 = runLocal(mg, Seq("d", "d", "e", "a"))
    val merged = mg.finish(mg.merge(b1, b2)).entries
    assert(merged.size <= 3)
    val exact = exactCounts(Seq("a", "a", "b", "c", "d", "d", "e", "a"))
    merged.foreach { case (t, est) => assert(est <= exact(t)) }
  }

  test("a planted majority term always survives even at k=1") {
    val rnd = new Random(3)
    val xs = rnd.shuffle(Seq.fill(120)("maj") ++ (1 to 50).map(i => s"u$i"))
    val mg = new MisraGries(1)
    val out = mg.finish(runLocal(mg, xs)).entries
    assert(out.contains("maj")) // count 120 > 170/2
  }

  test("distributed aggregation over real terms meets the bounds vs exact counts") {
    val k = 64
    val terms = Snapshot(spark, sf()).documents
      .where(col("text").isNotNull)
      .select(explode(split(lower(col("text")), " ")).as("term"))
    val sketch = terms.as(org.apache.spark.sql.Encoders.STRING)
      .select(new MisraGries(k).toColumn)
      .head().entries
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n / (k + 1)
    assert(sketch.nonEmpty && sketch.size <= k)
    sketch.foreach { case (t, est) =>
      assert(est <= exact(t) && exact(t) - est <= bound)
    }
    exact.foreach { case (t, c) => if (c > bound) assert(sketch.contains(t)) }
  }
}
