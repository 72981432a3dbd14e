package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.dedup.FuzzyMatch

class NearNamesSpec extends SparkSpecBase {
  import spark.implicits._

  /** The plain quadratic join the signature scheme must equal exactly. */
  private def bruteForce(names: DataFrame, k: Int): Set[(String, String, Int)] = {
    val n = names.select(col("name")).where(col("name").isNotNull && length(col("name")) >= 1).distinct()
    val a = n.select(col("name").as("name_a"), length(col("name")).as("la"))
    val b = n.select(col("name").as("name_b"), length(col("name")).as("lb"))
    a.crossJoin(b)
      .where(col("la") < col("lb") ||
        (col("la") === col("lb") && col("name_a") < col("name_b")))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= k)
      .select("name_a", "name_b", "dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
  }

  private def run(names: Seq[String], k: Int): Set[(String, String, Int)] =
    FuzzyMatch.nearNames(names.toDF("name"), "name", k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("known distances: substitutions, indels, and the threshold cut") {
    val names = Seq("kitten", "sitten", "sitting", "mitten", "kittens", "bolt")
    val got = run(names, 2)
    // spot anchors: one substitution, one append, the 3-edit exclusion
    assert(got.contains(("kitten", "sitten", 1)))
    assert(got.contains(("kitten", "kittens", 1)))
    assert(!got.exists(p => Set(p._1, p._2) == Set("kitten", "sitting")))
    assert(!got.exists(p => p._1 == "bolt" || p._2 == "bolt"))
    // the full contract: equality with the quadratic join
    assert(got == bruteForce(names.toDF("name"), 2))
  }

  test("short-string regime (len <= k) pairs across the broadcast path") {
    val names = Seq("a", "b", "ab", "ba", "abc", "abcd", "xyz")
    for (k <- 1 to 3)
      assert(run(names, k) == bruteForce(names.toDF("name"), k), s"k=$k")
  }

  test("orientation: shorter-first, lexicographic on ties; no self/duplicate pairs") {
    val got = run(Seq("abc", "abd", "ab", "abcd"), 2)
    got.foreach { case (a, b, d) =>
      assert(a.length < b.length || (a.length == b.length && a < b), s"($a,$b)")
      assert(d >= 1 && d <= 2)
    }
    assert(got.size == got.map(p => Set(p._1, p._2)).size, "duplicate unordered pair")
  }

  test("losslessness on real part names (sf0.001): signature plan == quadratic join") {
    val part = sources.Snapshot(spark, sf()).part
    for (k <- 1 to 2) {
      val got = FuzzyMatch.nearNames(part, "p_name", k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got == bruteForce(part.select(col("p_name").as("name")), k), s"k=$k")
    }
  }

  test("adversarial lengths: every split remainder class and the la window edge") {
    // lengths k+1 .. 3k+2 exercise segLen/segStart across all rem classes,
    // plus repeated characters (many equal substrings -> bucket stress)
    val names = Seq(
      "aaa", "aaaa", "aaaab", "aaabb", "aabab", "ababa", "aaaaaa", "aaaaab",
      "abcdefg", "abcdefgh", "abcdxfgh", "zbcdefg", "abcefg", "abcdefgxy")
    for (k <- 1 to 3)
      assert(run(names, k) == bruteForce(names.toDF("name"), k), s"k=$k")
  }

  test("null and empty names are dropped; maxDist < 1 rejected") {
    val df = Seq(Some("abc"), Some("abd"), None, Some("")).toDF("name")
    val got = FuzzyMatch.nearNames(df, "name", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("abc", "abd")))
    intercept[IllegalArgumentException](FuzzyMatch.nearNames(df, "name", 0))
  }
}
