package graft

import org.apache.spark.sql.functions._

import graft.operators.text.NameMatch

/** Gates for the Jaro–Winkler matcher (C75). The similarity table below
  * is the EMPIRICAL DuckDB 1.0 `jaro_similarity`/`jaro_winkler_similarity`
  * output (probed while pinning the semantics — byte-level matching,
  * integer half-transpositions, window max(⌊max/2⌋−1, 0), boost only at
  * jaro > 0.7, prefix cap 4); the implementation must reproduce every
  * row to within ulps, or the oracle's builtin re-derivation drifts.
  */
class NameMatchSpec extends SparkSpecBase {
  import spark.implicits._

  private val probes: Seq[(String, String, Double, Double)] = Seq(
    ("MARTHA", "MARHTA", 0.9444444444444445, 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.7666666666666666, 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964, 0.8962962962962964),
    ("DWAYNE", "DUANE", 0.8222222222222223, 0.8400000000000001),
    ("", "", 0.0, 0.0),
    ("", "a", 0.0, 0.0),
    ("a", "a", 1.0, 1.0),
    ("ab", "ba", 0.0, 0.0),
    ("abcd", "abcd", 1.0, 1.0),
    ("aaa", "aaaa", 0.9166666666666666, 0.9416666666666667),
    ("abcdef", "fedcba", 0.38888888888888884, 0.38888888888888884),
    ("CRATE", "TRACE", 0.7333333333333334, 0.7333333333333334),
    // boost threshold: prefix-2/prefix-4 pairs at jaro <= 0.7 stay unboosted
    ("aaXXXXXXXX", "aaYYYYYYYY", 0.4666666666666666, 0.4666666666666666),
    ("abcdXXXX", "abcdYYYY", 0.6666666666666666, 0.6666666666666666),
    // prefix caps at 4 even when 5 bytes agree
    ("abcdeXXX", "abcdeYYY", 0.75, 0.85),
    ("aXb", "aYb", 0.7777777777777777, 0.7999999999999999),
    ("abcde", "abdce", 0.9333333333333332, 0.9466666666666665),
    // ODD mismatch count between matched sequences -> INTEGER t = 1
    ("abcdef", "bcadef", 0.9444444444444445, 0.9444444444444445),
    ("abcdefgh", "hgfedcba", 0.5, 0.5),
    // BYTE semantics: multi-byte code points match byte-by-byte
    ("éa", "éb", 0.7777777777777777, 0.8222222222222222),
    ("ße", "se", 0.0, 0.0),
    ("ab", "a", 0.8333333333333334, 0.8500000000000001),
    ("supplier 1", "supplier 01", 0.9696969696969697, 0.9818181818181818),
    ("Customer#000001", "Customer#000010", 0.9777777777777779, 0.9866666666666667))

  test("jaro/jaroWinkler reproduce every probed DuckDB value to within ulps") {
    probes.foreach { case (a, b, j, jw) =>
      val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
      val gotJ = NameMatch.jaroBytes(ab, bb)
      val gotJw = NameMatch.jaroWinklerBytes(ab, bb)
      assert(math.abs(gotJ - j) < 1e-12, s"jaro($a, $b): $gotJ vs DuckDB $j")
      assert(math.abs(gotJw - jw) < 1e-12, s"jw($a, $b): $gotJw vs DuckDB $jw")
    }
  }

  test("the native expression matches the static method through codegen") {
    val df = probes.map { case (a, b, _, _) => (a, b) }.toDF("a", "b")
    val got = df.select(NameMatch.jaroWinkler(col("a"), col("b"))).collect()
      .map(_.getDouble(0)).toSeq
    val want = probes.map { case (a, b, _, _) =>
      NameMatch.jaroWinklerBytes(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    }
    assert(got == want)
    // NULL inputs are NULL out
    val n = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(NameMatch.jaroWinkler(col("a"), col("b"))).collect().head
    assert(n.isNullAt(0))
  }

  test("topSimilarPairs: blocked, rounded-score-ordered, id-tiebroken cut") {
    val df = Seq(
      (1L, "martha stone", "b1"), (2L, "marhta stone", "b1"),
      (3L, "martin stone", "b1"), (4L, "zzz yyy", "b1"),
      (5L, "martha stone", "b2")) // other block: never paired with b1
      .toDF("id", "name", "blk")
    val rows = NameMatch.topSimilarPairs(df, "id", "name", "blk", k = 3).collect()
    assert(rows.length == 3)
    // expected ordering derived with the operator's own static scorer
    def jw(a: String, b: String): Double = math.floor(
      NameMatch.jaroWinklerBytes(a.getBytes("UTF-8"), b.getBytes("UTF-8")) * 1e4
        + 0.5) / 1e4
    val ids = rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
    val all = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L))
    val names = Map(1L -> "martha stone", 2L -> "marhta stone",
      3L -> "martin stone", 4L -> "zzz yyy")
    val want = all.sortBy { case (a, b) => (-jw(names(a), names(b)), a, b) }.take(3)
    assert(ids == want)
    assert(!ids.contains((1L, 5L)), "cross-block pairs must not appear")
    assert(rows.forall(r => r.getDouble(4) == jw(names(r.getLong(0)), names(r.getLong(1)))))
  }
}
