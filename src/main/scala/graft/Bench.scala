package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: every SparkEntry.query timed on SPARK_GRAFT_SF_DIR.
  *
  * Noise handling (this box has ±50% neighbor noise — see CLAUDE.md): each
  * query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports the
  * per-query MEDIAN; the total is the sum of successful medians only.
  * Failed queries are listed in "failed" and carry -1.0 in "queries" —
  * they are never summed (a -1 sentinel in the total would make a failing
  * run look faster than a clean one).
  *
  * Output: ONE bare JSON line on stdout, and the same line written to
  * SPARK_GRAFT_BENCH_OUT (default ./BENCH_LOCAL.json) so the result stays
  * machine-readable even when sbt wraps stdout in [info] prefixes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      // hash-reduce every output column: a bare count() would let Catalyst
      // prune the projections and benchmark only the scan
      import org.apache.spark.sql.functions.{sum, xxhash64, col}
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
        .agg(sum("__h")).head()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    val results: Seq[(String, Seq[Double])] = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      var r = 0
      while (r < reps && !failed) {
        try times += once(fn)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: " + e.getMessage); failed = true
        }
        r += 1
      }
      name -> (if (failed) Seq.empty else times.toSeq)
    }
    val failed = results.collect { case (n, ts) if ts.isEmpty => n }
    val medians = results.collect { case (n, ts) if ts.nonEmpty => n -> median(ts) }
    val total = medians.map(_._2).sum
    val qs = results.map { case (k, ts) =>
      s"\"" + k + "\":" + (if (ts.isEmpty) "-1.0" else median(ts).toString)
    }.mkString("{", ",", "}")
    // per-query [min, median, max] across the reps: the regression-vs-noise
    // adjudication signal (a wide spread = box noise; a tight spread
    // shifted up = a real plan change) — SURVEY §6
    val spread = results.map { case (k, ts) =>
      val body = if (ts.isEmpty) "[-1.0,-1.0,-1.0]"
        else s"[${ts.min},${median(ts)},${ts.max}]"
      s"\"" + k + "\":" + body
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_spread":$spread,"sf":"$sfDir","reps":$reps,"n_failed":${failed.size},"failed":$failedJson}"""
    println(json)
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
