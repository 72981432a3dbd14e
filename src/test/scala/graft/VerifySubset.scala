package graft

import java.nio.file.{Files, Paths}

/** Dev tool (Test/runMain): Verify for a SUBSET of queries.
  *
  * Usage: Test/runMain graft.VerifySubset <sfDir> <outDir> name1 [name2 ...]
  *
  * Writes the same outDir layout as [[Verify]] (per-query parquet +
  * oracle_sql.json restricted to the named queries), so
  * `scripts/check_oracle.py <sfDir> <outDir>` gates just those queries —
  * the fast inner loop while authoring a new catalog entry. Skips the
  * SelfCheck run (use the full Verify before committing).
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    require(names.nonEmpty, "pass at least one query name")
    val unknown = names -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify-subset] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[verify-subset] wrote ${names.size} queries to $outDir")
    spark.stop()
  }
}
