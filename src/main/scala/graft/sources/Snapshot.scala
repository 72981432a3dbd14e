package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for a database snapshot laid out as one parquet per table.
  *
  * Re-expresses the reference's snapshot access + schema introspection
  * (reference: /root/reference/openai/list_of_tools.py:166 `schema_check`,
  * /root/reference/langchain/langchain_tool.py:66 `InfoSQLDatabaseTool`,
  * :89 `ListSQLDatabaseTool`) over distributed parquet instead of SQLite.
  *
  * Scale note: `table` is a bare `spark.read.parquet` so every downstream
  * filter/projection reaches the scan (PushedFilters / ReadSchema); no
  * eager caching or collect here. The returned DataFrame (an immutable
  * logical plan — file listing + footer schema) is memoized per
  * (session, dir, name): repeated query invocations over one snapshot
  * skip the driver-side listing/footer re-read that `spark.read.parquet`
  * performs on every call. Caveat (fine for immutable snapshot layouts):
  * files added under a dir within one session are invisible to that
  * session's memoized plan.
  */
final case class Snapshot(spark: SparkSession, dir: String) {
  import Snapshot._

  def table(name: String): DataFrame = {
    require(tableNames.contains(name), s"unknown snapshot table: $name")
    if (tableCache.size > MaxCachedPlans) tableCache.clear() // stopped test sessions
    tableCache.getOrElseUpdate((spark, dir, name), {
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      // events.ts normalization — the snapshot writer has shipped two
      // encodings so far and downstream code (watermarks, unix_micros)
      // requires a session-TZ TimestampType:
      //  - TIMESTAMP(NANOS): surfaced as long nanos (GraftSession's
      //    nanosAsLong) → `div 1000` (long division; a double roundtrip
      //    would lose precision above 2^53 ns) → timestamp_micros.
      //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      //    TIMESTAMP_NTZ → cast to TimestampType, value-identical under
      //    the UTC session TZ GraftSession pins.
      if (name == "events")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
          case org.apache.spark.sql.types.TimestampNTZType =>
            raw.withColumn("ts",
              org.apache.spark.sql.functions.col("ts").cast(
                org.apache.spark.sql.types.TimestampType))
          case _ => raw
        }
      else raw
    })
  }

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  def events: DataFrame = table("events")
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Registers every table as a temp view so `spark.sql(...)` works —
    * the reference's free-form SQL surface. Idempotent per (session, dir):
    * repeated free-form-SQL calls don't re-register ten views (and
    * re-resolve ten plans) each time; registering a DIFFERENT dir on the
    * same session re-points the views and the memo.
    */
  def registerAll(): Unit =
    if (!registeredDir.get(spark).contains(dir)) {
      tableNames.foreach(n => table(n).createOrReplaceTempView(n))
      registeredDir.put(spark, dir)
    }

  /** `schema_check` equivalent: one row per column across all tables.
    * Reads parquet footers only (no data scan).
    */
  def schemaReport: DataFrame = {
    import spark.implicits._
    tableNames
      .flatMap { t =>
        table(t).schema.fields.map(f => (t, f.name, f.dataType.simpleString, f.nullable))
      }
      .toDF("table_name", "column_name", "data_type", "nullable")
  }
}

object Snapshot {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // memoized logical plans are tiny; the bound only guards against a
  // pathological many-sessions/many-dirs test harness pinning sessions
  private val MaxCachedPlans = 256
  private val tableCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]
  private val registeredDir =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]
}
