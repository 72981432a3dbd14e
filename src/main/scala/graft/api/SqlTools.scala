package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Snapshot

/** The reference's free-form SQL surface + validator.
  *
  * Reference: /root/reference/langchain/my_toolkit.py:491
  * `SQLQueryValidatorTool` (LLM-checked SQL) and the query-execution tools
  * that run arbitrary SELECTs. Here validation is Catalyst analysis —
  * parse + resolve against real table schemas, no execution, no LLM.
  */
object SqlTools {

  final case class ValidationResult(valid: Boolean, error: Option[String])

  /** Runs a SQL query against the snapshot's registered views. */
  def run(snapshot: Snapshot, sql: String): DataFrame = {
    snapshot.registerAll()
    snapshot.spark.sql(sql)
  }

  /** Parses and analyzes (resolves columns/tables/types) without executing.
    * NOTE: `spark.sql` would be wrong here — it eagerly EXECUTES command
    * statements (DDL/DML), so validating `DROP TABLE t` would drop the
    * table. Going through `executePlan(...).assertAnalyzed()` stops at
    * analysis for queries and commands alike.
    */
  def validate(spark: SparkSession, sql: String): ValidationResult =
    try {
      val parsed = spark.sessionState.sqlParser.parsePlan(sql)
      spark.sessionState.executePlan(parsed).assertAnalyzed()
      ValidationResult(valid = true, None)
    } catch {
      case e: Exception => ValidationResult(valid = false, Some(e.getMessage))
    }
}
