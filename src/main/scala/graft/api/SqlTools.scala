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
    * `spark.sql` analyzes eagerly; only actions execute.
    */
  def validate(spark: SparkSession, sql: String): ValidationResult =
    try {
      spark.sql(sql)
      ValidationResult(valid = true, None)
    } catch {
      case e: Exception => ValidationResult(valid = false, Some(e.getMessage))
    }
}
