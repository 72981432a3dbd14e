package graft

import graft.api.SqlTools
import graft.sources.Snapshot

class SqlToolsSpec extends SparkSpecBase {

  test("free-form SQL runs over registered snapshot views") {
    val df = SqlTools.run(Snapshot(spark, sf()),
      "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'O'")
    assert(df.head().getLong(0) > 0)
  }

  test("validator accepts valid SQL without executing") {
    Snapshot(spark, sf()).registerAll()
    val r = SqlTools.validate(spark, "SELECT o_orderkey FROM orders WHERE o_totalprice > 100")
    assert(r.valid && r.error.isEmpty)
  }

  test("validator rejects bad column with a resolvable message") {
    Snapshot(spark, sf()).registerAll()
    val r = SqlTools.validate(spark, "SELECT not_a_column FROM orders")
    assert(!r.valid)
    assert(r.error.exists(_.contains("not_a_column")))
  }

  test("validator rejects syntax errors") {
    val r = SqlTools.validate(spark, "SELEC broken FROM")
    assert(!r.valid)
  }

  test("validator does NOT execute DDL side effects") {
    spark.sql("CREATE OR REPLACE TEMP VIEW validate_probe AS SELECT 1 AS x")
    val r = SqlTools.validate(spark, "DROP VIEW validate_probe")
    assert(r.valid) // analyzes fine...
    // ...but the view must still exist (nothing was executed)
    assert(spark.sql("SELECT * FROM validate_probe").count() == 1)
  }
}
