package graft.sources

import org.apache.spark.sql.SparkSession

/** Tripwire for silent testdata regeneration: asserts every snapshot
  * table's POST-normalization logical types against the shapes the whole
  * oracle catalog was validated on.
  *
  * Round-5 lesson: the driver regenerated events.parquet from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false) and the
  * only symptoms were an opaque hash mismatch (q_schema_check) plus
  * analysis exceptions deep inside as-of/sessionize. This check names the
  * offending column up front ("events.ts surfaced as X, expected Y").
  *
  * Expectations are POST-Snapshot-normalization, so events.ts must be a
  * session-TZ `timestamp` regardless of which parquet encoding the writer
  * used (nanos-as-long, NTZ micros, or adjusted-UTC micros all normalize
  * there); o_orderdate / l_shipdate are genuinely NTZ in the data and the
  * static schema oracle pins them as such.
  */
object DataShape {
  /** table -> (column -> simpleString type), in expected column order. */
  val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
    "part" -> Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq(
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))

  /** All shape violations across the snapshot, empty when healthy.
    * Footer-only reads — no data scan. */
  def violations(spark: SparkSession, dir: String): Seq[String] = {
    val snap = Snapshot(spark, dir)
    Snapshot.tableNames.flatMap { t =>
      val actual = snap.table(t).schema.fields
        .map(f => f.name -> f.dataType.simpleString)
      val want = expected(t)
      val missing = want.collect {
        case (c, ty) if !actual.exists(_._1 == c) =>
          s"$t.$c missing (expected $ty)"
      }
      val mismatched = actual.flatMap { case (c, ty) =>
        want.collectFirst {
          case (`c`, wty) if wty != ty =>
            s"$t.$c surfaced as $ty, expected $wty"
        }
      }
      val extra = actual.collect {
        case (c, ty) if !want.exists(_._1 == c) =>
          s"$t.$c unexpected extra column ($ty)"
      }
      missing ++ mismatched ++ extra
    }
  }

  /** RAW logical types, table → (column, type) — the parquet footer as
    * Spark surfaces it BEFORE Snapshot normalization (footer-only read).
    *
    * The post-normalization check above can ABSORB a new encoding: a
    * hypothetical third events.ts representation that happens to surface
    * as `timestamp` (e.g. adjusted-UTC micros) would sail through
    * [[violations]] while silently skipping the NTZ branch the catalog
    * was validated on. This report names the raw type so the spec pins
    * WHICH encoding the normalization consumed — a regeneration shows up
    * as a named raw-type change even when the normalized shape is
    * unchanged. Note the raw view is still session-dependent where the
    * session must pick a surface for exotic physical types (the pinned
    * `legacy.parquet.nanosAsLong=true` surfaces TIMESTAMP(NANOS) as
    * `bigint` — which is exactly the point: that surface IS the input
    * contract the normalization branch was written against).
    */
  def rawEncodings(spark: SparkSession, dir: String): Map[String, Seq[(String, String)]] =
    Snapshot.tableNames.map { t =>
      t -> spark.read.parquet(s"$dir/$t.parquet").schema.fields
        .toSeq.map(f => f.name -> f.dataType.simpleString)
    }.toMap

  /** The raw footer types the current normalization branches were
    * validated against (events.ts: TIMESTAMP(MICROS, NTZ) since the
    * round-5 regeneration — `timestamp_ntz` raw → session-TZ `timestamp`
    * normalized; every other table reads through unchanged).
    */
  val expectedRaw: Map[String, Seq[(String, String)]] =
    expected + ("events" -> expected("events").map {
      case ("ts", _) => "ts" -> "timestamp_ntz"
      case other => other
    })

  /** Raw-encoding violations: names any parquet footer type the
    * normalization layer was NOT validated against, even when the
    * normalized shape still passes. Empty when healthy. */
  def rawViolations(spark: SparkSession, dir: String): Seq[String] = {
    val raw = rawEncodings(spark, dir)
    Snapshot.tableNames.flatMap { t =>
      val actual = raw(t)
      expectedRaw(t).flatMap { case (c, wty) =>
        actual.collectFirst {
          case (`c`, ty) if ty != wty =>
            s"$t.$c RAW footer type $ty, normalization validated against $wty"
        }
      }
    }
  }

  /** Throws with every offending column named. */
  def assertShape(spark: SparkSession, dir: String): Unit = {
    val v = violations(spark, dir)
    require(v.isEmpty,
      s"snapshot shape drift at $dir — testdata regenerated with a new " +
        s"encoding? ${v.mkString("; ")}")
  }
}
