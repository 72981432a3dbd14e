package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler record-linkage scorer (C75) — the standard fuzzy
  * NAME matcher (Winkler 1990), complementing the edit-distance family
  * (levenshtein counts operations; Jaro–Winkler scores positional
  * character agreement with a common-prefix boost, the convention for
  * person/entity names).
  *
  * Semantics are pinned to DuckDB 1.0's `jaro_winkler_similarity`
  * (probed empirically; the oracle re-derives the whole operator with
  * that builtin):
  *  - operates on UTF-8 BYTES (multi-byte code points match
  *    byte-by-byte — 'ße' vs 'se' scores 0, probed);
  *  - empty-side score is 0 (even for two empties);
  *  - match window = max(⌊max(l1,l2)/2⌋ − 1, 0), greedy left-to-right
  *    first-unused match;
  *  - transpositions = ⌊positional mismatches of the matched
  *    sequences / 2⌋ (INTEGER halving — probed on an odd-mismatch
  *    construction);
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3;
  *  - Winkler boost ONLY when jaro > 0.7 (probed: prefix-4 pairs at
  *    jaro ≤ 0.7 stay unboosted): jw = jaro + 0.1·p·(1−jaro) with
  *    p = common BYTE prefix capped at 4.
  *
  * Hash safety: the score is a small-denominator rational through a
  * short IEEE chain; the two engines' op orders may differ by ulps, so
  * oracle-hashed scores round at hashRound 4 and ALL pair scores carry
  * a MarginAuditSpec boundary audit (4-digit grid margin + distance of
  * jaro from the 0.7 boost threshold — both > 1e-9, dwarfing any ulp).
  * Per-row JVM call from codegen (the DeflateLen shape), scan-fused.
  */
object NameMatch {

  /** Jaro similarity over UTF-8 bytes (DuckDB 1.0 semantics). */
  def jaroBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val used = new Array[Boolean](l2)
    val m1 = new Array[Byte](math.min(l1, l2))
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + win)
      var j = math.max(0, i - win)
      var found = false
      while (j <= hi && !found) {
        if (!used(j) && a(i) == b(j)) {
          used(j) = true; m1(m) = a(i); m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var mm = 0
    var j = 0
    while (j < l2) {
      if (used(j)) {
        if (b(j) != m1(mm)) mismatches += 1
        mm += 1
      }
      j += 1
    }
    val t = mismatches / 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }

  /** Jaro–Winkler similarity over UTF-8 bytes (DuckDB 1.0 semantics). */
  def jaroWinklerBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaroBytes(a, b)
    if (j > 0.7) {
      val cap = math.min(4, math.min(a.length, b.length))
      var p = 0
      while (p < cap && a(p) == b(p)) p += 1
      j + 0.1 * p * (1.0 - j)
    } else j
  }

  def jaroWinklerUTF8(a: UTF8String, b: UTF8String): Double =
    jaroWinklerBytes(a.getBytes, b.getBytes)

  private def bridge(e: Expression): Column = org.apache.spark.sql.GraftPlanBridge.column(e)
  private def expr(c: Column): Expression = org.apache.spark.sql.GraftPlanBridge.expression(c)

  /** Column-level Jaro–Winkler similarity (native expression, codegen). */
  def jaroWinkler(a: Column, b: Column): Column = bridge(JaroWinklerSim(expr(a), expr(b)))

  /** Top-k most-similar name pairs WITHIN a blocking key — the standard
    * record-linkage shape (the blocking key bounds the self-join to
    * within-block pairs; completeness holds only within blocks — the
    * caller picks a key coarse enough for its recall target). Pairs are
    * `id_a < id_b`; ordering uses the ROUNDED score (hashRound 4) so an
    * ulp of engine drift between equal rationals computed by different
    * (m, t, l) paths cannot reorder the cut, with the (id_a, id_b)
    * tiebreak owning exact rounded ties; the final top-k is a
    * TakeOrdered (no global sort).
    */
  def topSimilarPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    blockedPairs(df, idCol, nameCol, blockCol)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        graft.functions.ExactMath.hashRound(
          jaroWinkler(col("name_a"), col("name_b")), 4).as("jw_sim"))
      .orderBy(col("jw_sim").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** The within-block id_a < id_b pair enumeration [[topSimilarPairs]]
    * scores — exposed so the MarginAuditSpec boundary audit sweeps
    * exactly the pair set whose roundings decide the hashed cut.
    */
  def blockedPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockCol: String): DataFrame = {
    val base = df.where(col(idCol).isNotNull && col(nameCol).isNotNull &&
        col(blockCol).isNotNull)
    // pin the block join's parallelism (r16-opt, FanOut.byJoinKey
    // rationale): the per-pair Jaro–Winkler scoring runs in the join
    // stage, and AQE's bytes-based coalescing of the tiny blocked-name
    // shuffle serialized it to ONE 1.5 s task at sf0.1. One exchange,
    // reused by both sides; pair rows and the k-cut are unchanged.
    // MEASURED TRADE (r16-opt ScaleUp ×8 A/B, two runs each): under
    // copy-amplified HOT blocks the pin loses ~2× (12.7-13.2 s pinned
    // vs 6.2 s unpinned) because the pinned exchange opts out of AQE
    // skew-splitting exactly where blocks go hot; at sf0.1 it wins 3×
    // (0.69 vs 2.01 s). A deployment expecting skewed blocks disables
    // it via spark.graft.fanout.partitions=0.
    val keyed = graft.operators.FanOut.byJoinKey(
      base.select(col(blockCol).as("__blk"), col(idCol), col(nameCol)),
      col("__blk"))
    val left = keyed.select(col("__blk"),
      col(idCol).as("id_a"), col(nameCol).as("name_a"))
    val right = keyed.select(col("__blk"),
      col(idCol).as("id_b"), col(nameCol).as("name_b"))
    left.join(right, "__blk").where(col("id_a") < col("id_b"))
  }
}

/** (string, string) -> Jaro–Winkler similarity (DOUBLE). */
case class JaroWinklerSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (STRING, STRING), got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    NameMatch.jaroWinklerUTF8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.operators.text.NameMatch.jaroWinklerUTF8($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
