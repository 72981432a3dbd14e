package graft.operators.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: `deflate(text) / bytes(text)` — the
  * classic repetitiveness feature of web-corpus curation (highly
  * template/boilerplate text compresses far below prose; near-random
  * noise barely compresses). Complements [[TextStats.repetition]]
  * (explicit shingle repeats) and [[TextStats.entropy]] (unigram
  * distribution) with a SEQUENCE-aware signal that sees long-range
  * structure both of those miss.
  *
  * Deterministic: one fresh `java.util.zip.Deflater` per value at a fixed
  * level — same input ⇒ same output length on a given JDK (the cross-JVM
  * sweep pins it round-to-round). DuckDB has no deflate, so the query is
  * no_oracle: gated by analytic plants (SelfCheck) — a doc repeated
  * back-to-back must compress markedly better than one copy (the second
  * copy is matches into the 32 KB window), repetitive text must sit far
  * below hex-noise text — plus the corpus-wide bound deflated ≤ raw + 16
  * (zlib header/adler/stored-block overhead; note tiny docs can sit above
  * ratio 1 on overhead alone, so ratio thresholds belong to the CALLER's
  * length regime).
  * Scale shape: per-row JVM call from codegen, scan-fused, no shuffle.
  */
object Compress {

  /** zlib-deflated byte count of the UTF-8 text at `level`. */
  def deflatedLen(bytes: Array[Byte], level: Int): Int = {
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  def deflatedLenUTF8(s: UTF8String, level: Int): Int = deflatedLen(s.getBytes, level)

  private def bridge(e: Expression): Column = org.apache.spark.sql.GraftPlanBridge.column(e)
  private def expr(c: Column): Expression = org.apache.spark.sql.GraftPlanBridge.expression(c)

  def deflateLen(text: Column, level: Int = 6): Column = bridge(DeflateLen(expr(text), level))

  /** Per-doc report: raw bytes, deflated bytes, and the ratio rounded to
    * 4 digits (the repo's similarity-output convention). Empty text maps
    * to NULL ratio (0/0 is meaningless, not "perfectly compressed").
    */
  def report(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val raw = octet_length(col(textCol)).cast("long")
    df.select(
      col(idCol),
      raw.as("n_bytes"),
      deflateLen(col(textCol)).cast("long").as("deflated_bytes"),
      round(deflateLen(col(textCol)).cast("double") /
        nullif(raw.cast("double"), lit(0.0)), 4).as("compress_ratio"))
  }
}

/** string -> deflated byte count (INT) at a fixed compression level. */
case class DeflateLen(child: Expression, level: Int) extends UnaryExpression {
  require(level >= 0 && level <= 9, s"deflate level must be in [0,9], got $level")
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_len expects STRING, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    Compress.deflatedLenUTF8(v.asInstanceOf[UTF8String], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.operators.text.Compress.deflatedLenUTF8($s, $level);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
