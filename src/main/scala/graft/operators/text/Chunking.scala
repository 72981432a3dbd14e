package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-token chunking of documents into overlapping training windows —
  * the step between a curated corpus and a tokenized training set (the
  * reference stops at whole documents; this is part of the LLM-pipeline
  * extension family, like [[graft.operators.sample.Packing]]).
  *
  * Chunk i covers whitespace tokens `[i·stride, i·stride + chunkTokens)`
  * where `stride = chunkTokens - overlapTokens`; consecutive chunks share
  * exactly `overlapTokens` tokens, every token of the document appears in
  * at least one chunk, and a document shorter than one chunk yields one
  * (short) chunk. Chunk count is `max(1, ceil((n - overlap) / stride))`,
  * so the last chunk always contributes at least one new token.
  *
  * Scale shape: a pure per-row generator — tokenize, compute the start
  * offsets with integer arithmetic, `posexplode`, slice. No shuffle, no
  * state; output size is `~n_tokens/stride` rows per document and the plan
  * stays inside whole-stage codegen up to the generator. The start-count
  * division is done in doubles (`floor((n+c)/stride)`), exact for any
  * realistic token count (integers < 2^53).
  */
object Chunking {

  /** One row per (document, chunk): `(idCol, chunk_idx, n_chunk_tokens,
    * chunk_text)`, chunk_idx 0-based in document order. Null-text rows are
    * dropped (they carry no tokens to chunk).
    */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be > 0, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // ceil((n - overlap) / stride) via (n - overlap + stride - 1) div stride;
    // the numerator is >= stride - overlap >= 1 for any n >= 1, so no
    // negative-division edge. Double division is exact at these magnitudes.
    val nChunks = greatest(lit(1), floor(
      (n - lit(overlapTokens) + lit(stride - 1)).cast("double") / lit(stride.toDouble)).cast("int"))
    val starts = sequence(lit(0), (nChunks - lit(1)) * lit(stride), lit(stride))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks"), posexplode(starts).as(Seq("chunk_idx", "__start")))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        size(slice(col("__toks"), col("__start") + lit(1), lit(chunkTokens)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("__start") + lit(1), lit(chunkTokens)), " ")
          .as("chunk_text"))
  }
}
