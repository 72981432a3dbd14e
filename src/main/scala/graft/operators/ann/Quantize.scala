package graft.operators.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Symmetric per-vector int8 scalar quantization of embedding columns.
  *
  * At 100 TB the embedding column dominates ANN storage and shuffle width:
  * a 1024-dim float32 vector is 4 KB/row. Quantizing to `array<tinyint>`
  * plus one double scale is a 4x reduction — 4x more of the corpus (or of
  * an IVF cell) fits in executor memory and page cache, and every shuffle
  * of vector-carrying rows moves 4x fewer bytes. The cosine-fidelity loss
  * is bounded and measurable (each element is off by at most scale/2 =
  * max|v|/254), which the quantization spec asserts alongside top-k recall
  * versus the exact float path.
  *
  * Everything is elementwise higher-order functions over the array — no
  * UDFs, no shuffle; quantization fuses into the scan that reads the
  * vectors. Determinism: scale is `array_max` (order-independent) over
  * exact float→double widenings; round-half-away-from-zero on identical
  * IEEE doubles is engine-portable (mirrored by the DuckDB oracle).
  */
object Quantize {

  /** Per-vector quantization scale `max|v| / 127` (0.0 for a zero vector). */
  def scaleOf(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** int8 codes: `clamp(round(v / scale), -127, 127)` per element. A zero
    * vector (scale 0) quantizes to all-zero codes via a dummy divisor.
    */
  def quantizeVec(vec: Column, scale: Column): Column = {
    val safe = when(scale === lit(0.0), lit(1.0)).otherwise(scale)
    transform(vec, x =>
      least(greatest(round(x.cast("double") / safe), lit(-127.0)), lit(127.0)).cast("byte"))
  }

  /** Reconstruction `q_i · scale` (double array). */
  def dequantizeVec(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Adds `scaleCol` (double) and `qCol` (array<tinyint>) next to the
    * original vector column. Drop the float column afterwards for the 4x
    * storage win; keep it only while validating fidelity.
    */
  def quantize(df: DataFrame, vecCol: String,
      qCol: String = "q_vec", scaleCol: String = "q_scale"): DataFrame =
    df.withColumn(scaleCol, scaleOf(col(vecCol)))
      .withColumn(qCol, quantizeVec(col(vecCol), col(scaleCol)))

  /** Exact brute-force top-k over a QUANTIZED corpus: dequantize on the
    * fly inside the scan (no materialized float copy) and reuse the
    * float-path scoring. Same plan shape as [[BruteForceKNN.topK]] —
    * broadcast queries, corpus scanned once — but the corpus rows read
    * from storage are 4x slimmer.
    */
  def topKQuantized(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      corpusIdCol: String,
      qCol: String,
      scaleCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame =
    BruteForceKNN.topK(
      queries,
      corpus.withColumn("__deq", dequantizeVec(col(qCol), col(scaleCol))),
      queryIdCol, queryVecCol, corpusIdCol, "__deq", k, excludeSelf)

  /** Per-vector fidelity report: scale, worst elementwise reconstruction
    * error, and cosine between the original and reconstructed vector —
    * the audit to run before switching an ANN index to int8.
    */
  def fidelity(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = quantize(df, vecCol)
    q.withColumn("__recon", dequantizeVec(col("q_vec"), col("q_scale")))
      .select(
        col(idCol),
        graft.functions.ExactMath.hashRound(col("q_scale"), 8).as("q_scale"),
        graft.functions.ExactMath.hashRound(array_max(zip_with(col("__recon"), col(vecCol),
          (r, v) => abs(r - v.cast("double")))), 8).as("max_abs_err"),
        graft.functions.ExactMath.hashRound(GraftFunctions.cosine(col(vecCol), col("__recon")), 4).as("cos_fidelity"))
  }
}
