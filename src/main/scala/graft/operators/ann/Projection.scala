package graft.operators.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Seeded sparse sign random projection (Achlioptas 2003 / JL): reduce an
  * embedding column to `outDim` components with a deterministic ±1 matrix,
  * scaled by 1/sqrt(outDim) so squared norms are preserved in expectation.
  *
  * Why THIS projection and not Gaussian/PCA as the oracle-gated operator:
  * every arithmetic step is IEEE-exact (±1 scaling, sequential-fold dot
  * products — the codegen'd [[GraftFunctions.dot]] — and one correctly-
  * rounded sqrt), and the sign matrix derives from md5 — both properties an
  * independent engine can reproduce BIT FOR BIT, so the whole operator sits
  * under the driver's hash gate rather than a weaker spec-only check
  * (SURVEY §5: no transcendentals in hashed outputs). PCA stays the
  * documented non-goal: its eigensolve is iterative and engine-dependent.
  *
  * Scale shape: the matrix is outDim×inDim driver literals (a few KB)
  * embedded into codegen'd per-row expressions — zero shuffles, zero
  * joins; the corpus streams through the scan once. 4× narrower vectors
  * (64→16) shrink every downstream ANN broadcast/shuffle the same way
  * `Quantize` does byte-wise — the two compose.
  *
  * Contract: every vector must have length == `inDim` (the fold and its
  * DuckDB mirror both run over exactly inDim elements; shorter vectors
  * would silently zero-pad on one side only). Null vectors project to
  * null components.
  *
  * Re-expresses the reference's embedding-similarity surface
  * (/root/reference/openai/list_of_tools.py:121 cosine retrieval) at the
  * reduced dimension a 100 TB corpus wants for its first-pass ANN.
  */
object Projection {

  /** +1.0 when md5("seed:i:j") starts with nibble 0–7, else −1.0 —
    * lexicographic compare with "8", identical to the DuckDB mirror's
    * `md5(...) < '8'` (hex is lowercase in both engines; no 32-char hex
    * string equals the 1-char "8", so the prefix compare is unambiguous).
    */
  private[graft] def sign(seed: String, i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = md.map("%02x".format(_)).mkString
    if (hex < "8") 1.0 else -1.0
  }

  /** Row j of the sign matrix: signs for input components i = 0..inDim-1. */
  private[graft] def signRow(seed: String, inDim: Int, j: Int): Seq[Double] =
    (0 until inDim).map(i => sign(seed, i, j))

  /** Appends `p0..p{outDim-1}` double columns: p_j = dot(vec, signRow_j)
    * / sqrt(outDim). Each component is one codegen'd sequential-fold dot
    * against a literal array.
    */
  def project(
      df: DataFrame,
      vecCol: String,
      inDim: Int,
      outDim: Int,
      seed: String): DataFrame = {
    require(inDim >= 1, s"inDim must be >= 1, got $inDim")
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    val scale = lit(math.sqrt(outDim.toDouble))
    (0 until outDim).foldLeft(df) { (acc, j) =>
      acc.withColumn(s"p$j",
        GraftFunctions.dot(col(vecCol), typedlit(signRow(seed, inDim, j))) / scale)
    }
  }

  /** [[project]] keeping the components as ONE array column (for feeding
    * ANN operators that take a vector column). Same arithmetic, same
    * values as the flat columns.
    */
  def projectToVector(
      df: DataFrame,
      vecCol: String,
      inDim: Int,
      outDim: Int,
      seed: String,
      outCol: String): DataFrame = {
    val flat = project(df, vecCol, inDim, outDim, seed)
    flat.withColumn(outCol, array((0 until outDim).map(j => col(s"p$j")): _*))
      .drop((0 until outDim).map(j => s"p$j"): _*)
  }
}
