package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ExactMath

/** Learned document-quality classifier (VERDICT r14 #3): a logistic
  * scorer over HASHED-TOKEN bag-of-words features — the fastText/CCNet
  * shape every production curation pipeline runs next to its rule
  * screens (the reference's entire "quality" notion is the keyword
  * filter in `openai/basic_functions.py` step 5; this is its trained
  * successor at corpus scale).
  *
  * Feature hashing (engine-mirrorable by construction): token bucket =
  * `CAST(first 4 hex chars of md5(token) AS INT) % dim` — md5 is
  * bit-identical in Spark and DuckDB and 4 hex chars (16 bits) parse
  * exactly in both, so the SQL oracle re-derives the features
  * verbatim (the Projection md5-sign precedent). Scoring folds the
  * per-token weights SEQUENTIALLY in token order from 0.0
  * (`aggregate` == init-less `list_reduce`, the cosSql convention),
  * so the logit is an IEEE-identical double in both engines and
  * hashes UNROUNDED; the sigmoid score is the catalog's 14th audited
  * transcendental (hashRound 4 + MarginAuditSpec boundary audit), and
  * the `is_quality` flag compares the engine-identical logit against
  * 0 — no transcendental decides it.
  *
  * Scale shape: scoring is a pure map (tokenize → hash → fold) fused
  * into the scan — zero shuffles, whole-stage codegen. Training is
  * batch gradient descent with ONE slim shuffle per epoch: per-row
  * residuals quantize to DECIMAL(18,6) BEFORE summing (the dsum
  * rule — partial sums associative-exact, so gradients are
  * INDEPENDENT of partitioning), token rows explode to (bucket,
  * residual) and aggregate to ≤ dim+1 groups; the driver applies the
  * fixed-IEEE update. Two runs on any partitioning produce
  * bit-identical weights (spec-gated, the Bpe.train pattern).
  */
object QualityClassifier {

  /** Whitespace tokens of the ASCII-lowercased text, empties dropped.
    * translate a-z (a pure codepoint map, identical in both engines)
    * instead of lower(): Spark's non-ASCII lower is JVM-locale-
    * sensitive and can change codepoint counts (İ → i + combining dot)
    * where DuckDB's is utf8proc — a hash-checked mirror must not
    * depend on the corpus staying ASCII/CJK (the q_casing_audit
    * lesson, ADVICE r14, applied here at design time).
    */
  def tokens(textCol: Column): Column =
    filter(split(translate(textCol,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"), " "),
      w => length(w) > 0)

  /** Hashed feature bucket of one token: first 16 bits of md5, mod dim.
    * DuckDB mirror: `CAST(concat('0x', substr(md5(t),1,4)) AS INTEGER) % dim`.
    */
  def bucketOf(tok: Column, dim: Int): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("int") % dim

  /** The driver-side twin of [[bucketOf]] (specs and the margin audit
    * re-derive features with it).
    */
  def bucketOfLocal(tok: String, dim: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % dim
  }

  /** logit = bias + (Σ_tokens w(bucket(token))) / n_tokens — MEAN
    * features, the fastText convention: a sum would scale logits with
    * document length and saturate the sigmoid (measured: sum features
    * fail to train on this corpus; means converge). The Σ folds
    * sequentially in token order from 0.0 (init-less `list_reduce`
    * mirror), then ONE division and ONE add — every step IEEE-identical
    * in both engines. `toks` must be non-empty.
    */
  private def logitExpr(toks: Column, weights: Seq[Double], bias: Double): Column = {
    val dim = weights.length
    val wArr = array(weights.map(lit): _*)
    lit(bias) + aggregate(toks, lit(0.0),
      (acc, t) => acc + element_at(wArr, bucketOf(t, dim) + lit(1))) /
      size(toks).cast("double")
  }

  /** Score `df` with an embedded model: one row per non-empty document —
    * (id, n_tokens, logit UNROUNDED, score = hashRound-4 sigmoid,
    * is_quality = logit > 0). Pure map, no shuffle.
    */
  def scoreWithModel(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: Seq[Double],
      bias: Double): DataFrame = {
    val toks = tokens(col(textCol))
    val logit = logitExpr(col("__ws"), weights, bias)
    // fan the slim (id, text) projection out first: the per-token md5
    // bucketing runs inside an interpreted HOF lambda and dominated the
    // scoring map — on a single-split input the whole calibration family
    // (isotonic/ece/brier/pr-curve/log-loss/mcc/eval) paid it in ONE
    // task (r16-opt, ProfileStages). Gated no-op on multi-split inputs,
    // so the scale plan stays a pure map after the scan.
    graft.operators.FanOut.byKey(
      df.where(col(textCol).isNotNull).select(col(idCol), col(textCol)),
      col(idCol))
      .select(col(idCol), toks.as("__ws"))
      .where(size(col("__ws")) > 0)
      .select(col(idCol), size(col("__ws")).cast("long").as("n_tokens"),
        logit.as("logit"))
      .select(col(idCol), col("n_tokens"), col("logit"),
        ExactMath.hashRound(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 4).as("score"),
        (col("logit") > lit(0.0)).as("is_quality"))
  }

  /** Batch-gradient-descent training of (weights, bias) on a boolean
    * label. Deterministic by construction: per-row residuals
    * `(y − σ(logit))` quantize to DECIMAL(18,6) before the per-bucket
    * sums (associative-exact — partitioning cannot reorder them into a
    * different result), and the driver-side update is one fixed IEEE
    * sequence per epoch. One slim (bucket, residual-decimal) shuffle
    * per epoch, ≤ dim+1 groups; the source scans once per epoch.
    *
    * From the zero model the FIRST step is exactly hand-computable:
    * σ(0) = 0.5 exactly, so every residual is ±0.5 (decimal-exact),
    * every per-token contribution is quantize6(±0.5/n_tokens) and
    * grad_j is their exact decimal sum — the spec's paper-derived gate
    * (the Bpe.train 6-merge-recovery pattern).
    */
  def train(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      dim: Int = 64,
      epochs: Int = 20,
      lr: Double = 0.5): (Seq[Double], Double) = {
    require(dim >= 2 && dim <= 4096, s"dim must be in [2,4096], got $dim")
    require(epochs >= 1 && epochs <= 1000, s"epochs must be in [1,1000], got $epochs")
    val base = prepare(df, textCol, labelCol, dim)
      .localCheckpoint(true) // epochs re-scan the slim bucket table, not the source
    require(!base.isEmpty, "training corpus is empty after token/label cleaning")
    var w: Seq[Double] = Vector.fill(dim)(0.0)
    var b = 0.0
    for (_ <- 1 to epochs) {
      val next = stepFromCells(gradientCells(base, w, b), w, b, lr)
      w = next._1; b = next._2
    }
    (w, b)
  }

  /** The slim cleaned training projection: (__bs = hashed bucket array,
    * __y = boolean label), empty-token and NULL rows dropped. The md5
    * feature hashing is MODEL-INDEPENDENT, so it runs exactly once here
    * — training epochs fold plain INTs against the current weights
    * (the hashing dominated epoch cost when recomputed per epoch:
    * higher-order-function lambdas evaluate interpreted, and the fold
    * plus the explode each re-hashed every token).
    */
  def prepare(df: DataFrame, textCol: String, labelCol: String, dim: Int = 64): DataFrame = {
    // stamp the hash dim on the bucket column: a gradientCells call with
    // a different-length weight vector would otherwise fold NULLs out of
    // the sums (ANSI-off element_at) while the −2 cell still counts the
    // example — silently wrong gradients instead of an error
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.hashDim", dim.toLong).build()
    df.where(col(textCol).isNotNull && col(labelCol).isNotNull)
      .select(transform(tokens(col(textCol)), t => bucketOf(t, dim)).as("__bs", meta),
        col(labelCol).cast("boolean").as("__y"))
      .where(size(col("__bs")) > 0)
  }

  /** One epoch's gradient under the CURRENT model as a MERGEABLE cell
    * table (the D38 streaming-training state): rows (__j, __g) where
    * __j = −2 carries the example count, −1 the bias gradient
    * (∂logit/∂b = 1 → the raw quantized residual) and 0..dim−1 the
    * per-bucket gradients (∂logit/∂w_j = count_j/n_tokens → one
    * quantized residual/n per TOKEN occurrence). Every __g is an exact
    * DECIMAL sum of per-row quantized contributions, so
    * [[mergeGradientCells]] of two batches' cells equals the one-shot
    * cells EXACTLY (associativity) — gradient accumulation over
    * streaming microbatches is arrival-order free. One explode, one
    * slim shuffle, ≤ dim+2 groups. Arithmetic is IDENTICAL to scoring:
    * the bucket-array fold produces the same doubles the token fold
    * would (same buckets, same order).
    */
  def gradientCells(prepared: DataFrame, weights: Seq[Double], bias: Double): DataFrame = {
    val bsMeta = prepared.schema("__bs").metadata
    if (bsMeta.contains("graft.hashDim"))
      require(bsMeta.getLong("graft.hashDim") == weights.length.toLong,
        s"buckets were hashed at dim ${bsMeta.getLong("graft.hashDim")} but " +
          s"${weights.length} weights were supplied — the fold would NULL out")
    val wArr = array(weights.map(lit): _*)
    val logit = lit(bias) + aggregate(col("__bs"), lit(0.0),
      (acc, j) => acc + element_at(wArr, j + lit(1))) /
      size(col("__bs")).cast("double")
    val withR = prepared.select(col("__bs"),
      (when(col("__y"), lit(1.0)).otherwise(lit(0.0))
        - lit(1.0) / (lit(1.0) + exp(-logit))).as("__r"))
    withR
      .select(col("__r").cast(ExactMath.ValueDecimal).as("__rb"),
        (col("__r") / size(col("__bs")).cast("double"))
          .cast(ExactMath.ValueDecimal).as("__rt"),
        explode(concat(array(lit(-2), lit(-1)), col("__bs"))).as("__j"))
      .groupBy("__j")
      .agg(sum(when(col("__j") === -2, lit(1.0).cast(ExactMath.ValueDecimal))
        .when(col("__j") === -1, col("__rb"))
        .otherwise(col("__rt"))).as("__g"))
  }

  /** Binary-classifier evaluation against a boolean label (C83): one
    * row of confusion counts + accuracy/precision/recall/f1. Every
    * count is an exact partial-agg LONG; accuracy/prec/recall are ONE
    * exact-int division each (engine-identical doubles, hash-safe
    * unrounded — the B56 gini rule) and f1 is a fixed IEEE chain over
    * them, with zero-denominator cases NULL via `when` guards (CASE in
    * the mirror). `prec` not `precision`: PRECISION is a SQL keyword
    * and the oracle harness projects result columns unquoted (the
    * check_name lesson).
    */
  def evaluate(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val p = col(predCol); val y = col(labelCol)
    val counts = df.where(p.isNotNull && y.isNotNull).agg(
      count(lit(1)).as("n"),
      sum(when(p && y, 1L).otherwise(0L)).as("tp"),
      sum(when(p && !y, 1L).otherwise(0L)).as("fp"),
      sum(when(!p && y, 1L).otherwise(0L)).as("fn"),
      sum(when(!p && !y, 1L).otherwise(0L)).as("tn"))
    val withPr = counts.select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("n") > 0,
        (col("tp") + col("tn")).cast("double") / col("n").cast("double")).as("accuracy"),
      when(col("tp") + col("fp") > 0,
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double")).as("prec"),
      when(col("tp") + col("fn") > 0,
        col("tp").cast("double") / (col("tp") + col("fn")).cast("double")).as("recall"))
    withPr.withColumn("f1",
      when(col("prec").isNotNull && col("recall").isNotNull &&
        col("prec") + col("recall") > 0.0,
        lit(2.0) * col("prec") * col("recall") / (col("prec") + col("recall"))))
  }

  /** Per-GROUP classifier evaluation (C90) — [[evaluate]] sliced by a
    * group column (language, source, …): the fairness/slice-eval table
    * a pipeline publishes next to the aggregate row, where a flag that
    * looks fine on average can fail one slice. Same exact-count /
    * one-division / fixed-IEEE-f1 construction per group; zero
    * denominators NULL. One partial-agg pass at the group grain.
    */
  def evaluateByGroup(
      df: DataFrame, groupCol: String, predCol: String, labelCol: String): DataFrame = {
    val p = col(predCol); val y = col(labelCol)
    val counts = df.where(col(groupCol).isNotNull && p.isNotNull && y.isNotNull)
      .groupBy(col(groupCol)).agg(
        count(lit(1)).as("n"),
        sum(when(p && y, 1L).otherwise(0L)).as("tp"),
        sum(when(p && !y, 1L).otherwise(0L)).as("fp"),
        sum(when(!p && y, 1L).otherwise(0L)).as("fn"),
        sum(when(!p && !y, 1L).otherwise(0L)).as("tn"))
    val withPr = counts.select(col(groupCol), col("n"), col("tp"), col("fp"),
      col("fn"), col("tn"),
      when(col("n") > 0,
        (col("tp") + col("tn")).cast("double") / col("n").cast("double")).as("accuracy"),
      when(col("tp") + col("fp") > 0,
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double")).as("prec"),
      when(col("tp") + col("fn") > 0,
        col("tp").cast("double") / (col("tp") + col("fn")).cast("double")).as("recall"))
    withPr.withColumn("f1",
      when(col("prec").isNotNull && col("recall").isNotNull &&
        col("prec") + col("recall") > 0.0,
        lit(2.0) * col("prec") * col("recall") / (col("prec") + col("recall"))))
  }

  /** Field-wise associative merge of two [[gradientCells]] tables. */
  def mergeGradientCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("__j").agg(sum(col("__g")).as("__g"))

  /** One fixed-IEEE gradient step from a (possibly merged) cell table:
    * w_j += lr·g_j/n, b += lr·g_b/n with n read from the −2 cell.
    */
  def stepFromCells(
      cells: DataFrame,
      weights: Seq[Double],
      bias: Double,
      lr: Double): (Seq[Double], Double) = {
    val m = cells.collect()
      .map(r => r.getInt(0) -> r.getDecimal(1).doubleValue)
      .toMap
    val n = m.getOrElse(-2, 0.0)
    require(n > 0, "gradient cells carry no examples (empty training corpus)")
    val b2 = bias + lr * m.getOrElse(-1, 0.0) / n
    val w2 = Vector.tabulate(weights.length)(j =>
      weights(j) + lr * m.getOrElse(j, 0.0) / n)
    (w2, b2)
  }
}
