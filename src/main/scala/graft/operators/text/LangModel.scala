package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** CCNet-style language-model quality signal (Wenzek et al., LREC 2020:
  * score each document by an n-gram LM trained on a trusted slice; low
  * log-probability ⇒ gibberish/boilerplate, suspiciously high ⇒
  * templated text). Here: an interpolated word-BIGRAM model with
  * Laplace-smoothed unigram backoff, trained distributedly.
  *
  * Model (all counts from the train slice):
  *   p_uni(w)   = (c(w) + 1) / (N + V + 1)          — Laplace over V+UNK
  *   p(w | v)   = λ·(c(v,w) / c(v,·)) + (1−λ)·p_uni(w)   if c(v,·) > 0
  *              = p_uni(w)                                otherwise
  *   first token / unseen context scores as pure unigram; OOV words get
  *   the +1 mass, so every factor is > 0 and the score is total.
  *
  * Scale shape: counting = one train-slice scan into vocab-grain unigram
  * / bigram tables (bigram pairs built MAP-SIDE from the split array —
  * no window, no self-join); scoring = token-grain left joins against
  * those tables (auto-broadcast at vocabulary sizes that fit, sort-merge
  * beyond) and one per-doc aggregation. Nothing is quadratic; the only
  * corpus-sized shuffles carry slim (id, pos, counts) rows.
  *
  * Determinism contract (the q_text_entropy precedent — SURVEY §5): the
  * ln is libm-dependent and a corpus-scale set of per-token ln values
  * cannot clear the margin-audit protocol, so the ORACLE-HASHED columns
  * are the IEEE-exact companions that determine the score exactly —
  * n_tokens, n_oov, oov_rate (one exact division), and model_sig (md5
  * of the position-ordered exact (c(v,w), c(v,·), c(w)) count triples).
  * `avg_nll` itself (per-token ln contributions rounded to 9 digits and
  * decimal-summed, so the value is order-independent within Spark) is
  * exposed for pipeline use and gated by analytic planted cases in
  * LangModelSpec (uniform vocab ⇒ closed-form NLL).
  */
object LangModel {

  /** Per-doc LM score report: (idCol, n_tokens, n_oov, oov_rate,
    * model_sig, avg_nll). `train` supplies the count slice (pass a
    * deterministic subset of `docs`, or a separate trusted corpus).
    */
  def scoreNll(
      docs: DataFrame,
      train: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.7): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda must be in (0,1), got $lambda")
    def ws(c: Column) = split(lower(c), " ")
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), ws(col(textCol)).as("__ws"))
    val tbase = train.where(col(textCol).isNotNull).select(ws(col(textCol)).as("__ws"))

    val ttok = tbase.select(explode(col("__ws")).as("w"))
    val uni = ttok.groupBy("w").agg(count(lit(1)).as("cu"))
    val tot = ttok.agg(count(lit(1)).as("n_train"), countDistinct(col("w")).as("v_train"))
    val bi = tbase.select(explode(zip_with(
        slice(col("__ws"), lit(1), size(col("__ws")) - 1),
        slice(col("__ws"), lit(2), size(col("__ws")) - 1),
        (a, b) => struct(a.as("v"), b.as("w")))).as("p"))
      .groupBy(col("p.v").as("v"), col("p.w").as("w"))
      .agg(count(lit(1)).as("cb"))
    val ctx = bi.groupBy("v").agg(sum(col("cb")).as("cc"))

    // previous word from the array, map-side (element_at is 1-based, pos
    // 0-based, so element_at(ws, pos) IS the predecessor); the wide __ws
    // drops before any join
    val toks = base
      .select(col("__id"), col("__ws"), posexplode(col("__ws")).as(Seq("pos", "w")))
      .select(col("__id"), col("pos"), col("w"),
        when(col("pos") > 0, element_at(col("__ws"), col("pos"))).as("v"))

    val pUni = (coalesce(col("cu"), lit(0L)) + lit(1L)).cast("double") /
      (col("n_train") + col("v_train") + lit(1L)).cast("double")
    val p = when(col("v").isNull || col("cc").isNull, pUni)
      .otherwise(lit(lambda) * (coalesce(col("cb"), lit(0L)).cast("double") /
        col("cc").cast("double")) + lit(1.0 - lambda) * pUni)

    toks
      .join(uni, Seq("w"), "left")
      .join(bi, Seq("v", "w"), "left")
      .join(ctx, Seq("v"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("__nll", -log(p))
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("cu").isNull, 1L).otherwise(0L)).as("n_oov"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos"), concat_ws(":",
            coalesce(col("cb"), lit(0L)).cast("string"),
            coalesce(col("cc"), lit(0L)).cast("string"),
            coalesce(col("cu"), lit(0L)).cast("string")).as("s")))),
          x => x("s")))).as("model_sig"),
        sum(round(col("__nll"), 9).cast(DecimalType(28, 9))).as("__snll"))
      .select(
        col("__id").as(idCol),
        col("n_tokens"),
        col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_rate"),
        col("model_sig"),
        (col("__snll").cast("double") / col("n_tokens").cast("double")).as("avg_nll"))
  }
}
