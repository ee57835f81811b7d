package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Multinomial Naive Bayes text classifier — the closed-form distributed
  * classifier the curation pipeline uses where the reference's iterative
  * `LinearRegression` (`/root/reference/pyspark-3.ipynb`) can't apply:
  * labeling text by language / source / quality bucket from token counts.
  *
  * Why NB and not a gradient method: training IS one counting aggregate —
  * add-one-smoothed log-likelihoods are pure arithmetic over per-(label,
  * term) counts, so the whole fit is a map-side-combinable pass over the
  * corpus with no iteration, no feature matrix, and an exact ANSI-SQL twin
  * for the oracle. At 100 TB that's the difference between one scan and a
  * driver-coordinated optimization loop.
  *
  * Scale shape:
  *  - train: corpus tokenized ONCE into (label, term) counts (repeated
  *    terms collapse map-side before the exchange); everything downstream
  *    of the counts is vocabulary-sized, never corpus-sized.
  *  - model: dense labels × vocabulary log-prob table — bounded by the
  *    vocabulary (counts join), independent of corpus row count; small
  *    enough to BROADCAST at serve time.
  *  - predict: map-side explode + broadcast model join; the only exchange
  *    carries O(docs × labels) partial score rows.
  *
  * Cross-engine determinism: log-probs are rounded to 6 decimals at the
  * model boundary, per-doc scores to 4 AFTER summing, and the argmax tie
  * breaks on (rounded score desc, label asc) — so IEEE summation-order
  * drift cannot flip a prediction except at exact 1e-4 score ties, which
  * the tie-break then resolves identically in both engines.
  */
object NaiveBayes {

  /** Per-(label, term) token counts — the ONE corpus-sized pass. */
  private def termCounts(docs: DataFrame, labelCol: String,
      textCol: String): DataFrame =
    docs.select(col(labelCol).as("label"),
        explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("n_lt"))

  /** Add-one-smoothed log-likelihood model: one row per (label, term) over
    * the FULL labels × vocabulary grid,
    * `logp = ln((n_lt + 1) / (n_l + V))` — dense, so a term a label never
    * saw still contributes its smoothed penalty and the serve join needs
    * no per-label default path. The counts relation feeds three consumers
    * (totals, vocabulary, grid join); it is vocabulary-sized, not
    * corpus-sized, so materializing it once is cheap insurance against a
    * triple corpus scan (the tfidfKeywords lesson). */
  def model(train: DataFrame, labelCol: String, textCol: String): DataFrame = {
    val counts = termCounts(train, labelCol, textCol).localCheckpoint(false)
    val totals = counts.groupBy(col("label")).agg(sum(col("n_lt")).as("n_l"))
    val vocab = counts.select(col("term")).distinct()
    val vsize = vocab.agg(count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(totals))
      .join(counts, Seq("label", "term"), "left")
      .crossJoin(broadcast(vsize))
      .select(col("label"), col("term"),
        round(log((coalesce(col("n_lt"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_l") + col("v")).cast("double")), 6).as("logp"))
  }

  /** Per-label log priors from document frequencies:
    * `ln(n_docs_label / n_docs)`. One tiny aggregate. */
  def priors(train: DataFrame, labelCol: String): DataFrame = {
    val byLabel = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs_l"))
    byLabel.crossJoin(broadcast(train.agg(count(lit(1)).as("n_docs"))))
      .select(col("label"),
        round(log(col("n_docs_l").cast("double") / col("n_docs")), 6)
          .as("log_prior"))
  }

  /** Argmax prediction: per-doc token counts joined to the BROADCAST model
    * (inner join — out-of-vocabulary terms are skipped, the standard NB
    * convention; a doc with zero in-vocabulary tokens yields no row),
    * summed per (doc, label), plus the label prior; winner by score with
    * label tie-break. Emits (doc_id, pred_label, score).
    *
    * The log-likelihood sum runs in INTEGER micro-units: model log-probs
    * are already rounded to 6 decimals, so `round(logp·10⁶)` recovers
    * their exact integer value and `Σ tf·logp_micro` is a long sum —
    * associative and order-independent, where the equivalent double sum
    * drifts with partial-aggregation order and (measured, 2/500 docs at
    * sf0.01) flips the 4th decimal of the final score between engines.
    * The argmax likewise compares the exact integers, never doubles. */
  def predict(docs: DataFrame, modelDf: DataFrame, priorsDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf.join(broadcast(modelDf), "term")
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("tf") * round(col("logp") * 1e6).cast("long")).as("ll_micro"))
      .join(broadcast(priorsDf), "label")
      .select(col("doc_id"), col("label"),
        (col("ll_micro") + round(col("log_prior") * 1e6).cast("long"))
          .as("score_micro"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score_micro").desc, col("label"))))
      .filter(col("rank") === 1)
      // exact-integer ÷ 1e6 — bit-identical across engines, so NO rounding
      // (a 4-decimal round would hit exact .00005 halfway cases, where
      // Spark's BigDecimal.valueOf(Double.toString) canonicalization and
      // DuckDB's binary rounding disagree)
      .select(col("doc_id"), col("label").as("pred_label"),
        (col("score_micro") / 1e6).as("score"))
  }

  /** Train on `train`, score `docs` — the composed fit-and-serve path the
    * registry exposes. */
  def trainPredict(train: DataFrame, docs: DataFrame, labelCol: String,
      idCol: String, textCol: String): DataFrame =
    predict(docs, model(train, labelCol, textCol), priors(train, labelCol),
      idCol, textCol)
}
