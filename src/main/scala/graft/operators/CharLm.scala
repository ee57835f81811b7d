package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Character-trigram language-model scoring — the perplexity-style quality
  * filter LLM curation pipelines run after the rule-based gates (the CCNet
  * recipe: score every document against a reference-corpus LM, drop the
  * worst tail). A full neural LM needs model serving; the classic scalable
  * stand-in is an n-gram model with add-α smoothing, which is pure
  * counting — and counting is what a Spark aggregate does best.
  *
  * Model = the trigram COUNTS relation, deliberately kept raw (gram, cnt):
  * counts are ADDITIVE, so an incremental corpus refresh is
  * `counts ∪ trigramCounts(delta)` re-summed — the BM25/IVF persisted-
  * artifact pattern — and smoothing happens at scoring time from whatever
  * the merged counts say.
  *
  * Scale shape: the model vocabulary is CHARSET-bounded, not corpus-
  * bounded — lower-cased trigrams over a human alphabet stay well under
  * ~10⁶ entries (CJK included) no matter how many petabytes produced them,
  * so the logprob table is always a broadcast. Scoring explodes each
  * document's trigrams map-side, broadcast-joins the logprob table, and
  * the per-doc mean map-side-combines back to O(docs) rows before the only
  * exchange. Global smoothing constants (N, V, the unseen-gram logprob)
  * ride along as ONE broadcast stats row. A byte-level trigram variant
  * (vocabulary ≤ 2²⁴ by construction) is the drop-in if a corpus's
  * charset cannot be trusted.
  */
object CharLm {

  /** Character trigrams of the lower-cased text (no other normalization —
    * whitespace and punctuation are signal for a quality LM). Empty array
    * below 3 characters. The let-binding keeps `lower` evaluated once. */
  def charTrigrams(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Text.let(lower(text)) { t =>
      when(length(t) >= 3,
        transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
        .otherwise(array().cast("array<string>"))
    }

  /** The additive model artifact: trigram occurrence counts over `train`.
    * Map-side combined; merge refreshes by unioning delta counts and
    * re-summing (see [[mergeCounts]]). */
  def trigramCounts(train: DataFrame): DataFrame =
    train
      .select(explode(charTrigrams(col("text"))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))

  /** Fold a delta corpus's counts into a persisted counts artifact —
    * additive, so history is never re-scanned. */
  def mergeCounts(counts: DataFrame, delta: DataFrame): DataFrame =
    counts.unionByName(trigramCounts(delta))
      .groupBy(col("gram")).agg(sum(col("cnt")).as("cnt"))

  /** Score `docs` against a counts artifact: per-document mean negative
    * log-likelihood under the add-α trigram model, and the perplexity it
    * exponentiates to. Out-of-model trigrams get the unseen-gram mass
    * α / (N + α·(V+1)) — the +1 reserves one smoothing slot for the
    * entire unseen tail, so every logprob is well-defined on any corpus.
    *
    * Output: (doc_id, n_grams, avg_nll, ppl), docs with ≥1 trigram only.
    * `ppl` is exponentiated from the ROUNDED avg_nll so engine-order sum
    * drift cannot leak through the exp amplification. */
  def scoreDocs(docs: DataFrame, counts: DataFrame,
      alpha: Double = 0.5): DataFrame = {
    val stats = counts.agg(
      sum(col("cnt")).cast("double").as("n"),
      count(lit(1)).cast("double").as("v"))
    val model = counts.crossJoin(broadcast(stats))
      .select(col("gram"),
        log((col("cnt") + alpha) / (col("n") + (col("v") + 1) * alpha)).as("logp"))
    val unseen = stats.select(
      log(lit(alpha) / (col("n") + (col("v") + 1) * alpha)).as("logp_unseen"))
    docs
      .select(col("doc_id"), explode(charTrigrams(col("text"))).as("gram"))
      .join(broadcast(model), Seq("gram"), "left")
      .crossJoin(broadcast(unseen))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        round(-avg(coalesce(col("logp"), col("logp_unseen"))), 4).as("avg_nll"))
      .withColumn("ppl", round(exp(col("avg_nll")), 4))
  }

  /** Train-on-reference, score-everything composition: the CCNet stage.
    * `reference` picks the in-domain training slice (e.g. lang = 'en');
    * off-domain documents surface as the high-perplexity tail. */
  def perplexityAgainst(docs: DataFrame, reference: DataFrame,
      alpha: Double = 0.5): DataFrame =
    scoreDocs(docs, trigramCounts(reference), alpha)

  /** The gate stage: keep documents whose NLL under the reference LM is
    * at-or-below their stratum's `q`-quantile — per-stratum thresholds
    * broadcast back, filter map-side (the gateByQuantile shape; swap the
    * exact `percentile` for approx_percentile's mergeable GK sketch when
    * strata are corpus-sized). Threshold compares ROUNDED values so both
    * engines select the identical row set. */
  def gate(docs: DataFrame, reference: DataFrame, stratumCol: String,
      q: Double = 0.5, alpha: Double = 0.5): DataFrame = {
    val scored = scoreDocs(docs, trigramCounts(reference), alpha)
      .join(docs.select(col("doc_id"), col(stratumCol)), "doc_id")
    val thr = scored.groupBy(col(stratumCol))
      .agg(round(expr(s"percentile(avg_nll, $q)"), 4).as("thr"))
    scored.join(broadcast(thr), stratumCol)
      .filter(col("avg_nll") <= col("thr"))
      .select(col("doc_id"), col(stratumCol), col("avg_nll"), col("thr"))
  }
}
