package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Multinomial Naive Bayes: smoothed log-probs verified against the
  * hand-computed textbook formula, argmax prediction, OOV skipping,
  * dense-grid smoothing for unseen (label, term) cells, and label-order
  * tie-breaking. */
class NaiveBayesSpec extends SparkSpec {

  import spark.implicits._

  // label en: "the cat sat", "the dog sat"  → tokens: the×2 cat sat×2 dog
  // label fr: "le chat", "le chien"         → tokens: le×2 chat chien
  private lazy val train = Seq(
    (1L, "en", "the cat sat"), (2L, "en", "the dog sat"),
    (3L, "fr", "le chat"), (4L, "fr", "le chien"))
    .toDF("doc_id", "lang", "text")

  private lazy val m = NaiveBayes.model(train, "lang", "text").cache()
  private lazy val p = NaiveBayes.priors(train, "lang")

  private def logp(label: String, term: String): Double =
    m.filter(col("label") === label && col("term") === term)
      .head().getAs[Double]("logp")

  private def close(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-6

  test("model matches the hand-computed add-one-smoothed formula") {
    // vocab = {the, cat, sat, dog, le, chat, chien} → V = 7
    // en totals: 6 tokens; fr totals: 4 tokens
    assert(close(logp("en", "the"), math.log(3.0 / 13)))
    assert(close(logp("en", "cat"), math.log(2.0 / 13)))
    assert(close(logp("fr", "le"), math.log(3.0 / 11)))
  }

  test("model is dense: cross-label unseen terms carry the smoothed penalty") {
    // 'le' never appears under en — still present with count-0 smoothing
    assert(close(logp("en", "le"), math.log(1.0 / 13)))
    assert(m.count() == 14) // 2 labels × 7 vocabulary terms, full grid
  }

  test("priors are document-frequency log shares") {
    val pri = p.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(close(pri("en"), math.log(0.5)))
    assert(pri("fr") == pri("en"))
  }

  test("predict recovers the training labels and skips OOV terms") {
    val docs = Seq(
      (10L, "the cat UNSEEN-TOKEN"),   // OOV token must not affect the score
      (11L, "le chien"))
      .toDF("doc_id", "text")
    val out = NaiveBayes.predict(docs, m, p, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "en", 11L -> "fr"))

    // same doc without the OOV token scores identically
    val clean = NaiveBayes.predict(
      Seq((10L, "the cat")).toDF("doc_id", "text"), m, p, "doc_id", "text")
      .head().getAs[Double]("score")
    val noisy = NaiveBayes.predict(docs, m, p, "doc_id", "text")
      .filter(col("doc_id") === 10L).head().getAs[Double]("score")
    assert(clean == noisy)
  }

  test("doc with zero in-vocabulary tokens yields no prediction row") {
    val out = NaiveBayes.predict(
      Seq((20L, "zzz qqq")).toDF("doc_id", "text"), m, p, "doc_id", "text")
    assert(out.count() == 0)
  }

  test("exact score ties break on label order, deterministically") {
    // symmetric corpus: both labels see exactly the same token profile, so
    // every candidate scores identically → the smaller label must win
    val sym = Seq((1L, "aa", "x y"), (2L, "bb", "x y")).toDF("doc_id", "lang", "text")
    val out = NaiveBayes.trainPredict(sym, Seq((9L, "x")).toDF("doc_id", "text"),
      "lang", "doc_id", "text")
    assert(out.head().getString(1) == "aa")
  }

  test("trainPredict on the sf fixture is total, single-winner, in-label-set") {
    // the synthetic corpus draws the SAME token distribution for every
    // lang, so label accuracy is not a meaningful target here (separable-
    // data accuracy is covered by the hand fixtures above); what must hold
    // structurally: every document gets exactly one prediction (all share
    // the common vocabulary), labels come from the training set, and
    // log-scores are strictly negative
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val preds = NaiveBayes.trainPredict(
      docs.filter(graft.operators.Sampling.hashBucket(col("doc_id")) < 90),
      docs, "lang", "doc_id", "text").cache()
    assert(preds.count() == docs.count())
    assert(preds.select(col("doc_id")).distinct().count() == docs.count())
    val langs = docs.select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    assert(preds.select(col("pred_label")).distinct()
      .collect().map(_.getString(0)).toSet.subsetOf(langs))
    assert(preds.filter(col("score") >= 0).count() == 0)
  }
}
