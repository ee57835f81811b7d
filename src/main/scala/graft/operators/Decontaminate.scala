package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Benchmark decontamination: find (and drop) training documents that share
  * word n-grams with an evaluation/benchmark set, so the training corpus
  * does not memorize the test questions. The standard pre-training hygiene
  * step alongside dedup — n is typically 8..13 for natural text; the query
  * registry uses 5 on the short synthetic documents so the overlap signal
  * is near-exact-passage, not common-phrase, noise.
  *
  * Scale shape: the benchmark side is SMALL by construction (benchmarks are
  * megabytes; the corpus is the 100 TB side), so its distinct gram set is
  * broadcast and the corpus is probed map-side — the corpus is never
  * shuffled. Only the matched (doc_id, gram) pairs — a tiny fraction —
  * reach the aggregation shuffle.
  */
object Decontaminate {

  /** Exploded (doc_id, gram) rows — map-side only, duplicates kept: a
    * distinct here would shuffle the WHOLE corpus on (doc_id, gram);
    * instead the post-join countDistinct absorbs within-doc repeats, so
    * only matched rows ever reach an exchange. */
  private def grams(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), explode(Text.shingles(col("text"), n)).as("gram"))

  /** Contamination audit: for each training doc sharing at least one
    * n-gram with the benchmark set, how many distinct grams and distinct
    * benchmark docs it collides with. */
  def contaminationReport(train: DataFrame, benchmark: DataFrame, n: Int): DataFrame =
    grams(train, n)
      .join(broadcast(
        grams(benchmark, n).withColumnRenamed("doc_id", "bench_id").distinct()), "gram")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))

  /** The pipeline output: training docs with NO benchmark n-gram overlap.
    * Broadcast anti-join on the gram set — map-side, corpus unshuffled. */
  def clean(train: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    val benchGrams = broadcast(grams(benchmark, n).select(col("gram")).distinct())
    val contaminated = grams(train, n)
      .join(benchGrams, "gram")
      .select(col("doc_id")).distinct()
    // the contaminated-id list is bounded by the TRAIN side (widespread
    // contamination is possible), so no forced broadcast here — AQE
    // picks a broadcast anti-join when the list turns out small and a
    // shuffled one when it doesn't
    train.join(contaminated, Seq("doc_id"), "left_anti")
  }
}
