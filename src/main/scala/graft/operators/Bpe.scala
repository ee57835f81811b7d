package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.lake.Tables

/** Byte-pair-encoding merge learning — training the tokenizer itself on
  * the corpus, the step upstream of every token-count column in this
  * engine. Classic algorithm (Sennrich et al. 2016): represent each word
  * as a symbol sequence (characters to start), repeatedly find the most
  * frequent ADJACENT symbol pair weighted by word frequency, fuse it into
  * a new symbol everywhere, record the merge; the ordered merge list IS
  * the tokenizer.
  *
  * Spark-first shape: the corpus collapses to the WORD-TYPE table (word,
  * count) in one map-side-combined aggregate — Zipf makes this table
  * vocabulary-sized, and a `topW` heavy-hitter cap bounds it outright
  * (standard practice; tail types carry negligible pair mass — the cap is
  * the 100 TB guard, and the coverage loss is the documented trade).
  * Every learn iteration is then two vocabulary-sized operations: a pair
  * census (explode adjacent pairs, sum word counts) and a map-side fold
  * that applies the winning merge to each word's symbol array. Only the
  * single argmax row comes back to the driver per iteration — the same
  * control-plane shape as the Lloyd codebook refinement — and the words
  * relation is localCheckpoint'd each round to keep the plan O(1) in
  * iteration count.
  */
object Bpe {

  /** Word-type table (word, n) over the BPE pre-tokenization, capped to
    * the `topW` most frequent types (count desc, word asc — deterministic). */
  def wordCounts(docs: DataFrame, topW: Int = 100000): DataFrame =
    docs.select(explode(Text.bpeTokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(topW)

  /** Adjacent-pair census over a symbol-array relation (syms, n): every
    * adjacent position counts (overlaps included, as in the reference
    * algorithm's get_stats), weighted by word count. */
  private def pairCensus(words: DataFrame): DataFrame =
    words
      .select(col("n"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("left"), b.as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("n")).as("n_pairs"))

  /** Rank-1 pair census straight off a corpus (symbols = characters),
    * thresholded — the oracle-facing view of the learn loop's first
    * iteration. */
  def charPairCensus(docs: DataFrame, minCount: Long,
      topW: Int = 100000): DataFrame =
    pairCensus(wordCounts(docs, topW)
        .select(split(col("word"), "").as("syms"), col("n")))
      .select(concat(col("left"), col("right")).as("pair"), col("n_pairs"))
      .filter(col("n_pairs") >= minCount)

  /** Fuse one (left, right) pair in a symbol array, greedy left-to-right,
    * non-overlapping — a pure `aggregate` fold, map-side. */
  private def mergeOnce(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === left && s === right,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(element_at(acc, -1), s))))
        .otherwise(concat(acc, array(s))))

  /** Learn `numMerges` BPE merges from a word-type table. Returns the
    * ordered merge list (rank, left, right, merged, n_pairs) — ties on
    * pair frequency break lexicographically, so the learned tokenizer is
    * deterministic on any partitioning. */
  def learnMerges(words: DataFrame, numMerges: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    var syms = words.select(split(col("word"), "").as("syms"), col("n"))
      .localCheckpoint(false)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = pairCensus(syms)
        .orderBy(col("n_pairs").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, l + r, n))
        syms = syms.select(mergeOnce(col("syms"), l, r).as("syms"), col("n"))
          .localCheckpoint(false)
        rank += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "merged", "n_pairs")
  }

  /** Trained merge pairs as a shared artifact: memoized per (session,
    * dir, numMerges) — the [[Dedup.minhashCcLabels]] discipline — so the
    * segment/fertility consumers learn the tokenizer ONCE per corpus
    * instead of each re-running the control-plane loop. The memo holds a
    * tiny driver-side Seq (tokenizers are small by construction); inputs
    * are immutable parquet dirs, so the memo is sound for the one-shot
    * driver and production runs. */
  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), Seq[(String, String)]]()

  def trainedMergePairs(spark: SparkSession, dir: String,
      numMerges: Int): Seq[(String, String)] =
    mergeCache.computeIfAbsent((spark, dir, numMerges), _ =>
      learnMerges(wordCounts(Tables(spark, dir, "documents")), numMerges)
        .orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)

  /** Tokenize with a LEARNED merge list: fold the merges in rank order
    * over each word's character array — the serve path, pure map-side
    * column arithmetic (no join, no state). `merges` is the collected
    * (left, right) list in rank order, driver-side (tokenizers are small
    * by construction). */
  def segment(text: Column, merges: Seq[(String, String)]): Column = {
    val words = Text.bpeTokens(text)
    transform(words, w =>
      merges.foldLeft(split(w, "")) { case (syms, (l, r)) => mergeOnce(syms, l, r) })
  }
}
