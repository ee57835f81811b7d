package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.lake.Tables

/** The end-to-end training-data curation pipeline as ONE declarative
  * composition — what "a user of the reference switching to this library"
  * actually runs daily (BASELINE.json north star):
  *
  *   quality filter → exact dedup → near-dup components → survivors →
  *   deterministic split
  *
  * Every stage is an already-oracled operator; composing them stays a
  * single lazy plan (one scan of the corpus feeds the quality filter and
  * the fingerprint window; the CC stage re-reads only the kept slice).
  * Scale shape: the quality filter is map-side and reaches the scan, the
  * exact-dedup window shuffles by fingerprint, CC is the checkpointed
  * label-propagation of [[Dedup.minhashConnectedComponentsOf]], and the
  * split is a map-side hash — no driver state anywhere. */
object Curate {

  val MinTokens = 5

  /** Per-stratum quantile quality gate: keep rows whose score is at or
    * above their stratum's q-quantile. The threshold table is one tiny
    * row per stratum — aggregated with map-side partials, BROADCAST back,
    * and applied as a map-side filter. Deliberately NOT a per-stratum
    * window `percent_rank` (a stratum is billions of rows at 100 TB and a
    * window means sorting each one); when even the exact percentile
    * aggregate is too heavy, swap it for the mergeable GK sketch
    * (`Relational.approxQuantilesBy`) — the join/filter shape stays. */
  def gateByQuantile(docs: DataFrame, score: Column, strata: String,
      q: Double): DataFrame = {
    val scored = docs.withColumn("score", score)
    val thresholds = scored.groupBy(col(strata))
      .agg(round(percentile(col("score"), lit(q)), 4).as("thr"))
    scored.join(broadcast(thresholds), strata)
      .filter(col("score") >= col("thr"))
  }

  /** Per-source (domain) reputation: each source's doc count and mean
    * quality score, flagged `keep` when the source's mean is at or above
    * the corpus-wide mean — the domain-blocklist stage of web-corpus
    * curation (a spam farm drags its whole domain under the bar).
    *
    * Scale shape: the per-doc score is map-side, the per-source stats are
    * ONE map-side-combined hash agg (sources ≪ docs), and the corpus-wide
    * mean is a single-row aggregate attached by broadcast cross join — the
    * same normalizer shape as `Sampling.temperatureWeights`. Both means are
    * rounded to 4 decimals BEFORE the comparison so the keep flag is
    * reproducible across engines (sum-order ulp differences can't flip it
    * unless the true value sits exactly on a rounding boundary). */
  def sourceReputation(docs: DataFrame, score: Column): DataFrame = {
    val scored = docs.select(col("source"), score.as("s"))
    val stats  = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), avg(col("s")).as("avg_s"))
    val global = scored.agg(avg(col("s")).as("global_s"))
    stats.crossJoin(broadcast(global))
      .select(col("source"), col("n_docs"),
        round(col("avg_s"), 4).as("avg_score"),
        (round(col("avg_s"), 4) >= round(col("global_s"), 4)).as("keep"))
  }

  /** The gate output: documents from reputable sources only. The kept
    * source list is tiny (it is a subset of the stats table) so it joins
    * as a BROADCAST semi join — the corpus is never shuffled. */
  def gateBySource(docs: DataFrame, score: Column): DataFrame = {
    val kept = sourceReputation(docs, score)
      .filter(col("keep")).select(col("source"))
    docs.join(broadcast(kept), Seq("source"), "left_semi")
  }

  def curate(spark: SparkSession, dir: String, ccIterations: Int = 3): DataFrame = {
    val quality = Tables(spark, dir, "documents")
      .withColumn("n_tokens", Text.tokenCount(col("text")))
      .filter(col("n_tokens") >= MinTokens)
    // exact dedup: min-id survivor per normalized fingerprint
    val kept = quality
      .withColumn("fingerprint", Text.fingerprint(col("text")))
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(col("fingerprint"))))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"))
    // near-dup components over the exact-deduped corpus; survivors are
    // their own representative (MinTokens >= 5 guarantees shingles exist,
    // so every kept doc has a label)
    val cc = Dedup.minhashConnectedComponentsOf(
      kept.select(col("doc_id"), col("text")), ccIterations)
    kept.join(cc, "doc_id")
      .filter(col("cluster_id") === col("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        Sampling.hashBucket(col("doc_id")).as("bucket"))
      .withColumn("split", Sampling.splitExpr(col("bucket")))
  }
}
