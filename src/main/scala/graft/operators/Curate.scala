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

  /** The eight required-stopword markers of the Gopher rule set. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * §A1.1 text-quality heuristics — public knowledge; the reference's
    * notebooks filter rows only by literal column predicates,
    * `/root/reference/pyspark-2.ipynb:386`). Per document: the raw rule
    * statistics, each rule's boolean, and the conjunction `passes` — the
    * standard pre-training hygiene screen beyond composite scores.
    *
    * Rules (thresholds on the ROUNDED 4-dp ratios so both engines gate
    * the same value): word count in [50, 100000]; mean word length in
    * [3, 10]; symbol-to-word ratio (# or …) ≤ 0.1; ≤ 90% of lines start
    * with a bullet; ≤ 30% of lines end with an ellipsis; ≥ 80% of words
    * contain an alphabetic character; ≥ 2 distinct required stopwords.
    *
    * Scale shape: pure map-side projection over let-bound token/line
    * arrays — one scan, no shuffle, no UDF; every count is an integer and
    * every ratio a rounded exact quotient, so the report is
    * layout-invariant and cross-engine deterministic. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val words = Text.tokens(text)
    val lines = split(text, "\n")
    val nWords = size(words)
    val nLines = size(lines)
    val wordChars = aggregate(transform(words, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val symbols = Text.matchCount(text, "#|\\.\\.\\.")
    val bulletLines = size(filter(lines, l => ltrim(l).rlike("^[-*•]")))
    val ellipsisLines = size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$")))
    val alphaWords = size(filter(words, w => w.rlike("[a-zA-Z]")))
    val stopHits = size(array_intersect(array_distinct(words),
      array(GopherStopwords.map(lit): _*)))
    docs.select(col(idCol).as("doc_id"),
        nWords.cast("long").as("n_words"),
        round(wordChars / nWords.cast("double"), 4).as("mean_word_len"),
        round(symbols / nWords.cast("double"), 4).as("symbol_ratio"),
        round(bulletLines / nLines.cast("double"), 4).as("bullet_ratio"),
        round(ellipsisLines / nLines.cast("double"), 4).as("ellipsis_ratio"),
        round(alphaWords / nWords.cast("double"), 4).as("alpha_ratio"),
        stopHits.cast("long").as("stopword_hits"))
      .withColumn("passes",
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_ratio") <= 0.9 &&
          col("ellipsis_ratio") <= 0.3 &&
          col("alpha_ratio") >= 0.8 &&
          col("stopword_hits") >= 2)
  }

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
  /** Leave-one-source-out ablation — first-order data valuation at the
    * source granularity: for each source, the corpus-level metric
    * recomputed WITHOUT that source's documents, and the delta it
    * induces. A strongly positive delta means the source was dragging
    * the metric down (ablation candidate); the sign convention is
    * (without − full). This is the cheap end of the Shapley spectrum —
    * S ablations from ONE census, no retraining, no resampling.
    *
    * metric must be integral per doc (token counts, char counts): the
    * per-source sums are then exact, each reported mean is a single
    * integer ratio, and the delta subtracts the two ROUNDED means. One
    * corpus scan; the S-row census cross-joins a one-row broadcast
    * total. A single-source corpus leaves mean_without undefined → null
    * (not an error). */
  def sourceAblation(docs: DataFrame, metric: Column): DataFrame = {
    val per = docs.select(col("source"), metric.cast("long").as("m"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("m")).as("sum_m"))
    val tot = per.agg(sum(col("n_docs")).as("n_all"),
      sum(col("sum_m")).as("sum_all"))
    per.crossJoin(broadcast(tot))
      .withColumn("mean_full",
        round(col("sum_all").cast("double") / col("n_all"), 6))
      .withColumn("mean_without",
        when(col("n_all") === col("n_docs"), lit(null).cast("double"))
          .otherwise(round((col("sum_all") - col("sum_m")).cast("double")
            / (col("n_all") - col("n_docs")), 6)))
      .select(col("source"), col("n_docs"), col("mean_full"),
        col("mean_without"),
        round(col("mean_without") - col("mean_full"), 6).as("delta"))
  }

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
    // so every kept doc has a label). ccIterations <= 0 selects the
    // FIXPOINT-CERTIFIED form (iterate to zero label changes — the
    // production setting; a fixed k is the oracle-replay surface)
    val cc =
      if (ccIterations <= 0)
        Dedup.minhashConnectedComponentsCertifiedOf(
          kept.select(col("doc_id"), col("text")))
      else Dedup.minhashConnectedComponentsOf(
        kept.select(col("doc_id"), col("text")), ccIterations)
    kept.join(cc, "doc_id")
      .filter(col("cluster_id") === col("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        Sampling.hashBucket(col("doc_id")).as("bucket"))
      .withColumn("split", Sampling.splitExpr(col("bucket")))
  }

  /** Quantile normalization of an INTEGER metric across groups (the
    * microarray-normalization classic, Bolstad et al. 2003, adapted to
    * corpus sources): every value is replaced by the POOLED
    * distribution's value at the same within-group quantile — all
    * groups are mapped onto the same pooled reference distribution.
    * (EQUAL-size groups end up with identical marginals; UNEQUAL groups
    * sample the pooled grid at different integer positions, so their
    * post-normalization marginals agree in shape but not element-wise —
    * the floor-index trade documented in CurateSpec's unequal-size
    * case.) The source-bias killer for length/quality features feeding a mixer
    * ([[Sampling.temperatureWeights]]) or a quality gate.
    *
    * Determinism discipline, all-integer: within-group rank r (window
    * PARTITIONED by group, ties by id), pooled target position
    * idx = 1 + (r−1)(N−1) div (n_g−1) (nearest-rank-below, EXACT `div`
    * — no float index at any N; a singleton group maps to the pooled
    * median position), and the pooled value comes from the pooled
    * DISTINCT-VALUE census: cum ranges [lo, hi] per value (banded
    * prefixes via [[Sampling.orderedCensusCumsum]]), idx∈[lo,hi]
    * resolved by a BROADCAST range join — census-sized, never
    * corpus × corpus. */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("grp"),
      col(idCol).as("id"), col(valueCol).cast("long").as("v"))
    val nRow = base.agg(count(lit(1)).as("n_total"))
    val ranked = base
      .withColumn("r", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))))
      .withColumn("n_g", count(lit(1)).over(Window.partitionBy(col("grp"))))
    // banded cum ranges over the pooled distinct-value census
    // (Sampling.orderedCensusCumsum): the value domain is integer but
    // not bounded, so the prefix never crosses one sort task
    val census = Sampling.orderedCensusCumsum(
        base.groupBy(col("v").as("pv")).agg(count(lit(1)).as("cnt")),
        col("pv"), weights = Seq("cnt" -> col("cnt")))
      .withColumn("lo", col("cum_cnt") + 1)
      .withColumn("hi", col("cum_cnt") + col("cnt"))
      .select(col("pv"), col("lo"), col("hi"))
    ranked.crossJoin(broadcast(nRow))
      .withColumn("qnum", (col("r") - 1) * (col("n_total") - 1))
      .withColumn("qden", greatest(col("n_g") - 1, lit(1L)))
      .withColumn("idx",
        when(col("n_g") === 1, lit(1L) + expr("(n_total - 1) div 2"))
          .otherwise(lit(1L) + expr("qnum div qden")))
      .join(broadcast(census),
        col("idx") >= col("lo") && col("idx") <= col("hi"))
      .select(col("id").as(idCol), col("grp").as(groupCol),
        col("v").as(valueCol), col("pv").as("qn_value"))
  }
}
