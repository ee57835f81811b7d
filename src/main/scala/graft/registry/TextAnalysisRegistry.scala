package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.lake.{Ingest, LakePaths, Readers, Tables, Writers}
import graft.operators._
import graft.streaming.{Alerts, Funnel, Sessions}
import RegistryShared._

/** Registry slice — text analysis: tokenization, quality, language-ID, PII, chunking, BPE, retrieval, LM scoring.
  * Split out of SparkEntry (same conventions; see SparkEntry scaladoc). */
object TextAnalysisRegistry {

  /** Merge count for the oracled BPE apply path — small so the oracle's
    * unrolled CTE chain stays readable, large enough that multi-char
    * symbols feed later merges (merge 6 fuses 'm'+'er' at this SF). */
  private val BpeOracleMerges = 6

  private def trainedMerges(s: SparkSession, d: String): Seq[(String, String)] =
    Bpe.trainedMergePairs(s, d, BpeOracleMerges)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- text analysis (north star)
    "q_token_count" -> ((s, d) =>
      Tables(s, d, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"))),
    // Count-Min sketch build + probe vs the exact census: per-token
    // estimate is min over d=3 md5-row counters of w=16 buckets (small w
    // on purpose — the 31-token vocab forces real collisions so the
    // overcount column exercises the ≥-exact guarantee, not just zeros)
    "q_cms" -> ((s, d) => {
      val toks = Tables(s, d, "documents")
        .select(explode(Text.tokens(col("text"))).as("token"))
      val exact = toks.groupBy(col("token").as("item"))
        .agg(count(lit(1)).as("exact_count"))
      Sketches.cmsEstimate(Sketches.cmsBuild(toks, "token", 3, 16),
          toks, "token", 3, 16)
        .join(exact, "item")
        .select(col("item").as("token"), col("exact_count"),
          col("cms_count"),
          (col("cms_count") - col("exact_count")).as("overcount"))
    }),
    "q_token_count_bpe" -> ((s, d) =>
      Tables(s, d, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens_ws"),
        Text.bpeTokenCount(col("text")).as("n_tokens_bpe"))),
    // tokenizer fertility per language — the token-budget planning read
    // (chars per BPE token = compression ratio, BPE tokens per word =
    // fertility): one map-side projection + one lang-sized agg, exact
    // integer sums divided once
    "q_token_fertility" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("lang"), length(col("text")).cast("long").as("nc"),
          Text.bpeTokenCount(col("text")).cast("long").as("nb"),
          Text.tokenCount(col("text")).cast("long").as("nw"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("nc")) / sum(col("nb")).cast("double"), 4)
            .as("chars_per_token"),
          round(sum(col("nb")) / sum(col("nw")).cast("double"), 4)
            .as("tokens_per_word"))),
    "q_text_quality" -> ((s, d) => {
      val feats = Text.qualityFeatures(col("text")).map { case (n, c) => c.as(n) }
      Tables(s, d, "documents").select(col("doc_id") +: feats: _*)
    }),
    "q_lang_id" -> ((s, d) => {
      val scores = Text.languageScores(col("text"))
      Tables(s, d, "documents").select(col("doc_id"), col("lang"),
        scores("en").as("s_en"), scores("fr").as("s_fr"), scores("es").as("s_es"),
        scores("de").as("s_de"), scores("zh").as("s_zh"),
        Text.predictedLanguage(col("text")).as("predicted"))
    }),
    // BPE tokenizer training, first-iteration view: adjacent char-pair
    // census weighted by word-type frequency — the argmax row is merge #1;
    // the full learn loop is unit-goldened (not SQL-expressible)
    "q_bpe_pairs" -> ((s, d) =>
      Bpe.charPairCensus(Tables(s, d, "documents"), 20)),
    // BPE APPLY at scale (round-10): learn BpeOracleMerges merges on the
    // word-type table (driver-side control plane, Lloyd shape), then
    // segment every document with the trained merge list — pure map-side
    // column arithmetic. The oracle replays the ENTIRE learn+apply loop
    // as an unrolled greedy-merge CTE chain (bpeUnrollSql), so the
    // trained tokenizer itself is cross-engine-certified, not just its
    // first-round census
    "q_bpe_segment" -> ((s, d) => {
      // the merge fold is INTERPRETED per-row compute (HOF chain, no
      // codegen): spread the corpus across the executor cores first —
      // a small-sf parquet arrives as ONE scan partition, which would
      // serialize the whole apply onto one core (the 100 TB layout has
      // many files and never hits this; the repartition costs one
      // text-sized exchange and models the real cluster parallelism)
      val docs = Tables(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val segs = Bpe.segment(col("text"), trainedMerges(s, d))
      docs.select(col("doc_id"),
        size(flatten(segs)).cast("long").as("n_tokens_trained"),
        Text.bpeTokenCount(col("text")).cast("long").as("n_words"))
    }),
    // tokenizer fertility from REAL trained segments (q_token_fertility
    // is the cheap regex-proxy screen; this is the true planning number)
    "q_bpe_fertility" -> ((s, d) => {
      // same CPU-bound-apply repartition as q_bpe_segment
      val docs = Tables(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val segs = Bpe.segment(col("text"), trainedMerges(s, d))
      docs.select(col("lang"),
          length(col("text")).cast("long").as("nc"),
          size(flatten(segs)).cast("long").as("nb"),
          Text.tokenCount(col("text")).cast("long").as("nw"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("nc")) / sum(col("nb")).cast("double"), 4)
            .as("chars_per_token"),
          round(sum(col("nb")) / sum(col("nw")).cast("double"), 4)
            .as("tokens_per_word"))
    }),
    // char-trigram LM perplexity (the CCNet-style quality filter): model
    // trained on the en slice, every doc scored against it — the off-
    // domain tail surfaces as high ppl. Charset-bounded model broadcast;
    // scoring is map-side explode + broadcast join, O(docs) exchange
    "q_lm_score" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      CharLm.perplexityAgainst(docs, docs.filter(col("lang") === "en"))
    }),
    // keep docs at-or-below their language's median NLL — per-lang
    // thresholds broadcast back, filter map-side
    "q_lm_gate" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      CharLm.gate(docs, docs.filter(col("lang") === "en"), "lang")
    }),
    "q_fingerprint" -> ((s, d) =>
      Tables(s, d, "documents").select(col("doc_id"),
        Text.fingerprint(col("text")).as("fingerprint"))),
    // repetition metrics — the boilerplate/spam signal quality filters cut on
    "q_text_repetition" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(sum("n").as("n_tokens_total"),
          count(lit(1)).as("n_distinct_tokens"),
          round(count(lit(1)) / sum("n"), 4).as("distinct_ratio"),
          round(max("n") / sum("n"), 4).as("top_token_share"))),

    // doc→chunk split for embedding pipelines: 32-token windows advancing
    // by 24 (8-token overlap); explode is map-side, chunk text derives
    // from the let-bound token array
    "q_chunk_docs" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), explode(Text.chunkSpans(col("text"), 32, 8)).as("c"))
        .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
          col("c.chunk_text").as("chunk_text"))
        .withColumn("n_chunk_tokens", size(split(col("chunk_text"), " ")))),

    // tokenizer-prep: top-V vocabulary by corpus frequency (deterministic
    // count-desc/term tie-break) folded into ONE broadcast row; per-doc
    // out-of-vocabulary rate is then a map-side array filter — the signal
    // that drives vocab-size choice
    // tokenizer design read: cumulative corpus coverage of the df-ranked
    // vocabulary. A web-scale vocab (typos, URLs) is ~10⁹ terms, so the
    // df-descending rank + running mass are BANDED
    // (Sampling.orderedCensusCumsum on count ranges, ties on n sharing a
    // band and breaking by term in-band) — bit-identical to the global
    // `row_number/sum OVER (ORDER BY n DESC, term)` with the term census
    // never funneling through one sort task
    "q_vocab_coverage" -> ((s, d) => {
      val census = Tables(s, d, "documents")
        .select(explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
      graft.operators.Sampling.orderedCensusCumsum(census, col("n"),
          tieBreak = Seq(col("term")), desc = true,
          weights = Seq("n" -> col("n")))
        .select(col("rank").cast("int").as("rank"), col("term"), col("n"),
          round((col("cum_n") + col("n")).cast("double") / col("total_n"), 6)
            .as("coverage"))
    }),
    // boilerplate screen: normalized 40-char prefixes shared by >= 2 docs
    // — the strip-the-header census
    "q_boilerplate" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val total = docs.agg(count(lit(1)).as("n_total"))
      docs.select(substring(trim(lower(col("text"))), 1, 40).as("prefix"))
        .groupBy(col("prefix")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .crossJoin(broadcast(total))
        .select(col("prefix"), col("n_docs"),
          round(col("n_docs").cast("double") / col("n_total"), 6).as("share"))
    }),
    "q_vocab_oov" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val vocab = docs
        .select(explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(20)
        .agg(collect_list(col("term")).as("vocab"))
      docs.crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          Text.let(Text.tokens(col("text"))) { t =>
            round(size(filter(t, x => !array_contains(col("vocab"), x)))
              .cast("double") / size(t), 4)
          }.as("oov_rate"))
    }),
    // inference-serving batch assembly: bucket docs by length band, fill
    // deterministic fixed-size batches within each band, report per-batch
    // padding waste — the dynamic-batching prep that minimizes pad tokens
    "q_length_batches" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("len_bucket")).orderBy(col("doc_id"))
      Tables(s, d, "documents")
        .select(col("doc_id"), Text.tokenCount(col("text")).as("n_tokens"))
        .withColumn("len_bucket", floor(col("n_tokens") / lit(16)).cast("int"))
        .withColumn("batch_id",
          floor((row_number().over(w) - 1) / lit(16)).cast("int"))
        .groupBy(col("len_bucket"), col("batch_id"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("n_tokens")).as("max_tokens"),
          round(lit(1) - sum(col("n_tokens")) /
            (count(lit(1)) * max(col("n_tokens"))).cast("double"), 4)
            .as("pad_frac"))
    }),

    // the dataset card: per-language doc/token counts, mean quality, and
    // exact-uniqueness rate in ONE pass — one fingerprint window + one
    // hash agg, the summary a curation run publishes next to the corpus
    "q_corpus_report" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fingerprint"))
      Tables(s, d, "documents")
        .select(col("lang"), Text.tokenCount(col("text")).as("nt"),
          (Text.markerHits(col("text"), Text.stopwords("en")).cast("double") /
            Text.tokenCount(col("text"))).as("sw"),
          Text.fingerprint(col("text")).as("fingerprint"))
        .withColumn("cnt", count(lit(1)).over(w))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt").cast("long")).as("n_tokens"),
          round(avg(col("nt")), 4).as("avg_tokens"),
          round(avg(col("sw")), 4).as("avg_stopword_ratio"),
          round(avg(when(col("cnt") === 1, 1.0).otherwise(0.0)), 4).as("uniq_rate"))
    }),
    // join-key skew census — the decision input Joins.saltFor turns into
    // a salt factor for Joins.saltedJoin
    "q_skew_report" -> ((s, d) =>
      Joins.skewCensus(Tables(s, d, "events"), "user_id", 20)),

    // fixed-width histogram (binned aggregation): doc length per language
    "q_histogram" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("lang"),
          floor(col("n_chars") / lit(100.0)).cast("int").as("bin"))
        .groupBy(col("lang"), col("bin")).agg(count(lit(1)).as("n"))
        .withColumn("bin_lo", col("bin") * 100)),
    // equi-DEPTH histogram: 5 ~equal-count buckets cut at exact quintile
    // boundaries (rounded to 4, broadcast); assignment is a map-side
    // indicator sum — the heavy-tail-proof twin of q_histogram
    "q_histogram_equidepth" -> ((s, d) =>
      Aggregates.equidepthHistogram(
        Tables(s, d, "lineitem").select(col("l_extendedprice")),
        "l_extendedprice", 5)),
    // gap-filled hourly resample: buckets with no traffic appear as
    // explicit zero rows (grid from the per-type [min,max] span; the raw
    // events are aggregated exactly once)
    "q_resample_gapfill" -> ((s, d) =>
      TimeSeries.resampleGapfill(Tables(s, d, "events"))),
    // pure range join (no equi key), bucketized: hot-hour intervals
    // (self-calibrating p90 census threshold) exploded to hour buckets and
    // BROADCAST; events keyed by their single bucket map-side — the
    // inequality join becomes an equi-join + filter, corpus never shuffled
    "q_range_join" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      TimeSeries.rangeJoinBucketed(TimeSeries.hotIntervals(ev), ev)
    }),
    // LOCF backfill: error events report no value (nulled deterministically
    // here); each user's gap carries the last non-null forward — one
    // running last(ignoreNulls) window, the sessionization plan shape
    "q_locf" -> ((s, d) => {
      val ev = Tables(s, d, "events").select(col("event_id"), col("user_id"),
        col("ts"),
        when(col("event_type") === "error", lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      TimeSeries.locf(ev, "user_id", "ts", "event_id", "v")
        .select(col("event_id"), col("user_id"),
          round(col("filled"), 2).as("v_filled"))
    }),
    // weekly cohort retention matrix: first-event week × active week,
    // distinct users — two user_id-co-partitioned aggregates + one
    // (cohorts × weeks)-bounded fold
    "q_cohort_retention" -> ((s, d) =>
      TimeSeries.cohortRetention(Tables(s, d, "events"))),
    // cumulative per-cohort purchase value by week offset, normalized per
    // cohort member — running window over the cohort-partitioned census
    "q_cohort_ltv" -> ((s, d) =>
      TimeSeries.cohortLtv(Tables(s, d, "events"))),
    // trailing 24 h z-score anomaly flags over the GAP-FILLED series (zero
    // rows keep the frame honest); μ/σ/z rounded before every compare
    "q_anomaly_zscore" -> ((s, d) =>
      TimeSeries.anomalyZscore(Tables(s, d, "events"))),
    // heartbeat-lost report: contiguous >= 2 h zero-traffic runs per type
    // (islands-and-gaps over the gap-filled series)
    "q_silence_report" -> ((s, d) =>
      TimeSeries.silenceReport(Tables(s, d, "events"))),
    // trend / hour-of-day seasonal / residual split of the hourly series
    // (integer-exact: every output is one division of integer terms)
    "q_seasonal_decompose" -> ((s, d) =>
      TimeSeries.seasonalDecompose(Tables(s, d, "events"))),
    // level-shift detector: argmax |CUSUM| per type on the integer-scaled
    // statistic — the rate change the per-bucket z-score cannot see
    "q_changepoint_cusum" -> ((s, d) =>
      TimeSeries.changepointCusum(Tables(s, d, "events"))),
    // DAU / trailing-7d-WAU stickiness: sliding distinct via map-side
    // contribution explode + one distinct per target day (no per-day scan)
    "q_dau_wau" -> ((s, d) =>
      TimeSeries.dauWauStickiness(Tables(s, d, "events"))),
    // signup->purchase latency: integer-second deltas, engine-exact
    // one-row summary (percentiles over longs + integer-ratio mean)
    "q_funnel_time" -> ((s, d) =>
      TimeSeries.funnelTimeToConvert(Tables(s, d, "events"))),
    // finite-horizon EWMA in ONE ordered window — exact-decimal weights,
    // left-associated sum, head renormalization
    "q_ewma" -> ((s, d) =>
      TimeSeries.ewmaSmooth(Tables(s, d, "events"))),
    // trending parts by exponentially decayed demand — anchor folded to
    // one broadcast row, rank window over the item census only
    "q_trending_parts" -> ((s, d) =>
      TimeSeries.decayedDemand(Tables(s, d, "lineitem"))),
    // Theil-Sen robust daily trend — pair expansion over the DAILY
    // census, never the ledger
    "q_theil_sen" -> ((s, d) =>
      TimeSeries.theilSenDailyTrend(Tables(s, d, "events"))),
    // sample ACF at calendar lags 1..7 over the daily census —
    // integer-scaled deviations (CUSUM rule), DECIMAL(38,0)-exact sums,
    // one division at the output
    "q_acf" -> ((s, d) =>
      TimeSeries.autocorrelation(Tables(s, d, "events"), maxLag = 7)),
    // click->purchase lead-lag: CCF at lags -7..7 over the two
    // zero-filled daily series — same integer-scaled discipline
    "q_ccf" -> ((s, d) =>
      TimeSeries.crossCorrelation(Tables(s, d, "events"),
        "click", "purchase", maxLag = 7)),
    // last-touch attribution: purchases claim the latest same-user click
    // within 24 h via ONE ignore-nulls running window (no probe join)
    "q_attribution" -> ((s, d) =>
      TimeSeries.attributionLastTouch(Tables(s, d, "events"))),
    // linear multi-touch attribution — equi-join on user, range residual;
    // credit 1/n is exact per conversion
    "q_attribution_linear" -> ((s, d) =>
      TimeSeries.attributionLinear(Tables(s, d, "events"))),
    // interval-union active time: 5-min activity holds merged by the
    // islands pattern — exact covered seconds per user
    "q_active_time" -> ((s, d) =>
      TimeSeries.activeTime(Tables(s, d, "events"))),
    // daily latency-style percentile series — the p50/p95/p99 dashboard
    // row; exact per-day percentiles (days bound the buffer), GK swap
    // documented in winsorize for corpus-sized groups
    "q_daily_percentiles" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))),
    // P(next event type | current) per-user lead window + types²-bounded
    // fold — the next-action census behind funnel design
    "q_markov_transitions" -> ((s, d) =>
      TimeSeries.markovTransitions(Tables(s, d, "events"))),
    // per-doc char-trigram entropy (the compression-ratio quality proxy:
    // boilerplate/repetitive docs score low): H = ln n − Σc·ln c / n
    // over the per-doc gram census, one rounded output
    "q_char_entropy" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"),
          explode(Text.charNgrams(lower(col("text")), 3)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_grams"),
          round(log(sum(col("c")).cast("double")) -
            sum(col("c") * log(col("c").cast("double"))) /
              sum(col("c")), 4).as("entropy_nats"))),
    // Zipf-law OLS fit over the top-1000 term census: slope ~ -1 is the
    // natural-language signature (one-row corpus-health probe)
    "q_zipf_fit" -> ((s, d) => Retrieval.zipfFit(Tables(s, d, "documents"))),
    // duration-weighted per-user mean: each value holds until the user's
    // next event — the correct mean for irregular sampling
    "q_time_weighted_avg" -> ((s, d) =>
      TimeSeries.timeWeightedAvg(Tables(s, d, "events"),
        "user_id", "ts", "event_id", "value")),
    // linear interpolation of the error-nulled values between each user's
    // neighboring observations (the locf fixture, upgraded)
    "q_interpolate" -> ((s, d) => {
      val ev = Tables(s, d, "events").select(col("event_id"), col("user_id"),
        col("ts"),
        when(col("event_type") === "error", lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      TimeSeries.interpolateLinear(ev, "user_id", "ts", "event_id", "v")
        .select(col("event_id"), col("user_id"),
          round(col("interp"), 4).as("v_interp"))
    }),
    // PII redaction: deterministic synthetic PII (email/SSN/IPv4/phone all
    // derived from doc_id) is appended to a digit-stripped text snippet,
    // then scrubbed by the ordered PiiPatterns chain — exercises every
    // pattern, and the SSN-before-phone ordering, byte-for-byte vs the
    // oracle. Digit-stripping the snippet keeps the only digit runs in the
    // row the injected ones, so both engines face identical match sites.
    "q_pii_redact" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), concat(
          regexp_replace(substring(col("text"), 1, 40), "[0-9]", ""),
          lit(" reach user"), col("doc_id").cast("string"),
          lit("@mail.example.com ssn 123-45-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" ip 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".7 call +1 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("dirty"))
        .select(col("doc_id"), col("dirty"),
          Text.redactPii(col("dirty")).as("redacted"))),

    // JSONL round-trip: write the corpus hand-off format, read it back with
    // an explicit schema (JSON inference = a second full pass), aggregate.
    // Oracle aggregates the source table directly — the round-trip must be
    // lossless for the hashes to meet.
    "q_jsonl_roundtrip" -> ((s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "lang", "text")
      // keyed by application id so concurrent processes on the same
      // checkout cannot clobber each other's round-trip files
      val path = s"target/tmp/jsonl_rt_${s.sparkContext.applicationId}_${new java.io.File(d).getName}"
      Writers.jsonl(docs, path)
      Readers.jsonl(s, path, docs.schema)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("n_chars"))
    }),

    // ORC round-trip: the second columnar format; filter applied on the
    // read-back side pushes into the ORC scan (spec-asserted)
    "q_orc_roundtrip" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
        .select("doc_id", "source", "n_chars")
      val path = s"target/tmp/orc_rt_${s.sparkContext.applicationId}_${new java.io.File(d).getName}"
      Writers.orc(docs, path)
      Readers.orc(s, path)
        .filter(col("n_chars") >= 100)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
    }),
  )

  /** Unrolled greedy BPE learn+apply loop as DuckDB CTEs — an INDEPENDENT
    * formulation of [[Bpe.learnMerges]]+[[Bpe.segment]] (the Spark side
    * is a driver-side argmax loop over HOF folds; this is pure windowed
    * SQL), so the trained tokenizer is cross-engine-certified end to end.
    *
    * Per round k: `c_k` adjacent-pair census (overlaps counted, weighted
    * by word frequency), `m_k` the (freq desc, pair asc) argmax — the
    * learned merge — then greedy LEFT-TO-RIGHT NON-OVERLAPPING apply via
    * run parity: a position is fused iff it starts a candidate pair at an
    * ODD offset within its maximal run of consecutive candidates
    * (consecutive candidates only arise when left = right, where greedy
    * fuses alternate positions); the following position is then consumed
    * (`lag_fused`). MATERIALIZED pins each round to one evaluation — the
    * default inlining re-evaluates the chain per reference and goes
    * exponential in rounds. Validity bound: the word-type cap (100000,
    * matching [[Bpe.wordCounts]]) must not bind at oracle SF, else capped
    * types would drop from the APPLY join (vocab here: 31 types). */
  private def bpeUnrollSql(m: Int): String = {
    val rounds = (1 to m).map { k =>
      val prev = s"r${k - 1}"
      s"""c$k AS MATERIALIZED (
         |  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(n) AS BIGINT) AS np
         |  FROM $prev, unnest(range(1, len(syms))) AS t(i)
         |  GROUP BY 1, 2),
         |m$k AS MATERIALIZED (SELECT l, r FROM c$k ORDER BY np DESC, l, r LIMIT 1),
         |p$k AS (
         |  SELECT word, n, i, syms[i] AS s,
         |    (i < len(syms) AND syms[i] = (SELECT l FROM m$k)
         |       AND syms[i+1] = (SELECT r FROM m$k)) AS cand
         |  FROM $prev, unnest(range(1, len(syms) + 1)) AS t(i)),
         |q$k AS (
         |  SELECT *, CASE WHEN cand THEN i - coalesce(max(CASE WHEN NOT cand THEN i END)
         |      OVER (PARTITION BY word ORDER BY i ROWS UNBOUNDED PRECEDING), 0) END AS run_off
         |  FROM p$k),
         |g$k AS (
         |  SELECT word, n, i,
         |    CASE WHEN fused THEN s || lead_s ELSE s END AS sym, lag_fused
         |  FROM (SELECT word, n, i, s, fused,
         |          lead(s) OVER (PARTITION BY word ORDER BY i) AS lead_s,
         |          coalesce(lag(fused) OVER (PARTITION BY word ORDER BY i), false) AS lag_fused
         |        FROM (SELECT word, n, i, s,
         |                coalesce(cand AND run_off % 2 = 1, false) AS fused FROM q$k))),
         |r$k AS MATERIALIZED (
         |  SELECT word, n, list(sym ORDER BY i) AS syms
         |  FROM g$k WHERE NOT lag_fused GROUP BY word, n)""".stripMargin
    }.mkString(",\n")
    s"""w AS (SELECT unnest(regexp_extract_all(lower(text), '${Text.BpePattern}')) AS word FROM documents),
       |wc AS (SELECT word, count(*) AS n FROM w GROUP BY word ORDER BY n DESC, word LIMIT 100000),
       |r0 AS MATERIALIZED (SELECT word, n, string_split(word, '') AS syms FROM wc),
       |$rounds,
       |dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '${Text.BpePattern}')) AS word FROM documents),
       |seg AS (SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS nt,
       |               CAST(count(*) AS BIGINT) AS nwords
       |        FROM dw JOIN r$m USING (word) GROUP BY doc_id)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q_bpe_segment" ->
      s"""WITH ${bpeUnrollSql(BpeOracleMerges)}
         |SELECT doc_id,
         |  CAST(coalesce(seg.nt, 0) AS BIGINT) AS n_tokens_trained,
         |  CAST(coalesce(seg.nwords, 0) AS BIGINT) AS n_words
         |FROM documents LEFT JOIN seg USING (doc_id)""".stripMargin,
    "q_bpe_fertility" ->
      s"""WITH ${bpeUnrollSql(BpeOracleMerges)},
         |j AS (SELECT d.lang, CAST(length(d.text) AS BIGINT) AS nc,
         |        CAST(coalesce(seg.nt, 0) AS BIGINT) AS nb,
         |        CAST(len(string_split_regex(trim(lower(d.text)), '\\s+')) AS BIGINT) AS nw
         |      FROM documents d LEFT JOIN seg USING (doc_id))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(CAST(sum(nc) AS BIGINT) / CAST(CAST(sum(nb) AS BIGINT) AS DOUBLE), 4) AS chars_per_token,
         |  round(CAST(sum(nb) AS BIGINT) / CAST(CAST(sum(nw) AS BIGINT) AS DOUBLE), 4) AS tokens_per_word
         |FROM j GROUP BY lang""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INTEGER) AS n_tokens
        |FROM documents""".stripMargin,
    // same md5-row/bucket arithmetic as graft_md5_prefix % w — integer
    // end-to-end, so the sketch cells and min-estimates replay exactly
    "q_cms" ->
      s"""WITH toks AS (
         |  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
         |  FROM documents),
         |census AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS cnt
         |  FROM toks GROUP BY token),
         |probes AS (
         |  SELECT token, cnt, j,
         |    (${md5PrefixSqlOf("'cms:' || j || ':' || token", 7)}) % 16
         |      AS bucket
         |  FROM census, (SELECT unnest(range(3)) AS j)),
         |cells AS (
         |  SELECT j, bucket, CAST(sum(cnt) AS BIGINT) AS total
         |  FROM probes GROUP BY 1, 2),
         |est AS (
         |  SELECT p.token, min(c.total) AS cms_count
         |  FROM probes p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
         |  GROUP BY 1)
         |SELECT e.token, census.cnt AS exact_count, e.cms_count,
         |  e.cms_count - census.cnt AS overcount
         |FROM est e JOIN census ON e.token = census.token""".stripMargin,
    "q_token_count_bpe" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INTEGER) AS n_tokens_ws,
         |  CAST(len(regexp_extract_all(lower(text), '${Text.BpePattern}')) AS INTEGER) AS n_tokens_bpe
         |FROM documents""".stripMargin,
    "q_token_fertility" ->
      s"""WITH m AS (
         |  SELECT lang, CAST(length(text) AS BIGINT) AS nc,
         |    CAST(len(regexp_extract_all(lower(text), '${Text.BpePattern}')) AS BIGINT) AS nb,
         |    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS nw
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(CAST(sum(nc) AS BIGINT) / CAST(CAST(sum(nb) AS BIGINT) AS DOUBLE), 4) AS chars_per_token,
         |  round(CAST(sum(nb) AS BIGINT) / CAST(CAST(sum(nw) AS BIGINT) AS DOUBLE), 4) AS tokens_per_word
         |FROM m GROUP BY lang""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  round(length(text) / CAST(len(toks) AS DOUBLE), 4) AS avg_token_len,
        |  round(len(regexp_extract_all(text, '[.,;:!?]')) / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
        |  round(len(regexp_extract_all(text, '[0-9]')) / CAST(length(text) AS DOUBLE), 4) AS digit_ratio,
        |  round(len(list_filter(toks, t -> t IN ('the','a','of','and','is','in','to','it')))
        |    / CAST(len(toks) AS DOUBLE), 4) AS stopword_ratio
        |FROM (SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS toks
        |      FROM documents)""".stripMargin,
    "q_lang_id" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is','in','to','it'))) AS INTEGER) AS s_en,
        |    CAST(len(list_filter(toks, t -> t IN ('le','la','les','de','et','un','une','est'))) AS INTEGER) AS s_fr,
        |    CAST(len(list_filter(toks, t -> t IN ('el','los','las','de','y','un','una','es'))) AS INTEGER) AS s_es,
        |    CAST(len(list_filter(toks, t -> t IN ('der','die','das','und','ein','eine','ist'))) AS INTEGER) AS s_de,
        |    CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS INTEGER) AS s_zh
        |  FROM (SELECT doc_id, lang, text,
        |          string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents))
        |SELECT doc_id, lang, s_en, s_fr, s_es, s_de, s_zh,
        |  CASE
        |    WHEN s_en > 0 AND s_en = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'en'
        |    WHEN s_fr > 0 AND s_fr = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'fr'
        |    WHEN s_es > 0 AND s_es = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'es'
        |    WHEN s_de > 0 AND s_de = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'de'
        |    WHEN s_zh > 0 AND s_zh = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'zh'
        |    ELSE 'und' END AS predicted
        |FROM scored""".stripMargin,
    "q_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '${Text.BpePattern}')) AS word
         |           FROM documents),
         |wc AS (SELECT word, count(*) AS n FROM w GROUP BY word),
         |p AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, n
         |      FROM (SELECT word, n, unnest(range(1, len(word))) AS i FROM wc))
         |SELECT pair, CAST(sum(n) AS BIGINT) AS n_pairs
         |FROM p GROUP BY pair HAVING sum(n) >= 20""".stripMargin,
    // add-α trigram LM replayed end-to-end: counts, smoothing constants,
    // unseen-gram mass, per-doc mean NLL; ppl exponentiates the ROUNDED
    // nll on both sides so sum-order drift can't amplify through exp
    "q_lm_score" ->
      s"""WITH $lmScoreSql
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, avg_nll,
         |  round(exp(avg_nll), 4) AS ppl
         |FROM s""".stripMargin,
    // the CCNet gate stage: keep docs at-or-below their language's median
    // NLL under the reference LM — threshold on the ROUNDED score
    "q_lm_gate" ->
      s"""WITH $lmScoreSql,
         |sl AS (SELECT s.doc_id, d.lang, s.avg_nll
         |       FROM s JOIN documents d ON s.doc_id = d.doc_id),
         |th AS (SELECT lang, round(quantile_cont(avg_nll, 0.5), 4) AS thr
         |       FROM sl GROUP BY lang)
         |SELECT doc_id, lang, avg_nll, thr FROM sl JOIN th USING (lang)
         |WHERE avg_nll <= thr""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin,
    "q_text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS n FROM toks GROUP BY doc_id, token)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens_total,
        |  count(*) AS n_distinct_tokens,
        |  round(count(*) / CAST(sum(n) AS DOUBLE), 4) AS distinct_ratio,
        |  round(max(n) / CAST(sum(n) AS DOUBLE), 4) AS top_token_share
        |FROM tf GROUP BY doc_id""".stripMargin,

    "q_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |           FROM documents),
        |c AS (SELECT doc_id, t,
        |        unnest(range(0, 1 + CAST(ceil(greatest(len(t) - 32, 0) / 24.0) AS INT))) AS chunk_id
        |      FROM t)
        |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
        |  array_to_string(t[chunk_id*24 + 1 : chunk_id*24 + 32], ' ') AS chunk_text,
        |  CAST(len(t[chunk_id*24 + 1 : chunk_id*24 + 32]) AS INTEGER) AS n_chunk_tokens
        |FROM c""".stripMargin,
    "q_histogram" ->
      """SELECT lang, CAST(floor(n_chars / 100.0) AS INTEGER) AS bin,
        |  count(*) AS n,
        |  CAST(floor(n_chars / 100.0) AS INTEGER) * 100 AS bin_lo
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "q_histogram_equidepth" ->
      """WITH b AS (
        |  SELECT round(quantile_cont(l_extendedprice, 0.2), 4) AS b1,
        |         round(quantile_cont(l_extendedprice, 0.4), 4) AS b2,
        |         round(quantile_cont(l_extendedprice, 0.6), 4) AS b3,
        |         round(quantile_cont(l_extendedprice, 0.8), 4) AS b4
        |  FROM lineitem)
        |SELECT CAST((l_extendedprice >= b1) AS INTEGER)
        |     + CAST((l_extendedprice >= b2) AS INTEGER)
        |     + CAST((l_extendedprice >= b3) AS INTEGER)
        |     + CAST((l_extendedprice >= b4) AS INTEGER) AS bucket,
        |  count(*) AS n,
        |  round(min(l_extendedprice), 4) AS lo,
        |  round(max(l_extendedprice), 4) AS hi
        |FROM lineitem, b
        |GROUP BY 1""".stripMargin,
    "q_resample_gapfill" ->
      """WITH counts AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
        |    count(*) AS n_events, round(sum(value), 2) AS total_value
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(bucket_start), max(bucket_start),
        |      INTERVAL '1 hour')) AS bucket_start
        |  FROM counts GROUP BY event_type)
        |SELECT g.event_type, g.bucket_start,
        |  COALESCE(c.n_events, 0) AS n_events,
        |  COALESCE(c.total_value, 0.0) AS total_value
        |FROM grid g LEFT JOIN counts c
        |  ON g.event_type = c.event_type AND g.bucket_start = c.bucket_start""".stripMargin,
    "q_range_join" ->
      """WITH c AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hot_hour,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT round(quantile_cont(n, 0.9), 4) AS thr FROM c),
        |iv AS (
        |  SELECT event_type AS hot_type, hot_hour,
        |         hot_hour - INTERVAL '1 hour' AS iv_start,
        |         hot_hour + INTERVAL '2 hours' AS iv_end
        |  FROM c, t WHERE n >= thr)
        |SELECT iv.hot_type, iv.hot_hour, count(*) AS n_events,
        |  round(sum(e.value), 2) AS total_value
        |FROM iv JOIN events e ON e.ts >= iv.iv_start AND e.ts < iv.iv_end
        |GROUP BY 1, 2""".stripMargin,
    "q_locf" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, user_id,
        |  round(last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS v_filled
        |FROM e""".stripMargin,
    "q_cohort_retention" ->
      """WITH weeks AS (
        |  SELECT user_id, date_trunc('week', ts) AS week FROM events),
        |firsts AS (
        |  SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id)
        |SELECT f.cohort_week, w.week, count(DISTINCT w.user_id) AS n_users,
        |  CAST((epoch(w.week) - epoch(f.cohort_week)) / 604800 AS INTEGER)
        |    AS week_offset
        |FROM (SELECT DISTINCT user_id, week FROM weeks) w
        |JOIN firsts f ON w.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q_cohort_ltv" ->
      """WITH firsts AS (
        |  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
        |  FROM events GROUP BY user_id),
        |sizes AS (
        |  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        |  FROM firsts GROUP BY 1),
        |weekly AS (
        |  SELECT f.cohort_week, date_trunc('week', e.ts) AS week,
        |    CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS wk_cents
        |  FROM events e JOIN firsts f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort_week, week,
        |    CAST(sum(wk_cents) OVER (PARTITION BY cohort_week ORDER BY week
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_cents
        |  FROM weekly)
        |SELECT c.cohort_week,
        |  CAST((epoch(c.week) - epoch(c.cohort_week)) / 604800 AS INTEGER)
        |    AS week_offset,
        |  s.cohort_size, c.cum_cents,
        |  round(CAST(c.cum_cents AS DOUBLE) / (s.cohort_size * 100), 4)
        |    AS ltv_per_user
        |FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week""".stripMargin,
    // the gap-filled series CTEs are q_resample_gapfill's, then one
    // trailing-24 window; mu/sigma/z rounded exactly like the Spark side
    "q_anomaly_zscore" ->
      """WITH counts AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
        |    count(*) AS n_events, round(sum(value), 2) AS total_value
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(bucket_start), max(bucket_start),
        |      INTERVAL '1 hour')) AS bucket_start
        |  FROM counts GROUP BY event_type),
        |filled AS (
        |  SELECT g.event_type, g.bucket_start,
        |    COALESCE(c.n_events, 0) AS n_events
        |  FROM grid g LEFT JOIN counts c
        |    ON g.event_type = c.event_type AND g.bucket_start = c.bucket_start),
        |win AS (
        |  SELECT event_type, bucket_start, n_events,
        |    count(n_events) OVER w AS n_window,
        |    round(avg(n_events) OVER w, 4) AS mu,
        |    round(stddev_pop(n_events) OVER w, 4) AS sigma
        |  FROM filled
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, bucket_start, n_events,
        |  CASE WHEN sigma > 0
        |    THEN round((n_events - mu) / sigma, 4) END AS z,
        |  CASE WHEN sigma > 0
        |    THEN abs(round((n_events - mu) / sigma, 4)) >= 3.0
        |    ELSE n_events <> mu END AS is_anomaly
        |FROM win WHERE n_window = 24""".stripMargin,
    "q_silence_report" ->
      """WITH counts AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(bucket_start), max(bucket_start),
        |      INTERVAL '1 hour')) AS bucket_start
        |  FROM counts GROUP BY event_type),
        |filled AS (
        |  SELECT g.event_type, g.bucket_start,
        |    COALESCE(c.n_events, 0) AS n_events
        |  FROM grid g LEFT JOIN counts c
        |    ON g.event_type = c.event_type AND g.bucket_start = c.bucket_start),
        |flagged AS (
        |  SELECT event_type, bucket_start,
        |    CASE WHEN n_events = 0 THEN 1 ELSE 0 END AS is_zero
        |  FROM filled),
        |edged AS (
        |  SELECT *, CASE WHEN lag(is_zero) OVER w IS NULL
        |      OR lag(is_zero) OVER w <> is_zero THEN 1 ELSE 0 END AS edge
        |  FROM flagged
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start)),
        |runs AS (
        |  SELECT *, sum(edge) OVER (PARTITION BY event_type
        |    ORDER BY bucket_start
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM edged)
        |SELECT event_type, min(bucket_start) AS silence_start,
        |  max(bucket_start) + INTERVAL '1 hour' AS silence_end,
        |  count(*) AS n_buckets
        |FROM runs WHERE is_zero = 1
        |GROUP BY event_type, run_id HAVING count(*) >= 2""".stripMargin,
    "q_seasonal_decompose" ->
      """WITH counts AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(bucket_start), max(bucket_start),
        |      INTERVAL '1 hour')) AS bucket_start
        |  FROM counts GROUP BY event_type),
        |filled AS (
        |  SELECT g.event_type, g.bucket_start,
        |    CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events
        |  FROM grid g LEFT JOIN counts c
        |    ON g.event_type = c.event_type AND g.bucket_start = c.bucket_start),
        |trended AS (
        |  SELECT *, CASE WHEN count(*) OVER w = 25
        |      THEN CAST(sum(n_events) OVER w AS BIGINT) END AS trend_num,
        |    CAST(extract(hour FROM bucket_start) AS INTEGER) AS hod
        |  FROM filled
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
        |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |detr AS (
        |  SELECT *, 25 * n_events - trend_num AS detr_num FROM trended),
        |seasonal AS (
        |  SELECT event_type, hod, CAST(sum(detr_num) AS BIGINT) AS s_num,
        |    CAST(count(*) AS BIGINT) AS s_cnt
        |  FROM detr WHERE trend_num IS NOT NULL GROUP BY 1, 2)
        |SELECT d.event_type, d.bucket_start, d.n_events,
        |  round(CAST(d.trend_num AS DOUBLE) / 25.0, 4) AS trend,
        |  round(CAST(s.s_num AS DOUBLE) / (25.0 * s.s_cnt), 4) AS seasonal,
        |  round(CAST(d.detr_num * s.s_cnt - s.s_num AS DOUBLE)
        |    / (25.0 * s.s_cnt), 4) AS residual
        |FROM detr d LEFT JOIN seasonal s
        |  ON d.event_type = s.event_type AND d.hod = s.hod""".stripMargin,
    "q_changepoint_cusum" ->
      """WITH counts AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(bucket_start), max(bucket_start),
        |      INTERVAL '1 hour')) AS bucket_start
        |  FROM counts GROUP BY event_type),
        |filled AS (
        |  SELECT g.event_type, g.bucket_start,
        |    CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events
        |  FROM grid g LEFT JOIN counts c
        |    ON g.event_type = c.event_type AND g.bucket_start = c.bucket_start),
        |k AS (
        |  SELECT event_type, bucket_start,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY bucket_start) AS BIGINT) AS t_idx,
        |    CAST(sum(n_events) OVER (PARTITION BY event_type
        |      ORDER BY bucket_start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_buckets,
        |    CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS total
        |  FROM filled),
        |scored AS (
        |  SELECT *, n_buckets * cum - t_idx * total AS k_num,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(n_buckets * cum - t_idx * total) DESC,
        |        bucket_start) AS rk
        |  FROM k)
        |SELECT event_type, bucket_start AS cp_bucket,
        |  round(CAST(abs(k_num) AS DOUBLE) / n_buckets, 4) AS cusum_abs,
        |  n_buckets
        |FROM scored WHERE rk = 1""".stripMargin,
    "q_dau_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
        |contrib AS (
        |  SELECT DISTINCT user_id, day + CAST(x AS INTEGER) AS day
        |  FROM ud CROSS JOIN (SELECT unnest(range(7)) AS x)),
        |wau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS wau
        |  FROM contrib GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |  round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
        |FROM dau JOIN wau USING (day)""".stripMargin,
    "q_ewma" -> {
      val ws = (1 to 8).map(j => BigDecimal("0.7").pow(j))
      val lags = (1 to 8).map(j => s"lag(value, $j) OVER w AS x$j")
        .mkString(", ")
      val num = ws.zipWithIndex.map { case (w, i) =>
        s"CASE WHEN x${i + 1} IS NULL THEN 0.0 ELSE x${i + 1} * $w END"
      }.mkString(" + ")
      val den = ws.zipWithIndex.map { case (w, i) =>
        s"CASE WHEN x${i + 1} IS NULL THEN 0.0 ELSE $w END"
      }.mkString(" + ")
      s"""WITH l AS (
         |  SELECT user_id, event_id, value, $lags
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id, event_id, value,
         |  round((value * 1.0 + $num) / (1.0 + $den), 6) AS ewma
         |FROM l""".stripMargin
    },
    "q_trending_parts" ->
      """WITH a AS (SELECT max(l_shipdate) AS anchor FROM lineitem),
        |s AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_obs,
        |    round(sum(pow(2.0,
        |      -date_diff('day', l_shipdate, anchor) / 180.0)), 4) AS decayed
        |  FROM lineitem CROSS JOIN a GROUP BY 1)
        |SELECT l_partkey, n_obs, decayed,
        |  CAST(row_number() OVER (ORDER BY decayed DESC, l_partkey) AS INT)
        |    AS rank
        |FROM s QUALIFY rank <= 100""".stripMargin,
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(day) AS day0 FROM daily),
        |ind AS (
        |  SELECT CAST(date_diff('day', day0, day) AS INT) AS d, cnt
        |  FROM daily CROSS JOIN d0),
        |sl AS (
        |  SELECT CAST(b.cnt - a.cnt AS DOUBLE) / (b.d - a.d) AS slope
        |  FROM ind a JOIN ind b ON a.d < b.d),
        |sr AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    round(quantile_cont(slope, 0.5), 6) AS slope
        |  FROM sl),
        |res AS (
        |  SELECT n_pairs, slope, cnt - slope * d AS resid
        |  FROM ind CROSS JOIN sr)
        |SELECT CAST(count(*) AS BIGINT) AS n_days, n_pairs, slope,
        |  round(quantile_cont(resid, 0.5), 6) AS intercept
        |FROM res GROUP BY 2, 3""".stripMargin,
    "q_acf" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(cnt) AS BIGINT) AS t_sum, min(day) AS day0 FROM daily),
        |ind AS (
        |  SELECT CAST(date_diff('day', day0, day) AS INT) AS d,
        |    CAST(n_days * cnt - t_sum AS HUGEINT) AS dev
        |  FROM daily CROSS JOIN tot),
        |den AS (
        |  SELECT sum(dev * dev) AS den, CAST(count(*) AS BIGINT) AS n_days
        |  FROM ind),
        |lags AS (SELECT CAST(unnest(range(1, 8)) AS INTEGER) AS lag),
        |num AS (
        |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    sum(a.dev * b.dev) AS num
        |  FROM ind a CROSS JOIN lags l JOIN ind b ON a.d + l.lag = b.d
        |  GROUP BY l.lag)
        |SELECT lag, den.n_days AS n_days, n_pairs,
        |  round(CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) AS acf
        |FROM num CROSS JOIN den""".stripMargin,
    "q_ccf" ->
      """WITH daily AS (
        |  SELECT event_type AS et, date_trunc('day', ts) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2),
        |span AS (
        |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
        |  FROM (SELECT min(day) AS mn, max(day) AS mx FROM daily)),
        |fx AS (
        |  SELECT s.day, COALESCE(d.cnt, 0) AS cnt FROM span s
        |  LEFT JOIN daily d ON d.day = s.day AND d.et = 'click'),
        |fy AS (
        |  SELECT s.day, COALESCE(d.cnt, 0) AS cnt FROM span s
        |  LEFT JOIN daily d ON d.day = s.day AND d.et = 'purchase'),
        |tx AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cnt) AS BIGINT) AS t, min(day) AS day0 FROM fx),
        |ty AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cnt) AS BIGINT) AS t, min(day) AS day0 FROM fy),
        |dx AS (
        |  SELECT CAST(date_diff('day', day0, day) AS INT) AS d,
        |    CAST(n * cnt - t AS HUGEINT) AS dev
        |  FROM fx CROSS JOIN tx),
        |dy AS (
        |  SELECT CAST(date_diff('day', day0, day) AS INT) AS d,
        |    CAST(n * cnt - t AS HUGEINT) AS dev
        |  FROM fy CROSS JOIN ty),
        |den AS (
        |  SELECT (SELECT sum(dev * dev) FROM dx) AS sx2,
        |    (SELECT sum(dev * dev) FROM dy) AS sy2),
        |lags AS (SELECT CAST(unnest(range(-7, 8)) AS INTEGER) AS lag)
        |SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(a.dev * b.dev) AS DOUBLE)
        |    / sqrt(CAST(sx2 AS DOUBLE) * CAST(sy2 AS DOUBLE)), 6) AS ccf
        |FROM dx a CROSS JOIN lags l JOIN dy b ON a.d + l.lag = b.d
        |CROSS JOIN den
        |GROUP BY l.lag, sx2, sy2""".stripMargin,
    "q_daily_percentiles" ->
      """SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY 1""".stripMargin,
    // same gram positions (range is [a,b) so len−1 ≡ Spark's inclusive
    // len−2), H folded over the per-doc census
    "q_char_entropy" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(lower(text)) - 1),
        |      i -> substr(lower(text), i, 3))) AS g
        |  FROM documents WHERE length(text) >= 3),
        |c AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  round(ln(CAST(sum(c) AS DOUBLE))
        |    - sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 4) AS entropy_nats
        |FROM c GROUP BY doc_id""".stripMargin,
    "q_funnel_time" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS start_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, s.start_ts, min(e.ts) AS conv_ts
        |  FROM events e JOIN s USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= s.start_ts
        |  GROUP BY 1, 2),
        |d AS (
        |  SELECT CAST(floor(epoch(conv_ts)) AS BIGINT)
        |    - CAST(floor(epoch(start_ts)) AS BIGINT) AS delta_sec
        |  FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  round(quantile_cont(delta_sec, 0.25), 4) AS p25,
        |  round(quantile_cont(delta_sec, 0.5), 4) AS p50,
        |  round(quantile_cont(delta_sec, 0.75), 4) AS p75,
        |  round(quantile_cont(delta_sec, 0.9), 4) AS p90,
        |  round(CAST(sum(delta_sec) AS DOUBLE) / count(*), 4) AS avg_sec
        |FROM d""".stripMargin,
    "q_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts, event_type FROM events
        |  WHERE event_type IN ('purchase', 'click')),
        |t AS (
        |  SELECT *, last_value(CASE WHEN event_type = 'click' THEN ts END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
        |  FROM e)
        |SELECT event_id, user_id, ts AS conv_ts,
        |  CASE WHEN last_touch >= ts - INTERVAL 24 HOUR
        |    THEN last_touch END AS touch_ts,
        |  COALESCE(last_touch >= ts - INTERVAL 24 HOUR, FALSE) AS attributed
        |FROM t WHERE event_type = 'purchase'""".stripMargin,
    "q_attribution_linear" ->
      """WITH t AS (
        |  SELECT user_id, event_id AS touch_event_id, ts AS touch_ts
        |  FROM events WHERE event_type = 'click'),
        |c AS (
        |  SELECT user_id, event_id AS conv_event_id, ts AS conv_ts
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT c.user_id, c.conv_event_id, t.touch_event_id
        |  FROM c JOIN t ON c.user_id = t.user_id
        |  WHERE t.touch_ts <= c.conv_ts
        |    AND t.touch_ts > c.conv_ts - INTERVAL 24 HOUR),
        |cr AS (
        |  SELECT user_id, touch_event_id,
        |    1.0 / (count(*) OVER (PARTITION BY conv_event_id)) AS credit
        |  FROM m)
        |SELECT user_id, touch_event_id,
        |  CAST(count(*) AS BIGINT) AS n_conversions,
        |  round(sum(credit), 6) AS credit
        |FROM cr GROUP BY 1, 2""".stripMargin,
    "q_active_time" ->
      """WITH pts AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |m AS (
        |  SELECT *, max(sec + 300) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
        |  FROM pts),
        |e AS (
        |  SELECT *, CASE WHEN prev_max_end IS NULL OR sec > prev_max_end
        |    THEN 1 ELSE 0 END AS edge
        |  FROM m),
        |isl AS (
        |  SELECT *, sum(edge) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM e),
        |cov AS (
        |  SELECT user_id, island, max(sec) + 300 - min(sec) AS covered
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(covered) AS BIGINT) AS active_seconds
        |FROM cov GROUP BY 1""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH d AS (
        |  SELECT user_id, value,
        |    epoch(lead(ts, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) - epoch(ts) AS dur
        |  FROM events)
        |SELECT user_id,
        |  round(sum(value * dur) / sum(dur), 4) AS twa,
        |  count(*) AS n_intervals
        |FROM d WHERE dur IS NOT NULL GROUP BY user_id""".stripMargin,
    "q_interpolate" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events),
        |a AS (
        |  SELECT event_id, user_id, ts, v,
        |    last_value(v IGNORE NULLS) OVER back AS v0,
        |    last_value(CASE WHEN v IS NOT NULL THEN epoch(ts) END IGNORE NULLS)
        |      OVER back AS t0,
        |    first_value(v IGNORE NULLS) OVER fwd AS v1,
        |    first_value(CASE WHEN v IS NOT NULL THEN epoch(ts) END IGNORE NULLS)
        |      OVER fwd AS t1
        |  FROM e
        |  WINDOW back AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fwd AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        |  round(CASE
        |    WHEN v IS NOT NULL THEN v
        |    WHEN v0 IS NOT NULL AND v1 IS NOT NULL AND t1 <> t0
        |      THEN v0 + (v1 - v0) * (epoch(ts) - t0) / (t1 - t0)
        |    WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN v0
        |    END, 4) AS v_interp
        |FROM a""".stripMargin,
    "q_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type, lead(event_type, 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type, next_type, count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        |  round(n / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 4)
        |    AS p
        |FROM c""".stripMargin,
    "q_zipf_fit" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |top AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok WHERE term <> '' GROUP BY 1
        |  ORDER BY cnt DESC, term LIMIT 1000),
        |pts AS (
        |  SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, term)
        |      AS DOUBLE)) AS x,
        |    ln(CAST(cnt AS DOUBLE)) AS y
        |  FROM top),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |        sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy,
        |        sum(y * y) AS syy
        |      FROM pts)
        |SELECT n AS n_terms,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
        |    AS intercept,
        |  round(pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx)
        |    * (n * syy - sy * sy)), 4) AS r2
        |FROM s""".stripMargin,
    "q_vocab_coverage" ->
      """WITH c AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |    FROM documents)
        |  GROUP BY 1)
        |SELECT CAST(row_number() OVER rk AS INT) AS rank, term, n,
        |  round(CAST(sum(n) OVER (ORDER BY n DESC, term
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / sum(n) OVER (), 6) AS coverage
        |FROM c
        |WINDOW rk AS (ORDER BY n DESC, term)""".stripMargin,
    "q_boilerplate" ->
      """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
        |p AS (
        |  SELECT substr(trim(lower(text)), 1, 40) AS prefix,
        |    CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1 HAVING count(*) >= 2)
        |SELECT prefix, n_docs,
        |  round(CAST(n_docs AS DOUBLE) / n_total, 6) AS share
        |FROM p CROSS JOIN t""".stripMargin,
    "q_vocab_oov" ->
"""WITH tk AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |vc AS (SELECT term FROM (
        |         SELECT term, count(*) AS n,
        |           row_number() OVER (ORDER BY count(*) DESC, term) AS rk
        |         FROM tk GROUP BY term) WHERE rk <= 20),
        |vl AS (SELECT list(term) AS vocab FROM vc)
        |SELECT doc_id,
        |  round(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |          t -> NOT list_contains(vocab, t)))
        |    / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE), 4)
        |    AS oov_rate
        |FROM documents, vl""".stripMargin,
    "q_length_batches" ->
      """WITH sized AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
        |    CAST(floor(len(string_split_regex(trim(lower(text)), '\s+')) / 16.0) AS INTEGER)
        |      AS len_bucket
        |  FROM documents),
        |seq AS (
        |  SELECT doc_id, n_tokens, len_bucket,
        |    CAST(floor((row_number() OVER (PARTITION BY len_bucket ORDER BY doc_id) - 1)
        |      / 16.0) AS INTEGER) AS batch_id
        |  FROM sized)
        |SELECT len_bucket, batch_id, count(*) AS n_docs,
        |  max(n_tokens) AS max_tokens,
        |  round(1 - sum(n_tokens) / CAST(count(*) * max(n_tokens) AS DOUBLE), 4)
        |    AS pad_frac
        |FROM seq GROUP BY len_bucket, batch_id""".stripMargin,
    "q_corpus_report" ->
      """WITH f AS (
        |  SELECT lang,
        |    len(string_split_regex(trim(lower(text)), '\s+')) AS nt,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |          t -> t IN ('the','a','of','and','is','in','to','it')))
        |      / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) AS sw,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |c AS (SELECT lang, nt, sw, count(*) OVER (PARTITION BY fp) AS cnt FROM f)
        |SELECT lang, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  round(avg(nt), 4) AS avg_tokens,
        |  round(avg(sw), 4) AS avg_stopword_ratio,
        |  round(avg(CASE WHEN cnt = 1 THEN 1.0 ELSE 0.0 END), 4) AS uniq_rate
        |FROM c GROUP BY lang""".stripMargin,
    "q_skew_report" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        |s AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows FROM c)
        |SELECT user_id, n, round(n / CAST(n_rows AS DOUBLE), 6) AS share,
        |  round(n * n_keys / CAST(n_rows AS DOUBLE), 4) AS skew_x,
        |  CAST(row_number() OVER (ORDER BY n DESC, user_id) AS INT) AS rank
        |FROM c, s QUALIFY rank <= 20""".stripMargin,
    "q_pii_redact" -> piiRedactSql,
    "q_jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY lang""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars >= 100 GROUP BY source""".stripMargin,
  )
}
