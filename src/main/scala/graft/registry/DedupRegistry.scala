package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.lake.{Ingest, LakePaths, Readers, Tables, Writers}
import graft.operators._
import graft.streaming.{Alerts, Funnel, Sessions}
import RegistryShared._

/** Registry slice — deduplication tiers: exact, MinHash-LSH, SimHash, Jaccard verify, containment, span, agreement census.
  * Split out of SparkEntry (same conventions; see SparkEntry scaladoc). */
object DedupRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- dedup (north star)
    "q_dedup_exact" -> ((s, d) => Dedup.exactDedup(s, d)),
    "q_minhash_sig" -> ((s, d) => Dedup.minhashSignatures(s, d)),
    "q_dedup_minhash" -> ((s, d) => Dedup.minhashCandidatePairs(s, d)),
    "q_dedup_cluster" -> ((s, d) => Dedup.minhashClusters(s, d)),
    "q_dedup_cc" -> ((s, d) => Dedup.minhashCcLabels(s, d, 3)),
    // dedup audit: component-size histogram over the SAME memoized labels
    "q_dedup_sizes" -> ((s, d) =>
      Dedup.minhashCcLabels(s, d, 3)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))),
    // SOFT dedup: keep every doc but train-weight it 1/cluster_size —
    // the drop-nothing alternative the hard survivor policy trades
    // against (total weight == n_clusters, so the corpus "token budget"
    // equals the deduped one without discarding any variant). Served
    // from the certified labels; one window count over the bounded
    // cluster partitioning, exact integer ratio
    "q_dedup_weights" -> ((s, d) =>
      Dedup.minhashCcLabelsCertified(s, d)
        .withColumn("cluster_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          round(lit(1.0) / col("cluster_size"), 6).as("weight"))),
    // the dedup pipeline's OUTPUT: one survivor per component — served
    // from the FIXPOINT-CERTIFIED label artifact (round-10): the fixed-3
    // form stays as q_dedup_cc's oracle-replay surface, but the pipeline
    // output must hold for ANY bucket-graph diameter. The oracle's 3-step
    // unroll matches because the test corpus converges within 3 passes —
    // on a corpus where it didn't, fixed-3 would silently under-merge and
    // THIS row would honestly go red
    "q_dedup_survivors" -> ((s, d) =>
      Dedup.minhashCcLabelsCertified(s, d)
        .filter(col("cluster_id") === col("doc_id")).select(col("doc_id"))),
    // quality-aware survivor selection: keep the LONGEST member of each
    // near-dup cluster (min-id keeps an arbitrary copy; curation pipelines
    // keep the best one) — max_by over the memoized CC labels with the
    // doc_id fused into an exact bigint key so length ties break low-id
    "q_dedup_survivors_best" -> ((s, d) => {
      val ord = col("n_chars").cast("long") * lit(10000000L) +
        (lit(9999999L) - col("doc_id"))
      Dedup.minhashCcLabels(s, d, 3)
        .join(Tables(s, d, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id")
        .groupBy(col("cluster_id"))
        .agg(max_by(col("doc_id"), ord).as("survivor_id"),
          max(col("n_chars")).as("survivor_chars"),
          count(lit(1)).as("cluster_size"))
    }),
    // the dedup FUNNEL — the curation report's headline row: corpus size,
    // exact-unique count, near-dup survivors (same memoized CC labels),
    // and the per-tier removal rates; three 1-row aggregates attached by
    // broadcast (never a CartesianProduct — the plan sweep checks)
    "q_dedup_funnel" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(docs.agg(
          countDistinct(Text.fingerprint(col("text"))).as("n_exact_unique"))))
        .crossJoin(broadcast(Dedup.minhashCcLabels(s, d, 3).agg(
          sum(when(col("cluster_id") === col("doc_id"), 1L).otherwise(0L))
            .as("n_near_survivors"))))
        .withColumn("exact_dup_rate",
          round(lit(1) - col("n_exact_unique") / col("n_docs").cast("double"), 4))
        .withColumn("near_dup_rate",
          round(lit(1) - col("n_near_survivors") / col("n_docs").cast("double"), 4))
    }),
    // daily-ingest shape: docs >= 250 arriving against the < 250 corpus
    "q_dedup_incremental" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      Dedup.incrementalExactDedup(
        docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250))
    }),
    // Bloom-prefiltered incremental dedup: bloom-negative delta rows never
    // reach the corpus join; survivors with bloom_hit=1 are the false
    // positives that paid the verify join
    "q_dedup_bloom" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      Bloom.incrementalExactDedup(
        docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250))
    }),
    // delta near-dup candidates: incoming bands vs the corpus band table
    "q_dedup_minhash_incr" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      Dedup.incrementalMinhashCandidates(
        docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250))
    }),
    // incremental containment over the artifact relations (postings +
    // bottom-k probes + additive df rows), built here from the corpus
    // half of the same doc-id split — the delta probes the corpus AND the
    // corpus' probes replay against the delta
    "q_dedup_containment_incr" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      // the corpus-side relations are DURABLE ARTIFACTS in the operator's
      // contract (history is never re-shingled) — materialize them once
      // here instead of re-expanding the shingle subtree into every one
      // of the operator's join legs, which both mis-modeled the
      // operator's cost and quadrupled the codegen surface (profiled:
      // the expanded plan's first execution burned ~25 s in compile)
      val sets = Dedup.shingleSetRelation(docs.filter(col("doc_id") < 250))
        .localCheckpoint(false)
      val postings = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
      Dedup.incrementalContainmentPairs(
        postings, Dedup.containmentProbeRelation(sets),
        postings.groupBy(col("shingle")).agg(count(lit(1)).as("n")),
        docs.filter(col("doc_id") >= 250), 0.6)
    }),
    // sequence packing (concat-then-chunk): hash-bucket packers run in
    // parallel, each streaming its docs in id order into 2048-token
    // sequences; docs crossing a boundary are SPLIT into per-sequence
    // spans (token_start/token_end slice the doc) — no global sort, no
    // single-partition window, explode is map-side
    // buckets=8 (not 100) so verify-scale per-bucket streams cross many
    // 2048 boundaries and the oracle checks the SPLIT arithmetic, not just
    // the one-span case; at 100 TB the caller raises buckets to match the
    // cluster (one token stream per executor-sized slice)
    "q_pack_sequences" -> ((s, d) =>
      Packing.packSpans(Tables(s, d, "documents"), "doc_id",
        Text.tokenCount(col("text")), seqLen = 2048, buckets = 8)),
    // mixture upsampling: per-language integer repeat factors (epoch
    // mixing) — explode is map-side, deterministic, oracle-replayable
    "q_mix_upsample" -> ((s, d) =>
      Tables(s, d, "documents").select(col("doc_id"), col("lang"))
        .withColumn("copy", explode(sequence(lit(1),
          when(col("lang") === "zh", 3).when(col("lang") === "fr", 2).otherwise(1))))),
    // the end-to-end curation pipeline: quality filter -> exact dedup ->
    // near-dup components -> survivors -> deterministic split, one plan
    "q_curate" -> ((s, d) => Curate.curate(s, d, ccIterations = 0)),
    // per-language median gate: threshold table broadcast back, filter
    // map-side — NOT a per-stratum window sort
    "q_quality_gate" -> ((s, d) =>
      Curate.gateByQuantile(
        Tables(s, d, "documents").select(col("doc_id"), col("lang"), col("text")),
        Text.bpeTokenCount(col("text")), "lang", 0.5)
        .select(col("doc_id"), col("lang"), col("score"), col("thr"))),
    // leakage-safe split: the deterministic train/valid/test banding
    // keyed on the near-dup CLUSTER representative, not the doc — near
    // duplicates land on the SAME side by construction, closing the
    // eval-contamination hole a doc-keyed split leaves open; rides the
    // memoized CC labels, split is a map-side hash of the label
    "q_leakage_safe_split" -> ((s, d) =>
      Dedup.minhashCcLabels(s, d, 3)
        .select(col("doc_id"), col("cluster_id"),
          Sampling.splitExpr(Sampling.hashBucket(col("cluster_id")))
            .as("split"))),
    // Gopher-rule hygiene screen (word-count/word-length bounds, symbol
    // and bullet/ellipsis line ratios, alpha-word share, required
    // stopwords): one map-side projection, thresholds on rounded ratios
    "q_gopher_rules" -> ((s, d) =>
      Curate.gopherRules(Tables(s, d, "documents"), "doc_id", "text")),
    // per-source (domain) reputation vs the corpus-wide mean stopword
    // ratio — the domain-blocklist stage; gate output is a broadcast
    // semi join, corpus never shuffled
    "q_source_stats" -> ((s, d) =>
      Curate.sourceReputation(Tables(s, d, "documents"), stopwordRatio)),
    "q_source_gate" -> ((s, d) =>
      Curate.gateBySource(Tables(s, d, "documents"), stopwordRatio)
        .select(col("doc_id"), col("source"), col("lang"))),
    // leave-one-source-out ablation on mean token count: S ablations
    // from ONE census + a one-row broadcast total — the cheap end of
    // source-level data valuation
    "q_source_ablation" -> ((s, d) =>
      Curate.sourceAblation(Tables(s, d, "documents"),
        graft.functions.Text.tokenCount(col("text")))),
    // deterministic exact-k sample: exactly 20 docs per language, ranked
    // by md5(doc_id) — WindowGroupLimit keeps the rank cut partial
    "q_sample_exact_k" -> ((s, d) =>
      Sampling.exactKByHash(Tables(s, d, "documents")
        .select(col("doc_id"), col("lang")), "doc_id", "lang", 20)),
    // deterministic global shuffle rank (epoch training order): dense
    // 0..N-1 md5 permutation WITHOUT a global sort — order-preserving md5
    // bands + broadcast prefix offsets + per-band local ranks
    "q_shuffle_rank" -> ((s, d) =>
      Sampling.shuffleRank(Tables(s, d, "documents")
        .select(col("doc_id"), col("lang")), "doc_id")),
    // deterministic WEIGHTED sampling without replacement (A-Res): key =
    // md5-uniform^(1/n_chars), top-20 keys per language — longer docs
    // claim proportionally more slots, replayable on any engine
    "q_sample_weighted" -> ((s, d) =>
      Sampling.weightedKByHash(Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "lang", col("n_chars"), 20)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(col("wkey"), 6).as("wkey"), col("sample_rank"))),
    // temperature-scaled mixture weights (alpha=0.7): per-language w ∝ n^a
    "q_mixture_weights" -> ((s, d) =>
      Sampling.temperatureWeights(Tables(s, d, "documents"), "lang", 0.7)),
    // UniMax waterfill: 40% of corpus tokens spread as uniformly as the
    // 0.5-epoch cap allows — closed-form waterline over the language
    // census (the head language ends budget-limited, tails epoch-capped)
    "q_unimax" -> ((s, d) =>
      Sampling.unimaxAllocation(Tables(s, d, "documents"), "lang",
        Text.tokenCount(col("text")), 0.4, 0.5)),
    // greedy best-docs-first fill to a 2000-token budget per language:
    // census/boundary plan — only ONE quality band per stratum is sorted,
    // everything else is classified map-side off a broadcast census
    "q_token_budget" -> ((s, d) =>
      Sampling.tokenBudgetSelect(Tables(s, d, "documents"), "doc_id", "lang",
        round(stopwordRatio, 4), Text.bpeTokenCount(col("text")), 2000)),
    // reproducible mixture sampling: per-language keep rates by hash bucket
    "q_sample_mix" -> ((s, d) =>
      Sampling.stratifiedByHash(Tables(s, d, "documents")
          .select(col("doc_id"), col("lang")),
        "doc_id", "lang", Map("en" -> 30, "zh" -> 60), 100)),
    "q_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "q_dedup_simhash" -> ((s, d) => Dedup.simhashNearDupPairs(s, d, 3)),
    "q_dedup_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d, 0.5)),
    // tier-agreement census: which near-dup pairs do the exact (star
    // form), Jaccard-verified MinHash and SimHash tiers each find — the
    // tuning read for picking a dedup strategy; all three pair sets are
    // LSH/banded (never all-pairs) and the flags come from three
    // fanout-free left joins over the distinct pair union
    "q_dedup_agreement" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
      // each tier's pair relation is consumed TWICE (the union and its
      // flag join) — pin the three (pair-census-sized) relations so the
      // expensive LSH/banding pipelines behind mh/sh run once, not twice
      val ex = Tables(s, d, "documents")
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .withColumn("rep", min(col("doc_id")).over(w))
        .filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
        .localCheckpoint(false)
      val mh = Dedup.ngramJaccardPairs(s, d, 0.5)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(false)
      val sh = Dedup.simhashNearDupPairs(s, d)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(false)
      ex.unionByName(mh).unionByName(sh).distinct()
        .join(ex.withColumn("fe", lit(1)), Seq("doc_a", "doc_b"), "left")
        .join(mh.withColumn("fm", lit(1)), Seq("doc_a", "doc_b"), "left")
        .join(sh.withColumn("fs", lit(1)), Seq("doc_a", "doc_b"), "left")
        .groupBy(col("fe").isNotNull.as("in_exact"),
          col("fm").isNotNull.as("in_minhash"),
          col("fs").isNotNull.as("in_simhash"))
        .agg(count(lit(1)).as("n_pairs"))
    }),
    // the wide banding config (8 bands x 2 rows over the SAME signatures):
    // Pr[candidate] ≈ 0.90 at j=0.5 vs 0.23 for the default 4x4 — the
    // documented recall/cost knob for corpora needing moderate-similarity
    // dedup; costs more populated buckets to expand and verify
    "q_dedup_jaccard_wide" -> ((s, d) => Dedup.ngramJaccardPairs(s, d, 0.5, bands = 8)),
    // asymmetric containment over the same wide-band candidates: the
    // sub/superset-duplication signal (short doc quoted inside a long one)
    "q_dedup_containment" -> ((s, d) => Dedup.containmentPairs(s, d, 0.6, bands = 8)),
    // containment-LSH: candidates banded over the SHORTER side's bottom-k
    // shingle sketch — catches the extreme size-ratio subsets (j → 0) the
    // Jaccard-tuned banding above provably misses
    "q_dedup_containment_lsh" -> ((s, d) => Dedup.containmentLshPairs(s, d, 0.6)),
    "q_dedup_embed" -> ((s, d) => Dedup.embeddingNearDupPairs(s, d, 0.3)),
    // SemDeDup-style semantic survivor selection: prune any vector with a
    // lower-id cosine near-dup (one distinct + anti-join over the
    // cell-bucketed pair relation — no CC, no iteration)
    "q_semdedup" -> ((s, d) => Dedup.semanticDedupSurvivors(s, d, 0.3)),
    // incremental SemDeDup: delta vectors vs the persisted corpus
    // quantizer — corpus neighbors prune regardless of id (arrival-order
    // wins), in-batch pairs prune min-id-wins; history never re-paired.
    // The corpus/delta split is PROPORTIONAL (lower half of the vec_id
    // range), so the corpus-built codebook scales with the corpus per
    // the operator's own contract — a fixed-size corpus fixture pinned
    // the codebook and made the benched exponent quadratic-by-fixture
    // (cells stopped subdividing while the delta grew); the 1-row max
    // fold is deterministic and mirrored in the oracle CTE
    "q_semdedup_incr" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      val split = (emb.agg(max(col("vec_id"))).head.getLong(0) + 1) / 2
      Dedup.incrementalSemanticSurvivors(
        emb.filter(col("vec_id") < split), emb.filter(col("vec_id") >= split), 0.3)
    }),
    // DSIR importance resampling: per-doc hashed-unigram target/source
    // log-likelihood-ratio weight (target exemplars = English docs;
    // integer micro-unit sums, layout-invariant) + the top-k selection
    "q_importance_weights" -> ((s, d) =>
      Importance.importanceWeights(Tables(s, d, "documents"),
        "doc_id", "text", col("lang") === "en")),
    "q_importance_topk" -> ((s, d) =>
      Importance.resampleTopK(Tables(s, d, "documents"),
        "doc_id", "text", col("lang") === "en", 100)),
    // benchmark decontamination: docs 0..49 stand in for the (always-small)
    // benchmark set, everything else is the training corpus; sharing a
    // word 5-gram = contamination
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      Decontaminate.contaminationReport(
        docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50), 5)
    }),
    "q_decontaminate_clean" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      Decontaminate.clean(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50), 5)
        .select(col("doc_id"), col("lang"))
    }),
    // sub-document dedup tier: corpus-duplicated 4-token spans (ExactSubstr
    // recipe) — the report form is the boilerplate signal, the scrub form
    // removes every covered token and keeps the unique remainder
    "q_dup_span_frac" -> ((s, d) =>
      SpanDedup.dupSpanReport(Tables(s, d, "documents"), 4)),
    "q_span_scrub" -> ((s, d) =>
      SpanDedup.scrub(Tables(s, d, "documents"), 4)),

    // per-label prototype vectors (class centroids): same long-format
    // two-agg shape as q_codebook_refine, straight off the scan
    // label-centroid cosine matrix — geometry folds map-side to
    // labels×dims before any pairing
    "q_centroid_sim" -> ((s, d) =>
      Similarity.centroidSimilarity(Tables(s, d, "embeddings"))),
    // per-label medoid (exemplar nearest the centroid) — corpus shuffled
    // once on label, deterministic (rounded cosine, vec_id) winner
    "q_label_medoid" -> ((s, d) =>
      Similarity.labelMedoids(Tables(s, d, "embeddings"))),
    // simplified silhouette per label: own vs nearest-other centroid
    // distance, rounded-4 before the argmin, degenerate vectors score 0
    "q_silhouette" -> ((s, d) =>
      Similarity.silhouetteByLabel(Tables(s, d, "embeddings"))),
    // shape census: explicit two-pass central moments (builtin
    // skew/kurt bias variants disagree across engines)
    "q_moments" -> ((s, d) =>
      Audit.groupedMoments(Tables(s, d, "orders"),
        "o_orderpriority", "o_totalprice")),
    // per-part price trend: closed-form OLS in ONE aggregation, exact
    // integer denominator
    "q_group_trend" -> ((s, d) =>
      TimeSeries.groupedTrend(Tables(s, d, "lineitem"),
        "l_partkey", "l_shipdate", "l_extendedprice")),
    "q_embed_centroids" -> ((s, d) =>
      Tables(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding").cast("array<double>")))
        .toDF("label", "dim", "x")
        .groupBy(col("label"), col("dim"))
        .agg(round(avg(col("x")), 4).as("mean_x"), count(lit(1)).as("n"))),
    // standard scaler: per-stratum (mu, sigma) broadcast back, z map-side
    "q_standard_scale" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val stats = docs.groupBy(col("lang")).agg(
        round(avg(col("n_chars")), 4).as("mu"),
        round(stddev_samp(col("n_chars")), 4).as("sigma"))
      docs.join(broadcast(stats), "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round((col("n_chars") - col("mu")) / col("sigma"), 4).as("z"))
    }),
    // grouped Pearson correlation (co-moment partials merge map-side)
    "q_correlation" -> ((s, d) =>
      Tables(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(corr(col("l_discount"), col("l_extendedprice")), 4).as("corr_disc_price"),
          count(lit(1)).as("n"))),
  )

  def oracleSql: Map[String, String] = Map(

    "q_quality_gate" ->
      s"""WITH s AS (SELECT doc_id, lang,
         |  CAST(len(regexp_extract_all(lower(text), '${Text.BpePattern}')) AS INTEGER) AS score
         |  FROM documents),
         |th AS (SELECT lang, round(quantile_cont(score, 0.5), 4) AS thr
         |       FROM s GROUP BY lang)
         |SELECT doc_id, lang, score, thr FROM s JOIN th USING (lang)
         |WHERE score >= thr""".stripMargin,

    "q_source_stats" ->
      s"""WITH $sourceRepSql
         |SELECT source, n_docs, round(avg_s, 4) AS avg_score,
         |  round(avg_s, 4) >= round(global_s, 4) AS keep
         |FROM st, g""".stripMargin,
    "q_source_gate" ->
      s"""WITH $sourceRepSql,
         |kept AS (SELECT source FROM st, g
         |         WHERE round(avg_s, 4) >= round(global_s, 4))
         |SELECT doc_id, source, lang FROM documents
         |WHERE source IN (SELECT source FROM kept)""".stripMargin,

    "q_source_ablation" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |      AS BIGINT) AS sum_m
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
        |    CAST(sum(sum_m) AS BIGINT) AS sum_all FROM per),
        |m AS (
        |  SELECT source, n_docs,
        |    round(CAST(sum_all AS DOUBLE) / n_all, 6) AS mean_full,
        |    CASE WHEN n_all = n_docs THEN NULL
        |      ELSE round(CAST(sum_all - sum_m AS DOUBLE)
        |        / (n_all - n_docs), 6) END AS mean_without
        |  FROM per CROSS JOIN tot)
        |SELECT source, n_docs, mean_full, mean_without,
        |  round(mean_without - mean_full, 6) AS delta
        |FROM m""".stripMargin,
    "q_decontaminate" ->
      s"""WITH $decontamGramsSql
         |SELECT tg.doc_id, count(DISTINCT tg.g) AS n_shared_grams,
         |  count(DISTINCT bg.bench_id) AS n_bench_docs
         |FROM tg JOIN bg USING (g)
         |GROUP BY tg.doc_id""".stripMargin,
    "q_decontaminate_clean" ->
      s"""WITH $decontamGramsSql,
         |bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (g))
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id >= 50 AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    "q_dup_span_frac" ->
      s"""WITH $dupSpansSql,
         |agg AS (
         |  SELECT doc_id, count(*) AS n_dup_spans,
         |    sum(CASE WHEN prev IS NULL THEN 4
         |             ELSE least(4, start - prev) END) AS n_dup_tokens
         |  FROM (SELECT doc_id, start,
         |          lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
         |        FROM d)
         |  GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(greatest(len(toks) - 3, 0) AS INTEGER) AS n_spans,
         |  CAST(coalesce(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
         |  CAST(coalesce(n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
         |  round(coalesce(n_dup_tokens, 0) / CAST(len(toks) AS DOUBLE), 4)
         |    AS dup_token_frac
         |FROM t LEFT JOIN agg USING (doc_id)""".stripMargin,
    "q_span_scrub" ->
      s"""WITH $dupSpansSql,
         |cov AS (SELECT DISTINCT doc_id, unnest(range(start + 1, start + 5)) AS pos
         |        FROM d),
         |tok AS (SELECT doc_id, unnest(toks) AS tok,
         |          generate_subscripts(toks, 1) AS pos
         |        FROM t),
         |kept AS (SELECT tok.doc_id, tok.tok, tok.pos
         |         FROM tok LEFT JOIN cov
         |           ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
         |         WHERE cov.pos IS NULL)
         |SELECT t.doc_id,
         |  coalesce(string_agg(kept.tok, ' ' ORDER BY kept.pos), '') AS clean_text
         |FROM t LEFT JOIN kept ON t.doc_id = kept.doc_id
         |GROUP BY t.doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        |  min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))""".stripMargin,

    "q_minhash_sig" -> minhashSigSql,
    "q_dedup_minhash" -> minhashPairsSql,
    "q_dedup_cluster" -> minhashClusterSql,
    "q_dedup_cc" -> minhashCcSql(3),
    // INDEPENDENT formulation (round-9): true connected components via a
    // recursive transitive closure to FIXPOINT, not a replay of the
    // engine's 3-iteration label propagation — if the propagation had a
    // convergence bug, this row would catch it where a shared CTE chain
    // could not. (Verified equivalent at sf0.01: 0/500 label mismatches.)
    "q_dedup_sizes" ->
      s"""WITH RECURSIVE cp AS (SELECT doc_a, doc_b FROM ($minhashPairsSql)),
         |scope AS (
         |  SELECT doc_id FROM documents
         |  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM cp
         |      UNION SELECT doc_b AS a, doc_a AS b FROM cp),
         |reach(doc_id, r) AS (
         |  SELECT doc_id, doc_id FROM scope
         |  UNION
         |  SELECT reach.doc_id, e.b FROM reach JOIN e ON reach.r = e.a),
         |cc AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY cluster_id)
         |SELECT cluster_size, count(*) AS n_clusters FROM sz GROUP BY cluster_size""".stripMargin,
    "q_dedup_survivors" ->
      s"SELECT doc_id FROM (${minhashCcSql(3)}) WHERE cluster_id = doc_id",
    "q_dedup_weights" ->
      s"""WITH cc AS (${minhashCcSql(3)})
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |  round(CAST(1.0 AS DOUBLE)
         |    / count(*) OVER (PARTITION BY cluster_id), 6) AS weight
         |FROM cc""".stripMargin,
    "q_dedup_survivors_best" ->
      s"""WITH cc AS (${minhashCcSql(3)}),
         |m AS (
         |  SELECT cc.cluster_id, cc.doc_id, d.n_chars,
         |    CAST(d.n_chars AS BIGINT) * 10000000 + (9999999 - cc.doc_id)
         |      AS ord
         |  FROM cc JOIN documents d ON cc.doc_id = d.doc_id)
         |SELECT cluster_id,
         |  arg_max(doc_id, ord) AS survivor_id,
         |  max(n_chars) AS survivor_chars,
         |  count(*) AS cluster_size
         |FROM m GROUP BY cluster_id""".stripMargin,
    // INDEPENDENT formulation (round-9): survivors counted as DISTINCT
    // true-CC components (one survivor per component by definition), not
    // as label-propagation fixpoints where cluster_id = doc_id — a
    // different derivation of the same number over an independent CC.
    "q_dedup_funnel" ->
      s"""WITH RECURSIVE cp AS (SELECT doc_a, doc_b FROM ($minhashPairsSql)),
         |scope AS (
         |  SELECT doc_id FROM documents
         |  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM cp
         |      UNION SELECT doc_b AS a, doc_a AS b FROM cp),
         |reach(doc_id, r) AS (
         |  SELECT doc_id, doc_id FROM scope
         |  UNION
         |  SELECT reach.doc_id, e.b FROM reach JOIN e ON reach.r = e.a),
         |cc AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
         |s AS (SELECT
         |  (SELECT count(*) FROM documents) AS n_docs,
         |  (SELECT count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
         |     FROM documents) AS n_exact_unique,
         |  (SELECT count(DISTINCT cluster_id) FROM cc) AS n_near_survivors)
         |SELECT n_docs, n_exact_unique, n_near_survivors,
         |  round(1 - n_exact_unique / CAST(n_docs AS DOUBLE), 4) AS exact_dup_rate,
         |  round(1 - n_near_survivors / CAST(n_docs AS DOUBLE), 4) AS near_dup_rate
         |FROM s""".stripMargin,
    "q_dedup_incremental" ->
      """WITH inc AS (
        |  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        |    min(doc_id) AS doc_id
        |  FROM documents WHERE doc_id >= 250
        |  GROUP BY 1),
        |ex AS (
        |  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |  FROM documents WHERE doc_id < 250)
        |SELECT doc_id, fingerprint FROM inc
        |WHERE fingerprint NOT IN (SELECT fingerprint FROM ex)""".stripMargin,
    "q_dedup_bloom" ->
      s"""WITH fp AS (
         |  SELECT doc_id,
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
         |  FROM documents),
         |ex AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 250),
         |inc AS (SELECT fingerprint, min(doc_id) AS doc_id
         |        FROM fp WHERE doc_id >= 250 GROUP BY 1),
         |hs AS (SELECT fingerprint,
         |         ${md5PrefixSqlOf("fingerprint", 7)} AS h1,
         |         ${md5PrefixSqlOf("fingerprint || ':b2'", 7)} AS h2
         |       FROM (SELECT fingerprint FROM ex UNION SELECT fingerprint FROM inc)),
         |bpos AS (SELECT (h1 + j * h2) % 4096 AS pos
         |         FROM hs JOIN ex USING (fingerprint)
         |         CROSS JOIN (SELECT unnest(range(0, 3)) AS j)),
         |bloom AS (SELECT pos // 32 AS word,
         |            bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
         |          FROM bpos GROUP BY 1),
         |ppos AS (SELECT i.doc_id, i.fingerprint, (h.h1 + jj.j * h.h2) % 4096 AS pos
         |         FROM inc i JOIN hs h USING (fingerprint)
         |         CROSS JOIN (SELECT unnest(range(0, 3)) AS j) jj),
         |hits AS (SELECT doc_id, fingerprint,
         |           CAST(min(CASE WHEN b.bits IS NULL THEN 0
         |                ELSE (b.bits >> CAST(pos % 32 AS INT)) & 1 END) AS INT) AS bloom_hit
         |         FROM ppos LEFT JOIN bloom b ON ppos.pos // 32 = b.word
         |         GROUP BY 1, 2)
         |SELECT doc_id, fingerprint, bloom_hit
         |FROM hits
         |WHERE bloom_hit = 0 OR fingerprint NOT IN (SELECT fingerprint FROM ex)""".stripMargin,
    "q_dedup_minhash_incr" ->
      s"""WITH sigs_i AS (${minhashSigSqlWhere("WHERE doc_id >= 250")}),
         |bands_i AS (
         |${bandRowsSqlFrom("sigs_i")}),
         |sigs_e AS (${minhashSigSqlWhere("WHERE doc_id < 250")}),
         |bands_e AS (
         |${bandRowsSqlFrom("sigs_e")}),
         |ex_grouped AS (
         |  SELECT band, bucket, list_sort(list(doc_id)) AS ex_ids
         |  FROM bands_e GROUP BY band, bucket),
         |cross_exp AS (
         |  SELECT i.doc_id AS i_id,
         |    unnest(CASE WHEN len(g.ex_ids) <= ${Dedup.MaxBucket}
         |      THEN g.ex_ids ELSE g.ex_ids[1:1] END) AS e_id
         |  FROM bands_i i JOIN ex_grouped g ON i.band = g.band AND i.bucket = g.bucket),
         |cross_pairs AS (
         |  SELECT least(i_id, e_id) AS doc_a, greatest(i_id, e_id) AS doc_b
         |  FROM cross_exp),
         |${cappedPairCtesFrom("bands_i")}
         |SELECT DISTINCT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b FROM cross_pairs
         |  UNION ALL
         |  SELECT doc_a, doc_b FROM cand)""".stripMargin,
    "q_sample_exact_k" ->
      """SELECT doc_id, lang, sample_rank FROM (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 20""".stripMargin,
    // the oracle IS the naive global sort — the banded plan must
    // reproduce it exactly
    "q_shuffle_rank" ->
      """SELECT doc_id, lang,
        |  CAST(row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
        |    AS shuffle_rank
        |FROM documents""".stripMargin,
    "q_sample_weighted" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, lang, n_chars,
         |    pow(((${md5BucketSqlOf("doc_id")}) + 0.5) / 268435456.0,
         |        1.0 / n_chars) AS wkey
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, n_chars, wkey,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY wkey DESC, doc_id) AS INTEGER) AS sample_rank
         |  FROM keyed)
         |SELECT doc_id, lang, n_chars, round(wkey, 6) AS wkey, sample_rank
         |FROM r WHERE sample_rank <= 20""".stripMargin,
    "q_mixture_weights" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |z AS (SELECT sum(pow(n_docs, 0.7)) AS z FROM c)
        |SELECT lang, n_docs, round(pow(n_docs, 0.7) / z, 6) AS weight
        |FROM c CROSS JOIN z""".stripMargin,
    // waterfill replay: capacities in exact quarter-token BIGINTs
    // (epochCap=0.5 -> x2), budget_q = floor(0.4*total)*4, the first
    // rank whose capacity covers the remaining equal share is the
    // waterline; min_by carries its capped-prefix mass
    "q_unimax" ->
      """WITH c AS (
        |  SELECT lang,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |      AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |r AS (
        |  SELECT lang, n_tokens, n_tokens * 2 AS cap_q,
        |    CAST(row_number() OVER (ORDER BY n_tokens * 2, lang) AS INTEGER)
        |      AS rk,
        |    CAST(coalesce(sum(n_tokens * 2) OVER (ORDER BY n_tokens * 2, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cap_prefix_q,
        |    count(*) OVER () AS m,
        |    CAST(floor(sum(n_tokens) OVER () * 0.4) AS BIGINT) * 4 AS budget_q
        |  FROM c),
        |wl AS (
        |  SELECT min(rk) AS rstar, min_by(cap_prefix_q, rk) AS wl_prefix_q
        |  FROM r WHERE cap_q * (m - rk + 1) >= budget_q - cap_prefix_q)
        |SELECT lang, n_tokens,
        |  round(cap_q / 4.0, 2) AS capacity,
        |  round(CASE WHEN rstar IS NULL OR rk < rstar THEN CAST(cap_q AS DOUBLE)
        |        ELSE CAST(budget_q - wl_prefix_q AS DOUBLE) / (m - rstar + 1)
        |        END / 4.0, 2) AS allocation,
        |  round(CASE WHEN rstar IS NULL OR rk < rstar THEN CAST(cap_q AS DOUBLE)
        |        ELSE CAST(budget_q - wl_prefix_q AS DOUBLE) / (m - rstar + 1)
        |        END / 4.0 / n_tokens, 6) AS epochs,
        |  (rstar IS NULL OR rk < rstar) AS capped
        |FROM r CROSS JOIN wl""".stripMargin,
    // the oracle replays the SEMANTICS (one inclusive-cumsum window over
    // everything); the Spark side's census/boundary plan must select the
    // identical row set
    "q_token_budget" ->
      s"""WITH s AS (SELECT doc_id, lang,
         |    round(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |          t -> t IN ('the','a','of','and','is','in','to','it')))
         |      / CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE), 4) AS quality,
         |    CAST(len(regexp_extract_all(lower(text), '${Text.BpePattern}')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang
         |        ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM s)
         |SELECT doc_id, lang, quality, n_tokens FROM r WHERE cum <= 2000""".stripMargin,
    "q_sample_mix" -> {
      s"""SELECT doc_id, lang, bucket FROM (
         |  SELECT doc_id, lang, CAST((${md5BucketSql}) % 100 AS INTEGER) AS bucket FROM documents)
         |WHERE bucket < (CASE WHEN lang = 'en' THEN 30
         |                     WHEN lang = 'zh' THEN 60 ELSE 100 END)""".stripMargin
    },
    "q_curate" -> curateSql(3),
    "q_pack_sequences" ->
      s"""WITH toks AS (
         |  SELECT doc_id, n_tokens, bucket FROM (
         |    SELECT doc_id,
         |      CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens,
         |      CAST(($md5BucketSql) % 8 AS INTEGER) AS bucket
         |    FROM documents)
         |  WHERE n_tokens > 0),
         |streams AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS stream_end
         |  FROM toks),
         |spans AS (
         |  SELECT doc_id, bucket, n_tokens, stream_end,
         |    stream_end - n_tokens AS off,
         |    unnest(generate_series(
         |      CAST(floor((stream_end - n_tokens) / 2048) AS INTEGER),
         |      CAST(floor((stream_end - 1) / 2048) AS INTEGER))) AS seq_id
         |  FROM streams)
         |SELECT doc_id, bucket, n_tokens, CAST(seq_id AS INTEGER) AS seq_id,
         |  CAST(greatest(off, seq_id * 2048) - off AS BIGINT) AS token_start,
         |  CAST(least(stream_end, (seq_id + 1) * 2048) - off AS BIGINT) AS token_end,
         |  CAST(greatest(off, seq_id * 2048) - seq_id * 2048 AS BIGINT) AS seq_offset
         |FROM spans""".stripMargin,
    "q_mix_upsample" ->
      """SELECT doc_id, lang,
        |  unnest(generate_series(1, CASE WHEN lang = 'zh' THEN 3
        |                              WHEN lang = 'fr' THEN 2 ELSE 1 END)) AS copy
        |FROM documents""".stripMargin,
    "q_simhash" -> simhashSql,
    "q_dedup_simhash" -> simhashPairsSql,
    "q_dedup_jaccard" -> jaccardSql,
    // Flags + exact tier derived INDEPENDENTLY of the engine's shape
    // (round-9): group-join representative instead of a window QUALIFY,
    // EXISTS membership instead of the engine's left-join-null flags —
    // the aggregation layer no longer mirrors the Scala builder's plan.
    // (The mh/sh tier CTEs necessarily model the banded semantics.)
    "q_dedup_agreement" ->
      s"""WITH fps AS (
         |  SELECT doc_id,
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
         |  FROM documents),
         |reps AS (SELECT fp, min(doc_id) AS rep FROM fps GROUP BY fp),
         |ex AS (
         |  SELECT r.rep AS doc_a, f.doc_id AS doc_b
         |  FROM fps f JOIN reps r ON f.fp = r.fp
         |  WHERE f.doc_id <> r.rep),
         |mh AS (SELECT doc_a, doc_b FROM ($jaccardSql)),
         |sh AS (SELECT doc_a, doc_b FROM ($simhashPairsSql)),
         |u AS (
         |  SELECT doc_a, doc_b FROM ex
         |  UNION SELECT doc_a, doc_b FROM mh
         |  UNION SELECT doc_a, doc_b FROM sh),
         |f AS (
         |  SELECT
         |    EXISTS (SELECT 1 FROM ex
         |            WHERE ex.doc_a = u.doc_a AND ex.doc_b = u.doc_b) AS in_exact,
         |    EXISTS (SELECT 1 FROM mh
         |            WHERE mh.doc_a = u.doc_a AND mh.doc_b = u.doc_b) AS in_minhash,
         |    EXISTS (SELECT 1 FROM sh
         |            WHERE sh.doc_a = u.doc_a AND sh.doc_b = u.doc_b) AS in_simhash
         |  FROM u)
         |SELECT in_exact, in_minhash, in_simhash,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM f GROUP BY 1, 2, 3""".stripMargin,
    "q_dedup_jaccard_wide" -> jaccardSql(8),
    "q_dedup_containment" -> containmentSql(8, 0.6),
    "q_dedup_containment_lsh" ->
      containmentLshSql(0.6, Dedup.ContainBottomK, Dedup.ContainMaxDf,
        Dedup.ContainMinHits),
    "q_dedup_containment_incr" ->
      containmentIncrSql(0.6, Dedup.ContainBottomK, Dedup.ContainMaxDf,
        Dedup.ContainMinHits, 250),
    "q_dedup_embed" -> embedDedupSql,
    "q_semdedup" ->
      s"""SELECT vec_id FROM embeddings
         |WHERE vec_id NOT IN (SELECT vec_b FROM ($embedDedupSql))""".stripMargin,
    "q_leakage_safe_split" ->
      s"""WITH cc AS (${minhashCcSql(3)})
         |SELECT doc_id, cluster_id,
         |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, cluster_id,
         |  CAST((${md5BucketSqlOf("cluster_id")}) % 100 AS INTEGER) AS b
         |  FROM cc)""".stripMargin,
    // corpus = lower HALF of the vec_id range (proportional split,
    // mirroring the registry's 1-row max fold), so corpus ids all
    // precede delta ids and the operator's (corpus-any OR
    // lower-id-delta) rule collapses to a.vec_id < b.vec_id
    "q_semdedup_incr" ->
      s"""WITH sp AS (SELECT (max(vec_id) + 1) // 2 AS s FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings
         |  WHERE vec_id < (SELECT s FROM sp)
         |    AND vec_id % ${Quantize.CodebookStep} = 0
         |    AND vec_id < ${Quantize.CodebookStep.toLong * Quantize.MaxCells}),
         |qscored AS (
         |  SELECT e.vec_id, e.embedding, c.c_id,
         |    round(${cosSql("e.embedding", "c.c_emb")}, 4) AS aff
         |  FROM embeddings e CROSS JOIN cent c),
         |massign AS (
         |  SELECT vec_id, embedding, c_id AS cell FROM (
         |    SELECT vec_id, embedding, c_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, c_id) AS rn
         |    FROM qscored)
         |  WHERE rn <= ${Dedup.EmbedAssignCells}),
         |pruned AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM massign a JOIN massign b ON a.cell = b.cell
         |  WHERE b.vec_id >= (SELECT s FROM sp) AND a.vec_id < b.vec_id
         |    AND round(${cosSql("a.embedding", "b.embedding")}, 4) >= 0.3)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id >= (SELECT s FROM sp)
         |  AND vec_id NOT IN (SELECT vec_id FROM pruned)""".stripMargin,
    "q_gopher_rules" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS words,
        |    string_split(text, chr(10)) AS lines,
        |    text
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(list_sum(list_transform(words, x -> len(x))) AS BIGINT) AS word_chars,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS symbols,
        |    CAST(len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]'))) AS BIGINT) AS bullet_lines,
        |    CAST(len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS BIGINT) AS ellipsis_lines,
        |    CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alpha_words,
        |    CAST(len(list_intersect(list_distinct(words),
        |      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stopword_hits
        |  FROM w)
        |SELECT doc_id, n_words,
        |  round(word_chars / CAST(n_words AS DOUBLE), 4) AS mean_word_len,
        |  round(symbols / CAST(n_words AS DOUBLE), 4) AS symbol_ratio,
        |  round(bullet_lines / CAST(n_lines AS DOUBLE), 4) AS bullet_ratio,
        |  round(ellipsis_lines / CAST(n_lines AS DOUBLE), 4) AS ellipsis_ratio,
        |  round(alpha_words / CAST(n_words AS DOUBLE), 4) AS alpha_ratio,
        |  stopword_hits,
        |  (n_words BETWEEN 50 AND 100000
        |   AND round(word_chars / CAST(n_words AS DOUBLE), 4) BETWEEN 3.0 AND 10.0
        |   AND round(symbols / CAST(n_words AS DOUBLE), 4) <= 0.1
        |   AND round(bullet_lines / CAST(n_lines AS DOUBLE), 4) <= 0.9
        |   AND round(ellipsis_lines / CAST(n_lines AS DOUBLE), 4) <= 0.3
        |   AND round(alpha_words / CAST(n_words AS DOUBLE), 4) >= 0.8
        |   AND stopword_hits >= 2) AS passes
        |FROM m""".stripMargin,
    "q_importance_weights" -> importanceWeightsSql,
    "q_importance_topk" ->
      s"""SELECT doc_id, logw_micro FROM ($importanceWeightsSql)
         |ORDER BY logw_micro DESC, doc_id LIMIT 100""".stripMargin,

    "q_centroid_sim" ->
      """WITH cent AS (
        |  SELECT label, CAST(s.dim AS INTEGER) AS dim, round(avg(s.x), 4) AS m
        |  FROM (
        |    SELECT label, unnest(list_transform(range(1, len(embedding) + 1),
        |      i -> {'dim': i - 1, 'x': CAST(embedding[i] AS DOUBLE)})) AS s
        |    FROM embeddings)
        |  GROUP BY 1, 2),
        |norms AS (SELECT label, sqrt(sum(m * m)) AS nrm FROM cent GROUP BY 1),
        |dots AS (
        |  SELECT a.label AS label_a, b.label AS label_b, sum(a.m * b.m) AS dot
        |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT label_a, label_b,
        |  round(dot / (na.nrm * nb.nrm), 6) + 0 AS cosine
        |FROM dots
        |JOIN norms na ON dots.label_a = na.label
        |JOIN norms nb ON dots.label_b = nb.label""".stripMargin,
    "q_label_medoid" ->
      """WITH x AS (
        |  SELECT vec_id, label, CAST(s.dim AS INTEGER) AS dim,
        |    CAST(s.x AS DOUBLE) AS x
        |  FROM (
        |    SELECT vec_id, label, unnest(list_transform(range(1, len(embedding) + 1),
        |      i -> {'dim': i - 1, 'x': CAST(embedding[i] AS DOUBLE)})) AS s
        |    FROM embeddings)),
        |cent AS (SELECT label, dim, round(avg(x), 4) AS m FROM x GROUP BY 1, 2),
        |sc AS (
        |  SELECT vec_id, x.label,
        |    round(sum(x.x * c.m)
        |      / (sqrt(sum(x.x * x.x)) * sqrt(sum(c.m * c.m))), 6)
        |      AS cos_to_centroid
        |  FROM x JOIN cent c ON x.label = c.label AND x.dim = c.dim
        |  GROUP BY 1, 2)
        |SELECT label, vec_id, cos_to_centroid
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY label
        |  ORDER BY cos_to_centroid DESC, vec_id) = 1""".stripMargin,
    // distances to ALL centroids per vector (labels x dims broadcast
    // shape), a = own, b = min other, s on rounded-4 distances
    "q_silhouette" ->
      """WITH x AS (
        |  SELECT vec_id, label AS own, CAST(s.dim AS INTEGER) AS dim,
        |    CAST(s.x AS DOUBLE) AS x
        |  FROM (
        |    SELECT vec_id, label, unnest(list_transform(range(1, len(embedding) + 1),
        |      i -> {'dim': i - 1, 'x': CAST(embedding[i] AS DOUBLE)})) AS s
        |    FROM embeddings)),
        |cent AS (SELECT own AS clabel, dim, round(avg(x), 4) AS m
        |  FROM x GROUP BY 1, 2),
        |d AS (
        |  SELECT x.vec_id, x.own, c.clabel,
        |    round(sqrt(sum((x.x - c.m) * (x.x - c.m))), 4) AS dist
        |  FROM x JOIN cent c ON x.dim = c.dim
        |  GROUP BY 1, 2, 3),
        |ab AS (
        |  SELECT vec_id, own,
        |    max(CASE WHEN clabel = own THEN dist END) AS a,
        |    min(CASE WHEN clabel != own THEN dist END) AS b
        |  FROM d GROUP BY 1, 2),
        |s AS (
        |  SELECT vec_id, own,
        |    CASE WHEN greatest(a, b) = 0.0 THEN 0.0
        |      ELSE round((b - a) / greatest(a, b), 4) END AS s
        |  FROM ab)
        |SELECT own AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(avg(s), 4) AS silhouette
        |FROM s GROUP BY own""".stripMargin,
    "q_moments" ->
      """WITH mu AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    round(avg(o_totalprice), 4) AS mean
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT o.o_orderpriority, mu.n, mu.mean,
        |    avg((o.o_totalprice - mu.mean) * (o.o_totalprice - mu.mean)) AS m2,
        |    avg((o.o_totalprice - mu.mean) * (o.o_totalprice - mu.mean)
        |      * (o.o_totalprice - mu.mean)) AS m3,
        |    avg((o.o_totalprice - mu.mean) * (o.o_totalprice - mu.mean)
        |      * (o.o_totalprice - mu.mean) * (o.o_totalprice - mu.mean)) AS m4
        |  FROM orders o JOIN mu USING (o_orderpriority)
        |  GROUP BY 1, 2, 3)
        |SELECT o_orderpriority, n, mean,
        |  round(sqrt(m2), 4) AS sd,
        |  round(m3 / pow(m2, 1.5), 4) AS skewness,
        |  round(m4 / (m2 * m2) - 3.0, 4) AS kurtosis
        |FROM c""".stripMargin,
    "q_group_trend" ->
      """WITH d0 AS (SELECT min(l_shipdate) AS d0 FROM lineitem),
        |b AS (
        |  SELECT l_partkey,
        |    CAST(date_diff('day', d0, l_shipdate) AS BIGINT) AS x,
        |    l_extendedprice AS y
        |  FROM lineitem CROSS JOIN d0),
        |a AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    sum(y) AS sy, sum(x * y) AS sxy
        |  FROM b GROUP BY 1
        |  HAVING CAST(count(*) AS BIGINT) * CAST(sum(x * x) AS BIGINT)
        |    - CAST(sum(x) AS BIGINT) * CAST(sum(x) AS BIGINT) > 0),
        |s AS (
        |  SELECT l_partkey, n,
        |    round((n * sxy - sx * sy)
        |      / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
        |    sy, sx
        |  FROM a)
        |SELECT l_partkey, n, slope,
        |  round((sy - slope * sx) / n, 4) AS intercept
        |FROM s""".stripMargin,
    "q_embed_centroids" ->
      """SELECT label, CAST(s.dim AS INTEGER) AS dim,
        |  round(avg(s.x), 4) + 0 AS mean_x, count(*) AS n
        |FROM (
        |  SELECT label, unnest(list_transform(range(1, len(embedding) + 1),
        |    i -> {'dim': i - 1, 'x': CAST(embedding[i] AS DOUBLE)})) AS s
        |  FROM embeddings)
        |GROUP BY label, CAST(s.dim AS INTEGER)""".stripMargin,
    "q_standard_scale" ->
      """WITH st AS (SELECT lang, round(avg(n_chars), 4) AS mu,
        |              round(stddev_samp(n_chars), 4) AS sigma
        |            FROM documents GROUP BY lang)
        |SELECT doc_id, lang, n_chars,
        |  round((n_chars - mu) / sigma, 4) + 0 AS z
        |FROM documents JOIN st USING (lang)""".stripMargin,
    "q_correlation" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) + 0 AS corr_qty_price,
        |  round(corr(l_discount, l_extendedprice), 4) + 0 AS corr_disc_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
  )
}
