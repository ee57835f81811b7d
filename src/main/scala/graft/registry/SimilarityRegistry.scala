package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.lake.{Ingest, LakePaths, Readers, Tables, Writers}
import graft.operators._
import graft.streaming.{Alerts, Funnel, Sessions}
import RegistryShared._

/** Registry slice — similarity search: ANN (brute/IVF/LSH/quantized), codebooks, sampling/mixture, splits.
  * Split out of SparkEntry (same conventions; see SparkEntry scaladoc). */
object SimilarityRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // top principal component of the embedding corpus: one-pass
    // long-format covariance relation, then broadcast-vector power steps
    // rounded per iteration (plan O(1) per iteration, nothing collected)
    "q_pca_power" -> ((s, d) =>
      graft.ml.Pca.topComponentPower(Tables(s, d, "embeddings"))),

    // -- similarity search (north star)
    // lexical retrieval — BM25 top-10 per query, the keyword complement
    // to the ANN tier below
    "q_bm25" -> ((s, d) =>
      Retrieval.bm25TopK(Tables(s, d, "documents"), bm25Queries, 10)),
    // exact phrase occurrences via positional postings: term-filtered
    // (doc, start) relations equi-joined — the multi-word query BM25's
    // bag-of-words cannot answer
    "q_phrase_search" -> ((s, d) =>
      Retrieval.phraseSearch(Tables(s, d, "documents"), Seq("data", "row"))),
    // hybrid retrieval: BM25 top-10 ⊕ cosine top-10 fused by reciprocal
    // rank fusion (c=60) — rank-space fusion needs no score calibration;
    // queries 0-2 exist in both spaces because vec_id ≡ doc_id
    "q_hybrid_rrf" -> ((s, d) =>
      Retrieval.hybridRrf(
        Retrieval.bm25TopK(Tables(s, d, "documents"), bm25Queries, 10),
        Similarity.bruteForceTopK(s, d, 3, 10))),
    // ranking-quality scorecard: NDCG@10 + reciprocal rank of the BM25
    // ranking against graded labels derived from the exact cosine ranks
    // (3/2/1 tiers) — evaluation runs on the queries x k grid only
    "q_ndcg" -> ((s, d) => {
      val lex = Retrieval.bm25TopK(Tables(s, d, "documents"), bm25Queries, 10)
      val graded = Similarity.bruteForceTopK(s, d, 3, 10)
        .select(col("q_id").as("query_id"), col("vec_id").as("doc_id"),
          when(col("rank") <= 2, 3).when(col("rank") <= 5, 2)
            .otherwise(1).as("rel"))
      Retrieval.rankingQuality(lex, graded, k = 10, relThreshold = 2)
    }),
    // per-doc top-5 keywords by smoothed TF-IDF — map-side-combined term
    // counts, broadcast vocabulary df, per-doc window cut
    "q_tfidf_keywords" -> ((s, d) =>
      Retrieval.tfidfKeywords(Tables(s, d, "documents"), 5)),
    // per-doc 5-gram novelty (fraction of grams in no other doc) — df via
    // window census over the gram, no join back
    "q_ngram_novelty" -> ((s, d) =>
      Retrieval.ngramNovelty(Tables(s, d, "documents"))),
    // market-basket association rules: a-priori pruned, in-basket pair
    // expansion (no self-join), lift from one broadcast scalar row
    "q_assoc_rules" -> ((s, d) =>
      Affinity.associationRules(Tables(s, d, "lineitem"),
        "l_orderkey", "l_partkey", 3)),
    // RFM quintile segmentation — ledger folds map-side to the customer
    // dim; deterministic ntile tie-break by (metric, custkey)
    "q_rfm" -> ((s, d) => Affinity.rfm(Tables(s, d, "orders"))),
    // term co-occurrence + PMI over doc contexts (pairs seen >= 100 times)
    "q_cooccurrence" -> ((s, d) =>
      Retrieval.cooccurrencePmi(Tables(s, d, "documents"), 100)),
    // the 100 TB-safe variant: presence capped to the top-50 df terms
    // before the self-join, bounding per-doc pair blowup at C(50, 2)
    "q_cooccurrence_topv" -> ((s, d) =>
      Retrieval.cooccurrencePmi(Tables(s, d, "documents"), 100, Some(50))),
    // skip-gram context windows: join-free map-side pair emission, the
    // embedding-training counterpart of the document-level form
    "q_cooccurrence_skipgram" -> ((s, d) =>
      Retrieval.windowCooccurrence(Tables(s, d, "documents"), 3, 50)),
    // TextRank: damped PageRank over the skip-gram term graph, 3
    // checkpointed iterations over the vocabulary-bounded edge relation;
    // per-generation scores rounded to 6 so engines iterate on identical
    // inputs — top-20 graph-central corpus keywords
    "q_textrank" -> ((s, d) =>
      Retrieval.textrank(Tables(s, d, "documents"), 3, 50)),
    // L2 normalization surface over the embedding column: norm via the
    // native graft_dot fold, components order-free (min/max) for exact
    // cross-engine double parity
    // int8 scalar quantization (4x storage before ANN): per-dim corpus
    // ranges folded to ONE broadcast row, coding map-side; floor(x+0.5)
    // for cross-engine tie determinism
    "q_embed_quantize" -> ((s, d) =>
      Similarity.quantizeInt8(Tables(s, d, "embeddings"))),
    "q_embed_normalize" -> ((s, d) => {
      val v = col("embedding").cast("array<double>")
      val n = Vectors.norm(col("embedding"))
      Tables(s, d, "embeddings").select(col("vec_id"),
        round(n, 4).as("l2_norm"),
        round(element_at(v, 1) / n, 6).as("u0"),
        round(array_min(v) / n, 6).as("u_min"),
        round(array_max(v) / n, 6).as("u_max"))
    }),
    "q_ann_brute" -> ((s, d) => Similarity.bruteForceTopK(s, d, 10, 5)),
    // greedy k-center (farthest-point-first) diversity selection: the
    // coverage complement of the dedup tiers — 8 selection rounds, each
    // one broadcast-selected-set map-side pass + a top-1, trace
    // engine-exact via round-6 distances and vec_id tie-breaks
    "q_kcenter" -> ((s, d) =>
      Coreset.kCenterGreedy(Tables(s, d, "embeddings"), 8)),
    // sign random projection (JL transform) 64 -> 16 dims: md5-parity
    // sign matrix folded into one broadcast row, integer-micro exact
    // component sums — the cheap pre-ANN dimensionality reduction
    "q_rand_projection" -> ((s, d) =>
      Similarity.randomProjection(Tables(s, d, "embeddings"), 16)),
    // two-sample MMD drift (angular kernel via md5-parity signed
    // projections): even vs odd labels stand in for ref/new corpus
    // snapshots; exact integer signs, one division on the one-row output
    "q_mmd_drift" -> ((s, d) =>
      Drift.signedMmd(Tables(s, d, "embeddings"), col("label") % 2 === 0)),
    // ADC search over the int8 codes: original queries vs map-side
    // dequantized corpus — same single unshuffled corpus stage as brute
    "q_ann_quantized" -> ((s, d) => Similarity.quantizedTopK(s, d, 10, 5)),
    // semantic decontamination: vec_id < 50 stands in for the benchmark
    // embeddings (mirroring q_decontaminate's doc-id split); max cosine
    // computed map-side over the single broadcast benchmark row
    "q_decontaminate_embed" -> ((s, d) =>
      Similarity.embedDecontamination(s, d, 50, 0.35)),
    // contrastive hard negatives: nearest neighbors with a DIFFERENT label
    "q_ann_hardneg" -> ((s, d) => Similarity.hardNegativesTopK(s, d, 10, 5)),
    "q_ann_ivf" -> ((s, d) => Similarity.ivfTopK(s, d, 10, 5)),
    "q_ann_lsh" -> ((s, d) => Similarity.lshTopK(s, d, 10, 5)),
    // one distributed Lloyd update of the codebook: per-cell elementwise
    // mean in LONG format (cell, dim, mean, n) — the training step that
    // refines the sampled codebook into real k-means centroids. The
    // repartition by cell is load-bearing: it materializes the O(C·d)
    // argmax ONCE per vector at the exchange; without the barrier
    // Catalyst collapses the cell projection into the post-explode
    // aggregation and re-evaluates it per exploded row (64x). The same
    // exchange already clusters by a prefix of the group keys, so the
    // aggregation needs no second shuffle.
    "q_codebook_refine" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      Quantize.withCodebook(emb, emb)
        .select(Quantize.cellExpr(col("embedding"), col("cents")).as("cell"),
          col("embedding").cast("array<double>").as("embedding"))
        .repartition(col("cell"))
        .select(col("cell"), posexplode(col("embedding")))
        .toDF("cell", "dim", "x")
        .groupBy(col("cell"), col("dim"))
        .agg(round(avg(col("x")), 4).as("mean_x"), count(lit(1)).as("n"))
    }),
    // deterministic hash split for train/valid/test — reproducible across
    // runs and engines (md5 of the id, not a sampled RNG)
    "q_train_split" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), Sampling.hashBucket(col("doc_id")).as("bucket"))
        .withColumn("split", Sampling.splitExpr(col("bucket")))),
    // k-fold CV assignment census: fold = md5(id) mod 5, per-fold size +
    // mean doc length (one map-side column add + one agg; folds are a
    // function of the id, stable across layout/engine/rerun)
    "q_kfold" -> ((s, d) =>
      Sampling.kfoldAssign(Tables(s, d, "documents"), "doc_id", 5)
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          round(sum(col("n_chars")) / count(lit(1)).cast("double"), 4)
            .as("avg_chars"))),
    // split-leakage audit: how many normalized-text fingerprints appear
    // in 1 / 2 / 3 hash splits — exact-duplicate leakage across
    // train/valid/test, the in-corpus twin of benchmark decontamination
    // (any n_splits > 1 row is a leak). Census form so the audit is a
    // non-trivial row set even on a leak-free corpus. Two hash aggs over
    // (fingerprint, split) pairs; nothing quadratic.
    "q_split_leakage" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(graft.functions.Text.fingerprint(col("text")).as("fp"),
          Sampling.splitExpr(Sampling.hashBucket(col("doc_id"))).as("split"))
        .distinct()
        .groupBy(col("fp"))
        .agg(countDistinct(col("split")).cast("int").as("n_splits"))
        .groupBy(col("n_splits"))
        .agg(count(lit(1)).as("n_fingerprints"))),
    // top event-type PATHS per session (first 8 events — paths are
    // unbounded at scale, the prefix cap keeps the census bounded):
    // session ids via the lag/running-sum shape, path assembled from the
    // per-session sorted struct array, then a paths-bounded count fold
    "q_session_paths" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapMs = 30 * 60000L
      val sess = Tables(s, d, "events")
        .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
        .withColumn("new_s", when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > gapMs, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_s"))
          .over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(concat_ws("->", slice(transform(
          array_sort(collect_list(struct(unix_millis(col("ts")).as("ms"),
            col("event_id").as("eid"), col("event_type").as("et")))),
          e => e.getField("et")), 1, 8)).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .filter(col("n_sessions") >= 3)
    }),
    // the ML tier's oracle row (M1-M3): closed-form two-feature OLS on the
    // deterministic md5 train band (whole orders land together — a grouped
    // split, like splitting by document). The iterative LinearRegression
    // path is spec'd against this same solution in RegressionSpec.
    "q_lr_coeffs" -> ((s, d) =>
      graft.ml.Regression.closedFormCoeffs(
        Tables(s, d, "lineitem")
          .filter(Sampling.hashBucket(col("l_orderkey")) < 90),
        "l_quantity", "l_discount", "l_extendedprice")),
    // split-conformal interval around the closed-form OLS: rounded-beta
    // predictions, exact-micro residual census order statistic, test
    // coverage as an exact ratio
    "q_conformal" -> ((s, d) =>
      graft.ml.Regression.conformalInterval(Tables(s, d, "lineitem"),
        "l_orderkey", "l_quantity", "l_discount", "l_extendedprice")),
    // k-fold CV regression in TWO passes: additive centered sums, each
    // fold trained on complement sums (total - fold), no per-fold rescan
    "q_cv_coeffs" -> ((s, d) =>
      graft.ml.Regression.cvCoeffs(Tables(s, d, "lineitem"),
        "l_orderkey", "l_quantity", "l_discount", "l_extendedprice")),
    // exact tie-corrected ROC-AUC — integer U statistic, the ordered
    // window runs over DISTINCT scores only
    "q_auc" -> ((s, d) =>
      graft.ml.Logistic.auc(Tables(s, d, "orders"),
        col("o_totalprice"), col("o_orderstatus") === "F")),
    // exact PR curve from the same census — running tp/fp down the score
    // order, integer-ratio precision/recall
    "q_pr_curve" -> ((s, d) =>
      graft.ml.Logistic.prCurve(Tables(s, d, "orders"),
        col("o_totalprice"), col("o_orderstatus") === "F")),
    // logistic regression by 3 full-batch GD steps — coefficient row
    // carried as a broadcast (never collected), round-6 per step
    "q_logreg" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val base = o.crossJoin(broadcast(o.agg(max(col("o_orderdate")).as("mx"))))
        .select(col("o_totalprice").as("price"),
          datediff(col("mx"), col("o_orderdate")).cast("double").as("age"),
          col("o_orderstatus"))
      graft.ml.Logistic.fitGd(base, Seq("price", "age"),
        col("o_orderstatus") === "F")
    }),
  )

  /** Unrolled power-iteration CTE chain (the TextRank pattern: round per
    * iteration so float drift cannot compound across engines). */
  private def pcaPowerSql(iters: Int): String = {
    val steps = (1 to iters).map { t =>
      val prev = if (t == 1) "v0" else s"v${t - 1}"
      s"""u$t AS (SELECT cov.i AS i, sum(cov.c * $prev.v) AS u
         |       FROM cov JOIN $prev ON cov.j = $prev.i GROUP BY 1),
         |n$t AS (SELECT sqrt(sum(u * u)) AS nrm FROM u$t),
         |v$t AS (SELECT i, round(u / (SELECT nrm FROM n$t), 6) AS v FROM u$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |idx AS (SELECT unnest(range(0, 64)) AS i),
       |x AS (SELECT vec_id, i, emb[CAST(i + 1 AS INT)] AS xi FROM e CROSS JOIN idx),
       |mu AS (SELECT i, round(avg(xi), 6) AS mi FROM x GROUP BY 1),
       |xc AS (SELECT x.vec_id, x.i, x.xi - mu.mi AS xc FROM x JOIN mu USING (i)),
       |cov AS (SELECT a.i AS i, b.i AS j,
       |          round(sum(a.xc * b.xc) / (SELECT n FROM nn), 6) AS c
       |        FROM xc a JOIN xc b USING (vec_id) GROUP BY 1, 2),
       |v0 AS (SELECT i, 0.125 AS v FROM idx),
       |$steps
       |SELECT v$iters.i AS dim, v$iters.v AS loading,
       |  (SELECT round(nrm, 4) FROM n$iters) AS eigenvalue
       |FROM v$iters""".stripMargin
  }

  /** Unrolled greedy k-center trace: per round, min-distance census over
    * the not-yet-selected corpus (1 − max cosine vs the selected set,
    * rounded to 6 like the Spark side), then the (md DESC, vec_id) top-1
    * joins the selection — an independent formulation (self-join + NOT
    * IN vs broadcast-row array fold). */
  private def kcenterSql(k: Int): String = {
    // MATERIALIZED is load-bearing (the BPE-oracle discipline): sel{t}
    // references sel{t-1} three times, so default CTE inlining expands
    // the chain 3^k-fold and the oracle runs for minutes instead of ms
    val steps = (1 to k - 1).map { t =>
      s"""d$t AS MATERIALIZED (
         |  SELECT v.vec_id AS vec_id,
         |    round(1 - max(list_dot_product(v.e, s.e) / (v.n * s.n)), 6) AS md
         |  FROM v JOIN v s ON s.vec_id IN (SELECT vec_id FROM sel${t - 1})
         |  WHERE v.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
         |  GROUP BY v.vec_id),
         |sel$t AS MATERIALIZED (
         |  SELECT * FROM sel${t - 1}
         |  UNION ALL
         |  SELECT CAST($t AS INTEGER) AS sel_order, vec_id, md AS min_dist
         |  FROM (SELECT vec_id, md FROM d$t ORDER BY md DESC, vec_id LIMIT 1))""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                          CAST(embedding AS DOUBLE[]))) AS n
       |  FROM embeddings),
       |sel0 AS MATERIALIZED (
       |  SELECT CAST(0 AS INTEGER) AS sel_order, vec_id,
       |    CAST(NULL AS DOUBLE) AS min_dist
       |  FROM v WHERE vec_id = (SELECT min(vec_id) FROM v)),
       |$steps
       |SELECT sel_order, vec_id, min_dist FROM sel${k - 1}""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_pca_power" -> pcaPowerSql(3),
    "q_kcenter" -> kcenterSql(8),
    // row-major md5-parity sign matrix ⊗ integer-micro components —
    // exact BIGINT sums in any order, one division at the rounded output
    "q_rand_projection" ->
      s"""WITH xm AS (
         |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS i,
         |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT)
         |      AS xm
         |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
         |s AS (
         |  SELECT j, i,
         |    1 - 2 * ((${md5PrefixSqlOf("'rp:' || j || ':' || i", 1)}) % 2)
         |      AS sgn
         |  FROM (SELECT unnest(range(16)) AS j), (SELECT unnest(range(64)) AS i))
         |SELECT vec_id, CAST(s.j AS INTEGER) AS dim,
         |  CAST(sum(s.sgn * xm.xm) AS DOUBLE) / (1000000 * sqrt(16.0)) AS y
         |FROM xm JOIN s ON xm.i = s.i
         |GROUP BY 1, 2""".stripMargin,
    // the q_rand_projection sign matrix under the mmd: seed; exact long
    // dots -> exact signs -> HUGEINT f-numerators, one final division
    "q_mmd_drift" ->
      s"""WITH xm AS (
         |  SELECT vec_id, (label % 2 = 0) AS in_p, CAST(i - 1 AS BIGINT) AS i,
         |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT)
         |      AS xm
         |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
         |s AS (
         |  SELECT j, i,
         |    1 - 2 * ((${md5PrefixSqlOf("'mmd:' || j || ':' || i", 1)}) % 2)
         |      AS sgn
         |  FROM (SELECT unnest(range(16)) AS j), (SELECT unnest(range(64)) AS i)),
         |proj AS (
         |  SELECT xm.vec_id, xm.in_p, s.j, sum(s.sgn * xm.xm) AS dot
         |  FROM xm JOIN s ON xm.i = s.i GROUP BY 1, 2, 3),
         |agg AS (
         |  SELECT j,
         |    CAST(sum(CASE WHEN in_p THEN sign(dot) ELSE 0 END) AS HUGEINT)
         |      AS sp,
         |    CAST(sum(CASE WHEN NOT in_p THEN sign(dot) ELSE 0 END) AS HUGEINT)
         |      AS sq,
         |    CAST(sum(CASE WHEN in_p THEN 1 ELSE 0 END) AS HUGEINT) AS np,
         |    CAST(sum(CASE WHEN NOT in_p THEN 1 ELSE 0 END) AS HUGEINT) AS nq
         |  FROM proj GROUP BY j),
         |fin AS (
         |  SELECT CAST(max(np) AS BIGINT) AS n_p, CAST(max(nq) AS BIGINT) AS n_q,
         |    sum((sp * nq - sq * np) * (sp * nq - sq * np)) AS num
         |  FROM agg)
         |SELECT n_p, n_q,
         |  round(CAST(num AS DOUBLE)
         |    / (16.0 * n_p * n_p * n_q * n_q), 6) AS mmd2
         |FROM fin""".stripMargin,
    "q_split_leakage" ->
      s"""WITH fs AS (
         |  SELECT DISTINCT
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         |    CASE WHEN CAST(($md5BucketSql) % 100 AS INTEGER) < 90 THEN 'train'
         |         WHEN CAST(($md5BucketSql) % 100 AS INTEGER) < 95 THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |per_fp AS (
         |  SELECT fp, CAST(count(DISTINCT split) AS INTEGER) AS n_splits
         |  FROM fs GROUP BY fp)
         |SELECT n_splits, count(*) AS n_fingerprints
         |FROM per_fp GROUP BY n_splits""".stripMargin,
    "q_session_paths" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_ms
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev_ms IS NULL
        |      OR epoch_ms(ts) - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM w),
        |sess AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM f),
        |paths AS (
        |  SELECT user_id, session_id,
        |    array_to_string(list_slice(
        |      list(event_type ORDER BY ts, event_id), 1, 8), '->') AS path
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT path, count(*) AS n_sessions
        |FROM paths GROUP BY path HAVING count(*) >= 3""".stripMargin,

    "q_bm25" -> bm25Sql,
    "q_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS arr
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, unnest(arr) AS w, unnest(range(len(arr))) AS p
        |  FROM toks)
        |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        |WHERE a.w = 'data' AND b.w = 'row'
        |GROUP BY a.doc_id""".stripMargin,
    "q_ndcg" ->
      s"""WITH lex AS (SELECT * FROM ($bm25Sql)),
         |sem AS (SELECT * FROM (${annSql(cellRestricted = false, 3, 10)})),
         |graded AS (
         |  SELECT q_id AS query_id, vec_id AS doc_id,
         |    CASE WHEN rank <= 2 THEN 3 WHEN rank <= 5 THEN 2 ELSE 1 END
         |      AS rel
         |  FROM sem),
         |sys AS (
         |  SELECT l.query_id, l.doc_id, l.rank, COALESCE(g.rel, 0) AS rel
         |  FROM lex l LEFT JOIN graded g
         |    ON l.query_id = g.query_id AND l.doc_id = g.doc_id
         |  WHERE l.rank <= 10),
         |dcg AS (
         |  SELECT query_id,
         |    round(sum((pow(2.0, rel) - 1.0) / log2(rank + 1.0)), 6) AS dcg,
         |    COALESCE(max(CASE WHEN rel >= 2 THEN 1.0 / rank END), 0.0)
         |      AS rr_raw
         |  FROM sys GROUP BY query_id),
         |ideal AS (
         |  SELECT query_id,
         |    round(sum((pow(2.0, rel) - 1.0) / log2(irank + 1.0)), 6) AS idcg
         |  FROM (
         |    SELECT query_id, rel, row_number() OVER (PARTITION BY query_id
         |        ORDER BY rel DESC, doc_id) AS irank
         |    FROM graded)
         |  WHERE irank <= 10 GROUP BY query_id)
         |SELECT d.query_id, d.dcg, i.idcg,
         |  round(d.dcg / i.idcg, 6) AS ndcg, round(d.rr_raw, 6) AS rr
         |FROM dcg d JOIN ideal i ON d.query_id = i.query_id""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH lex AS (SELECT * FROM ($bm25Sql)),
         |sem AS (SELECT * FROM (${annSql(cellRestricted = false, 3, 10)})),
         |fused AS (
         |  SELECT COALESCE(l.query_id, s.q_id) AS query_id,
         |    COALESCE(l.doc_id, s.vec_id) AS doc_id,
         |    round(COALESCE(CAST(1 AS DOUBLE) / (60 + l.rank),
         |        CAST(0 AS DOUBLE))
         |      + COALESCE(CAST(1 AS DOUBLE) / (60 + s.rank),
         |        CAST(0 AS DOUBLE)), 6) AS rrf,
         |    l.rank AS lex_rank, s.rank AS sem_rank
         |  FROM lex l FULL OUTER JOIN sem s
         |    ON l.query_id = s.q_id AND l.doc_id = s.vec_id)
         |SELECT query_id, doc_id, rrf, lex_rank, sem_rank,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, doc_id) AS INTEGER) AS fused_rank
         |FROM fused""".stripMargin,
    "q_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |stats AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf,
        |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS score
        |  FROM tf JOIN dft USING (term) CROSS JOIN stats)
        |SELECT doc_id, term, tf, score,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
        |FROM scored QUALIFY rank <= 5""".stripMargin,
    "q_ngram_novelty" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(t) - 3),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
        |             t[i+3] || ' ' || t[i+4])) AS sh
        |    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |          FROM documents)
        |    WHERE len(t) >= 5)),
        |c AS (SELECT sh, count(*) AS df FROM g GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  round(avg(CASE WHEN df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novelty
        |FROM g JOIN c USING (sh)
        |GROUP BY 1""".stripMargin,
    "q_assoc_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
        |f AS (
        |  SELECT item, CAST(count(*) AS BIGINT) AS supp FROM b
        |  GROUP BY 1 HAVING count(*) >= 3),
        |bf AS (SELECT basket, item, supp FROM b JOIN f USING (item)),
        |nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM b),
        |pr AS (
        |  SELECT x.item AS item_a, y.item AS item_b,
        |    x.supp AS supp_a, y.supp AS supp_b,
        |    CAST(count(*) AS BIGINT) AS pair_supp
        |  FROM bf x JOIN bf y ON x.basket = y.basket AND x.item < y.item
        |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 3)
        |SELECT item_a, item_b, pair_supp, supp_a, supp_b,
        |  round(CAST(pair_supp AS DOUBLE) / supp_a, 6) AS conf_ab,
        |  round(CAST(pair_supp AS DOUBLE) / supp_b, 6) AS conf_ba,
        |  round(CAST(pair_supp AS DOUBLE) * n_baskets / (supp_a * supp_b), 6)
        |    AS lift
        |FROM pr CROSS JOIN nb""".stripMargin,
    "q_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    round(sum(o_totalprice), 2) AS monetary
        |  FROM orders GROUP BY 1),
        |a AS (SELECT max(last_order) AS anchor FROM per),
        |s AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', last_order, anchor) AS INT) AS recency_days,
        |    frequency, monetary,
        |    CAST(ntile(5) OVER (ORDER BY date_diff('day', last_order, anchor) DESC,
        |      o_custkey) AS INT) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS INT) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY monetary, o_custkey) AS INT) AS m_score
        |  FROM per CROSS JOIN a)
        |SELECT o_custkey, recency_days, frequency, monetary,
        |  r_score, f_score, m_score,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
        |       WHEN r_score >= 4 AND f_score <= 2 THEN 'recent'
        |       WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
        |       WHEN r_score <= 2 AND f_score <= 2 THEN 'dormant'
        |       ELSE 'core' END AS segment
        |FROM s""".stripMargin,
    "q_cooccurrence" ->
      """WITH pres AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS term
        |  FROM documents),
        |pairs AS (
        |  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
        |  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY a.term, b.term
        |  HAVING count(*) >= 100),
        |dft AS (SELECT term, count(*) AS df FROM pres GROUP BY term),
        |st AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT term_a, term_b, n_ab,
        |  round(ln(CAST(n_ab AS DOUBLE) * n_docs / (da.df * db.df)), 4) + 0 AS pmi
        |FROM pairs
        |JOIN dft da ON pairs.term_a = da.term
        |JOIN dft db ON pairs.term_b = db.term
        |CROSS JOIN st""".stripMargin,
    "q_cooccurrence_topv" ->
      """WITH pres0 AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS term
        |  FROM documents),
        |vocab AS (
        |  SELECT term FROM (
        |    SELECT term, count(*) AS vdf,
        |      row_number() OVER (ORDER BY count(*) DESC, term) AS rk
        |    FROM pres0 GROUP BY term) WHERE rk <= 50),
        |pres AS (
        |  SELECT pres0.doc_id, pres0.term FROM pres0
        |  JOIN vocab ON pres0.term = vocab.term),
        |pairs AS (
        |  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
        |  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY a.term, b.term
        |  HAVING count(*) >= 100),
        |dft AS (SELECT term, count(*) AS df FROM pres GROUP BY term),
        |st AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT term_a, term_b, n_ab,
        |  round(ln(CAST(n_ab AS DOUBLE) * n_docs / (da.df * db.df)), 4) + 0 AS pmi
        |FROM pairs
        |JOIN dft da ON pairs.term_a = da.term
        |JOIN dft db ON pairs.term_b = db.term
        |CROSS JOIN st""".stripMargin,
    "q_cooccurrence_skipgram" ->
      """WITH tk AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |p AS (
        |  SELECT unnest(flatten(list_transform(range(1, len(t)),
        |    i -> list_transform(range(i + 1, least(i + 3, len(t)) + 1),
        |      j -> {'a': least(t[i], t[j]), 'b': greatest(t[i], t[j])})))) AS p
        |  FROM tk WHERE len(t) >= 2)
        |SELECT p.a AS term_a, p.b AS term_b, count(*) AS n_ab
        |FROM p GROUP BY 1, 2 HAVING count(*) >= 50""".stripMargin,
    // TextRank: the SAME skip-gram edge CTE, then three unrolled damped
    // power-iteration steps — each generation re-rounded to 6, mirroring
    // the Spark side's per-iteration rounding, so float drift can't compound
    "q_textrank" ->
      """WITH tk AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |pp AS (
        |  SELECT unnest(flatten(list_transform(range(1, len(t)),
        |    i -> list_transform(range(i + 1, least(i + 3, len(t)) + 1),
        |      j -> {'a': least(t[i], t[j]), 'b': greatest(t[i], t[j])})))) AS p
        |  FROM tk WHERE len(t) >= 2),
        |e AS (
        |  SELECT p.a AS term_a, p.b AS term_b, count(*) AS n_ab
        |  FROM pp GROUP BY 1, 2 HAVING count(*) >= 50),
        |sym AS (
        |  SELECT term_a AS src, term_b AS dst, n_ab AS w FROM e
        |  UNION ALL
        |  SELECT term_b AS src, term_a AS dst, n_ab AS w FROM e
        |  WHERE term_a <> term_b),
        |deg AS (SELECT src, sum(w) AS wdeg FROM sym GROUP BY src),
        |tr AS (
        |  SELECT s.src, s.dst, CAST(s.w AS DOUBLE) / d.wdeg AS p
        |  FROM sym s JOIN deg d ON s.src = d.src),
        |s0 AS (SELECT src AS term, 1.0 AS score FROM deg),
        |s1 AS (SELECT dst AS term, round(0.15 + 0.85 * sum(p * score), 6) AS score
        |       FROM tr JOIN s0 ON s0.term = tr.src GROUP BY dst),
        |s2 AS (SELECT dst AS term, round(0.15 + 0.85 * sum(p * score), 6) AS score
        |       FROM tr JOIN s1 ON s1.term = tr.src GROUP BY dst),
        |s3 AS (SELECT dst AS term, round(0.15 + 0.85 * sum(p * score), 6) AS score
        |       FROM tr JOIN s2 ON s2.term = tr.src GROUP BY dst)
        |SELECT term, score FROM s3 ORDER BY score DESC, term LIMIT 20""".stripMargin,
    // same fixed parenthesization and floor(x+0.5) as the Spark side;
    // Spark dims are 0-based posexplode, DuckDB subscripts 1-based -> i-1
    "q_embed_quantize" ->
      """WITH x AS (
        |  SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
        |    CAST(embedding[i] AS DOUBLE) AS xv
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |s AS (SELECT dim, min(xv) AS lo, max(xv) AS hi FROM x GROUP BY dim)
        |SELECT x.vec_id, x.dim,
        |  CASE WHEN s.hi = s.lo THEN 0
        |       ELSE CAST(floor((x.xv - s.lo) / (s.hi - s.lo) * 255 + 0.5)
        |         AS INTEGER) END AS code
        |FROM x JOIN s ON x.dim = s.dim""".stripMargin,
    "q_embed_normalize" ->
      """SELECT vec_id,
        |  round(n, 4) AS l2_norm,
        |  round(v[1] / n, 6) + 0 AS u0,
        |  round(list_aggregate(v, 'min') / n, 6) + 0 AS u_min,
        |  round(list_aggregate(v, 'max') / n, 6) + 0 AS u_max
        |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                              CAST(embedding AS DOUBLE[]))) AS n
        |      FROM embeddings)""".stripMargin,
    "q_ann_brute" -> annSql(cellRestricted = false),
    "q_ann_quantized" ->
      """WITH x AS (
        |  SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
        |    CAST(embedding[i] AS DOUBLE) AS xv
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |s AS (SELECT dim, min(xv) AS lo, max(xv) AS hi FROM x GROUP BY dim),
        |dq AS (
        |  SELECT vec_id, list(
        |    CASE WHEN s.hi = s.lo THEN s.lo
        |         ELSE s.lo + floor((x.xv - s.lo) / (s.hi - s.lo) * 255 + 0.5)
        |           * (s.hi - s.lo) / 255 END ORDER BY x.dim) AS e
        |  FROM x JOIN s ON x.dim = s.dim GROUP BY vec_id),
        |q AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.q_id, d.vec_id,
        |    round(list_dot_product(q.qe, d.e)
        |      / (sqrt(list_dot_product(q.qe, q.qe))
        |       * sqrt(list_dot_product(d.e, d.e))), 4) AS cosine
        |  FROM dq d JOIN q ON d.vec_id != q.q_id)
        |SELECT q_id, vec_id, cosine, rank FROM (
        |  SELECT q_id, vec_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "q_decontaminate_embed" ->
      s"""WITH tr AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |            FROM embeddings WHERE vec_id >= 50),
         |be AS (SELECT CAST(embedding AS DOUBLE[]) AS b
         |       FROM embeddings WHERE vec_id < 50),
         |m AS (SELECT tr.vec_id,
         |        max(list_dot_product(e, b)
         |          / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(b, b)))) AS mc
         |      FROM tr CROSS JOIN be GROUP BY tr.vec_id)
         |SELECT vec_id, round(mc, 4) AS max_bench_cos,
         |  round(mc, 4) >= 0.35 AS contaminated
         |FROM m""".stripMargin,
    "q_ann_hardneg" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
        |  FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.q_id, q.q_label, e.vec_id, e.label,
        |    round(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
        |      / (sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])))
        |       * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))), 4) AS cosine
        |  FROM embeddings e JOIN q ON e.label != q.q_label)
        |SELECT q_id, q_label, vec_id, label, cosine, rank FROM (
        |  SELECT q_id, q_label, vec_id, label, cosine,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "q_ann_ivf" -> ivfSql,
    "q_ann_lsh" -> lshAnnSql,
    "q_codebook_refine" ->
      s"""WITH $quantizeCtes
         |SELECT cell, CAST(s.dim AS INTEGER) AS dim,
         |  round(avg(s.x), 4) + 0 AS mean_x, count(*) AS n
         |FROM (
         |  SELECT cell, unnest(list_transform(range(1, len(embedding) + 1),
         |    i -> {'dim': i - 1, 'x': CAST(embedding[i] AS DOUBLE)})) AS s
         |  FROM assign)
         |GROUP BY cell, CAST(s.dim AS INTEGER)""".stripMargin,
    "q_train_split" ->
      s"""SELECT doc_id, bucket,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, CAST(($md5BucketSql) % 100 AS INTEGER) AS bucket FROM documents)""".stripMargin,
    "q_kfold" ->
      s"""SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
         |FROM (SELECT CAST((${md5BucketSqlOf("doc_id")}) % 5 AS INTEGER)
         |        AS fold, n_chars
         |      FROM documents)
         |GROUP BY fold""".stripMargin,
    "q_cv_coeffs" -> {
      def cm(t: String, f: String, ta: String, fa: String,
          tb: String, fb: String) =
        s"($t - $f) / np - (($ta - $fa) / np) * (($tb - $fb) / np)"
      val v1 = cm("t11", "s11", "t1", "s1", "t1", "s1")
      val v2 = cm("t22", "s22", "t2", "s2", "t2", "s2")
      val c12 = cm("t12", "s12", "t1", "s1", "t2", "s2")
      val c1y = cm("t1y", "s1y", "t1", "s1", "ty", "sy")
      val c2y = cm("t2y", "s2y", "t2", "s2", "ty", "sy")
      val det = s"(($v1) * ($v2) - ($c12) * ($c12))"
      val b1 = s"((($c1y) * ($v2) - ($c2y) * ($c12)) / $det)"
      val b2 = s"((($c2y) * ($v1) - ($c1y) * ($c12)) / $det)"
      val b0 = s"((ty - sy) / np - $b1 * ((t1 - s1) / np) - $b2 * ((t2 - s2) / np))"
      s"""WITH d0 AS (
         |  SELECT l_orderkey AS id, CAST(l_quantity AS DOUBLE) AS x1,
         |    CAST(l_discount AS DOUBLE) AS x2,
         |    CAST(l_extendedprice AS DOUBLE) AS y
         |  FROM lineitem
         |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
         |    AND l_extendedprice IS NOT NULL),
         |g AS (
         |  SELECT round(avg(x1), 4) AS gm1, round(avg(x2), 4) AS gm2,
         |    round(avg(y), 4) AS gmy
         |  FROM d0),
         |cc AS (
         |  SELECT CAST((${md5BucketSqlOf("id")}) % 5 AS INTEGER) AS fold,
         |    x1 - gm1 AS a, x2 - gm2 AS b, y - gmy AS z
         |  FROM d0 CROSS JOIN g),
         |per AS (
         |  SELECT fold, CAST(count(*) AS BIGINT) AS n,
         |    sum(a) AS s1, sum(b) AS s2, sum(z) AS sy,
         |    sum(a * a) AS s11, sum(b * b) AS s22, sum(a * b) AS s12,
         |    sum(a * z) AS s1y, sum(b * z) AS s2y
         |  FROM cc GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS tn, sum(s1) AS t1,
         |    sum(s2) AS t2, sum(sy) AS ty, sum(s11) AS t11,
         |    sum(s22) AS t22, sum(s12) AS t12, sum(s1y) AS t1y,
         |    sum(s2y) AS t2y
         |  FROM per),
         |j AS (
         |  SELECT per.*, tot.*, g.*, CAST(tn - n AS DOUBLE) AS np
         |  FROM per CROSS JOIN tot CROSS JOIN g)
         |SELECT fold, tn - n AS n_train,
         |  round($b1, 4) AS b1,
         |  round($b2, 4) AS b2,
         |  round($b0 + gmy - $b1 * gm1 - $b2 * gm2, 4) AS b0
         |FROM j""".stripMargin
    },
    "q_pr_curve" ->
      """WITH c AS (
        |  SELECT o_totalprice AS s,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_pos,
        |    CAST(count(*) - sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_neg
        |  FROM orders GROUP BY 1)
        |SELECT s AS threshold,
        |  CAST(sum(n_pos) OVER w AS BIGINT) AS tp,
        |  CAST(sum(n_neg) OVER w AS BIGINT) AS fp,
        |  round(CAST(sum(n_pos) OVER w AS DOUBLE)
        |    / (sum(n_pos) OVER w + sum(n_neg) OVER w), 6) AS precision,
        |  round(CAST(sum(n_pos) OVER w AS DOUBLE)
        |    / (sum(n_pos) OVER ()), 6) AS recall
        |FROM c
        |WINDOW w AS (ORDER BY s DESC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_auc" ->
      """WITH c AS (
        |  SELECT o_totalprice AS s,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_pos,
        |    CAST(count(*) - sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_neg
        |  FROM orders GROUP BY 1),
        |cb AS (
        |  SELECT *, CAST(coalesce(sum(n_neg) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS neg_below
        |  FROM c)
        |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |  round(sum(n_pos * (CAST(neg_below AS DOUBLE) + n_neg * 0.5))
        |    / (sum(n_pos) * sum(n_neg)), 6) AS auc
        |FROM cb""".stripMargin,
    // 3 unrolled GD steps, identical margin/err expressions per step,
    // round-6 gradients and weights (mirrors ml.Logistic.fitGd)
    "q_logreg" -> {
      def margin(wi: String) =
        s"$wi.w0 + zp * $wi.w_price + za * $wi.w_age"
      val steps = (1 to 3).map { i =>
        val prev = s"wr${i - 1}"
        s"""g$i AS (
           |  SELECT
           |    round(avg(1.0 / (1.0 + exp(-(${margin(prev)}))) - y), 6) AS g0,
           |    round(avg((1.0 / (1.0 + exp(-(${margin(prev)}))) - y) * zp), 6)
           |      AS gp,
           |    round(avg((1.0 / (1.0 + exp(-(${margin(prev)}))) - y) * za), 6)
           |      AS ga
           |  FROM z CROSS JOIN $prev),
           |wr$i AS (
           |  SELECT round(w0 - 1.0 * g0, 6) AS w0,
           |    round(w_price - 1.0 * gp, 6) AS w_price,
           |    round(w_age - 1.0 * ga, 6) AS w_age
           |  FROM wr${i - 1} CROSS JOIN g$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH mx AS (SELECT max(o_orderdate) AS mx FROM orders),
         |b AS (
         |  SELECT o_totalprice AS price,
         |    CAST(date_diff('day', o_orderdate, mx) AS DOUBLE) AS age,
         |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
         |  FROM orders CROSS JOIN mx),
         |m AS (
         |  SELECT round(avg(price), 4) AS mu_p, round(stddev_pop(price), 4) AS sd_p,
         |    round(avg(age), 4) AS mu_a, round(stddev_pop(age), 4) AS sd_a
         |  FROM b),
         |z AS (
         |  SELECT y, (price - mu_p) / sd_p AS zp, (age - mu_a) / sd_a AS za
         |  FROM b CROSS JOIN m),
         |wr0 AS (SELECT 0.0 AS w0, 0.0 AS w_price, 0.0 AS w_age),
         |$steps,
         |l AS (
         |  SELECT round(-avg(y * ln(p) + (1.0 - y) * ln(1.0 - p)), 6) AS log_loss
         |  FROM (SELECT y, 1.0 / (1.0 + exp(-(${margin("wr3")}))) AS p
         |        FROM z CROSS JOIN wr3))
         |SELECT wr3.w0, wr3.w_price, wr3.w_age, l.log_loss
         |FROM wr3 CROSS JOIN l""".stripMargin
    },
    // the q_lr_coeffs moment CTE on the 60% split, ROUNDED betas reused
    // verbatim for prediction, census-cumulative order statistic
    "q_conformal" -> {
      val bucket = s"CAST((${md5BucketSqlOf("l_orderkey")}) % 100 AS INTEGER)"
      s"""WITH clean AS (
         |  SELECT $bucket AS bucket,
         |    CAST(l_quantity AS DOUBLE) AS x1,
         |    CAST(l_discount AS DOUBLE) AS x2,
         |    CAST(l_extendedprice AS DOUBLE) AS y
         |  FROM lineitem
         |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
         |    AND l_extendedprice IS NOT NULL),
         |m AS (
         |  SELECT covar_pop(x1, y) AS c1y, covar_pop(x2, y) AS c2y,
         |         covar_pop(x1, x2) AS c12,
         |         var_pop(x1) AS v1, var_pop(x2) AS v2,
         |         avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my
         |  FROM clean WHERE bucket < 60),
         |b AS (
         |  SELECT
         |    round((c1y*v2 - c2y*c12) / (v1*v2 - c12*c12), 4) + 0 AS b1,
         |    round((c2y*v1 - c1y*c12) / (v1*v2 - c12*c12), 4) + 0 AS b2,
         |    round(my - (c1y*v2 - c2y*c12) / (v1*v2 - c12*c12) * m1
         |             - (c2y*v1 - c1y*c12) / (v1*v2 - c12*c12) * m2, 4) + 0
         |      AS b0
         |  FROM m),
         |calr AS (
         |  SELECT CAST(round(abs(y - (b0 + b1 * x1 + b2 * x2)) * 1e6, 0)
         |    AS BIGINT) AS r
         |  FROM clean, b WHERE bucket >= 60 AND bucket < 80),
         |ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM calr),
         |census AS (
         |  SELECT r, CAST(count(*) AS BIGINT) AS c FROM calr GROUP BY r),
         |cum AS (
         |  SELECT r, sum(c) OVER (ORDER BY r
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM census),
         |q AS (
         |  SELECT max(n_cal) AS n_cal, min(r) AS q_micro
         |  FROM cum, ncal WHERE cum >= ceil((n_cal + 1) * 0.9)),
         |testr AS (
         |  SELECT CAST(round(abs(y - (b0 + b1 * x1 + b2 * x2)) * 1e6, 0)
         |    AS BIGINT) AS r
         |  FROM clean, b WHERE bucket >= 80)
         |SELECT max(q.n_cal) AS n_cal, CAST(count(*) AS BIGINT) AS n_test,
         |  round(max(q.q_micro) / 1e6, 6) AS q_half_width,
         |  round(avg(CASE WHEN r <= q.q_micro THEN 1.0 ELSE 0.0 END), 6)
         |    AS coverage
         |FROM testr, q""".stripMargin
    },
    "q_lr_coeffs" ->
      s"""WITH train AS (
         |  SELECT CAST(l_quantity AS DOUBLE) AS x1,
         |         CAST(l_discount AS DOUBLE) AS x2,
         |         CAST(l_extendedprice AS DOUBLE) AS y
         |  FROM lineitem
         |  WHERE CAST((${md5BucketSqlOf("l_orderkey")}) % 100 AS INTEGER) < 90
         |    AND l_quantity IS NOT NULL AND l_discount IS NOT NULL
         |    AND l_extendedprice IS NOT NULL),
         |m AS (
         |  SELECT covar_pop(x1, y) AS c1y, covar_pop(x2, y) AS c2y,
         |         covar_pop(x1, x2) AS c12,
         |         var_pop(x1) AS v1, var_pop(x2) AS v2,
         |         avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM train)
         |SELECT n,
         |  round((c1y*v2 - c2y*c12) / (v1*v2 - c12*c12), 4) + 0 AS b1,
         |  round((c2y*v1 - c1y*c12) / (v1*v2 - c12*c12), 4) + 0 AS b2,
         |  round(my - (c1y*v2 - c2y*c12) / (v1*v2 - c12*c12) * m1
         |           - (c2y*v1 - c1y*c12) / (v1*v2 - c12*c12) * m2, 4) + 0 AS b0
         |FROM m""".stripMargin,
  )
}
