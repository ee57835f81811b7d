package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** BM25 lexical retrieval — the keyword complement to the ANN tier: given a
  * small set of (query_id, query_text) pairs, score every document with
  * Okapi BM25 over whitespace terms and keep the top-k per query.
  *
  * Scale shape: the query-term set is tiny and BROADCAST; corpus tokens are
  * filtered to query terms map-side right after the explode, so only
  * matched (doc, term) rows — a vanishing fraction of 100 TB — ever reach
  * an exchange. Per-term document frequencies and the global (N, avgdl)
  * stats row are broadcast back. Doc length is computed map-side in the
  * same scan that explodes the tokens.
  *
  * Oracle parity: avgdl is rounded to 4 decimals BEFORE scoring and the
  * final score to 4 after summing, so IEEE drift between engines cannot
  * reorder the (score, doc_id) ranking except at exact 1e-4 boundaries.
  */
object Retrieval {

  /** Per-document top-m keywords by smoothed TF-IDF
    * (idf = ln((N+1)/(df+1)) + 1, the sklearn smoothing). Unlike
    * [[bm25TopK]] there is no query to pre-filter on, so the full
    * token-frequency aggregation is inherent — but it map-side-combines
    * (repeated terms in a doc collapse before the exchange), the
    * vocabulary-sized df table is broadcast back, and the top-m cut is a
    * per-doc window over vocabulary-bounded rows. */
  def tfidfKeywords(docs: DataFrame, m: Int): DataFrame = {
    // The term-frequency table feeds BOTH the per-term document
    // frequencies and the scoring join. Materialize it ONCE
    // (localCheckpoint, the Dedup-CC pattern): exchange reuse cannot be
    // relied on here — Catalyst rewrites the df-branch aggregate into a
    // bare distinct (pruning `tf`), making the subtrees structurally
    // different, and the corpus would be scanned + exploded twice. At
    // cluster scale this is the persisted inverted-index artifact.
    val tf = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // rowcount-only scan: parquet answers count(*) from footer metadata
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score", round(
        col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 4))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= m)
      .select(col("doc_id"), col("term"), col("tf"), col("score"), col("rank"))
  }

  /** Document-level term co-occurrence with pointwise mutual information:
    * PMI(a,b) = ln(n_ab · N / (df_a · df_b)) over distinct-terms-per-doc
    * presence rows. The within-doc distinct is `array_distinct` — map-side,
    * BEFORE the explode, so the presence relation carries no duplicate
    * (doc, term) rows into the self-join. The self-join is co-partitioned
    * on doc_id (one exchange, reused for both sides); document frequencies
    * are broadcast back.
    *
    * `topV` is the 100 TB guard: without it a document with d distinct
    * terms emits C(d,2) pair rows — a 10⁴-term web page is ~5·10⁷ rows
    * from ONE document before `minPairCount` can drop anything. With
    * `topV = Some(v)` presence is semi-joined against the broadcast top-v
    * terms by document frequency (ties broken by term, deterministic)
    * BEFORE the self-join, so per-doc blowup is bounded by C(v, 2) and the
    * self-join input by v·N. Per-term df values are unchanged by the
    * filter (removing OTHER terms' rows cannot change df of a surviving
    * term), so PMI for surviving pairs is identical to the uncapped run. */
  def cooccurrencePmi(docs: DataFrame, minPairCount: Long,
      topV: Option[Int] = None): DataFrame = {
    // presence feeds THREE consumers (both self-join sides + the df
    // aggregate); materialize it once like the retrieval tf tables —
    // otherwise the df branch re-scans and re-tokenizes the corpus
    val presenceAll = docs.select(col("doc_id"),
      explode(array_distinct(Text.tokens(col("text")))).as("term"))
      .localCheckpoint(false)
    val presence = topV match {
      case None => presenceAll
      case Some(v) =>
        // vocabulary-sized aggregate → TakeOrderedAndProject → broadcast
        // semi-join: the cap costs one pass over the (already
        // checkpointed) presence rows and never shuffles the corpus side
        val vocab = presenceAll.groupBy(col("term"))
          .agg(count(lit(1)).as("vdf"))
          .orderBy(col("vdf").desc, col("term")).limit(v)
          .select(col("term"))
        presenceAll.join(broadcast(vocab), "term")
          .select(col("doc_id"), col("term"))
          .localCheckpoint(false)
    }
    val pairs = presence.as("a")
      .join(presence.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val dft = presence.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    pairs
      .join(broadcast(dft.select(col("term").as("term_a"), col("df").as("df_a"))), "term_a")
      .join(broadcast(dft.select(col("term").as("term_b"), col("df").as("df_b"))), "term_b")
      .crossJoin(broadcast(stats))
      .select(col("term_a"), col("term_b"), col("n_ab"),
        round(log(col("n_ab").cast("double") * col("n_docs") / (col("df_a") * col("df_b"))), 4).as("pmi"))
  }

  /** Context-window (skip-gram) co-occurrence: unordered token pairs
    * within `window` positions of each other, the embedding-training
    * counterpart of document-level [[cooccurrencePmi]]. Where the
    * document-level form needs a doc_id self-join, this one needs NO join
    * at all: every document emits its pairs from one traversal of its own
    * token array (position i pairs with i+1..i+window) — a map-side
    * projection whose output is ≤ window·tokens rows, then a single
    * map-side-combinable count aggregate. The per-doc blowup is bounded
    * by the window, not the vocabulary, so no top-V cap is needed.
    * Pairs are normalized (least, greatest); a token repeated within a
    * window pairs with itself, as in word2vec context counting.
    *
    * The pair emission is the native codegen'd
    * [[graft.expressions.SkipgramPairs]] — the declarative
    * `flatten(transform(sequence, i -> transform(sequence, j -> ...)))`
    * formulation runs as interpreted HOFs and allocates a nested array
    * per position (bit-parity-asserted in VectorExpressionsSpec). */
  def windowCooccurrence(docs: DataFrame, window: Int,
      minPairCount: Long): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    docs.select(Text.tokens(col("text")).as("t"))
      .select(explode(call_function("graft_skipgram", col("t"), lit(window))).as("p"))
      .groupBy(col("p.a").as("term_a"), col("p.b").as("term_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
  }

  /** TextRank keyword extraction: weighted PageRank over the
    * [[windowCooccurrence]] term graph (Mihalcea & Tarau 2004). Terms are
    * nodes, co-occurrence counts are edge weights, and after `iterations`
    * damped power steps the top-`topK` scores are the corpus keywords —
    * the graph-centrality upgrade of [[tfidfKeywords]] (a term matters if
    * it co-occurs with terms that matter, not merely if it is frequent).
    *
    * Scale shape: the graph is VOCABULARY-bounded — after the one
    * corpus-wide pair pass (windowCooccurrence, map-side emission, no
    * join) every relation here is O(edges ≥ minPairCount), orders smaller
    * than the corpus. Each iteration is one co-partitioned join + one
    * map-side-combinable sum; the transition relation is checkpointed once
    * and each score generation is checkpointed so lineage (and plan size)
    * stays O(1) in the iteration count — the Dedup-CC iteration pattern.
    *
    * Determinism: transition probabilities are exact integer ratios and
    * every generation's scores are ROUNDED to 6 before the next step, so
    * both engines iterate on identical inputs and cross-engine float drift
    * cannot compound across iterations. */
  def textrank(docs: DataFrame, window: Int, minPairCount: Long,
      damping: Double = 0.85, iterations: Int = 3, topK: Int = 20): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = windowCooccurrence(docs, window, minPairCount)
    // undirected: each edge contributes both directions (self-loops from
    // within-window repeats stay single — a=b emits one row)
    val sym = e.select(col("term_a").as("src"), col("term_b").as("dst"), col("n_ab").as("w"))
      .unionByName(e.filter(col("term_a") =!= col("term_b"))
        .select(col("term_b").as("src"), col("term_a").as("dst"), col("n_ab").as("w")))
    val deg = sym.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    val trans = sym.join(deg, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("wdeg")).as("p"))
      .localCheckpoint(false)
    var scores = deg.select(col("src").as("term"), lit(1.0).as("score"))
    (1 to iterations).foreach { _ =>
      scores = trans.join(scores.withColumnRenamed("term", "src"), "src")
        .groupBy(col("dst").as("term"))
        .agg(round(lit(1 - damping) + lit(damping) * sum(col("p") * col("score")), 6)
          .as("score"))
        .localCheckpoint(false)
    }
    scores.orderBy(col("score").desc, col("term")).limit(topK)
  }

  def bm25TopK(docs: DataFrame, queries: Seq[(Int, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val queryTerms = queries
      .flatMap { case (qid, q) => q.toLowerCase.trim.split("\\s+").distinct.map((qid, _)) }
      .toDF("query_id", "term")

    // corpus side: one scan — doc length + token explode, then the
    // broadcast semi-filter down to query terms
    val matched = docs
      .select(col("doc_id"), Text.tokenCount(col("text")).as("dl"),
        explode(Text.tokens(col("text"))).as("term"))
      .join(broadcast(queryTerms.select(col("term")).distinct()), "term")

    // tf is tiny (query terms only) but feeds two consumers; checkpointing
    // it keeps the df branch from re-scanning and re-exploding the whole
    // corpus (see tfidfKeywords for why exchange reuse can't be relied on)
    val tf = matched.groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    // global stats: a single row, attached like the ANN codebook
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      round(avg(Text.tokenCount(col("text"))), 4).as("avgdl"))
    scoreAndRank(tf, queryTerms, stats, k, k1, b)
  }

  /** Scoring tail shared by the direct and the from-artifact paths: per-term
    * document frequency from the (already query-filtered) tf rows, Okapi
    * weight, per-query top-k. `stats` is one (n_docs, avgdl) row. */
  private def scoreAndRank(tf: DataFrame, queryTerms: DataFrame,
      stats: DataFrame, k: Int, k1: Double, b: Double): DataFrame = {
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dft), "term")
      .join(broadcast(queryTerms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("w",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("w")), 4).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }

  /** Hybrid retrieval fusion by Reciprocal Rank Fusion: rrf(d) =
    * Σ_lists 1/(c + rank_list(d)) over a lexical (BM25) and a semantic
    * (ANN cosine) ranking — the standard way to combine keyword and
    * embedding retrieval WITHOUT calibrating their incomparable score
    * scales (ranks are scale-free; c=60 is the published default).
    * Candidates found by only one list still score (the other term is 0).
    *
    * `lexical` is a (query_id, doc_id, rank) ranking ([[bm25TopK]]);
    * `semantic` is (q_id, vec_id, rank) ([[Similarity.bruteForceTopK]] or
    * any ANN variant — fusion is agnostic to how the ranking was made).
    * Both inputs are per-query top-k relations — queries × k rows — so
    * the fusion join and re-rank cost nothing against the retrieval
    * itself; the rrf score is rounded BEFORE ranking so the fused order
    * (tie-break doc_id) is engine-exact. */
  def hybridRrf(lexical: DataFrame, semantic: DataFrame,
      c: Int = 60): DataFrame = {
    val lex = lexical.select(col("query_id"), col("doc_id"),
      col("rank").as("lex_rank"))
    val sem = semantic.select(col("q_id").as("query_id"),
      col("vec_id").as("doc_id"), col("rank").as("sem_rank"))
    lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        round(coalesce(lit(1.0) / (lit(c) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("sem_rank")), lit(0.0)), 6)
          .as("rrf"),
        col("lex_rank"), col("sem_rank"))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id"))))
  }

  /** Ranking-quality evaluation — NDCG@k and reciprocal rank per query
    * (Järvelin & Kekäläinen, TOIS 2002), the scorecard that closes the
    * retrieval loop: [[bm25TopK]]/[[hybridRrf]] PRODUCE rankings, this
    * measures them against graded relevance. DCG uses the standard
    * exponential gain (2^rel − 1)/log2(rank + 1); IDCG re-ranks the
    * query's graded pool by (rel desc, doc_id) so ndcg ∈ [0, 1] is
    * comparable across queries; rr = 1/rank of the first result with
    * rel ≥ `relThreshold` (0 when none).
    *
    * Determinism: gains are exact integers over a log2 of an integer —
    * identical in both engines; dcg/idcg round to 6 BEFORE the ndcg
    * division (sub-round partial-agg noise cannot leak), ndcg rounds the
    * rounded ratio.
    *
    * Scale shape: both inputs are per-query top-k relations (queries × k
    * rows — the corpus work already happened inside the retrieval
    * operators); the label join, ideal re-rank window and per-query fold
    * all run on that grid, so evaluation cost is O(queries·k) no matter
    * the corpus size. */
  def rankingQuality(system: DataFrame, graded: DataFrame, k: Int = 10,
      relThreshold: Int = 2): DataFrame = {
    val gain: Column => Column = rel => pow(lit(2.0), rel) - lit(1.0)
    val sys = system.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"))
      .join(graded, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val dcg = sys.groupBy(col("query_id"))
      .agg(round(sum(gain(col("rel")) /
          log2(col("rank").cast("double") + 1.0)), 6).as("dcg"),
        coalesce(max(when(col("rel") >= relThreshold,
          lit(1.0) / col("rank"))), lit(0.0)).as("rr_raw"))
    val ideal = graded
      .withColumn("irank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rel").desc, col("doc_id"))))
      .filter(col("irank") <= k)
      .groupBy(col("query_id"))
      .agg(round(sum(gain(col("rel")) /
        log2(col("irank").cast("double") + 1.0)), 6).as("idcg"))
    dcg.join(ideal, "query_id")
      .select(col("query_id"), col("dcg"), col("idcg"),
        round(col("dcg") / col("idcg"), 6).as("ndcg"),
        round(col("rr_raw"), 6).as("rr"))
  }

  // ---- persisted inverted-index artifact (build once / ingest deltas /
  // serve many) — the lexical twin of the IVF assignment artifact: at
  // 100 TB the corpus is tokenized ONCE at build time, daily deltas append
  // without touching history, and every query run reads only postings.

  /** Exact PHRASE search via positional postings: docs where the phrase's
    * tokens appear consecutively, with the occurrence count — the
    * "multi-word query" BM25's bag-of-words scoring cannot answer.
    *
    * Plan: ONE corpus pass posexplodes (token, position); each phrase
    * term's postings are that relation filtered to the term (the filter
    * sits directly on the generator output — map-side, before any
    * exchange), normalized to the phrase START position (pos − i), and
    * equi-joined on (doc, start): k-term phrases are k−1 hash joins
    * between term-sized relations, never a scan of the corpus per term.
    * A persisted deployment writes the posexploded relation bucketed by
    * term (the positional twin of [[buildIndex]]) and each query reads
    * only its terms' buckets. Repeated terms ("batch batch") work: the
    * normalized starts of the i-th copy intersect only where copies are
    * truly adjacent. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "phrase needs at least two tokens")
    val toks = docs.select(col("doc_id"),
      posexplode(Text.tokens(col("text"))).as(Seq("pos", "w")))
    phrase.zipWithIndex.map { case (term, i) =>
      toks.filter(col("w") === term)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }.reduce(_.join(_, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** One posting per (term, doc) with the doc's length — tokenization paid
    * once, at build time. */
  private def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Text.tokenCount(col("text")).as("dl"),
        explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** ADDITIVE stats rows (n_docs, sum_dl) — each build/ingest appends one;
    * the serve path sums them, so avgdl is always corpus-exact without
    * ever rewriting history (`sum_dl / n_docs` over longs is the same
    * double division `avg` performs in [[bm25TopK]]). */
  private def statsRowOf(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(Text.tokenCount(col("text")).cast("long")).as("sum_dl"))

  /** Write the index artifact for `docs` at `dir` (postings + stats). */
  def buildIndex(docs: DataFrame, dir: String): Unit = {
    postingsOf(docs).write.mode("overwrite").parquet(s"$dir/postings")
    statsRowOf(docs).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Append a delta batch: only the DELTA is tokenized; existing postings
    * and stats files are untouched (append, never rewrite). */
  def ingestIndex(delta: DataFrame, dir: String): Unit = {
    postingsOf(delta).write.mode("append").parquet(s"$dir/postings")
    statsRowOf(delta).write.mode("append").parquet(s"$dir/stats")
  }

  /** BM25 served from the artifact — no tokenization anywhere: postings are
    * semi-filtered to the broadcast query terms straight off the scan (at
    * cluster scale, bucket the postings by term to prune that scan too),
    * document frequencies count the matched postings, and the stats rows
    * fold into one (n_docs, avgdl) broadcast row. Result is row-identical
    * to [[bm25TopK]] over the same corpus. */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: Seq[(Int, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val queryTerms = queries
      .flatMap { case (qid, q) => q.toLowerCase.trim.split("\\s+").distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val tf = spark.read.parquet(s"$dir/postings")
      .join(broadcast(queryTerms.select(col("term")).distinct()), "term")
    val stats = spark.read.parquet(s"$dir/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .select(col("n_docs"),
        round(col("sum_dl").cast("double") / col("n_docs"), 4).as("avgdl"))
    scoreAndRank(tf, queryTerms, stats, k, k1, b)
  }

  /** Per-document n-gram novelty: the fraction of a document's DISTINCT
    * word n-grams found in NO other document — the memorization /
    * boilerplate screen of a curation pass (novelty → 0 means the doc is
    * assembled from corpus-common phrasing; → 1 means it contributes
    * genuinely unseen n-grams, the complement of the span-dedup tier).
    *
    * Shape: per-doc distinct grams explode once; document frequency is a
    * WINDOW CENSUS over the gram (the groupBy-then-join-back collapsed to
    * one shuffle, the SpanDedup pattern), and the df=1 fraction folds per
    * document in the second and last shuffle. Documents with fewer than
    * `n` tokens have no grams and are absent (novelty undefined). */
  def ngramNovelty(docs: DataFrame, n: Int = 5): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(Text.shingles(col("text"), n))).as("gram"))
    grams.withColumn("df", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        round(avg(when(col("df") === 1, 1.0).otherwise(0.0)), 6).as("novelty"))
  }

  /** Zipf-law fit over the term-frequency census: OLS of ln(freq) on
    * ln(rank) for the top-N terms — slope ≈ −1 is the natural-language
    * signature, a flat slope flags synthetic/templated corpora and a
    * cliff flags boilerplate mass (a one-row corpus-health probe).
    *
    * Scale shape: the corpus pass is the term census (map-side combined);
    * the top-N cut is TakeOrdered (per-partition partial top-N, no global
    * sort of the vocabulary), and the rank window + OLS run on N rows.
    * The closed-form slope/intercept/r² derive from one aggregate over
    * the N (ln rank, ln freq) points; intercept and r² reuse the RAW
    * slope expression so both engines evaluate identical arithmetic. */
  def zipfFit(docs: DataFrame, topN: Int = 1000): DataFrame = {
    val tok = docs.select(explode(Text.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val top = tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(topN)
    val pts = top
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("cnt").desc, col("term"))).cast("long"))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    val s = pts.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val slopeRaw = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    s.select(col("n").as("n_terms"),
      round(slopeRaw, 4).as("slope"),
      round((col("sy") - slopeRaw * col("sx")) / col("n"), 4).as("intercept"),
      round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
        ((col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy"))), 4).as("r2"))
  }
}
