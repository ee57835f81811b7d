package graft.operators

import graft.SparkSpec

/** BM25 retrieval: scores match a from-scratch Scala computation, ranking
  * behaves (tf monotonicity, rare-term weighting), the corpus side joins
  * broadcast. */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "cat dog fish"),        // one 'cat'
    (2L, "cat cat dog"),         // two 'cat's, same length
    (3L, "bird bird bird"),      // rare term, no 'cat'
    (4L, "dog fish fowl")        // 'dog' only
  ).toDF("doc_id", "text")

  private def bm25Ref(tf: Long, df: Long, dl: Long, nDocs: Long, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Double =
    math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0) *
      (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

  test("scores match the textbook BM25 formula") {
    val out = Retrieval.bm25TopK(docs, Seq(0 -> "cat bird"), 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toMap
    val round4 = (x: Double) => math.rint(x * 1e4) / 1e4
    // all docs are 3 tokens; avgdl = 3.0; N = 4; df(cat)=2, df(bird)=1
    assert(out(1L) == round4(bm25Ref(1, 2, 3, 4, 3.0)))
    assert(out(2L) == round4(bm25Ref(2, 2, 3, 4, 3.0)))
    assert(out(3L) == round4(bm25Ref(3, 1, 3, 4, 3.0)))
  }

  test("ranking: higher tf wins; rare terms outweigh common ones; k cuts") {
    val ranked = Retrieval.bm25TopK(docs, Seq(0 -> "cat bird"), 2)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id")).toSeq
    // doc 3: tf=3 of a df=1 term beats doc 2's tf=2 of a df=2 term
    assert(ranked == Seq(3L, 2L))

    // multi-query isolation: each query_id ranks independently
    val multi = Retrieval.bm25TopK(docs,
      Seq(0 -> "cat", 1 -> "fish"), 1).collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Long]("doc_id"))).toMap
    assert(multi == Map(0 -> 2L, 1 -> 1L))
  }

  test("tfidfKeywords: smoothed idf ranks distinctive terms first; m cuts") {
    val out = Retrieval.tfidfKeywords(docs, 2).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[String]("term")).toSeq)
      .toMap
    // doc 1 "cat dog fish": all tf=1; cat and fish (df=2) beat dog (df=3),
    // and their score tie breaks on term order
    assert(out(1L) == Seq("cat", "fish"))
    // doc 3: bird tf=3 df=1 is its only (and top) term
    assert(out(3L).head == "bird")
    assert(out.values.forall(_.size <= 2))
    // score matches the sklearn-smoothed formula: tf * (ln((N+1)/(df+1)) + 1)
    val birdScore = Retrieval.tfidfKeywords(docs, 2)
      .filter("doc_id = 3 AND term = 'bird'").head().getAs[Double]("score")
    val round4 = (x: Double) => math.rint(x * 1e4) / 1e4
    assert(birdScore == round4(3 * (math.log(5.0 / 2.0) + 1)))
  }

  test("cooccurrencePmi: co-occurring terms get textbook PMI, disjoint pairs absent") {
    val corpus = Seq(
      (1L, "alpha beta x"), (2L, "alpha beta y"),
      (3L, "alpha beta z"), (4L, "gamma delta w")).toDF("doc_id", "text")
    val out = Retrieval.cooccurrencePmi(corpus, 1).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // alpha & beta appear together in 3 of 4 docs, each with df=3:
    // PMI = ln(3*4 / (3*3)) = ln(4/3)
    assert(out(("alpha", "beta"))._1 == 3L)
    assert(math.abs(out(("alpha", "beta"))._2 - math.log(4.0 / 3.0)) < 1e-3)
    // never-co-occurring pair is absent entirely
    assert(!out.contains(("alpha", "gamma")) && !out.contains(("gamma", "alpha")))
    // within-doc term repeats do not inflate counts (array_distinct)
    val rep = Retrieval.cooccurrencePmi(
      Seq((1L, "alpha alpha beta")).toDF("doc_id", "text"), 1).collect()
    assert(rep.length == 1 && rep.head.getLong(2) == 1L)
  }

  test("windowCooccurrence: hand-counted skip-gram pairs, window bound, degenerate docs") {
    val corpus = Seq(
      (1L, "a b c a"),            // window-3 pairs: ab ac aa bc ab ac
      (2L, "solo"),               // single token: no pairs
      (3L, "")                    // empty: no pairs
    ).toDF("doc_id", "text")
    val out = Retrieval.windowCooccurrence(corpus, 3, 1).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(("a", "b") -> 2L, ("a", "c") -> 2L,
      ("a", "a") -> 1L, ("b", "c") -> 1L), out.toString)
    // window 1 = adjacent bigrams only
    val w1 = Retrieval.windowCooccurrence(corpus, 1, 1).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(w1 == Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("a", "c") -> 1L), w1.toString)
    // join-free: the plan is scan -> explode -> aggregate, no join node
    val plan = Retrieval.windowCooccurrence(corpus, 3, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("cooccurrencePmi topV: capped pairs ⊆ uncapped with identical PMI; per-doc blowup bounded") {
    // 6 docs; 'rare1'/'rare2' co-occur but each has df=1 — below any top-2
    // vocabulary by df — while alpha (df=5) and beta (df=4) dominate
    val corpus = Seq(
      (1L, "alpha beta rare1 rare2"), (2L, "alpha beta x1"),
      (3L, "alpha beta x2"), (4L, "alpha beta x3"),
      (5L, "alpha y1 y2"), (6L, "gamma delta w")).toDF("doc_id", "text")
    val key = (r: org.apache.spark.sql.Row) =>
      ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))
    val full = Retrieval.cooccurrencePmi(corpus, 1).collect().map(key).toMap
    val capped = Retrieval.cooccurrencePmi(corpus, 1, Some(2)).collect().map(key).toMap
    // capped ⊆ uncapped, and surviving pairs carry IDENTICAL (n_ab, pmi) —
    // the vocab filter cannot change a surviving term's df
    assert(capped.keySet.subsetOf(full.keySet))
    capped.foreach { case (k, v) => assert(full(k) == v) }
    // the top-2 vocabulary by df is {alpha, beta}: exactly one pair survives
    assert(capped.keySet == Set(("alpha", "beta")))
    // the low-df pair present in the full run is gone from the capped one
    assert(full.contains(("rare1", "rare2")) && !capped.contains(("rare1", "rare2")))
    // per-doc pair blowup bound: with v = 2 no document can contribute more
    // than C(2,2) = 1 pair, so total n_ab mass ≤ n_docs
    assert(capped.values.map(_._1).sum <= 6L)
  }

  test("index artifact: serve == direct, delta ingest == full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString
    val queries = Seq(0 -> "cat bird", 1 -> "dog fish")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getInt(r.fieldIndex("query_id")), r.getLong(r.fieldIndex("doc_id")),
        r.getDouble(r.fieldIndex("score")), r.getInt(r.fieldIndex("rank")))
    // build over the full corpus: serving the artifact is row-identical to
    // the direct tokenizing path
    Retrieval.buildIndex(docs, s"$dir/full")
    val direct = Retrieval.bm25TopK(docs, queries, 10).collect().map(key).toSet
    val served = Retrieval.bm25FromIndex(spark, s"$dir/full", queries, 10)
      .collect().map(key).toSet
    assert(served == direct)
    // build docs 1-2, ingest 3-4 as a delta: identical serving results —
    // history never re-tokenized, stats rows summed
    Retrieval.buildIndex(docs.filter($"doc_id" <= 2), s"$dir/inc")
    Retrieval.ingestIndex(docs.filter($"doc_id" > 2), s"$dir/inc")
    val incr = Retrieval.bm25FromIndex(spark, s"$dir/inc", queries, 10)
      .collect().map(key).toSet
    assert(incr == direct)
    // two stats rows on disk (one per batch), folded at serve time
    assert(spark.read.parquet(s"$dir/inc/stats").count() == 2)
  }

  test("plan: query terms, document frequencies and stats all broadcast") {
    val plan = Retrieval.bm25TopK(docs, Seq(0 -> "cat bird"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // no shuffled (sort-merge) join anywhere — the only exchanges are the
    // matched-row aggregations and the final per-query window
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("textrank: graph-central hub outranks equally-frequent satellites; scores bounded; deterministic") {
    import spark.implicits._
    // "hub" co-occurs with every satellite; satellites only see the hub
    // and their own repeats — same raw frequency, different centrality
    val sats = Seq("aa", "bb", "cc", "dd")
    val corpus = (1 to 30).flatMap { _ =>
      sats.map(s => s"hub $s hub $s")
    }.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val ranked = Retrieval.textrank(corpus, window = 2, minPairCount = 2,
      iterations = 3, topK = 5).collect()
    assert(ranked.head.getString(0) == "hub",
      s"expected hub first, got ${ranked.map(_.getString(0)).mkString(",")}")
    val hubScore = ranked.head.getDouble(1)
    ranked.tail.foreach(r => assert(r.getDouble(1) < hubScore))
    // damped PageRank scores stay >= (1 - d)
    ranked.foreach(r => assert(r.getDouble(1) >= 0.15))
    // layout must not change the result (rounded per iteration)
    val again = Retrieval.textrank(corpus.repartition(7), window = 2,
      minPairCount = 2, iterations = 3, topK = 5).collect()
    assert(ranked.map(r => (r.getString(0), r.getDouble(1))).toSeq
      == again.map(r => (r.getString(0), r.getDouble(1))).toSeq)
  }

  test("hybridRrf: both-list docs sum reciprocal ranks; single-list docs still score; fused order deterministic") {
    import spark.implicits._
    val lex = Seq((1, 10, 1), (1, 20, 2)).toDF("query_id", "doc_id", "rank")
    val sem = Seq((1, 20, 1), (1, 30, 2)).toDF("q_id", "vec_id", "rank")
    val got = Retrieval.hybridRrf(lex, sem)
      .orderBy("fused_rank")
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getInt(5)))
    // doc 20 is in both lists: 1/61 + 1/62; docs 10/30 single-list
    assert(got.toSeq == Seq(
      (20, math.rint((1.0 / 61 + 1.0 / 62) * 1e6) / 1e6, 1),
      (10, math.rint(1.0 / 61 * 1e6) / 1e6, 2),
      (30, math.rint(1.0 / 62 * 1e6) / 1e6, 3)), got.mkString(","))
  }

  test("phraseSearch: consecutive-only matches, multiple occurrences counted, repeated-term phrases exact") {
    import spark.implicits._
    val docs = Seq(
      (1, "x data row y data row"),   // two occurrences
      (2, "data x row"),              // not adjacent → no match
      (3, "row data"),                // wrong order → no match
      (4, "b b b a"),                 // "b b" overlaps: positions 0,1
      (5, "b a b")                    // repeated term NOT adjacent
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, Seq("data", "row"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 2L), got.toString)
    val rep = Retrieval.phraseSearch(docs, Seq("b", "b"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rep == Map(4 -> 2L), rep.toString)
  }

  test("ngramNovelty: shared grams score 0, unique grams score 1, short docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1, "a b c d e x y"),   // grams: "a b c d e"(shared), "b c d e x", "c d e x y"
      (2, "a b c d e"),       // one gram, shared with doc 1 -> novelty 0
      (3, "p q r s t"),       // one gram, unique -> novelty 1
      (4, "too short")        // < 5 tokens -> absent
    ).toDF("doc_id", "text")
    val got = Retrieval.ngramNovelty(docs, 5)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1, 2, 3), got.toString)
    assert(got(1) == ((3L, 0.666667)), got.toString)
    assert(got(2) == ((1L, 0.0)))
    assert(got(3) == ((1L, 1.0)))
  }

  test("zipfFit recovers the exponent of a planted power-law corpus") {
    import spark.implicits._
    // term t_r appears round(1000 / r) times: an exact Zipf s = 1 corpus
    val text = (1 to 50).flatMap { r =>
      Seq.fill(math.round(1000.0 / r).toInt)(f"t$r%03d")
    }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val row = Retrieval.zipfFit(docs, topN = 50).collect()(0)
    assert(row.getLong(0) == 50)
    val slope = row.getDouble(1)
    assert(math.abs(slope + 1.0) < 0.02, s"slope $slope, expected ~ -1")
    assert(row.getDouble(3) > 0.999, s"r2 ${row.getDouble(3)}")
  }

  test("rankingQuality: the ideal ordering scores ndcg 1 and rr 1; a reversed ranking matches the hand-computed dcg ratio") {
    import org.apache.spark.sql.functions.col
    val graded = Seq((0, 10L, 3), (0, 20L, 2), (0, 30L, 1))
      .toDF("query_id", "doc_id", "rel")
    val ideal = Seq((0, 10L, 1), (0, 20L, 2), (0, 30L, 3))
      .toDF("query_id", "doc_id", "rank")
    val perfect = Retrieval.rankingQuality(ideal, graded, k = 10).collect()(0)
    assert(perfect.getDouble(3) == 1.0 && perfect.getDouble(4) == 1.0, perfect.toString)
    val reversed = Seq((0, 30L, 1), (0, 20L, 2), (0, 10L, 3))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rankingQuality(reversed, graded, k = 10).collect()(0)
    def dcgOf(rels: Seq[Int]): Double =
      BigDecimal(rels.zipWithIndex.map { case (rel, i) =>
        (math.pow(2, rel) - 1) / (math.log(i + 2) / math.log(2)) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (dcg, idcg) = (dcgOf(Seq(1, 2, 3)), dcgOf(Seq(3, 2, 1)))
    assert(got.getDouble(1) == dcg && got.getDouble(2) == idcg, got.toString)
    assert(got.getDouble(3) == BigDecimal(dcg / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, got.toString)
    // first rel >= 2 result sits at rank 2 -> rr = 0.5
    assert(got.getDouble(4) == 0.5, got.toString)
    // a query with NO graded docs in the top-k: dcg 0, rr 0
    val miss = Seq((0, 99L, 1)).toDF("query_id", "doc_id", "rank")
    val m = Retrieval.rankingQuality(miss, graded, k = 10).collect()(0)
    assert(m.getDouble(1) == 0.0 && m.getDouble(4) == 0.0, m.toString)
  }
}
