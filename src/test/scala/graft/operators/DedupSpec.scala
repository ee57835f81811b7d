package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** North-star dedup operators over the sf0.001 driver tables. The pair
  * queries are additionally cross-checked against the straightforward
  * self-join formulation — the one-pass bucket-expansion rewrite must
  * produce the identical pair set. */
class DedupSpec extends SparkSpec {

  test("exactDedup partitions the corpus: copies sum to the doc count, survivor is min id") {
    val docs = Tables(spark, sfDir, "documents")
    val d = Dedup.exactDedup(spark, sfDir)
    assert(d.agg(sum("n_copies")).head().getLong(0) == docs.count())
    assert(d.select("fingerprint").distinct().count() == d.count())
  }

  test("minhash signatures are deterministic and complete") {
    val s1 = Dedup.minhashSignatures(spark, sfDir)
    assert(s1.columns.toSeq == "doc_id" +: (0 until Dedup.MinhashK).map(h => s"mh_$h"))
    val a = s1.orderBy("doc_id").collect()
    val b = Dedup.minhashSignatures(spark, sfDir).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("minhash candidate pairs == the self-join formulation (one-pass rewrite equivalence)") {
    val got = Dedup.minhashCandidatePairs(spark, sfDir)
    val bands = Dedup.minhashBands(spark, sfDir)
    val expected = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    assert(got.count() == expected.count())
    assert(got.except(expected).count() == 0 && expected.except(got).count() == 0)
    assert(got.filter(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("simhash near-dup pairs == the self-join formulation, all within maxDist") {
    val got = Dedup.simhashNearDupPairs(spark, sfDir, 3)
    assert(got.filter(col("hamming") > 3).count() == 0)
    val sigs = Dedup.simhash(spark, sfDir)
    val chunks = (0 until Dedup.SimhashChunks).map { c =>
      sigs.select(col("doc_id"), col("simhash"), lit(c).as("chunk"),
        floor(col("simhash") / (1L << (c * Dedup.ChunkBits)))
          .mod(1 << Dedup.ChunkBits).as("chunk_val"))
    }.reduce(_.unionAll(_))
    val expected = chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
    assert(got.except(expected).count() == 0 && expected.except(got).count() == 0)
  }

  test("pigeonhole completeness: every pair within Hamming 3 shares a chunk (is found)") {
    val sigs = Dedup.simhash(spark, sfDir)
    val all = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= 3)
    val got = Dedup.simhashNearDupPairs(spark, sfDir, 3)
    assert(all.except(got).count() == 0)   // banding loses NOTHING within distance 3
  }

  test("hot-bucket cap: a planted 1000-copy document expands linearly, not quadratically") {
    import spark.implicits._
    // 1000 identical documents + a few distinct ones: every band bucket of
    // the copies holds all 1000 ids. Uncapped that is C(1000,2) = 499500
    // pairs materialized from a single row; capped it must be the 999
    // min-id star pairs.
    val docs = ((0 until 1000).map(i => (i.toLong, "the same exact duplicated text body repeated"))
      ++ Seq((2000L, "a completely different document about spark plans"),
             (2001L, "yet another unrelated piece of text entirely")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairsOf(docs).collect()
    assert(pairs.length == 999, s"expected 999 star pairs, got ${pairs.length}")
    assert(pairs.forall(_.getLong(0) == 0L), "star pairs must anchor on the min doc_id")
    assert(pairs.map(_.getLong(1)).toSet == (1L until 1000L).toSet)
    // below the cap the expansion is the full pair set (unchanged semantics)
    val small = Dedup.minhashCandidatePairsOf(docs.filter(col("doc_id") < 4))
    assert(small.count() == 6)  // C(4,2)
  }

  test("cluster form: every copy maps to the min-id representative; distinct docs to themselves") {
    import spark.implicits._
    val docs = ((0 until 50).map(i => (i.toLong, "the same exact duplicated text body repeated"))
      ++ Seq((100L, "a completely different document about spark plans")))
      .toDF("doc_id", "text")
    val clusters = Dedup.minhashClustersOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 50).forall(i => clusters(i.toLong) == 0L))
    assert(clusters(100L) == 100L)
    // cluster output is one row per (shingled) document
    assert(clusters.size == 51)
  }

  test("jaccard verify stage: scores bounded, pairs are a subset of LSH candidates") {
    val pairs = Dedup.ngramJaccardPairs(spark, sfDir, 0.5)
    assert(pairs.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).count() == 0)
    val cand = Dedup.minhashCandidatePairs(spark, sfDir)
    assert(pairs.select("doc_a", "doc_b").except(cand).count() == 0)
  }

  test("embedding near-dup pairs stay within cosine bounds and cell restriction") {
    val pairs = Dedup.embeddingNearDupPairs(spark, sfDir, 0.3)
    assert(pairs.filter(col("cosine") < 0.3 || col("cosine") > 1.0001).count() == 0)
    assert(pairs.filter(col("vec_a") >= col("vec_b")).count() == 0)
  }
}
