package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Text
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

  test("wide banding (8x2): candidates and verified pairs are supersets of 4x4; catches j~0.5 planted pairs") {
    import spark.implicits._
    // any pair agreeing on a 4-slot band agrees on both its 2-slot halves,
    // so on the real corpus wide candidates must contain narrow ones
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrowCand = pairs(Dedup.minhashCandidatePairsOf(docs, bands = 4))
    val wideCand = pairs(Dedup.minhashCandidatePairsOf(docs, bands = 8))
    assert(narrowCand.subsetOf(wideCand),
      s"missing from wide: ${(narrowCand -- wideCand).take(5)}")
    assert(pairs(Dedup.ngramJaccardPairsOf(docs, 0.5, bands = 4))
      .subsetOf(pairs(Dedup.ngramJaccardPairsOf(docs, 0.5, bands = 8))))

    // planted corpus of 20 pairs at jaccard ~0.5 (60 shared + 30 unique
    // tokens each): S-curve predicts ~0.21 candidate recall for 4x4 vs
    // ~0.89 for 8x2 there — the knob's reason to exist
    val rnd = new scala.util.Random(7)
    def words(n: Int) = Seq.fill(n)("w" + rnd.nextInt(1000000).toString).mkString(" ")
    val planted = (0 until 20).flatMap { i =>
      val common = words(60)
      Seq((2 * i.toLong, common + " " + words(30)),
        (2 * i.toLong + 1, common + " " + words(30)))
    }.toDF("doc_id", "text")
    val truePairs = (0 until 20).map(i => (2 * i.toLong, 2 * i.toLong + 1)).toSet
    val narrowHit = (pairs(Dedup.ngramJaccardPairsOf(planted, 0.4, bands = 4)) & truePairs).size
    val wideHit = (pairs(Dedup.ngramJaccardPairsOf(planted, 0.4, bands = 8)) & truePairs).size
    assert(wideHit > narrowHit && wideHit >= 12,
      s"wide=$wideHit narrow=$narrowHit of 20 planted j~0.5 pairs")
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
    // uncapped: the equivalence under test is the one-pass bucket-expansion
    // rewrite vs the self-join; the hot-bucket cap (deliberate pair loss)
    // has its own planted spec below
    val docs = Tables(spark, sfDir, "documents")
    val got = Dedup.simhashNearDupPairsOf(docs, 3, maxBucket = Int.MaxValue)
    assert(got.filter(col("hamming") > 3).count() == 0)
    val sigs = Dedup.simhash(spark, sfDir)
    // integer div, NOT floor(x / 2^k): above 2^53 the double division the
    // floor formulation implies is no longer exact
    val chunks = (0 until Dedup.SimhashChunks).map { c =>
      sigs.select(col("doc_id"), col("simhash"), lit(c).as("chunk"),
        expr(s"simhash div ${1L << (c * Dedup.ChunkBits)}")
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

  test("simhash pairs: join-free one-pass plan (in-bucket expansion), no cache left behind") {
    // delta-based: other operators (CC) legitimately hold a small label
    // checkpoint; THIS operator must not add any persisted blocks
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Dedup.simhashNearDupPairs(spark, sfDir, 3)
    df.collect()   // run THIS dataset's QueryExecution so AQE finalizes it
    val executed = df.queryExecution.executedPlan.toString
    assert(!executed.contains("Join"),
      s"simhash candidates must come from in-bucket expansion, not a self-join:\n${executed.take(3000)}")
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty, s"simhashNearDupPairs left persisted blocks behind: $added")
  }

  test("simhash hot-bucket cap: a planted 1000-copy document expands linearly, not quadratically") {
    import spark.implicits._
    // 1000 identical documents: every copy has the IDENTICAL 60-bit
    // fingerprint, so all four chunk buckets hold all 1000 ids. Uncapped
    // that is C(1000,2) = 499500 pairs materialized from each of 4 bucket
    // rows; capped it must be the 999 min-id star pairs (deduped across
    // the 4 chunks), all at Hamming 0.
    val docs = ((0 until 1000).map(i => (i.toLong, "the same exact duplicated text body repeated"))
      ++ Seq((2000L, "a completely different document about spark plans")))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairsOf(docs).collect()
    assert(pairs.length == 999, s"expected 999 star pairs, got ${pairs.length}")
    assert(pairs.forall(_.getLong(0) == 0L), "star pairs must anchor on the min doc_id")
    assert(pairs.forall(_.getInt(2) == 0), "identical copies must be at Hamming 0")
    assert(pairs.map(_.getLong(1)).toSet == (1L until 1000L).toSet)
    // below the cap the expansion is the full pair set (unchanged semantics)
    val small = Dedup.simhashNearDupPairsOf(docs.filter(col("doc_id") < 4))
    assert(small.count() == 6)  // C(4,2)
  }

  test("pigeonhole completeness: every pair within Hamming 3 shares a chunk (is found)") {
    val sigs = Dedup.simhash(spark, sfDir)
    val all = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= 3)
    val got = Dedup.simhashNearDupPairsOf(Tables(spark, sfDir, "documents"),
      3, maxBucket = Int.MaxValue)
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

  test("containment catches a planted subset pair that the jaccard threshold misses") {
    import spark.implicits._
    // doc 1 is a strict prefix of doc 2: containment(1→2) = 1.0 but
    // jaccard = 10/14 ≈ 0.71 — under a 0.8 jaccard bar, over a 0.95
    // containment bar. Filler docs keep the corpus non-trivial.
    val sub  = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val sup  = sub + " nu xi omicron pi"
    val docs = (Seq((1L, sub), (2L, sup)) ++
      (10 until 30).map(i => (i.toLong, s"filler$i words nothing shared here at all index $i"))
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairsOf(docs, 0.95, bands = 8).collect()
    assert(cont.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L
      && r.getDouble(2) == 1.0), s"subset pair not found: ${cont.mkString(",")}")
    // the symmetric score reports the size ratio, not 1.0
    assert(cont.find(r => r.getLong(0) == 1L).get.getDouble(3) < 0.8)
    val jac = Dedup.ngramJaccardPairsOf(docs, 0.8, bands = 8)
    assert(!jac.collect().exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "jaccard at 0.8 should miss the subset pair containment catches")
  }

  test("containment-LSH catches an extreme size-ratio subset the jaccard banding misses") {
    import spark.implicits._
    // a 50-token doc embedded VERBATIM in a 5000-token doc: containment
    // 1.0 but jaccard ≈ 48/4998 ≈ 0.01 — the Jaccard-tuned MinHash
    // banding (Pr ≈ 1-(1-j²)^8 ≈ 4e-4 even at 8×2) never surfaces it;
    // the bottom-k probe sketch guarantees it (every probe of the small
    // side hits the host)
    val subTokens = (0 until 50).map(i => s"sub$i")
    val sub  = subTokens.mkString(" ")
    val host = ((0 until 2500).map(i => s"pre$i") ++ subTokens ++
      (0 until 2450).map(i => s"post$i")).mkString(" ")
    val docs = (Seq((1L, sub), (2L, host)) ++
      (10 until 30).map(i => (i.toLong, s"filler$i words nothing shared here at all index $i"))
    ).toDF("doc_id", "text")
    val viaJaccardBanding = Dedup.containmentPairsOf(docs, 0.95, bands = 8).collect()
    assert(!viaJaccardBanding.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "jaccard-banded candidates should (by the S-curve) miss the j≈0.01 subset pair")
    val viaContainLsh = Dedup.containmentLshPairsOf(docs, 0.95).collect()
    val hit = viaContainLsh.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(hit.isDefined, s"containment-LSH missed the planted subset: ${viaContainLsh.mkString(",")}")
    assert(hit.get.getDouble(2) == 1.0)            // cont(A→B): all of A inside B
    assert(hit.get.getDouble(3) < 0.05)            // mirror direction: tiny
    // every emitted pair clears the threshold in at least one direction
    viaContainLsh.foreach(r =>
      assert(math.max(r.getDouble(2), r.getDouble(3)) >= 0.95, r.toString))
  }

  test("incremental minhash candidates: delta + corpus-only pairs decompose the full pair set") {
    // pairs(all) = pairs(existing) ∪ [cross + within-incoming] — exact as
    // long as no bucket crosses the star-pair cap (none at this SF)
    val docs = Tables(spark, sfDir, "documents")
    val ex  = docs.filter(col("doc_id") < 250)
    val inc = docs.filter(col("doc_id") >= 250)
    val delta = Dedup.incrementalMinhashCandidates(ex, inc)
    val full  = Dedup.minhashCandidatePairsOf(docs)
    val exOnly = Dedup.minhashCandidatePairsOf(ex)
    val union = delta.unionByName(exOnly).distinct()
    assert(union.except(full).count() == 0 && full.except(union).count() == 0)
    // the delta never reports an existing↔existing pair
    assert(delta.filter(col("doc_a") < 250 && col("doc_b") < 250).count() == 0)
  }

  test("incremental minhash caps the cross expansion against a hot existing bucket") {
    import spark.implicits._
    val dupText = "the same exact duplicated text body repeated"
    val existing = (0 until 1000).map(i => (i.toLong, dupText)).toDF("doc_id", "text")
    val incoming = (2000 until 2100).map(i => (i.toLong, dupText)).toDF("doc_id", "text")
    val pairs = Dedup.incrementalMinhashCandidates(existing, incoming).collect()
    // uncapped the cross side alone would be 100 x 1000 pairs; capped:
    // each incoming copy pairs only with the existing bucket's min-id
    // representative (0), plus the 99 within-batch star pairs
    assert(pairs.length == 199, s"expected 199 capped pairs, got ${pairs.length}")
    val cross = pairs.filter(_.getLong(0) == 0L)
    assert(cross.length == 100 && cross.map(_.getLong(1)).toSet == (2000L until 2100L).toSet)
  }

  test("connected components own their band cache (only the label checkpoint outlives)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cc = Dedup.minhashConnectedComponents(spark, sfDir, 2)
    cc.count()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1, s"band cache not released: ${added.size} persisted RDDs added")
  }

  test("clearCcCache: memoized labels are served until cleared, fresh after") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc-memo").toString
    def writeCorpus(ids: Seq[Long]): Unit = ids
      .map(i => (i, s"dup dup dup shared text $i exact same body"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    writeCorpus(Seq(1L, 2L))
    val first = Dedup.minhashCcLabels(spark, dir, 2).count()
    // rewriting the dir IN-SESSION violates the memo's immutability
    // assumption: the cached labels (not the new corpus) are served
    writeCorpus(Seq(1L, 2L, 3L, 4L))
    assert(Dedup.minhashCcLabels(spark, dir, 2).count() == first)
    Dedup.clearCcCache()
    assert(Dedup.minhashCcLabels(spark, dir, 2).count() == 4)
  }

  test("connected components: converged labels == driver union-find over the candidate graph") {
    val docs = Tables(spark, sfDir, "documents")
    // ground truth: union-find over the (uncapped connectivity-preserving)
    // candidate pairs, components labeled by their min doc_id
    val edges = Dedup.minhashCandidatePairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = Dedup.minhashBandsOf(docs).select("doc_id").distinct()
      .collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = nodes.map(n => n -> find(n)).toMap
    // 8 iterations >> the bucket-graph diameter at this SF -> converged
    val got = Dedup.minhashConnectedComponentsOf(docs, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "converged CC labels differ from union-find components")
    // one propagation step == the minhashClusters shape
    val one = Dedup.minhashConnectedComponentsOf(docs, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = Dedup.minhashClustersOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == clusters)
  }

  test("fixpoint-certified CC closes a 5-hop duplicate chain the fixed-3 form under-merges") {
    import spark.implicits._
    // Bucket graph = a PATH of 6 docs: doc i and i+1 share exactly bucket
    // i (the shard-copies-chained-through-partial-overlaps shape). Min-
    // label propagation moves the min one hop per pass, so 3 passes leave
    // the tail labeled by a mid-chain id — the silent under-merge the
    // certified form exists to catch.
    val bands = (1 to 5).flatMap(i =>
        Seq((i.toLong, 0, s"chain-$i"), ((i + 1).toLong, 0, s"chain-$i")))
      .toDF("doc_id", "band", "bucket")
    val fixed3 = Dedup.connectedComponentsFromBands(bands, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed3.values.toSet.size > 1,
      "fixture must be deep enough that 3 passes under-merge")
    val certified = Dedup.connectedComponentsFromBandsCertified(bands)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(certified == (1L to 6L).map(_ -> 1L).toMap,
      s"certified labels wrong: $certified")
    // the safety valve fails loudly instead of shipping half-merged labels
    val boom = intercept[IllegalStateException] {
      Dedup.connectedComponentsFromBandsCertified(bands, maxIterations = 2)
    }
    assert(boom.getMessage.contains("did not converge"))
  }

  test("recall telemetry: MinHash-LSH candidates cover >= 0.9 of true pairs at jaccard >= 0.7") {
    // The S-curve Pr[candidate] = 1-(1-j^4)^4 gives ~0.67 at exactly
    // j=0.7, ~0.88 at 0.8, >0.99 at 0.9 — so the measured operating point
    // only clears 0.9 when the true-pair population sits well above the
    // threshold, which is what near-duplicate corpora look like: planted
    // one-token-dropped copies have j ~ (S-1)/S ~ 0.97+. This spec pins
    // that operating point with numbers instead of citing the curve.
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val dups = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val corpus = docs.unionByName(dups)
    // exact all-pairs Jaccard over distinct 3-gram shingles — viable at
    // test N only; this is the oracle the LSH path approximates
    val sh = corpus
      .select(col("doc_id"), array_distinct(Text.shingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    val truePairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.sh"), col("b.sh"))))
      .withColumn("j", col("inter")
        / (size(col("a.sh")) + size(col("b.sh")) - col("inter")))
      .filter(col("j") >= 0.7)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.size >= 50, s"expected >= 50 planted true pairs, got ${truePairs.size}")
    val cand = Dedup.minhashCandidatePairsOf(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = truePairs.count(cand)
    assert(hit >= 0.9 * truePairs.size,
      s"MinHash-LSH recall $hit/${truePairs.size} below 0.9 at j >= 0.7")
  }

  test("embed near-dup recall telemetry: multi-cell assignment finds >= 0.6 of true pairs") {
    import graft.functions.Vectors
    // exact all-pairs ground truth — viable at test N only
    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"), Vectors.norm(col("embedding")).as("nrm"))
    val exact = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        round(Vectors.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
      .filter(col("cos") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.embeddingNearDupPairs(spark, sfDir, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), "reported pairs must be true pairs (no false positives)")
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.6, s"embed pair recall $recall (${got.size}/${exact.size}) below 0.6")
  }

  test("embedding near-dup pairs stay within cosine bounds and cell restriction") {
    val pairs = Dedup.embeddingNearDupPairs(spark, sfDir, 0.3)
    assert(pairs.filter(col("cosine") < 0.3 || col("cosine") > 1.0001).count() == 0)
    assert(pairs.filter(col("vec_a") >= col("vec_b")).count() == 0)
  }

  test("semantic dedup survivors: min-id-wins complement of the pair relation") {
    val all = graft.lake.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val pruned = Dedup.embeddingNearDupPairs(spark, sfDir, 0.3)
      .select(col("vec_b")).collect().map(_.getLong(0)).toSet
    val survivors = Dedup.semanticDedupSurvivors(spark, sfDir, 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == all -- pruned)
    // the lowest id of every near-dup pair always survives its pair
    // partner's pruning decision (vec_a < vec_b by construction), so the
    // survivor set is never empty where pairs exist
    assert((all -- pruned).nonEmpty)
    // determinism: independent evaluation returns the identical set
    assert(Dedup.semanticDedupSurvivors(spark, sfDir, 0.3)
      .collect().map(_.getLong(0)).toSet == survivors)
  }

  test("incremental semantic dedup: corpus wins regardless of id; in-batch min-id wins") {
    import spark.implicits._
    def v(x: Double*) = x.map(_.toFloat).toArray
    val corpus = Seq(
      (0L, v(1, 0, 0, 0)), // centroid seed (vec_id % 2 == 0)
      (2L, v(0, 1, 0, 0))
    ).toDF("vec_id", "embedding")
    val delta = Seq(
      (100L, v(1, 0.01, 0, 0)),    // near-dup of corpus 0 -> pruned
      (101L, v(0, 0, 1, 0)),       // novel direction -> survives
      (102L, v(0, 0, 0.99, 0.05)), // near-dup of lower-id 101 -> pruned
      (103L, v(0, 0, 0, 1))        // novel -> survives
    ).toDF("vec_id", "embedding")
    val got = Dedup.incrementalSemanticSurvivors(corpus, delta, 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(101L, 103L), s"got $got")
    // the corpus itself is never re-scored: survivors are delta-only
    assert(got.forall(_ >= 100L))
  }

  test("leakage-safe split: a near-dup cluster never straddles the split bands") {
    val rows = Dedup.minhashCcLabels(spark, sfDir, 3)
      .select(col("doc_id"), col("cluster_id"),
        Sampling.splitExpr(Sampling.hashBucket(col("cluster_id"))).as("split"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every member of a cluster carries its representative's split
    val byCluster = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byCluster.forall(_._2.size == 1),
      s"clusters straddling splits: ${byCluster.filter(_._2.size > 1).take(3)}")
    // the banding is the standard 90/5/5 over cluster ids — all three
    // bands exist at this corpus size and the assignment is a pure
    // function of cluster_id (layout-invariant by construction)
    assert(rows.map(_._3).toSet == Set("train", "valid", "test"))
  }
}
