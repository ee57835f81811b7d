package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.lake.Tables

/** Deduplication operators for the LLM-data-pipeline surface (BASELINE.json
  * north star): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
  * cosine.
  *
  * Scale design (100 TB): every variant is a hash-partitioned plan — no
  * driver-side state, no cross join over the full corpus. Candidate
  * generation always goes through a banding/bucketing key so the self-join
  * is an equi-join on (band, bucket) that Catalyst shuffles by key; only
  * within-bucket pairs are ever materialized. Pair explosion is bounded by
  * bucket size, which the banding parameters control.
  */
object Dedup {

  /** Exact dedup: first row (by doc_id) per normalized-text fingerprint.
    * A hash aggregation on the md5 key — one shuffle of (key, min_id),
    * map-side combined. `dropDuplicates` would be nondeterministic about
    * WHICH row survives; min-id is reproducible. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    docs
      .withColumn("fingerprint", Text.fingerprint(col("text")))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
  }

  /** Number of MinHash hash functions and LSH banding layout: 16 signature
    * slots in 4 bands of 4. Pr[candidate] = 1-(1-j^4)^4 for Jaccard j —
    * the standard S-curve, steep around j ≈ 0.7. */
  val MinhashK = 16
  val Bands    = 4
  val RowsPerBand: Int = MinhashK / Bands

  /** MinHash signature per document: slot h = min over 3-gram shingles of
    * md5(h || '|' || shingle). Using the lexicographic min of a salted md5
    * instead of an integer universal hash keeps the formula portable to the
    * SQL oracle while remaining a valid min-wise independent family.
    * Documents with no shingle (fewer than 3 tokens) are excluded. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val sh   = Text.shingles(col("text"), 3)
    val sigCols = (0 until MinhashK).map { h =>
      array_min(transform(col("shingles"), s => md5(concat(lit(s"$h|"), s))))
        .as(s"mh_$h")
    }
    docs
      .select(col("doc_id"), sh.as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id") +: sigCols: _*)
  }

  /** LSH band buckets: one row per (doc, band), bucket = md5 of the band's
    * signature slots. This is the shuffle key for candidate generation. */
  def minhashBands(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(spark, dir)
    val bandRows = (0 until Bands).map { b =>
      val slots = (b * RowsPerBand until (b + 1) * RowsPerBand).map(h => col(s"mh_$h"))
      sigs.select(col("doc_id"), lit(b).as("band"),
        md5(concat_ws("|", slots: _*)).as("bucket"))
    }
    bandRows.reduce(_.unionAll(_))
  }

  /** Candidate near-duplicate pairs: documents sharing any band bucket.
    * Equi-join on (band, bucket) — partition-local after one shuffle. */
  def minhashCandidatePairs(spark: SparkSession, dir: String): DataFrame = {
    val bands = minhashBands(spark, dir)
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash bits — 16, from the first 4 hex chars of md5(token). Kept
    * small so the identical nibble arithmetic is writable in the oracle. */
  val SimhashBits = 16

  /** 16-bit SimHash per document: each distinct token votes +1/-1 on each
    * bit of its md5-derived 16-bit value; the sign of the summed votes is
    * the fingerprint bit. One explode + one groupBy — both map-side
    * combinable. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val hexVal = {
      // nibble value via position in the hex alphabet (portable to SQL)
      def nib(i: Int) = expr(
        s"instr('0123456789abcdef', substring(md5(token), $i, 1)) - 1")
      nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
    }
    val toks = docs
      .select(col("doc_id"), explode(array_distinct(Text.tokens(col("text")))).as("token"))
      .withColumn("hv", hexVal)
    val bitVotes = (0 until SimhashBits).map { j =>
      sum(when(floor(col("hv") / math.pow(2, j).toLong) % 2 === 1, 1).otherwise(-1)).as(s"v_$j")
    }
    val votes = toks.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until SimhashBits)
      .map(j => when(col(s"v_$j") > 0, math.pow(2, j).toLong).otherwise(0L))
      .reduce(_ + _)
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= 3, banded for scale:
    * the 16 bits split into 4 chunks; by pigeonhole any pair within
    * distance 3 shares at least one exact chunk, so candidates come from an
    * equi-join on (chunk index, chunk value), then the exact Hamming test
    * (bit_count of xor) filters. No quadratic pass anywhere. */
  def simhashNearDupPairs(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val sigs = simhash(spark, dir)
    val chunks = (0 until 4).map { c =>
      sigs.select(col("doc_id"), col("simhash"), lit(c).as("chunk"),
        floor(col("simhash") / math.pow(2, c * 4).toLong).mod(16).as("chunk_val"))
    }.reduce(_.unionAll(_))
    val a = chunks.as("a")
    val b = chunks.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity over banded candidate pairs.
    * Candidates: same (lang, token-count bucket) — an equi-join, not a
    * cross join; at 100 TB the band key keeps bucket sizes O(corpus/banding
    * cardinality) and the shingle join is shuffle-partitioned by shingle.
    * Jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) over DISTINCT 3-gram
    * shingles, computed by exploding shingles and counting joint hits. */
  def ngramJaccardPairs(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(Text.shingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("n_sh", size(col("sh")))
      .withColumn("bucket", floor(col("n_sh") / 20))

    val exploded = docs.select(col("doc_id"), col("lang"), col("bucket"),
      col("n_sh"), explode(col("sh")).as("shingle"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    val joint = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.lang") === col("b.lang")
          && col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
    joint
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Embedding near-dup: pairs with cosine >= threshold, restricted to the
    * same coarse cell (the label column stands in for an IVF coarse
    * quantizer — at scale, cells come from a trained k-means codebook and
    * this same equi-join shape applies). */
  def embeddingNearDupPairs(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val a = emb.as("a")
    val b = emb.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(Vectors.cosine(col("a.embedding"), col("b.embedding")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
