package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors
import graft.lake.Tables

/** Approximate-nearest-neighbor search over the embedding column
  * (BASELINE.json north star).
  *
  * Three tiers, same interface (query set -> top-k neighbor relation):
  *  - brute force: exact, O(|Q| * N); right answer when |Q| is small and
  *    the corpus fits a broadcast-probe pattern (queries broadcast, corpus
  *    streamed — the 100 TB side is never shuffled).
  *  - IVF-style cell-restricted: probe only the query's coarse cell
  *    (the label column stands in for a k-means codebook assignment) —
  *    the equi-join on cell turns the cross product into a partitioned
  *    hash join. This is the scale path.
  *  - LSH (random hyperplane): sign-bit bucket join; hyperplanes are
  *    derived deterministically from md5 so plans are reproducible.
  */
object Similarity {

  private def queriesSet(spark: SparkSession, dir: String, nQueries: Int): DataFrame =
    Tables(spark, dir, "embeddings").filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))

  /** Exact top-k cosine neighbors for each of the first `nQueries` vectors.
    * The query side is broadcast; the corpus side streams through a single
    * stage (scan -> cosine -> per-query top-k). Ranking uses row_number
    * with vec_id tie-break for determinism. */
  def bruteForceTopK(spark: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    val corpus = Tables(spark, dir, "embeddings")
    val q      = queriesSet(spark, dir, nQueries)
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Vectors.cosine(col("q_emb"), col("embedding")), 4).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style ANN: probe only the query's coarse cell. Same output shape
    * as brute force; recall trades against the number of probed cells
    * (nprobe=1 here; more cells = union more equi-joins). */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    val corpus = Tables(spark, dir, "embeddings")
    val q      = queriesSet(spark, dir, nQueries)
    val scored = corpus.join(broadcast(q),
        col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Vectors.cosine(col("q_emb"), col("embedding")), 4).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Number of LSH hyperplanes (bucket bits). */
  val LshPlanes = 8

  /** Max embedding dimensionality the precomputed plane matrix covers. */
  val LshMaxDims = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim):
    * first 4 hex chars of md5("plane{p}|{d}") as a 16-bit value, scaled to
    * [-0.5, 0.5). Identical to the md5-nibble arithmetic the SQL oracle
    * runs — but evaluated ONCE driver-side (the matrix is a plan literal),
    * not per row: at 100 TB, 8 planes x 64 dims of per-row md5 would
    * dominate the scan. */
  def planeCoefs(plane: Int): Seq[Double] =
    (0 until LshMaxDims).map { d =>
      Integer.parseInt(md5hex(s"plane$plane|$d").substring(0, 4), 16) / 65536.0 - 0.5
    }

  /** Sign-bit LSH bucket id for an embedding: bit p = [dot(v, plane_p) > 0].
    * The plane matrix is a literal array sliced to the embedding's length;
    * the dot is a higher-order-function fold — evaluates in-stage. */
  def lshBucket(emb: Column): Column =
    (0 until LshPlanes).map { p =>
      val coefs = array(planeCoefs(p).map(lit): _*)
      val dotP = aggregate(
        zip_with(emb.cast("array<double>"), slice(coefs, lit(1), size(emb)),
          (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
      when(dotP > 0, math.pow(2, p).toLong).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed ANN: candidates share the query's hyperplane-sign bucket;
    * exact cosine re-ranks within bucket. At 100 TB the bucket column is
    * precomputed and the corpus bucketed/partitioned by it, so a query
    * probe touches one partition. */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    val corpus = Tables(spark, dir, "embeddings")
      .withColumn("bucket", lshBucket(col("embedding")))
    val q = queriesSet(spark, dir, nQueries)
      .withColumn("q_bucket", lshBucket(col("q_emb")))
    val scored = corpus.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Vectors.cosine(col("q_emb"), col("embedding")), 4).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
