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
/** IVF-style coarse quantizer: a deterministic sampled codebook (every
  * `CodebookStep`-th vector — random-sample codebooks are a standard IVF
  * initialization; Lloyd iterations would refine, not change the shape)
  * with cell assignment as a PURE PROJECTION.
  *
  * The codebook is collected driver-side — it is bounded (~√N cells in a
  * real deployment) and plays the same role as a broadcast dimension — and
  * baked into the plan as literal arrays, so assigning 100 TB of vectors is
  * a map-only stage: no shuffle, no row explosion, one argmax over C
  * cosines per row. Affinities are rounded to 4 decimals with centroid-id
  * tie-break so the argmax is reproducible in the SQL oracle.
  */
object Quantize {

  /** Sampling stride for the deterministic codebook. */
  val CodebookStep = 50

  def codebook(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % CodebookStep === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))

  /** Codebook as driver-side literals (the IVF codebook always lives with
    * the planner/driver; float->double is exact). */
  def centroidsLocal(emb: DataFrame): Seq[(Long, Seq[Double])] =
    codebook(emb).collect().toSeq.map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))
    }

  /** Per-centroid affinity structs, orderable: (rounded cosine, -c_id) so
    * the natural struct max = highest affinity, smallest id on ties.
    * The embedding's norm is let-bound (computed once, not once per
    * centroid) and centroid norms are Scala-side constants — same
    * sequential-fold doubles the SQL oracle computes at runtime. */
  private def scoredCellsArr(emb: Column, cents: Seq[(Long, Seq[Double])]): Column =
    graft.functions.Text.let(Vectors.norm(emb)) { n =>
      array(cents.map { case (cid, vec) =>
        val normC = math.sqrt(vec.foldLeft(0.0)((acc, x) => acc + x * x))
        struct(round(Vectors.dot(emb, typedlit(vec)) / (n * lit(normC)), 4).as("a"),
          lit(-cid).as("nc"))
      }: _*)
    }

  /** Nearest-centroid cell id — one projection, evaluates in-stage. */
  def cellExpr(emb: Column, cents: Seq[(Long, Seq[Double])]): Column =
    -array_max(scoredCellsArr(emb, cents)).getField("nc")

  /** The `nprobe` nearest cells (affinity desc, id-asc ties) as an array —
    * the query-side multi-probe. */
  def probeCellsExpr(emb: Column, cents: Seq[(Long, Seq[Double])], nprobe: Int): Column =
    transform(
      slice(reverse(array_sort(scoredCellsArr(emb, cents))), 1, nprobe),
      s => -s.getField("nc"))
}

object Similarity {

  /** Corpus with its norm materialized once per vector — every tier pays
    * one norm per VECTOR instead of one per scored pair. */
  private def corpusWithNorm(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"),
      Vectors.norm(col("embedding")).as("nrm"))

  private def queriesSet(spark: SparkSession, dir: String, nQueries: Int): DataFrame =
    corpusWithNorm(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))

  private def pairCosine: Column =
    round(Vectors.dot(col("q_emb"), col("embedding"))
      / (col("q_nrm") * col("nrm")), 4)

  /** Exact top-k cosine neighbors for each of the first `nQueries` vectors.
    * The query side is broadcast; the corpus side streams through a single
    * stage (scan -> cosine -> per-query top-k). Ranking uses row_number
    * with vec_id tie-break for determinism. */
  def bruteForceTopK(spark: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    val corpus = corpusWithNorm(spark, dir)
    val q      = queriesSet(spark, dir, nQueries)
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), pairCosine.as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF ANN with the sampled-codebook quantizer: the corpus is assigned
    * one cell each (map-only projection, [[Quantize.cellExpr]]); each query
    * probes its `nprobe` nearest cells. The equi-join on cell turns the
    * cross product into a partitioned hash join over ~nprobe/C of the
    * corpus — the scale path; recall trades against nprobe. */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      nprobe: Int = 2): DataFrame = {
    val emb    = Tables(spark, dir, "embeddings")
    val cents  = Quantize.centroidsLocal(emb)
    val corpus = corpusWithNorm(spark, dir)
      .withColumn("cell", Quantize.cellExpr(col("embedding"), cents))
    val q = corpusWithNorm(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"),
        explode(Quantize.probeCellsExpr(col("embedding"), cents, nprobe)).as("q_cell"))
    val scored = corpus.join(broadcast(q),
        col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), pairCosine.as("cosine"))
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
    val corpus = corpusWithNorm(spark, dir)
      .withColumn("bucket", lshBucket(col("embedding")))
    val q = queriesSet(spark, dir, nQueries)
      .withColumn("q_bucket", lshBucket(col("q_emb")))
    val scored = corpus.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), pairCosine.as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
