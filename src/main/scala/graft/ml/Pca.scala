package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal component by distributed power iteration — the
  * embedding-quality probe ("how much of the corpus' variance is one
  * direction?") and the first step of any spectral factorization.
  *
  * Shape: the d×d covariance is ONE pass over the corpus in long format
  * (vec_id co-partitioned self-join of the centered entries, map-side
  * combinable sums; d² = 4096 output rows for d = 64) — the corpus is
  * never touched again. Each power step multiplies the d²-row covariance
  * RELATION by a broadcast d-row vector: plan size O(1) in the iteration
  * count, no driver-side linear algebra, nothing ever collected.
  *
  * Determinism (the TextRank pattern): means and covariance entries are
  * rounded once at their aggregates, and the iterate is re-rounded to 6
  * after every normalization, so float-sum order can never compound
  * across iterations; the all-positive start vector fixes the eigenvector
  * sign. The oracle unrolls the same `iterations` steps as CTEs.
  *
  * `iterations` is a fixed, small count — the operator reports the
  * direction after k steps, bit-identically in both engines; convergence
  * tolerance would introduce a cross-engine control-flow dependence. */
object Pca {

  def topComponentPower(embeddings: DataFrame,
      iterations: Int = 3): DataFrame = {
    val nRow = embeddings.agg(count(lit(1)).as("n"))
    val x = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xi")))
      .withColumn("xi", col("xi").cast("double"))
    val mu = x.groupBy(col("i")).agg(round(avg(col("xi")), 6).as("mi"))
    val xc = x.join(broadcast(mu), "i")
      .select(col("vec_id"), col("i"), (col("xi") - col("mi")).as("xc"))
    val cov = xc
      .join(xc.select(col("vec_id"), col("i").as("j"), col("xc").as("xcj")),
        Seq("vec_id"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("xc") * col("xcj")).as("s"))
      .crossJoin(broadcast(nRow))
      .select(col("i"), col("j"), round(col("s") / col("n"), 6).as("c"))
      // anchor the d²-row covariance ONCE (the HITS/pageRank rule): every
      // power step re-reads this checkpoint instead of re-nesting the
      // corpus self-join, so the plan really is O(1) in `iterations`
      .localCheckpoint(false)
    var v = mu.select(col("i"), lit(0.125).as("v")) // 1/sqrt(64): unit start
    var lastNorm = nRow.select(lit(0.0).as("nrm"))
    for (_ <- 1 to iterations) {
      val u = cov
        .join(broadcast(v.select(col("i").as("j"), col("v"))), "j")
        .groupBy(col("i")).agg(sum(col("c") * col("v")).as("u"))
      lastNorm = u.agg(sqrt(sum(col("u") * col("u"))).as("nrm"))
      v = u.crossJoin(broadcast(lastNorm))
        .select(col("i"), round(col("u") / col("nrm"), 6).as("v"))
        // re-anchor the d-row iterate per step, like HITS' hub/auth
        .localCheckpoint(false)
    }
    v.crossJoin(broadcast(lastNorm.select(round(col("nrm"), 4).as("eigenvalue"))))
      .select(col("i").as("dim"), col("v").as("loading"), col("eigenvalue"))
  }
}
