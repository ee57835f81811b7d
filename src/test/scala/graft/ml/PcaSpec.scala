package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Power-iteration top component: recovers a planted dominant direction,
  * returns a unit vector, and is layout-independent. */
class PcaSpec extends SparkSpec {

  test("topComponentPower recovers a planted dominant direction as a unit vector") {
    import spark.implicits._
    // 200 vectors in R^64: dominant variance along e0 (amplitude i-scaled),
    // small deterministic off-axis noise elsewhere
    val data = (0 until 200).map { i =>
      val amp = (i - 100).toDouble / 10.0
      val v = Array.tabulate(64)(j =>
        if (j == 0) amp.toFloat
        else (math.sin(i * 31 + j) * 0.05).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val comp = Pca.topComponentPower(data).orderBy("dim").collect()
    val loadings = comp.map(_.getDouble(1))
    assert(math.abs(math.abs(loadings(0)) - 1.0) < 0.01,
      s"dominant axis loading ${loadings(0)}")
    val norm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"not unit: $norm")
    val eig = comp.head.getDouble(2)
    assert(eig > 0, s"eigenvalue $eig")
    // layout independence: same result after repartition
    val b = Pca.topComponentPower(data.repartition(7)).orderBy("dim").collect()
    assert(comp.map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      b.map(r => (r.getInt(0), r.getDouble(1))).toSeq)
  }

  test("plan size is O(1) in the iteration count (covariance + iterate anchored)") {
    import spark.implicits._
    val data = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 13 + j).toFloat))
    }.toDF("vec_id", "embedding")
    def planNodes(iters: Int): Int =
      Pca.topComponentPower(data, iters)
        .queryExecution.optimizedPlan.map(_ => 1).size
    val (n3, n6) = (planNodes(3), planNodes(6))
    assert(n3 == n6,
      s"plan grows with iterations: $n3 nodes at 3 iters vs $n6 at 6")
  }
}
