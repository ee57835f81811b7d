package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** Theta-sketch set algebra: exactness below the sampling threshold, the
  * merge laws (append ≡ rebuild, rollup ≡ direct), estimation-regime
  * accuracy on >2^lgK streams, and the overlap-check booleans. */
class ThetaSpec extends SparkSpec {

  import spark.implicits._

  private lazy val li = Tables(spark, sfDir, "lineitem")

  private def estimate(df: DataFrame, value: String): Double =
    df.agg(call_function("graft_theta_estimate",
        call_function("graft_theta_agg", col(value), lit(Sketches.ThetaLgK)))
        .as("est"))
      .head().getDouble(0)

  test("exact regime: estimate equals the true distinct count") {
    val exact = li.select(col("l_partkey")).distinct().count().toDouble
    assert(estimate(li, "l_partkey") == exact) // < 2^12 distinct → no sampling
  }

  test("string values sketch identically to their distinct set") {
    val df = Seq("a", "b", "a", "c", "b").toDF("s")
    assert(estimate(df, "s") == 3.0)
  }

  test("overlap check: intersection and difference are exact on the fixture") {
    val pivot = lit("1998-06-01").cast("timestamp")
    val row = Sketches.thetaOverlapCheck(
      li.filter(col("l_shipdate") < pivot),
      li.filter(col("l_shipdate") >= pivot), "l_partkey").head()
    val Seq(a, b, ov, onlyA) = (0 to 3).map(row.getLong(_))
    assert(a == ov + onlyA)               // A partitions into (A∩B) ⊎ (A\B)
    assert(ov > 0 && b > 0)
    assert((4 to 7).forall(row.getBoolean(_)), row.toString)
  }

  test("disjoint slices: overlap estimate is exactly zero") {
    val row = Sketches.thetaOverlapCheck(
      spark.range(0, 1000).toDF("id"), spark.range(1000, 2000).toDF("id"),
      "id").head()
    assert(row.getLong(2) == 0L)          // exact_overlap
    assert(row.getBoolean(6))             // ok_overlap: estimate must be 0 too
  }

  test("thetaIngest: appending a delta equals rebuilding over the union") {
    val old = li.filter(col("l_orderkey") % 3 =!= 0)
    val delta = li.filter(col("l_orderkey") % 3 === 0)
    val cells = Seq("l_returnflag", "l_linestatus")
    def estimates(artifact: DataFrame) =
      Sketches.thetaServe(artifact, cells).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val appended = Sketches.thetaIngest(
      Sketches.thetaBuild(old, cells, "l_partkey"), delta, cells, "l_partkey")
    assert(estimates(appended) ==
      estimates(Sketches.thetaBuild(li, cells, "l_partkey")))
  }

  test("thetaServe rollup of cell sketches ≡ sketching the rollup directly") {
    val cells = Seq("l_returnflag", "l_linestatus")
    def byFlag(artifact: DataFrame) =
      Sketches.thetaServe(artifact, Seq("l_returnflag")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFlag(Sketches.thetaBuild(li, cells, "l_partkey")) ==
      byFlag(Sketches.thetaBuild(li, Seq("l_returnflag"), "l_partkey")))
  }

  test("estimation regime: 200k-distinct stream lands within the error bound") {
    // far above 2^12 nominal entries → sampling engages; RSE ≈ 1.6%, assert 5%
    val big = spark.range(0, 200000).toDF("id")
    val est = estimate(big, "id")
    assert(math.abs(est - 200000) <= 200000 * 0.05, s"est $est")
    // half-overlapping halves: intersection estimate within 10%
    val row = Sketches.thetaOverlapCheck(
      spark.range(0, 150000).toDF("id"), spark.range(50000, 200000).toDF("id"),
      "id", bound = 0.10).head()
    assert(row.getLong(2) == 100000L)
    assert((4 to 7).forall(row.getBoolean(_)), row.toString)
  }

  test("theta functions are reachable from plain SQL") {
    li.createOrReplaceTempView("li_theta")
    val est = spark.sql(
      """SELECT graft_theta_estimate(graft_theta_agg(l_partkey, 12)) AS est
        |FROM li_theta""".stripMargin).head().getDouble(0)
    assert(est == li.select(col("l_partkey")).distinct().count().toDouble)
  }
}
