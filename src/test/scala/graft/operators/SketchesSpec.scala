package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** Mergeable-sketch artifacts: the merge laws (append ≡ rebuild,
  * rollup-of-cells ≡ direct) and the accuracy bounds the oracled
  * serve-checks rely on. */
class SketchesSpec extends SparkSpec {

  private lazy val li = Tables(spark, sfDir, "lineitem")

  test("hllIngest: appending a delta equals rebuilding over the union, exactly") {
    val old = li.filter(col("l_orderkey") % 3 =!= 0)
    val delta = li.filter(col("l_orderkey") % 3 === 0)
    val cells = Seq("l_returnflag", "l_linestatus")
    val appended = Sketches.hllIngest(
      Sketches.hllBuild(old, cells, "l_partkey"), delta, cells, "l_partkey")
    def estimates(artifact: org.apache.spark.sql.DataFrame) =
      Sketches.hllServe(artifact, cells).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // register max-merge: the merged artifact is bit-identical in effect
    assert(estimates(appended) == estimates(Sketches.hllBuild(li, cells, "l_partkey")))
  }

  test("hllServe rollup of cell sketches ≡ sketching the rollup directly") {
    val cells = Seq("l_returnflag", "l_linestatus")
    val rolled = Sketches.hllServe(Sketches.hllBuild(li, cells, "l_partkey"),
      Seq("l_returnflag")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.hllServe(
      Sketches.hllBuild(li, Seq("l_returnflag"), "l_partkey"),
      Seq("l_returnflag")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled == direct, s"rollup drifted from direct: $rolled vs $direct")
  }

  test("hllServeCheck: every group within bound of the exact distinct count") {
    val rows = Sketches.hllServeCheck(li, Seq("l_returnflag", "l_linestatus"),
      Seq("l_returnflag"), "l_partkey").collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(2)),
      rows.map(_.toSeq.mkString(",")).mkString("; "))
  }

  test("kllServeCheck: merged-sketch quantiles hold the 1% rank bound; ingest keeps it") {
    val cells = Seq("l_returnflag", "l_linestatus")
    val rows = Sketches.kllServeCheck(li, cells, Seq("l_returnflag"),
      "l_quantity", Seq(0.25, 0.5, 0.75)).collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)),
      rows.map(_.toSeq.mkString(",")).mkString("; "))
    // appending a delta preserves the guarantee (compactor merge)
    val old = li.filter(col("l_orderkey") % 3 =!= 0)
    val delta = li.filter(col("l_orderkey") % 3 === 0)
    val merged = Sketches.kllIngest(
      Sketches.kllBuild(old, cells, "l_quantity"), delta, cells, "l_quantity")
    val med = Sketches.kllServe(merged, Seq("l_returnflag"), Seq(0.5)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // l_quantity is 1..50 integers: a 0.2%-rank-error sketch of an
    // appended artifact must land within one integer step of the median
    exact.foreach { case (k, m) =>
      assert(math.abs(med(k) - m) <= 1.0, s"$k: sketch ${med(k)} vs exact $m")
    }
  }

  test("CMS: estimates dominate exact counts, are exact at collision-free width, and the artifact merges") {
    import spark.implicits._
    val items = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c") ++
      (1 to 40).map(i => s"t$i")).toDF("item")
    val exact = items.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // narrow sketch: 43 distinct items into 3x8 cells — collisions certain
    val narrow = Sketches.cmsBuild(items, "item", d = 3, w = 8)
    val est = Sketches.cmsEstimate(narrow, items, "item", d = 3, w = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: CMS ${est(k)} underestimates exact $n")
    }
    assert(est.exists { case (k, v) => v > exact(k) },
      "3x8 cells over 43 items produced zero collisions — suspicious")
    // wide sketch: no bucket shared -> estimates exact (total cells >> items)
    val wide = Sketches.cmsBuild(items, "item", d = 3, w = 4096)
    val wideEst = Sketches.cmsEstimate(wide, items, "item", d = 3, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wideEst == exact, "wide CMS should be collision-free here")
    // unseen probes: an item absent from the build must estimate 0 when
    // any of its d cells is empty (absent grid cell counts as 0 — true
    // CMS semantics), and must APPEAR in the output (left join, never
    // dropped). The wide grid is collision-free, so all of "zzz-unseen"'s
    // cells are empty.
    val unseen = Sketches.cmsEstimate(wide,
      Seq("a", "zzz-unseen").toDF("item"), "item", d = 3, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unseen == Map("a" -> 30L, "zzz-unseen" -> 0L), unseen.toString)
    // mergeability: build(a ++ b) == re-sum(build(a) ++ build(b)) cell-wise
    val (h1, h2) = (items.limit(40), items.exceptAll(items.limit(40)))
    val merged = Sketches.cmsBuild(h1, "item", 3, 8)
      .unionByName(Sketches.cmsBuild(h2, "item", 3, 8))
      .groupBy("j", "bucket").agg(sum("total").as("total"))
    val direct = narrow.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m2 = merged.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m2 == direct, "CMS merge is not exact")
  }
}
