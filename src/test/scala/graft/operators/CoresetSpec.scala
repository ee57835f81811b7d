package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** Greedy k-center selection: cluster coverage, the descending max-min
  * invariant, and layout invariance of the trace. */
class CoresetSpec extends SparkSpec {

  test("kCenterGreedy covers all planted clusters before revisiting one") {
    import spark.implicits._
    // three tight clusters along orthogonal axes + a jitter dimension;
    // greedy farthest-first must take one point from each cluster in its
    // first three picks (any second visit to a covered cluster is nearer
    // than an untouched one)
    def pt(axis: Int, jitter: Double): Seq[Float] =
      (0 until 4).map(i => (if (i == axis) 1.0f else 0.0f)) :+ jitter.toFloat
    val rows = (0 until 30).map { i =>
      val cluster = i % 3
      (i.toLong, pt(cluster, 0.01 * (i / 3)), cluster)
    }
    val emb = rows.toDF("vec_id", "embedding", "cluster")
    val sel = Coreset.kCenterGreedy(emb, 3)
      .join(emb.select(col("vec_id"), col("cluster")), "vec_id")
      .orderBy(col("sel_order"))
      .collect()
    assert(sel.map(_.getAs[Int]("cluster")).toSet.size == 3,
      s"first 3 picks must span the 3 clusters: ${sel.mkString(", ")}")
  }

  test("kCenterGreedy trace: min_dist descends and bounds the cover radius") {
    val emb = Tables(spark, sfDir, "embeddings")
    val trace = Coreset.kCenterGreedy(emb, 6).orderBy(col("sel_order")).collect()
    assert(trace.length == 6)
    assert(trace.head.isNullAt(2), "seed has no prior set -> NULL min_dist")
    val dists = trace.tail.map(_.getDouble(2))
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b },
      s"greedy max-min must descend: ${dists.mkString(", ")}")
    // every unselected point sits within the LAST selection distance + eps
    // of some center (the classic 2-approximation certificate)
    val ids = trace.map(_.getLong(1)).toSet
    val centers = emb.filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("ce"))
    val maxMin = emb.filter(!col("vec_id").isInCollection(ids))
      .crossJoin(broadcast(centers.agg(collect_list(struct(col("ce"))).as("cs"))))
      .select(max(lit(1.0) - array_max(transform(col("cs"), c =>
        graft.functions.Vectors.cosine(col("embedding"), c.getField("ce"))))))
      .head().getDouble(0)
    assert(maxMin <= dists.last + 1e-6,
      s"cover radius $maxMin exceeds the final selection distance ${dists.last}")
  }

  test("kCenterGreedy is layout-invariant") {
    val emb = Tables(spark, sfDir, "embeddings")
    val a = Coreset.kCenterGreedy(emb, 4).collect().map(_.toSeq).toSet
    val b = Coreset.kCenterGreedy(emb.repartition(7), 4).collect().map(_.toSeq).toSet
    assert(a == b, "selection trace must not depend on partitioning")
  }
}
