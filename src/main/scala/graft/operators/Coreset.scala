package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Diversity-driven subset selection over the embedding corpus — the
  * coverage complement of the dedup tiers: dedup REMOVES redundant
  * points, k-center selection KEEPS a small set that spans the space
  * (seed-set curation, labeling-budget allocation, eval-set design).
  *
  * Greedy farthest-point-first traversal (Gonzalez 1985) is a
  * 2-approximation to the optimal k-center cover and the standard
  * coreset construction for data selection (Sener & Savarese, ICLR
  * 2018, "Active Learning for CNNs: A Core-Set Approach").
  */
object Coreset {

  /** Greedy k-center selection trace: the seed (smallest `vec_id` — a
    * deterministic, layout-free anchor), then k−1 rounds of "add the
    * point FARTHEST (max-min cosine distance) from everything selected
    * so far". Output is one row per selected point:
    * `(sel_order, vec_id, min_dist)` where `min_dist` is the point's
    * distance to the previously-selected set at the moment of its
    * selection (the seed's is NULL). `min_dist` descends (a classic
    * invariant of the greedy trace) and the LAST value bounds the cover:
    * every unselected point is within that radius of some center.
    *
    * Scale shape: the selected set is folded into ONE broadcast row
    * (k ≤ hundreds), so each round is a single map-side pass over the
    * never-shuffled corpus — min-distance via an array fold over the
    * broadcast structs — finished by a `TakeOrderedAndProject` top-1
    * (never a global sort). The selected relation is localCheckpoint'ed
    * per round (the Lloyd/CC control-plane discipline), keeping the plan
    * O(1) in k; total cost is k corpus passes, each cheaper than one
    * brute-force ANN query batch. Distances are rounded to 6 dp BEFORE
    * the argmax with `vec_id` as tie-break, so the trace is engine-exact
    * and layout-invariant. */
  def kCenterGreedy(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", Vectors.norm(col("e")))
      .localCheckpoint(false)
    var sel = base.orderBy(col("vec_id")).limit(1)
      .select(lit(0).as("sel_order"), col("vec_id"), col("e"), col("nrm"),
        lit(null).cast("double").as("min_dist"))
      .localCheckpoint(false)
    for (t <- 1 until k) {
      val selRow = sel
        .agg(collect_list(struct(col("e"), col("nrm"))).as("cs"))
      val next = base
        .join(broadcast(sel.select(col("vec_id"))), Seq("vec_id"), "left_anti")
        .crossJoin(broadcast(selRow))
        .withColumn("md", round(lit(1.0) - array_max(transform(col("cs"),
          c => Vectors.dot(col("e"), c.getField("e"))
            / (col("nrm") * c.getField("nrm")))), 6))
        .orderBy(col("md").desc, col("vec_id")).limit(1)
        .select(lit(t).as("sel_order"), col("vec_id"), col("e"), col("nrm"),
          col("md").as("min_dist"))
      sel = sel.unionByName(next).localCheckpoint(false)
    }
    sel.select(col("sel_order"), col("vec_id"), col("min_dist"))
  }
}
