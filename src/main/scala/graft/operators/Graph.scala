package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge relations (the term co-occurrence
  * graph, entity graphs). PageRank lives in [[Retrieval.textrank]]; the
  * dedup tier's connected components live in [[Dedup]]; this hosts the
  * structural census operators.
  */
object Graph {

  /** Triangle enumeration by DEGREE-ORDERED ORIENTATION (the canonical
    * distributed scheme: Cohen's MapReduce triangle counting / Suri &
    * Vassilvitskii WWW'11): orient every undirected edge from its
    * lower-degree endpoint to its higher-degree endpoint (ties by name),
    * build wedges only from each node's OUT-edges, and close them against
    * the oriented edge list. Every triangle is found exactly once — from
    * its lowest-degree corner.
    *
    * Why this survives scale: naive wedge counting explodes on hubs (a
    * degree-10⁶ node contributes 5·10¹¹ wedges); orientation bounds
    * out-degree by O(√m) on any graph (a node of out-degree d has d
    * higher-degree neighbours, so m ≥ d²/2), making total wedge count
    * O(m^1.5) — the arboricity bound — regardless of hub skew. The two
    * joins are plain equi-joins Catalyst shuffles on src/(v,w).
    *
    * `edges` is undirected, one row per edge (term_a < term_b). Output:
    * one row per triangle, corners sorted. */
  def triangles(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("term_a").as("u"), col("term_b").as("v"))
      .unionByName(edges.select(col("term_b").as("u"), col("term_a").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
    // orient: keep (u, v) iff (d(u), u) < (d(v), v) — a total order, so
    // exactly one direction survives per edge
    val oriented = sym
      .join(deg.select(col("u"), col("d").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      .filter(struct(col("du"), col("u")) < struct(col("dv"), col("v")))
      .select(col("u"), col("v"), col("dv"))
    // wedge endpoints ordered by the SAME (degree, name) total order the
    // orientation uses, so the closing edge can only be b -> c
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    wedges.join(oriented.as("e3"),
        col("b") === col("e3.u") && col("c") === col("e3.v"))
      .select(least(col("a"), col("b"), col("c")).as("term_a"),
        // the middle corner: neither min nor max
        (array_sort(array(col("a"), col("b"), col("c"))))(1).as("term_b"),
        greatest(col("a"), col("b"), col("c")).as("term_c"))
  }
}
