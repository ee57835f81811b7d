package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** Degree-oriented triangle enumeration: parity with brute force, each
  * triangle exactly once, and the hub-proof orientation property. */
class GraphSpec extends SparkSpec {

  private def bruteTriangles(edges: Set[(String, String)]): Set[(String, String, String)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def linked(x: String, y: String) =
      edges.contains((x, y)) || edges.contains((y, x))
    (for {
      i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
      if linked(nodes(i), nodes(j)) && linked(nodes(j), nodes(k)) &&
        linked(nodes(i), nodes(k))
    } yield (nodes(i), nodes(j), nodes(k))).toSet
  }

  test("triangles ≡ brute force on a fixture with a hub (K4 + pendant + hub star)") {
    import spark.implicits._
    // K4 on a-d (4 triangles), hub h adjacent to everything (closes more),
    // pendant p adjacent only to a (no triangle through p-h-a? h-p edge
    // absent, so none)
    val edges = Set(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"),
      ("a", "p"))
    val df = edges.toSeq.toDF("term_a", "term_b")
    val got = Graph.triangles(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // exactly once each: no duplicate rows
    assert(got.length == got.toSet.size, "duplicate triangles")
    assert(got.toSet == bruteTriangles(edges), s"got ${got.toSet}")
    // K4 alone has 4; hub closes 6 more (one per K4 edge + none via p)
    assert(got.length == 10)
  }

  test("triangles ≡ brute force on the real skip-gram term graph") {
    val edges = Retrieval.windowCooccurrence(
      Tables(spark, sfDir, "documents"), 3, 50)
    val edgeSet = edges.select("term_a", "term_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) => a != b }.toSet
    val got = Graph.triangles(edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == bruteTriangles(edgeSet), s"${got.size} vs brute ${bruteTriangles(edgeSet).size}")
    assert(got.nonEmpty)
  }

  test("connectedComponents: chain + pair converge to min labels; self-loops dropped") {
    import spark.implicits._
    // components: {a,b,c,d} (chain, diameter 3), {x,y}; self-loop z-z
    // contributes no node (self-loops are no-op edges)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("z", "z"))
      .toDF("term_a", "term_b")
    val got = Graph.connectedComponents(edges, iterations = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"), got.toString)
    // under-iterating a long chain leaves the far end unconverged;
    // labels are still monotone valid partial states
    val one = Graph.connectedComponents(edges, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(one("d") == "c" && one("b") == "a", one.toString)
  }

  test("degreeDistribution: hub and leaves counted, self-loops dropped") {
    import spark.implicits._
    // star: h-1..h-4 (h degree 4, leaves degree 1) + self-loop
    val edges = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"),
      ("h", "h")).toDF("term_a", "term_b")
    val got = Graph.degreeDistribution(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 4L -> 1L), got.toString)
  }

  test("pageRank: one iteration hand-computed with a dangling sink; mass conserved") {
    import spark.implicits._
    // A -> B, A -> C, B -> A; C is a dangling sink (its mass spreads
    // uniformly). init 1.0 each, damping 0.85:
    //   dmass = 1 (C); contrib: A<-1.0, B<-0.5, C<-0.5
    //   s(X) = 0.15 + 0.85*(c + 1/3)
    val edges = Seq(("A", "B", 1L), ("A", "C", 1L), ("B", "A", 1L))
      .toDF("src", "dst", "w")
    val one = Graph.pageRank(edges, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(one == Map("A" -> 1.283333, "B" -> 0.858333, "C" -> 0.858333),
      one.toString)
    // after more iterations the mass still sums to ~n (teleport +
    // redistribution conserve it; only round-6 noise remains)
    val three = Graph.pageRank(edges, iterations = 3)
      .collect().map(_.getDouble(1)).sum
    assert(math.abs(three - 3.0) < 1e-4, three.toString)
  }

  test("hits: on a directed star the center is the pure hub, leaves split authority") {
    import spark.implicits._
    // center -> each of 3 leaves: center has ALL hub mass, zero authority;
    // leaves have equal authority 1/sqrt(3), zero hub
    val edges = Seq(("c", "l1", 1L), ("c", "l2", 1L), ("c", "l3", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.hits(edges).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r("c") == ((0.0, 1.0)), s"center: ${r("c")}")
    val third = BigDecimal(1 / math.sqrt(3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq("l1", "l2", "l3").foreach { l =>
      assert(r(l) == ((third, 0.0)), s"$l: ${r(l)}")
    }
    // L2 norms of both score vectors are 1 (up to round-6 noise)
    val (an, hn) = (r.values.map(v => v._1 * v._1).sum,
      r.values.map(v => v._2 * v._2).sum)
    assert(math.abs(an - 1.0) < 1e-4 && math.abs(hn - 1.0) < 1e-4, s"$an $hn")
  }
}
