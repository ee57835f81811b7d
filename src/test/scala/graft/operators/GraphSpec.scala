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

  test("localClustering: clique corners score 1, a star centre scores 0, degree-1 nodes drop") {
    import spark.implicits._
    // triangle a-b-c plus star s with leaves l1..l3 (no leaf-leaf edges)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"),
      ("s", "l1"), ("s", "l2"), ("s", "l3")).toDF("term_a", "term_b")
    val got = Graph.localClustering(edges).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set("a", "b", "c", "s"), got.toString) // leaves degree 1 drop
    Seq("a", "b", "c").foreach(n => assert(got(n) == (2L, 1L, 1.0), s"$n -> ${got(n)}"))
    assert(got("s") == (3L, 0L, 0.0), got("s").toString)
  }

  test("localClustering: partial cohesion is the exact triangle/wedge ratio") {
    import spark.implicits._
    // 4-cycle with ONE diagonal: a-b, b-c, c-d, d-a, a-c
    // a: deg 3, triangles {abc, acd} = 2 -> lcc = 2*2/(3*2) = 0.666667
    // b: deg 2, 1 triangle -> 1.0; d likewise; c symmetric to a
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("a", "c"))
      .toDF("term_a", "term_b")
    val got = Graph.localClustering(edges).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("a") == 0.666667 && got("c") == 0.666667, got.toString)
    assert(got("b") == 1.0 && got("d") == 1.0, got.toString)
  }

  test("assortativity: a star is perfectly disassortative (-1), a path scores the hand-computed -0.5") {
    import spark.implicits._
    val star = Seq(("s", "l1"), ("s", "l2"), ("s", "l3")).toDF("term_a", "term_b")
    assert(Graph.assortativity(star).collect()(0).getDouble(1) == -1.0)
    // P4 a-b-c-d: m=6 sj=10 sj2=18 sjk=16 -> (96-100)/(108-100) = -0.5
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("term_a", "term_b")
    val r = Graph.assortativity(path).collect()(0)
    assert(r.getLong(0) == 6L && r.getDouble(1) == -0.5, r.toString)
    // a REGULAR graph has zero degree variance: undefined -> null, no error
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("term_a", "term_b")
    assert(Graph.assortativity(tri).collect()(0).isNullAt(1))
  }

  test("kCore: a pendant chain peels away, the clique survives with in-core degrees; certified matches and under-peeling is visible") {
    import spark.implicits._
    // triangle a-b-c plus chain c-d-e: 2-core = the triangle exactly
    val g = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
      .toDF("term_a", "term_b")
    val core = Graph.kCore(g, k = 2, passes = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core == Map("a" -> 2L, "b" -> 2L, "c" -> 2L), core.toString)
    val cert = Graph.kCoreCertified(g, k = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cert == core, cert.toString)
    // a 7-node chain needs one peel per endpoint pair: 1 fixed pass
    // under-peels (interior nodes still look degree-2), certified empties it
    val chain = (1 to 6).map(i => (s"n$i", s"n${i + 1}")).toDF("term_a", "term_b")
    assert(Graph.kCore(chain, k = 2, passes = 1).count() > 0)
    assert(Graph.kCoreCertified(chain, k = 2).count() == 0)
    // loud failure rather than a silent half-peel when the cap is too low
    intercept[IllegalStateException] {
      Graph.kCoreCertified(chain, k = 2, maxPasses = 1)
    }
    // checkpoint discipline: the plan must not nest one join per pass
    def planNodes(passes: Int): Int =
      Graph.kCore(g, k = 2, passes = passes)
        .queryExecution.optimizedPlan.collect { case p => p }.size
    assert(planNodes(4) == planNodes(8),
      s"plan grows with passes: ${planNodes(4)} vs ${planNodes(8)}")
  }

  test("labelPropagation: two cliques over a bridge resolve to two communities of min label") {
    import spark.implicits._
    // K3 {a,b,c} — bridge c-x — K3 {x,y,z}: the hand-traced 3-sweep run
    // (self-vote, min-label ties) lands a,b,c -> 'a' and x,y,z -> 'x'
    val g = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")).toDF("term_a", "term_b")
    val got = Graph.labelPropagation(g, iterations = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "x" -> 3L), got.toString)
    // plan O(1) in iteration count (checkpoint discipline)
    def planNodes(it: Int): Int =
      Graph.labelPropagation(g, iterations = it)
        .queryExecution.optimizedPlan.collect { case p => p }.size
    assert(planNodes(3) == planNodes(6),
      s"plan grows with iterations: ${planNodes(3)} vs ${planNodes(6)}")
  }

  test("modularity: bridged cliques score the hand value; one community scores 0; clean split scores 0.5") {
    import spark.implicits._
    val bridged = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")).toDF("term_a", "term_b")
    val labels = Graph.labelPropagationLabels(bridged, 3)
    val r = Graph.modularity(bridged, labels).collect()(0)
    // |sym| = 14, internal 6+6, degree sums 7+7: 12/14 − 98/196 = 0.357143
    assert(r.getLong(0) == 7L && r.getLong(1) == 2L, r.toString)
    assert(r.getDouble(2) == 0.357143, r.toString)
    // everything in one community -> Q = 1 − 1 = 0 exactly
    val one = bridged.select(col("term_a").as("node")).unionByName(
      bridged.select(col("term_b").as("node"))).distinct()
      .withColumn("label", lit("all"))
    assert(Graph.modularity(bridged, one).collect()(0).getDouble(2) == 0.0)
    // two disjoint triangles, true partition: 12/12 − 72/144 = 0.5
    val disjoint = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z")).toDF("term_a", "term_b")
    val q = Graph.modularity(disjoint,
      Graph.labelPropagationLabels(disjoint, 3)).collect()(0)
    assert(q.getDouble(2) == 0.5, q.toString)
  }

  test("bfsHops: chain distances from a multi-source seed set; budget bounds reach") {
    import spark.implicits._
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("f", "g"))
      .toDF("term_a", "term_b")
    val seeds = Seq("a", "f").toDF("node")
    val got = Graph.bfsHops(g, seeds, maxHops = 4).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3, "e" -> 4,
      "f" -> 0, "g" -> 1), got.toString)
    // hop budget: e is 4 hops out, absent at maxHops = 3
    val short = Graph.bfsHops(g, seeds, maxHops = 3).collect()
      .map(_.getString(0)).toSet
    assert(!short.contains("e") && short.contains("d"), short.toString)
  }

  test("bfsHopsFrontier ≡ bfsHops on converged and budget-cut inputs; early-exits on frontier exhaustion") {
    import spark.implicits._
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("f", "g"),
      ("b", "h"), ("h", "c")) // a diamond (b-c via h) exercises re-discovery
      .toDF("term_a", "term_b")
    val seeds = Seq("a", "f").toDF("node")
    for (hops <- Seq(2, 3, 4, 8)) { // 8 > eccentricity: frontier empties early
      val full = Graph.bfsHops(g, seeds, maxHops = hops).collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      val delta = Graph.bfsHopsFrontier(g, seeds, maxHops = hops).collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(delta == full, s"maxHops=$hops: $delta vs $full")
    }
    // isolated seed (no edges touch it): present at hop 0 in both forms
    val iso = Graph.bfsHopsFrontier(g, Seq("zz").toDF("node"), 3).collect()
    assert(iso.map(r => r.getString(0) -> r.getInt(1)).toSeq == Seq("zz" -> 0))
  }

  test("personalizedPageRank: mass stays on the seed's reachable set; hand-unrolled scores; conservation") {
    import spark.implicits._
    // s -> a -> b (b dangling) plus an unreachable pair x -> y
    val g = Seq(("s", "a", 1L), ("a", "b", 1L), ("x", "y", 1L))
      .toDF("src", "dst", "w")
    val got = Graph.personalizedPageRank(g, Seq("s").toDF("node"),
      iterations = 3).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // unreachable-from-seed nodes score EXACTLY 0 (not 1/N-ish)
    assert(got("x") == 0.0 && got("y") == 0.0, got.toString)
    // hand unroll (damping 0.85, dangling mass returns to the seed):
    // it1: s=.15 a=.85 b=0; it2: s=.15 a=.1275 b=.7225
    // it3: s=.15+.85*.7225=.764125 a=.1275 b=.108375
    assert(got("s") == 0.764125 && got("a") == 0.1275 && got("b") == 0.108375,
      got.toString)
    // walk-with-restart conserves unit mass on the reachable set
    assert(math.abs(got.values.sum - 1.0) < 1e-9, got.values.sum.toString)
    // two seeds: restart mass splits 1/|S| each
    val two = Graph.personalizedPageRank(g, Seq("s", "x").toDF("node"),
      iterations = 1).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(two("s") == 0.075 && two("x") == 0.075, two.toString)
    assert(two("a") == 0.425 && two("y") == 0.425, two.toString)
  }

  test("adamicAdar: 4-cycle diagonals score 2/ln(2); hub df-cap drops capped wedges") {
    import spark.implicits._
    val square = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("term_a", "term_b")
    val got = Graph.adamicAdar(square, k = 10, maxDeg = 100).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val aa = BigDecimal(2.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(("a", "c", 2L, aa), ("b", "d", 2L, aa)),
      got.mkString(","))
    // star: centre deg 5 > maxDeg 3 and leaves deg 1 < 2 -> no wedges
    val star = (1 to 5).map(i => ("hub", s"l$i")).toDF("term_a", "term_b")
    assert(Graph.adamicAdar(star, k = 10, maxDeg = 3).count() == 0)
    // uncapped, the 10 leaf pairs all score 1/ln(5)
    val open = Graph.adamicAdar(star, k = 20, maxDeg = 10).collect()
    assert(open.length == 10 && open.forall(r =>
      math.abs(r.getDouble(3) - 1.0 / math.log(5.0)) < 1e-5))
  }
}
