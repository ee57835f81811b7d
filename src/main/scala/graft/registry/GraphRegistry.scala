package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables
import graft.operators._
import RegistryShared._

/** Registry slice — the graph-analytics family (link analysis, triangle
  * census, cores, mixing). Split out of TextAnalysisRegistry (same
  * conventions; see SparkEntry scaladoc). */
object GraphRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // general PageRank (dangling mass redistributed) over the event-type
    // transition graph — composes the Markov census into the graph tier
    // HITS hubs/authorities over the same event-transition graph as
    // q_pagerank - separates the two link-analysis roles PageRank
    // conflates; unrolled-iteration oracle, L2-normalized + rounded/step
    "q_hits" -> ((s, d) => Graph.hits(
      TimeSeries.markovTransitions(Tables(s, d, "events"))
        .select(col("event_type").as("src"), col("next_type").as("dst"),
          col("n").as("w")))),
    "q_pagerank" -> ((s, d) => Graph.pageRank(
      TimeSeries.markovTransitions(Tables(s, d, "events"))
        .select(col("event_type").as("src"), col("next_type").as("dst"),
          col("n").as("w")))),
    // personalized PageRank seeded at 'signup': restart AND dangling
    // mass return to the seed — relevance-to-seed, not popularity
    "q_ppr" -> ((s, d) => Graph.personalizedPageRank(
      TimeSeries.markovTransitions(Tables(s, d, "events"))
        .select(col("event_type").as("src"), col("next_type").as("dst"),
          col("n").as("w")),
      s.range(1).select(lit("signup").as("node")))),
    // triangle census over the skip-gram term graph, degree-ordered
    // orientation (out-degree bounded O(√m) — hub-proof wedge counts)
    "q_triangles" -> ((s, d) =>
      Graph.triangles(Retrieval.windowCooccurrence(
        Tables(s, d, "documents"), 3, 50))),
    // general min-label-propagation CC over the SAME term graph — labels
    // monotone, 4 iterations >= diameter at this density
    "q_graph_cc" -> ((s, d) =>
      Graph.connectedComponents(Retrieval.windowCooccurrence(
        Tables(s, d, "documents"), 3, 50))),
    // degree -> node-count census over the term graph
    "q_degree_dist" -> ((s, d) =>
      Graph.degreeDistribution(Retrieval.windowCooccurrence(
        Tables(s, d, "documents"), 3, 50))),
    // local clustering coefficient per term — corner census over the
    // oriented triangle relation joined to the degree census; exact
    // integer ratio per node, hub-proof via the same O(m^1.5) bound
    "q_clustering_coeff" -> ((s, d) =>
      Graph.localClustering(Retrieval.windowCooccurrence(
        Tables(s, d, "documents"), 3, 50))),
    // degree assortativity of the part<->supplier bipartite graph (the
    // synthetic term graph is COMPLETE, hence regular — assortativity is
    // undefined there by construction): exact BIGINT edge sums,
    // DECIMAL(38,0) one-row products, single division
    // numeric-encoded nodes; the assortativity value only sees degrees,
    // so the output is representation-invariant (oracle keeps strings)
    "q_assortativity" -> ((s, d) =>
      Graph.assortativity(bipartiteEdges(s, d))),
    // 3-core by 4 fixed peel passes (engine-exact replay; the certified
    // fixpoint variant is spec-covered) — degree census + semi-join per
    // pass, checkpointed so the plan is O(1) in passes
    "q_kcore" -> ((s, d) =>
      Graph.kCore(Retrieval.windowCooccurrence(
        Tables(s, d, "documents"), 3, 50), k = 3, passes = 4)),
    // label-propagation communities over the part<->supplier bipartite
    // graph — 3 fixed synchronous sweeps with self-vote + min-label
    // tie-break (deterministic, engine-exact replay); community-size
    // census output
    "q_label_prop" -> ((s, d) =>
      Graph.labelPropagation(bipartiteEdges(s, d), iterations = 3)
        .select(fmtNode(col("label")).as("label"), col("n_nodes"))),
    // multi-source BFS hop distance from every 10th supplier over the
    // same bipartite graph — frontier-delta expansion (per-sweep volume
    // is the newly-discovered wave, not the full dist relation; bit-
    // identical to the fixed-sweep min-relaxation replay, GraphSpec-
    // proven), unreachable-within-budget nodes absent
    "q_bfs_hops" -> ((s, d) =>
      Graph.bfsHopsFrontier(bipartiteEdges(s, d),
        Tables(s, d, "lineitem").filter(col("l_suppkey") % 10 === 0)
          .select((col("l_suppkey") * 2 + 1).as("node")).distinct(),
        maxHops = 4)
        .select(fmtNode(col("node")).as("node"), col("hop"))),
    // Adamic-Adar link prediction on the bipartite graph: top-100
    // non-adjacent distance-2 pairs by summed 1/ln(deg) over shared
    // neighbours, hub centres df-capped at deg 200 (documented lossy
    // cap; the cut wedges carry ~zero AA signal)
    "q_adamic_adar" -> ((s, d) =>
      Graph.adamicAdar(bipartiteEdges(s, d), k = 100, maxDeg = 200)
        .select(fmtNode(col("a")).as("a"), fmtNode(col("b")).as("b"),
          col("cn"), col("aa"))),
    // Newman-Girvan modularity of the 3-sweep LPA partition — exact
    // BIGINT edge/degree censuses factored to TWO final divisions
    "q_modularity" -> ((s, d) => {
      val e = bipartiteEdges(s, d)
      Graph.modularity(e, Graph.labelPropagationLabels(e, 3))
    }),
  )

  /** The part<->supplier bipartite edge relation (the q_assortativity
    * graph): real structure at every sf, unlike the synthetic term graph
    * which is complete. Nodes are LONG-encoded (even = 2·partkey,
    * odd = 2·suppkey+1) — the r10 bench showed the string-keyed form
    * paying 3-11 s per graph query at sf0.1 purely on string shuffles;
    * numeric keys shuffle/compare 5-10× cheaper and at 100 TB the node
    * id is hot-path payload. [[fmtNode]] renders 'p…'/'s…' at the
    * OUTPUT only; ties inside LPA/top-k break on the numeric order and
    * the oracles mirror the same encoding. */
  private def bipartiteEdges(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .select((col("l_partkey") * 2).as("term_a"),
        (col("l_suppkey") * 2 + 1).as("term_b"))
      .distinct()

  /** Render an encoded node id for output ('p123' / 's55'). */
  private def fmtNode(c: Column): Column =
    when(c % 2 === 0, concat(lit("p"), (c / 2).cast("long")))
      .otherwise(concat(lit("s"), (c / 2).cast("long")))

  /** Unrolled synchronous-LPA sweep CTEs `l0..l<iterations>` over an
    * in-scope `sym` relation — shared by q_label_prop / q_modularity so
    * the partition both oracles score is literally the same SQL. */
  private def lpaSweepsSql(iterations: Int): String = {
    val sweeps = (1 to iterations).map { i =>
      s"""v$i AS (
         |  SELECT node, label, count(*) AS c FROM (
         |    SELECT s.v AS node, l.label FROM sym s
         |    JOIN l${i - 1} l ON s.u = l.node
         |    UNION ALL SELECT node, label FROM l${i - 1})
         |  GROUP BY node, label),
         |l$i AS (
         |  SELECT node, label FROM (
         |    SELECT node, label, row_number() OVER (
         |      PARTITION BY node ORDER BY c DESC, label) AS rk FROM v$i)
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym),
       |$sweeps""".stripMargin
  }

  /** Shared oracle CTE prefix: the bipartite edge set + its symmetric
    * closure, STRING nodes (q_assortativity's representation-invariant
    * oracle keeps this form). */
  private val bipartiteSymSql: String =
    """e AS (
      |  SELECT DISTINCT 'p' || l_partkey AS term_a,
      |    's' || l_suppkey AS term_b
      |  FROM lineitem),
      |sym AS (
      |  SELECT term_a AS u, term_b AS v FROM e WHERE term_a != term_b
      |  UNION ALL
      |  SELECT term_b AS u, term_a AS v FROM e WHERE term_a != term_b)""".stripMargin

  /** The LONG-encoded twin (matches [[bipartiteEdges]]): even = part,
    * odd = supplier; ties and orderings are numeric, exactly as the
    * engine computes them. */
  private val bipartiteSymNumSql: String =
    """e AS (
      |  SELECT DISTINCT 2 * l_partkey AS term_a,
      |    2 * l_suppkey + 1 AS term_b
      |  FROM lineitem),
      |sym AS (
      |  SELECT term_a AS u, term_b AS v FROM e WHERE term_a != term_b
      |  UNION ALL
      |  SELECT term_b AS u, term_a AS v FROM e WHERE term_a != term_b)""".stripMargin

  /** Render an encoded node id ('p123' / 's55') — [[fmtNode]]'s SQL twin. */
  private def fmtNodeSql(x: String): String =
    s"CASE WHEN $x % 2 = 0 THEN 'p' || ($x // 2) ELSE 's' || ($x // 2) END"

  def oracleSql: Map[String, String] = Map(
    // Markov edge CTE + unrolled PageRank iterations (round-6 per
    // iteration, dangling mass via NOT IN outw, 1-0.85 left unfolded so
    // both engines subtract at runtime)
    "q_hits" -> {
      val base =
        """WITH seq AS (
          |  SELECT event_type, lead(event_type, 1) OVER (
          |    PARTITION BY user_id ORDER BY ts, event_id) AS next_type
          |  FROM events),
          |e AS (
          |  SELECT event_type AS src, next_type AS dst,
          |    CAST(count(*) AS DOUBLE) AS w
          |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
          |nodes AS (
          |  SELECT DISTINCT node FROM (
          |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          |h0 AS (SELECT node, 1.0 AS h FROM nodes)""".stripMargin
      val iters = (1 to 3).map { i =>
        s"""a${i}r AS (
           |  SELECT e.dst AS node, sum(e.w * h.h) AS ar
           |  FROM e JOIN h${i - 1} h ON e.src = h.node GROUP BY 1),
           |a${i}n AS (SELECT sqrt(sum(ar * ar)) AS an FROM a${i}r),
           |a$i AS (
           |  SELECT n.node,
           |    round(coalesce(r.ar, 0.0) / (SELECT an FROM a${i}n), 6) AS a
           |  FROM nodes n LEFT JOIN a${i}r r USING (node)),
           |h${i}r AS (
           |  SELECT e.src AS node, sum(e.w * a.a) AS hr
           |  FROM e JOIN a$i a ON e.dst = a.node GROUP BY 1),
           |h${i}n AS (SELECT sqrt(sum(hr * hr)) AS hn FROM h${i}r),
           |h$i AS (
           |  SELECT n.node,
           |    round(coalesce(r.hr, 0.0) / (SELECT hn FROM h${i}n), 6) AS h
           |  FROM nodes n LEFT JOIN h${i}r r USING (node))""".stripMargin
      }.mkString(",\n")
      s"$base,\n$iters\n" +
        "SELECT a3.node, a3.a AS authority, h3.h AS hub " +
        "FROM a3 JOIN h3 USING (node)"
    },
    "q_pagerank" -> {
      val base =
        """WITH seq AS (
          |  SELECT event_type, lead(event_type, 1) OVER (
          |    PARTITION BY user_id ORDER BY ts, event_id) AS next_type
          |  FROM events),
          |e AS (
          |  SELECT event_type AS src, next_type AS dst,
          |    CAST(count(*) AS BIGINT) AS w
          |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
          |nodes AS (
          |  SELECT DISTINCT node FROM (
          |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
          |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM e GROUP BY 1),
          |trans AS (
          |  SELECT src, dst, CAST(w AS DOUBLE) / wout AS p
          |  FROM e JOIN outw USING (src)),
          |s0 AS (SELECT node, 1.0 AS score FROM nodes)""".stripMargin
      val iters = (1 to 3).map { i =>
        s"""d$i AS (
           |  SELECT coalesce(sum(score), 0.0) AS dmass FROM s${i - 1}
           |  WHERE node NOT IN (SELECT src FROM outw)),
           |c$i AS (
           |  SELECT t.dst AS node, sum(t.p * s.score) AS c
           |  FROM trans t JOIN s${i - 1} s ON t.src = s.node GROUP BY 1),
           |s$i AS (
           |  SELECT n.node,
           |    round((1 - 0.85) + 0.85 * (coalesce(c.c, 0.0)
           |      + d.dmass / nn.n_nodes), 6) AS score
           |  FROM nodes n LEFT JOIN c$i c ON n.node = c.node
           |  CROSS JOIN d$i d CROSS JOIN nn)""".stripMargin
      }.mkString(",\n")
      s"$base,\n$iters\nSELECT node, score FROM s3"
    },
    // same graph CTEs; restart/dangling mass to the seed row only
    "q_ppr" -> {
      val base =
        """WITH seq AS (
          |  SELECT event_type, lead(event_type, 1) OVER (
          |    PARTITION BY user_id ORDER BY ts, event_id) AS next_type
          |  FROM events),
          |e AS (
          |  SELECT event_type AS src, next_type AS dst,
          |    CAST(count(*) AS BIGINT) AS w
          |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
          |nodes AS (
          |  SELECT DISTINCT node FROM (
          |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          |seeds AS (SELECT node FROM nodes WHERE node = 'signup'),
          |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_seeds FROM seeds),
          |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM e GROUP BY 1),
          |trans AS (
          |  SELECT src, dst, CAST(w AS DOUBLE) / wout AS p
          |  FROM e JOIN outw USING (src)),
          |s0 AS (
          |  SELECT n.node,
          |    round(CASE WHEN sd.node IS NOT NULL
          |      THEN 1.0 / ns.n_seeds ELSE 0.0 END, 6) AS score
          |  FROM nodes n LEFT JOIN seeds sd ON n.node = sd.node
          |  CROSS JOIN ns)""".stripMargin
      val iters = (1 to 3).map { i =>
        s"""d$i AS (
           |  SELECT coalesce(sum(score), 0.0) AS dmass FROM s${i - 1}
           |  WHERE node NOT IN (SELECT src FROM outw)),
           |c$i AS (
           |  SELECT t.dst AS node, sum(t.p * s.score) AS c
           |  FROM trans t JOIN s${i - 1} s ON t.src = s.node GROUP BY 1),
           |s$i AS (
           |  SELECT n.node,
           |    round(0.85 * coalesce(c.c, 0.0) + CASE WHEN sd.node IS NOT NULL
           |      THEN ((1 - 0.85) + 0.85 * d.dmass) / ns.n_seeds ELSE 0.0 END, 6)
           |      AS score
           |  FROM nodes n LEFT JOIN c$i c ON n.node = c.node
           |  LEFT JOIN seeds sd ON n.node = sd.node
           |  CROSS JOIN d$i d CROSS JOIN ns)""".stripMargin
      }.mkString(",\n")
      s"$base,\n$iters\nSELECT node, score FROM s3"
    },
    // same skip-gram edge CTE as q_cooccurrence_skipgram, then the
    // degree-ordered orientation mirrored with row-value comparisons
    "q_triangles" ->
      """WITH tk AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |pp AS (
        |  SELECT unnest(flatten(list_transform(range(1, len(t)),
        |    i -> list_transform(range(i + 1, least(i + 3, len(t)) + 1),
        |      j -> {'a': least(t[i], t[j]), 'b': greatest(t[i], t[j])})))) AS p
        |  FROM tk WHERE len(t) >= 2),
        |e AS (
        |  SELECT p.a AS term_a, p.b AS term_b, count(*) AS n_ab
        |  FROM pp GROUP BY 1, 2 HAVING count(*) >= 50),
        |sym AS (
        |  SELECT term_a AS u, term_b AS v FROM e
        |  UNION ALL
        |  SELECT term_b AS u, term_a AS v FROM e),
        |deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
        |o AS (
        |  SELECT s.u, s.v, dv.d AS dv
        |  FROM sym s JOIN deg du ON s.u = du.u JOIN deg dv ON s.v = dv.u
        |  WHERE (du.d, s.u) < (dv.d, s.v)),
        |w AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM o e1 JOIN o e2
        |    ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v))
        |SELECT least(a, b, c) AS term_a,
        |  list_sort([a, b, c])[2] AS term_b,
        |  greatest(a, b, c) AS term_c
        |FROM w JOIN o e3 ON w.b = e3.u AND w.c = e3.v""".stripMargin,
    // skip-gram term-graph CC: unrolled min-label propagation (exact
    // string mins — no float anywhere)
    "q_graph_cc" -> {
      val iters = (1 to 4).map { i =>
        s"""n$i AS (
           |  SELECT s.v AS node, min(l.label) AS nl
           |  FROM sym s JOIN l${i - 1} l ON s.u = l.node GROUP BY 1),
           |l$i AS (
           |  SELECT l.node, least(l.label, coalesce(n.nl, l.label)) AS label
           |  FROM l${i - 1} l LEFT JOIN n$i n USING (node))""".stripMargin
      }.mkString(",\n")
      s"""$termGraphCtes,
         |l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym),
         |$iters
         |SELECT node, label FROM l4""".stripMargin
    },
    "q_degree_dist" ->
      s"""$termGraphCtes,
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree
         |        FROM sym GROUP BY 1)
         |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM deg GROUP BY 1""".stripMargin,
    // the q_triangles pipeline + corner unnest census + degree join:
    // lcc = 2*tri / (deg*(deg-1)) over nodes with degree >= 2
    "q_clustering_coeff" ->
      """WITH tk AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |pp AS (
        |  SELECT unnest(flatten(list_transform(range(1, len(t)),
        |    i -> list_transform(range(i + 1, least(i + 3, len(t)) + 1),
        |      j -> {'a': least(t[i], t[j]), 'b': greatest(t[i], t[j])})))) AS p
        |  FROM tk WHERE len(t) >= 2),
        |e AS (
        |  SELECT p.a AS term_a, p.b AS term_b, count(*) AS n_ab
        |  FROM pp GROUP BY 1, 2 HAVING count(*) >= 50),
        |sym AS (
        |  SELECT term_a AS u, term_b AS v FROM e
        |  UNION ALL
        |  SELECT term_b AS u, term_a AS v FROM e),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
        |o AS (
        |  SELECT s.u, s.v, dv.d AS dv
        |  FROM sym s JOIN deg du ON s.u = du.u JOIN deg dv ON s.v = dv.u
        |  WHERE (du.d, s.u) < (dv.d, s.v)),
        |w AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM o e1 JOIN o e2
        |    ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)),
        |tri AS (
        |  SELECT a, b, c FROM w JOIN o e3 ON w.b = e3.u AND w.c = e3.v),
        |corners AS (
        |  SELECT unnest([a, b, c]) AS term FROM tri),
        |tpn AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS n_tri
        |  FROM corners GROUP BY term),
        |degc AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS d
        |  FROM sym WHERE u != v GROUP BY u)
        |SELECT degc.u AS term, degc.d AS degree,
        |  COALESCE(tpn.n_tri, 0) AS n_tri,
        |  round(2.0 * COALESCE(tpn.n_tri, 0)
        |    / CAST(degc.d * (degc.d - 1) AS DOUBLE), 6) AS lcc
        |FROM degc LEFT JOIN tpn ON degc.u = tpn.term
        |WHERE degc.d >= 2""".stripMargin,
    // the part<->supplier bipartite edge set + degree tag join; exact
    // HUGEINT sums, one division (denominator = variance form by u<->v
    // symmetry), NULL on a regular graph
    "q_assortativity" ->
      """WITH e AS (
        |  SELECT DISTINCT 'p' || l_partkey AS term_a,
        |    's' || l_suppkey AS term_b
        |  FROM lineitem),
        |sym AS (
        |  SELECT term_a AS u, term_b AS v FROM e
        |  WHERE term_a != term_b
        |  UNION ALL
        |  SELECT term_b AS u, term_a AS v FROM e
        |  WHERE term_a != term_b),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
        |tagged AS (
        |  SELECT du.d AS du, dv.d AS dv
        |  FROM sym s JOIN deg du ON s.u = du.u JOIN deg dv ON s.v = dv.u),
        |sums AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS m,
        |    CAST(sum(du) AS HUGEINT) AS sj,
        |    CAST(sum(du * du) AS HUGEINT) AS sj2,
        |    CAST(sum(du * dv) AS HUGEINT) AS sjk
        |  FROM tagged)
        |SELECT CAST(m AS BIGINT) AS m,
        |  CASE WHEN m * sj2 - sj * sj = 0 THEN NULL
        |    ELSE round(CAST(m * sjk - sj * sj AS DOUBLE)
        |      / CAST(m * sj2 - sj * sj AS DOUBLE), 6) END AS assortativity
        |FROM sums""".stripMargin,
    // the same edge CTE peeled 4 times: degree census + double semi-join
    // per pass — the engine's fixed-pass replay
    "q_kcore" -> {
      val peels = (1 to 4).map { i =>
        s"""k$i AS (SELECT u FROM (
           |  SELECT u, count(*) AS c FROM s${i - 1} GROUP BY u) WHERE c >= 3),
           |s$i AS (
           |  SELECT s.u, s.v FROM s${i - 1} s
           |  JOIN k$i a ON s.u = a.u JOIN k$i b ON s.v = b.u)""".stripMargin
      }.mkString(",\n")
      s"""WITH tk AS (
         |  SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
         |  FROM documents),
         |pp AS (
         |  SELECT unnest(flatten(list_transform(range(1, len(t)),
         |    i -> list_transform(range(i + 1, least(i + 3, len(t)) + 1),
         |      j -> {'a': least(t[i], t[j]), 'b': greatest(t[i], t[j])})))) AS p
         |  FROM tk WHERE len(t) >= 2),
         |e AS (
         |  SELECT p.a AS term_a, p.b AS term_b, count(*) AS n_ab
         |  FROM pp GROUP BY 1, 2 HAVING count(*) >= 50),
         |s0 AS (
         |  SELECT term_a AS u, term_b AS v FROM e
         |  WHERE term_a != term_b
         |  UNION ALL
         |  SELECT term_b AS u, term_a AS v FROM e
         |  WHERE term_a != term_b),
         |$peels
         |SELECT u AS term, CAST(count(*) AS BIGINT) AS core_degree
         |FROM s4 GROUP BY u""".stripMargin
    },
    // 3 unrolled synchronous LPA sweeps: neighbour votes + self-vote,
    // argmax by (count DESC, label) — row_number here ≡ the engine's
    // min(struct(-c, label)) aggregate
    "q_label_prop" ->
      s"""WITH $bipartiteSymNumSql,
         |${lpaSweepsSql(3)}
         |SELECT ${fmtNodeSql("label")} AS label,
         |  CAST(count(*) AS BIGINT) AS n_nodes
         |FROM l3 GROUP BY label""".stripMargin,
    // the same unrolled LPA partition scored with the factored-division
    // modularity (Σd_c² in HUGEINT, two divisions at the one-row output)
    "q_modularity" ->
      s"""WITH $bipartiteSymNumSql,
         |${lpaSweepsSql(3)},
         |t AS (
         |  SELECT lu.label AS lab, CAST(count(*) AS BIGINT) AS d_c,
         |    CAST(sum(CASE WHEN lu.label = lv.label THEN 1 ELSE 0 END)
         |      AS BIGINT) AS l_c
         |  FROM sym s
         |  JOIN l3 lu ON s.u = lu.node
         |  JOIN l3 lv ON s.v = lv.node
         |  GROUP BY lu.label),
         |fin AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |    CAST(sum(d_c) AS BIGINT) AS two_m,
         |    CAST(sum(l_c) AS BIGINT) AS l_tot,
         |    sum(CAST(d_c AS HUGEINT) * CAST(d_c AS HUGEINT)) AS d2
         |  FROM t)
         |SELECT two_m // 2 AS m_edges, n_communities,
         |  round(CAST(l_tot AS DOUBLE) / two_m
         |    - CAST(d2 AS DOUBLE)
         |      / (CAST(two_m AS DOUBLE) * CAST(two_m AS DOUBLE)), 6)
         |    AS modularity
         |FROM fin""".stripMargin,
    // 4 unrolled min-relaxation sweeps from the supplier seed set
    "q_bfs_hops" -> {
      val sweeps = (1 to 4).map { i =>
        s"""d$i AS (
           |  SELECT node, min(hop) AS hop FROM (
           |    SELECT node, hop FROM d${i - 1}
           |    UNION ALL
           |    SELECT s.v AS node, d.hop + 1 AS hop
           |    FROM d${i - 1} d JOIN sym s ON d.node = s.u)
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $bipartiteSymNumSql,
         |d0 AS (
         |  SELECT DISTINCT 2 * l_suppkey + 1 AS node, 0 AS hop
         |  FROM lineitem WHERE l_suppkey % 10 = 0),
         |$sweeps
         |SELECT ${fmtNodeSql("node")} AS node, hop FROM d4""".stripMargin
    },
    // wedge join on df-capped shared neighbours, NOT EXISTS anti vs the
    // canonical edge set, rounded-score top-k (ties by pair)
    "q_adamic_adar" ->
      s"""WITH $bipartiteSymNumSql,
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
         |capped AS (
         |  SELECT s.u AS z, s.v AS n, d.d AS d
         |  FROM sym s JOIN deg d ON s.u = d.u
         |  WHERE d.d >= 2 AND d.d <= 200),
         |wedges AS (
         |  SELECT l.n AS a, r.n AS b, 1.0 / ln(CAST(l.d AS DOUBLE)) AS w
         |  FROM capped l JOIN capped r ON l.z = r.z AND l.n < r.n),
         |existing AS (
         |  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM sym),
         |scored AS (
         |  SELECT w.a, w.b, CAST(count(*) AS BIGINT) AS cn,
         |    round(sum(w.w), 6) AS aa
         |  FROM wedges w
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM existing e WHERE e.a = w.a AND e.b = w.b)
         |  GROUP BY w.a, w.b)
         |SELECT ${fmtNodeSql("a")} AS a, ${fmtNodeSql("b")} AS b, cn, aa
         |FROM (
         |  SELECT *, row_number() OVER (ORDER BY aa DESC, a, b) AS rk
         |  FROM scored)
         |WHERE rk <= 100""".stripMargin,
  )
}
