package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge relations (the term co-occurrence
  * graph, entity graphs). PageRank lives in [[Retrieval.textrank]]; the
  * dedup tier's connected components live in [[Dedup]]; this hosts the
  * structural census operators.
  */
object Graph {

  /** Weighted PageRank over an explicit DIRECTED edge relation
    * (src, dst, w) — the general-graph complement to
    * [[Retrieval.textrank]] (which builds its own co-occurrence graph and
    * has no dangling nodes by construction). Scores use the sum-N
    * convention (init 1.0, teleport 1−d), and DANGLING mass — score
    * sitting on nodes with no out-edges — redistributes uniformly each
    * iteration, so total mass is conserved on any graph shape.
    *
    * Scale shape: the transition relation is weight-normalized ONCE and
    * checkpointed (the plan stays O(1) in iteration count — the CC/Lloyd
    * pattern); each iteration is one equi-join + one map-side-combinable
    * aggregate on dst, plus a one-row dangling aggregate and the
    * broadcast node count. Scores round to 6 per iteration so float
    * drift cannot compound across engines (the TextRank rule). */
  def pageRank(edges: DataFrame, damping: Double = 0.85,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    val nRow = nodes.agg(count(lit(1)).as("n_nodes"))
    // materialized once: the per-iteration dangling-mass anti-join probes
    // outw, and an unpinned plan would re-derive the full edge relation
    // (a corpus-sized window for the event-transition graph) every sweep
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
      .localCheckpoint(false)
    val trans = edges.join(outw, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("wout")).as("p"))
      .localCheckpoint(false)
    var scores = nodes.select(col("node"), lit(1.0).as("score"))
    (1 to iterations).foreach { _ =>
      val dang = scores
        .join(outw.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("score")), lit(0.0)).as("dmass"))
      val contrib = trans.join(scores.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("p") * col("score")).as("c"))
      scores = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dang)).crossJoin(broadcast(nRow))
        .select(col("node"),
          round(lit(1 - damping) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) +
              col("dmass") / col("n_nodes")), 6).as("score"))
        .localCheckpoint(false)
    }
    scores
  }

  /** Personalized PageRank — random walk with restart to a SEED set
    * (Haveliwala, WWW 2002 "Topic-Sensitive PageRank"): the relevance-
    * to-the-seeds ranking a data pipeline uses to expand a small trusted
    * set (seed domains → quality-adjacent pages, seed docs → related
    * docs) where global PageRank only measures popularity. Same unrolled
    * fixed-iteration shape as [[pageRank]] (scores rounded 6dp per
    * iteration so cross-engine float drift cannot compound), except BOTH
    * the restart mass and the dangling mass return to the seeds'
    * uniform distribution instead of 1/N — non-seed nodes with no path
    * from the seeds stay exactly 0.
    *
    * Scale shape: the transition relation checkpoints once; per
    * iteration one equi-join + hash-agg on dst + one broadcast attach of
    * the (dangling-mass, seed-count) one-row folds — the plan is O(1)
    * in iterations and the graph never re-derives. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      damping: Double = 0.85, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    val seedSet = nodes.join(
      seeds.select(col("node")).distinct(), Seq("node")).localCheckpoint(false)
    val sRow = seedSet.agg(count(lit(1)).as("n_seeds"))
    // materialized once: the per-iteration dangling-mass anti-join probes
    // outw, and an unpinned plan would re-derive the full edge relation
    // (a corpus-sized window for the event-transition graph) every sweep
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
      .localCheckpoint(false)
    val trans = edges.join(outw, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("wout")).as("p"))
      .localCheckpoint(false)
    val flagged = nodes
      .join(seedSet.withColumn("is_seed", lit(1)), Seq("node"), "left")
      .localCheckpoint(false)
    var scores = flagged.crossJoin(broadcast(sRow))
      .select(col("node"),
        round(when(col("is_seed").isNotNull,
          lit(1.0) / col("n_seeds")).otherwise(lit(0.0)), 6).as("score"))
    (1 to iterations).foreach { _ =>
      val dang = scores
        .join(outw.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("score")), lit(0.0)).as("dmass"))
      val contrib = trans.join(scores.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("p") * col("score")).as("c"))
      scores = flagged.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dang)).crossJoin(broadcast(sRow))
        .select(col("node"),
          round(lit(damping) * coalesce(col("c"), lit(0.0)) +
            when(col("is_seed").isNotNull,
              (lit(1 - damping) + lit(damping) * col("dmass")) / col("n_seeds"))
              .otherwise(lit(0.0)), 6).as("score"))
        .localCheckpoint(false)
    }
    scores
  }

  /** Connected components by MIN-LABEL PROPAGATION over an explicit
    * undirected edge relation (term_a, term_b) — the general-graph form
    * of the dedup tier's band-bucket CC ([[Dedup]]): every node starts
    * labeled with itself; each iteration every node takes the min of its
    * own and its neighbors' labels (one equi-join + one min-aggregate +
    * one left join back — all shuffle on node). Labels are monotone
    * non-increasing, so `iterations` ≥ the largest component's diameter
    * converges exactly; each iteration checkpoints so the plan stays
    * O(1) in iteration count. Self-loops are dropped (no-ops); isolated
    * nodes never appear in an edge relation and are absent by
    * definition. */
  def connectedComponents(edges: DataFrame, iterations: Int = 4): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val sym = symPartitioned(edges)
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(false)
    (1 to iterations).foreach { _ =>
      val nbr = sym
        .join(labels.withColumnRenamed("node", "u")
          .withColumnRenamed("label", "nl"), "u")
        .groupBy(col("v").as("node")).agg(min(col("nl")).as("nl"))
      labels = labels.join(nbr, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** Degree-distribution census: degree → node count — the first profiling
    * read on any graph (hub spotting, power-law eyeballing, and the input
    * to the triangle orientation's O(√m) bound). Two map-side-combinable
    * aggregations; nothing touches the node or edge payload. */
  def degreeDistribution(edges: DataFrame): DataFrame =
    symmetric(edges)
      .groupBy(col("u")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))

  /** Both directions of an undirected (term_a, term_b) edge list,
    * self-loops dropped. */
  private def symmetric(edges: DataFrame): DataFrame = {
    val e = edges.filter(col("term_a") =!= col("term_b"))
    e.select(col("term_a").as("u"), col("term_b").as("v"))
      .unionByName(e.select(col("term_b").as("u"), col("term_a").as("v")))
  }

  /** [[symmetric]], hash-partitioned on `u` and pinned. Every iterative
    * consumer (CC / LPA / BFS / k-core / Adamic-Adar) joins or aggregates
    * the edge relation on `u` once per sweep; a checkpoint WITHOUT an
    * explicit partitioning re-shuffles the whole edge relation at every
    * sweep (the union that builds it destroys any incoming partitioning),
    * while localCheckpoint PRESERVES outputPartitioning — so one exchange
    * here replaces one per iteration (optimization guide §2.4, "two
    * operations keyed the same way can share one exchange"). */
  private def symPartitioned(edges: DataFrame): DataFrame =
    symmetric(edges).repartition(col("u")).localCheckpoint(false)

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

  /** Degree assortativity coefficient (Newman, PRL 2002 form over full
    * degrees): the Pearson correlation of the endpoint degrees across the
    * symmetric edge relation — positive = hubs attach to hubs (social
    * shape), negative = hubs attach to leaves (star/infrastructure
    * shape), the one-number read on whether degree-targeted
    * interventions (hub dedup, hub caching) help or hurt.
    *
    * r = (M·Σjk − Σj·Σk) / √((M·Σj² − (Σj)²)(M·Σk² − (Σk)²)) with all
    * five sums EXACT BIGINTs over the directed (both-directions) edge
    * list — degree census + one equi-join to tag each edge end + one
    * map-side-combinable fold; the single √/division happens on the
    * one-row output. By u↔v symmetry Σj = Σk, so the output also serves
    * as a self-check. */
  def assortativity(edges: DataFrame): DataFrame = {
    val sym = symmetric(edges)
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val tagged = sym
      .join(deg.select(col("u"), col("d").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
    // per-edge sums stay BIGINT-exact; the one-row products of sums
    // (m·Σjk, (Σj)²) clear 2^63 on big graphs — DECIMAL(38,0) headroom
    val dec: Column => Column = _.cast("decimal(38,0)")
    tagged.agg(count(lit(1)).as("m"),
        sum(col("du")).as("sj"), sum(col("du") * col("du")).as("sj2"),
        sum(col("du") * col("dv")).as("sjk"))
      .withColumn("den",
        (dec(col("m")) * dec(col("sj2")) - dec(col("sj")) * dec(col("sj")))
          .cast("double"))
      .select(col("m"),
        // a REGULAR graph (all degrees equal) has zero degree variance:
        // the coefficient is genuinely undefined -> null, not an error
        when(col("den") === 0.0, lit(null).cast("double"))
          .otherwise(round(
            (dec(col("m")) * dec(col("sjk")) - dec(col("sj")) * dec(col("sj")))
              .cast("double") / col("den"), 6))
          .as("assortativity"))
  }

  /** k-core decomposition by iterative peeling: repeatedly remove nodes
    * of degree < k until none remain — the densest-region extraction
    * behind community seeding and spam-farm detection (a k-core survives
    * any node's removal with degree ≥ k−1; a star or chain of any size
    * peels away entirely for k ≥ 2).
    *
    * Each pass is a degree census + a semi-join of the edge relation
    * against surviving nodes (shuffle on node, never corpus-sized work),
    * localCheckpointed so the plan stays O(1) in pass count. Peeling is
    * monotone (removals only lower degrees), so `passes` ≥ the longest
    * peel chain converges exactly; the oracled form runs a FIXED pass
    * count (engine-exact replay), [[kCoreCertified]] iterates to a
    * verified fixpoint. Output: surviving nodes with their in-core
    * degree. */
  def kCore(edges: DataFrame, k: Int, passes: Int = 4): DataFrame = {
    require(k >= 1 && passes >= 1, s"k=$k passes=$passes")
    // NOT symPartitioned: the per-pass `keep` relation is census-sized, so
    // both semi-joins go broadcast and never shuffle the edge side — a
    // hash(u) pin would add a full-edge exchange that nothing reuses
    // (measured 0.80 s → 1.02 s with the pin; reverted)
    var sym = symmetric(edges).localCheckpoint(false)
    (1 to passes).foreach { _ =>
      val keep = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("u"))
      sym = sym.join(keep, "u")
        .join(keep.withColumnRenamed("u", "v"), "v")
        .select(col("u"), col("v")).localCheckpoint(false)
    }
    sym.groupBy(col("u").as("term")).agg(count(lit(1)).as("core_degree"))
  }

  /** [[kCore]] iterated to a CERTIFIED fixpoint: peel until a pass
    * removes zero nodes, fail LOUDLY at `maxPasses` rather than ship a
    * half-peeled core (the fixpoint-CC discipline). The surviving census
    * is by construction the true k-core. */
  def kCoreCertified(edges: DataFrame, k: Int, maxPasses: Int = 30): DataFrame = {
    var sym = symmetric(edges).localCheckpoint(false)
    var prev = -1L
    var pass = 0
    while (pass < maxPasses) {
      val keep = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("u")).localCheckpoint(false)
      val n = keep.count()
      if (n == prev) return sym.groupBy(col("u").as("term"))
        .agg(count(lit(1)).as("core_degree"))
      prev = n
      sym = sym.join(keep, "u")
        .join(keep.withColumnRenamed("u", "v"), "v")
        .select(col("u"), col("v")).localCheckpoint(false)
      pass += 1
    }
    throw new IllegalStateException(
      s"k-core failed to converge in $maxPasses passes (k=$k) — " +
        "raise maxPasses; do NOT ship a half-peeled core")
  }

  /** Community detection by SYNCHRONOUS LABEL PROPAGATION (Raghavan et
    * al., Phys. Rev. E 2007) over an undirected (term_a, term_b) edge
    * relation: every node starts in its own community (label = own id);
    * each of the fixed `iterations` every node adopts the label that is
    * most frequent among its neighbours' current labels PLUS one
    * self-vote (the self-vote damps the two-colouring oscillation plain
    * synchronous LPA exhibits on bipartite regions), ties broken by the
    * LEXICOGRAPHICALLY SMALLEST label — fully deterministic, no RNG.
    *
    * Scale shape: each iteration is one equi-join (edges × labels,
    * shuffled on node), one (node, label) count aggregate — map-side
    * combinable — and one argmax-by-struct-min aggregate (`min(struct
    * (-count, label))`), never a window over anything corpus-sized;
    * iterates localCheckpoint so the plan stays O(1) in the iteration
    * count (the PageRank/CC discipline). Fixed iteration count =
    * engine-exact replay for the oracle; LPA converges in a handful of
    * sweeps on modular graphs (the paper's ~5-iteration observation).
    *
    * Output: one row per surviving community — (label, n_nodes) census,
    * the stable summary shape (node→label maps are order-fragile across
    * tie-structures; the census is not). */
  def labelPropagation(edges: DataFrame, iterations: Int = 3): DataFrame =
    labelPropagationLabels(edges, iterations)
      .groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))

  /** [[labelPropagation]]'s underlying node → community-label relation —
    * the form downstream composition ([[modularity]], per-community
    * drill-downs) consumes. */
  def labelPropagationLabels(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val sym = symPartitioned(edges)
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(false)
    (1 to iterations).foreach { _ =>
      val votes = sym
        .join(labels.withColumnRenamed("node", "u")
          .withColumnRenamed("label", "nl"), "u")
        .select(col("v").as("node"), col("nl").as("label"))
        .unionByName(labels) // self-vote
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
      labels = votes.groupBy(col("node"))
        .agg(min(struct((-col("c")).as("negc"), col("label"))).as("best"))
        .select(col("node"), col("best.label").as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** Newman–Girvan modularity Q of a node → `label` partition (Newman,
    * PNAS 2006): Q = Σ_c (L_c/|sym| − (d_c/|sym|)²) with L_c the
    * BOTH-DIRECTIONS internal edge count of community c, d_c its degree
    * sum, |sym| = 2m — the one-number "are these communities denser than
    * chance?" certificate for any labelling ([[labelPropagationLabels]],
    * dedup CC labels, external taxonomies). Q > 0 beats the random-graph
    * null; ~0.3+ reads as real structure.
    *
    * Two label-tag equi-joins on the edge relation + one community-sized
    * census; every count is an exact BIGINT, the per-community terms pay
    * one double division each, and the Σ folds the tiny census. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val sym = symmetric(edges)
    val tagged = sym
      .join(labels.withColumnRenamed("node", "u")
        .withColumnRenamed("label", "lu"), "u")
      .join(labels.select(col("node").as("v"), col("label").as("lv")), "v")
    val per = tagged.groupBy(col("lu").as("label"))
      .agg(count(lit(1)).as("d_c"),
        sum(when(col("lu") === col("lv"), 1L).otherwise(0L)).as("l_c"))
    per.agg(count(lit(1)).as("n_communities"),
        sum(col("d_c")).as("two_m"),
        sum(col("l_c")).as("l_tot"), // kept exact: Σ L_c needs one |sym|
        sum(col("d_c").cast("decimal(38,0)") * col("d_c").cast("decimal(38,0)"))
          .as("d2"))
      .select((col("two_m") / 2).cast("long").as("m_edges"), col("n_communities"),
        round(col("l_tot").cast("double") / col("two_m") -
          col("d2").cast("double") /
            (col("two_m").cast("double") * col("two_m").cast("double")), 6)
          .as("modularity"))
  }

  /** Multi-source BFS hop distance: the minimum number of edges from any
    * node in `seeds` (a one-column `node` relation) to every reachable
    * node, explored to `maxHops` — the landmark-distance feature behind
    * graph ML features and blast-radius queries.
    *
    * Frontier-free formulation (simpler and oracle-replayable): iterate
    * dist ← min(dist, min over in-neighbours dist+1) `maxHops` times —
    * each step one equi-join + one map-side-combinable min aggregate +
    * one outer merge, all shuffled on node, localCheckpointed (plan O(1)
    * in hops). Monotone non-increasing, so maxHops ≥ eccentricity of the
    * seed set converges exactly; nodes beyond `maxHops` are absent from
    * the output (unreachable-within-budget is expressed by absence, not
    * a sentinel). */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val sym = symPartitioned(edges)
    var dist = seeds.select(col("node")).distinct()
      .withColumn("hop", lit(0)).localCheckpoint(false)
    (1 to maxHops).foreach { _ =>
      dist = dist
        .unionByName(
          dist.withColumnRenamed("node", "u")
            .join(sym, "u")
            .select(col("v").as("node"), (col("hop") + 1).as("hop")))
        .groupBy(col("node")).agg(min(col("hop")).as("hop"))
        .localCheckpoint(false)
    }
    dist
  }

  /** FRONTIER-DELTA form of [[bfsHops]] — the production path: in an
    * unweighted graph a node's FIRST discovery sweep is its minimum hop,
    * so each sweep expands only the nodes discovered LAST sweep (the
    * frontier) and anti-joins the candidates against the settled set —
    * per-sweep join volume is |frontier|·d̄, strictly shrinking once the
    * expansion wave passes its peak, instead of [[bfsHops]]' full-dist
    * re-materialization every sweep. The settled relation is a lazy
    * UNION of per-sweep checkpointed frontiers (each tiny), never
    * re-checkpointed as a whole. Early-exits when the frontier empties
    * (the frontier count doubles as the checkpoint materializer — the
    * kCoreCertified control-plane shape). Output is identical to
    * [[bfsHops]] by construction (GraphSpec proves equivalence). */
  def bfsHopsFrontier(edges: DataFrame, seeds: DataFrame,
      maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val sym = symPartitioned(edges)
    var frontier = seeds.select(col("node")).distinct()
      .withColumn("hop", lit(0)).localCheckpoint(false)
    var dist = frontier
    var h = 0
    while (h < maxHops && frontier.count() > 0) {
      h += 1
      frontier = frontier
        .withColumnRenamed("node", "u").join(sym, "u")
        .select(col("v").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .withColumn("hop", lit(h))
        .localCheckpoint(false)
      dist = dist.unionByName(frontier)
    }
    dist
  }

  /** Adamic–Adar link prediction (Adamic & Adar, Social Networks 2003):
    * for every non-adjacent pair (a, b) at distance 2, score
    * AA(a,b) = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z) — common neighbours,
    * discounted by how promiscuous each shared neighbour is. Returns the
    * top-`k` candidate links by (rounded score desc, a, b).
    *
    * Scale shape: wedges a–z–b explode quadratically on hub centres (a
    * degree-10⁶ z contributes 5·10¹¹ pairs), so z is DF-CAPPED at
    * `maxDeg` — the dedup tier's inverted-index cap: a shared neighbour
    * of degree > maxDeg carries 1/ln(deg) ≈ 0 signal and is dropped
    * LOUDLY by documented contract rather than silently blowing the
    * shuffle (same argument as stop-word df-caps; deg < 2 is dropped
    * too since ln(1) = 0 has no defined discount). Wedge build = one
    * self-join of the capped adjacency on z; existing edges leave via
    * one anti-join; the global top-k window runs over the aggregated
    * (pair-census-sized) relation, never the corpus. Scores are SUMMED
    * RAW then rounded once to 6; the top-k ORDER uses the rounded score
    * so cross-engine ulp drift in ln cannot flip the cutoff. */
  def adamicAdar(edges: DataFrame, k: Int = 50, maxDeg: Long = 1000): DataFrame = {
    // hash(u)-pinned: deg census, the capped tag join, and the z-keyed
    // wedge self-join all key on u/z — the census and BOTH wedge legs
    // reuse the one exchange
    val sym = symPartitioned(edges)
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val capped = sym.join(
        deg.filter(col("d") >= 2 && col("d") <= maxDeg), "u")
      .select(col("u").as("z"), col("v").as("n"), col("d"))
    val wedges = capped.as("l")
      .join(capped.as("r"),
        col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .select(col("l.n").as("a"), col("r.n").as("b"),
        (lit(1.0) / log(col("l.d").cast("double"))).as("w"))
    val existing = sym.select(least(col("u"), col("v")).as("a"),
      greatest(col("u"), col("v")).as("b")).distinct()
    val scored = wedges.join(existing, Seq("a", "b"), "left_anti")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"), round(sum(col("w")), 6).as("aa"))
    // top-k as orderBy+limit -> TakeOrderedAndProject: per-partition
    // heaps + one k-row merge, not a single-partition window sort of the
    // (candidate-pair-sized, millions at scale) scored relation
    scored.orderBy(col("aa").desc, col("a"), col("b")).limit(k)
  }

  /** Local clustering coefficient per node — "are my neighbours
    * neighbours of each other?", the cohesion read that separates a hub
    * in a clique-y community (high lcc) from a pure star centre
    * (lcc ≈ 0). lcc(u) = 2·tri(u) / (deg(u)·(deg(u)−1)) over nodes with
    * degree ≥ 2 (undefined below — those rows drop).
    *
    * Rides [[triangles]]' degree-ordered orientation wholesale: per-node
    * triangle counts come from exploding each triangle's three corners
    * into a map-side-combinable census (wedge work stays O(m^1.5),
    * hub-proof), degrees from the same symmetric edge census, and the
    * two vocab-sized relations meet in one equi-join — the corpus-sized
    * document relation is long gone by then. The coefficient is a single
    * exact-integer ratio, rounded once. */
  def localClustering(edges: DataFrame): DataFrame = {
    val triPerNode = triangles(edges)
      .select(explode(array(col("term_a"), col("term_b"), col("term_c")))
        .as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n_tri"))
    val deg = symmetric(edges)
      .groupBy(col("u").as("term")).agg(count(lit(1)).as("degree"))
    deg.filter(col("degree") >= 2)
      .join(triPerNode, Seq("term"), "left")
      .select(col("term"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
          (col("degree") * (col("degree") - 1L)).cast("double"), 6)
          .as("lcc"))
  }

  /** HITS hubs & authorities over a weighted directed edge relation —
    * the link-analysis complement to [[pageRank]]: PageRank scores
    * global reachability, HITS separates "points AT good pages" (hub)
    * from "pointed at BY good hubs" (authority) — the two roles a
    * citation/transition graph conflates into one PageRank number.
    *
    * Each of the fixed `iterations` alternates a = Aᵀh then h = Aa, each
    * an equi-join + map-side-combinable sum, L2-normalized by a one-row
    * broadcast and ROUNDED to 6 (the TextRank rule — float drift cannot
    * compound, and the oracle unrolls identical steps). Both iterates
    * checkpoint per round, so the plan is O(1) in the iteration count —
    * the [[pageRank]]/Lloyd shape. */
  def hits(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src"), col("dst"), col("w").cast("double").as("w"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    var hub = nodes.select(col("node"), lit(1.0).as("h"))
    var auth = nodes.select(col("node"), lit(1.0).as("a"))
    (1 to iterations).foreach { _ =>
      val aRaw = e.join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("w") * col("h")).as("ar"))
      val aNorm = aRaw.agg(sqrt(sum(col("ar") * col("ar"))).as("an"))
      auth = nodes.join(aRaw, Seq("node"), "left")
        .crossJoin(broadcast(aNorm))
        .select(col("node"),
          round(coalesce(col("ar"), lit(0.0)) / col("an"), 6).as("a"))
        .localCheckpoint(false)
      val hRaw = e.join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("w") * col("a")).as("hr"))
      val hNorm = hRaw.agg(sqrt(sum(col("hr") * col("hr"))).as("hn"))
      hub = nodes.join(hRaw, Seq("node"), "left")
        .crossJoin(broadcast(hNorm))
        .select(col("node"),
          round(coalesce(col("hr"), lit(0.0)) / col("hn"), 6).as("h"))
        .localCheckpoint(false)
    }
    auth.join(hub, "node")
      .select(col("node"), col("a").as("authority"), col("h").as("hub"))
  }
}
