package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persisted mergeable-sketch artifacts (Apache DataSketches via the
  * built-in `hll_*` / `kll_*` functions): the build / ingest / serve
  * pattern the BM25-postings and IVF tiers use, applied to cardinality
  * and quantile statistics.
  *
  * Why an artifact and not a query: at 100 TB, "distinct users per day"
  * or "p99 latency per service" gets asked hundreds of times against the
  * same immutable history. A sketch table holds ONE small binary row per
  * finest-grained cell; every later question — any coarser rollup, any
  * new day of data — is answered by MERGING sketches (register-wise max
  * for HLL, compactor merge for KLL), never by rescanning the corpus.
  * Both sketch families are associative and commutative, so partial
  * aggregation, AQE re-partitioning, and incremental appends all yield
  * the same merged state.
  *
  * Scale shape: build is one map-side-combined aggregate (sketches merge
  * in the partial-agg step, so the exchange carries one ~KB sketch per
  * cell per task, not rows); ingest appends the DELTA's cell sketches and
  * re-merges — history is never rescanned; serve groups the artifact's
  * tiny rows. Exact `countDistinct` at the same grain would shuffle every
  * distinct (cell, value) pair — O(corpus) — and cannot be incrementally
  * refreshed at all.
  */
object Sketches {

  /** lgConfigK for HLL sketches: 2¹² registers ≈ 1.6% relative standard
    * error at ~4 KB per sketch. */
  val HllLgK = 12

  /** k for KLL doubles sketches: normalized rank error ≈ 0.2% at 99%
    * confidence — far inside the 1% the serve-check asserts. */
  val KllK = 2048

  // ------------------------------------------------------- HLL distinct

  /** Build the distinct-count artifact: one HLL sketch of `value` per
    * finest-grained `cells` combination. */
  def hllBuild(df: DataFrame, cells: Seq[String], value: String,
      lgK: Int = HllLgK): DataFrame =
    df.groupBy(cells.map(col): _*)
      .agg(hll_sketch_agg(col(value), lgK).as("sketch"))

  /** Fold a delta corpus into the artifact — sketch the DELTA only, union
    * per cell. Register-wise max-merge: append ≡ rebuild, exactly. */
  def hllIngest(artifact: DataFrame, delta: DataFrame, cells: Seq[String],
      value: String, lgK: Int = HllLgK): DataFrame =
    artifact.unionByName(hllBuild(delta, cells, value, lgK))
      .groupBy(cells.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Serve distinct-count estimates at any rollup of the artifact's cells
    * — merges sketch rows, never touches the base table. */
  def hllServe(artifact: DataFrame, dims: Seq[String]): DataFrame =
    artifact.groupBy(dims.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .cast("long").as("approx_distinct"))

  /** Oracle-comparable serve: build at `cells`, roll up to `dims`, and emit
    * the EXACT distinct count plus a boolean asserting the merged-sketch
    * estimate landed within `bound` of it. The estimate itself is
    * implementation-defined and never leaves the query; the boolean is
    * deterministic (register max-merge is order- and partitioning-
    * independent) so an external oracle asserts it TRUE from the exact
    * side alone. */
  def hllServeCheck(df: DataFrame, cells: Seq[String], dims: Seq[String],
      value: String, bound: Double = 0.05): DataFrame =
    hllServe(hllBuild(df, cells, value), dims)
      .join(df.groupBy(dims.map(col): _*)
          .agg(countDistinct(col(value)).as("exact_distinct")),
        dims)
      .select(dims.map(col) :+ col("exact_distinct") :+
        (abs(col("approx_distinct") - col("exact_distinct")) <=
          col("exact_distinct") * bound).as("within_bound"): _*)

  // ------------------------------------------------------ KLL quantiles

  /** Build the quantile artifact: one KLL doubles sketch of `value` per
    * `cells` combination. */
  def kllBuild(df: DataFrame, cells: Seq[String], value: String,
      k: Int = KllK): DataFrame =
    df.groupBy(cells.map(col): _*)
      .agg(kll_sketch_agg_double(col(value).cast("double"), k).as("sketch"))

  /** Fold a delta corpus into the quantile artifact (compactor merge
    * preserves the rank-error guarantee across appends). */
  def kllIngest(artifact: DataFrame, delta: DataFrame, cells: Seq[String],
      value: String, k: Int = KllK): DataFrame =
    artifact.unionByName(kllBuild(delta, cells, value, k))
      .groupBy(cells.map(col): _*)
      .agg(kll_merge_agg_double(col("sketch")).as("sketch"))

  /** Serve quantiles at any rollup of the artifact's cells. Output one
    * column per requested probability (`p25`-style names). */
  def kllServe(artifact: DataFrame, dims: Seq[String],
      probs: Seq[Double]): DataFrame = {
    val merged = artifact.groupBy(dims.map(col): _*)
      .agg(kll_merge_agg_double(col("sketch")).as("sk"))
    merged.select(dims.map(col) ++ probs.map(p =>
      kll_sketch_get_quantile_double(col("sk"), lit(p)).as(nameOf(p))): _*)
  }

  private def nameOf(p: Double): String = s"p${math.round(p * 100)}"

  // --------------------------------------------------- theta set algebra

  /** lgK for theta sketches: 2¹² nominal entries ≈ 1.6% RSE; exact below
    * ~4096 distinct items (sampling never engages). */
  val ThetaLgK = 12

  private def thetaAgg(value: String, lgK: Int) =
    call_function("graft_theta_agg", col(value), lit(lgK))

  /** Build the set-algebra artifact: one theta sketch of `value` per
    * finest-grained `cells` combination. Unlike the HLL artifact, these
    * rows also support INTERSECTION and DIFFERENCE at serve time. */
  def thetaBuild(df: DataFrame, cells: Seq[String], value: String,
      lgK: Int = ThetaLgK): DataFrame =
    df.groupBy(cells.map(col): _*)
      .agg(thetaAgg(value, lgK).as("sketch"))

  /** Fold a delta corpus into the theta artifact — sketch the DELTA only,
    * union per cell (associative + commutative: append ≡ rebuild). */
  def thetaIngest(artifact: DataFrame, delta: DataFrame, cells: Seq[String],
      value: String, lgK: Int = ThetaLgK): DataFrame =
    artifact.unionByName(thetaBuild(delta, cells, value, lgK))
      .groupBy(cells.map(col): _*)
      .agg(call_function("graft_theta_union_agg", col("sketch")).as("sketch"))

  /** Serve distinct-count estimates at any rollup of the artifact cells. */
  def thetaServe(artifact: DataFrame, dims: Seq[String]): DataFrame =
    artifact.groupBy(dims.map(col): _*)
      .agg(round(call_function("graft_theta_estimate",
        call_function("graft_theta_union_agg", col("sketch"))))
        .cast("long").as("approx_distinct"))

  /** Oracle-comparable set-algebra check between two corpus slices: sketch
    * each side into ONE row (map-side-combined — neither slice is shuffled
    * or joined), intersect/difference the two sketches, and emit the EXACT
    * distinct counts plus booleans asserting each estimate landed within
    * `bound` of its exact value. The exact side (distinct + joins) exists
    * only for verification — the production path is the sketch algebra,
    * whose cost is two scans and four ~KB rows. Below ~2^lgK distinct
    * items per side the sketches are exact, so the booleans are
    * deterministic, not probabilistic. */
  def thetaOverlapCheck(a: DataFrame, b: DataFrame, value: String,
      bound: Double = 0.05, lgK: Int = ThetaLgK): DataFrame = {
    val da = a.select(col(value).as("v")).distinct()
    val db = b.select(col(value).as("v")).distinct()
    val exacts = da.agg(count(lit(1)).as("exact_a"))
      .crossJoin(db.agg(count(lit(1)).as("exact_b")))
      .crossJoin(da.join(db, "v").agg(count(lit(1)).as("exact_overlap")))
      .crossJoin(da.join(db, Seq("v"), "left_anti")
        .agg(count(lit(1)).as("exact_only_a")))
    val sketches = a.agg(thetaAgg(value, lgK).as("sk_a"))
      .crossJoin(b.agg(thetaAgg(value, lgK).as("sk_b")))
      .select(
        call_function("graft_theta_estimate", col("sk_a")).as("est_a"),
        call_function("graft_theta_estimate", col("sk_b")).as("est_b"),
        call_function("graft_theta_estimate",
          call_function("graft_theta_intersect", col("sk_a"), col("sk_b")))
          .as("est_overlap"),
        call_function("graft_theta_estimate",
          call_function("graft_theta_diff", col("sk_a"), col("sk_b")))
          .as("est_only_a"))
    def ok(est: String, exact: String) =
      (abs(col(est) - col(exact)) <= col(exact) * bound).as(s"ok${exact.stripPrefix("exact")}")
    exacts.crossJoin(sketches).select(
      col("exact_a"), col("exact_b"), col("exact_overlap"), col("exact_only_a"),
      ok("est_a", "exact_a"), ok("est_b", "exact_b"),
      ok("est_overlap", "exact_overlap"), ok("est_only_a", "exact_only_a"))
  }

  // ---------------------------------------------------- heavy hitters

  /** maxMapSize for frequent-items sketches: ε ≈ 3.5/1024 ≈ 0.34% of the
    * stream length; ~32 KB per sketch. */
  val FreqMaxMapSize = 1024

  /** Build the heavy-hitters artifact: one frequent-items sketch of
    * `item` per `cells` combination — the bounded-memory census of
    * dominant tokens / domains / join keys. */
  def freqBuild(df: DataFrame, cells: Seq[String], item: String,
      maxMapSize: Int = FreqMaxMapSize): DataFrame =
    df.groupBy(cells.map(col): _*)
      .agg(call_function("graft_freq_agg", col(item), lit(maxMapSize))
        .as("sketch"))

  /** Fold a delta corpus into the artifact — sketch the DELTA only, merge
    * per cell. Misra-Gries merges keep the error bound additive in ε·N.
    * The merge map size must match the build's (see FreqMergeAgg). */
  def freqIngest(artifact: DataFrame, delta: DataFrame, cells: Seq[String],
      item: String, maxMapSize: Int = FreqMaxMapSize): DataFrame =
    artifact.unionByName(freqBuild(delta, cells, item, maxMapSize))
      .groupBy(cells.map(col): _*)
      .agg(call_function("graft_freq_merge_agg", col("sketch"),
        lit(maxMapSize)).as("sketch"))

  /** Serve the reported heavy hitters of the merged artifact at `bp` basis
    * points of the stream: one row per (cells-rollup, reported item). */
  def freqServe(artifact: DataFrame, dims: Seq[String], bp: Int,
      maxMapSize: Int = FreqMaxMapSize): DataFrame =
    artifact.groupBy(dims.map(col): _*)
      .agg(call_function("graft_freq_merge_agg", col("sketch"),
        lit(maxMapSize)).as("sk"))
      .select(dims.map(col) :+
        explode(call_function("graft_freq_items", col("sk"), lit(bp))).as("r"): _*)
      .select(dims.map(col) ++ Seq(col("r.item").as("item"),
        col("r.est").as("est"), col("r.lb").as("lb"), col("r.ub").as("ub")): _*)

  /** Oracle-comparable heavy-hitters query: sketch the `item` stream, keep
    * items at ≥ `bp` basis points. In the no-eviction regime (distinct
    * items < ~0.75·maxMapSize) the sketch is exact, so (item, est) rows
    * equal the exact census both engines compute — the eviction regime's
    * weaker bound guarantees are spec'd in ThetaSpec/FreqSpec instead. */
  def freqServeCheck(df: DataFrame, item: String, bp: Int,
      maxMapSize: Int = FreqMaxMapSize): DataFrame =
    df.agg(call_function("graft_freq_agg", col(item), lit(maxMapSize)).as("sk"))
      .select(explode(call_function("graft_freq_items", col("sk"), lit(bp))).as("r"))
      .select(col("r.item").as("item"), col("r.est").as("est"))

  /** Oracle-comparable serve: quantiles from merged sketches, validated by
    * re-joining the rows and checking each returned value's TRUE rank sits
    * within `eps` of its target — the KLL guarantee (k = 2048 bounds rank
    * error to ~0.2%, asserted at 1%). Booleans hold for any valid sketch
    * output, so compaction randomness cannot flip them. */
  def kllServeCheck(df: DataFrame, cells: Seq[String], dims: Seq[String],
      value: String, probs: Seq[Double], eps: Double = 0.01): DataFrame = {
    val q = kllServe(kllBuild(df, cells, value), dims, probs)
    val counters = probs.flatMap { p =>
      val v = col(value).cast("double")
      Seq(
        sum(when(v <= col(nameOf(p)), 1L).otherwise(0L)).as(s"le_${nameOf(p)}"),
        sum(when(v < col(nameOf(p)), 1L).otherwise(0L)).as(s"lt_${nameOf(p)}"))
    }
    def rankOk(p: Double): Column =
      ((col(s"le_${nameOf(p)}") >= (lit(p) - eps) * col("n") - 1) &&
        (col(s"lt_${nameOf(p)}") + 1 <= (lit(p) + eps) * col("n") + 1))
        .as(s"${nameOf(p)}_ok")
    df.join(broadcast(q), dims)
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n"), counters: _*)
      .select(dims.map(col) ++ Seq(col("n")) ++ probs.map(rankOk): _*)
  }

  // ------------------------------------------------- Count-Min frequency

  /** The `d` CMS bucket ids of an item — row j's hash is the engine-wide
    * md5 7-nibble base (seed-namespaced `cms:j:`), reduced mod `w`.
    * Pairwise-independence per row comes from the independent md5
    * streams, the Cormode–Muthukrishnan requirement. */
  private def cmsBuckets(item: Column, d: Int, w: Int): Column =
    array((0 until d).map(j =>
      call_function("graft_md5_prefix",
        concat(lit(s"cms:$j:"), item), lit(7)) % w): _*)

  /** Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) of item
    * frequencies: a d×w grid of counters where item frequency is
    * OVER-estimated by at most εN with probability 1−δ (w = ⌈e/ε⌉,
    * d = ⌈ln 1/δ⌉) — the frequency complement to [[hllBuild]]
    * (distinct) and [[kllBuild]] (quantiles), and like them a MERGEABLE
    * artifact: cells are plain sums, so partial aggregation, delta
    * ingest (`unionByName` + re-sum) and cross-shard merges are all
    * exact by commutativity — no rescan, ever.
    *
    * Scale shape: one vocab-sized census first (map-side combined — the
    * corpus collapses before any CMS work), then d rows per DISTINCT
    * item into a (row, bucket) hash-agg of ≤ d·w cells. Integer
    * end-to-end: no float crosses an engine or partition boundary. */
  def cmsBuild(items: DataFrame, itemCol: String, d: Int = 3,
      w: Int = 64): DataFrame =
    items.groupBy(col(itemCol).as("item")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), posexplode(cmsBuckets(col("item"), d, w)))
      .toDF("cnt", "j", "bucket")
      .groupBy(col("j"), col("bucket")).agg(sum(col("cnt")).as("total"))

  /** Point-frequency estimates from a CMS artifact: for each distinct
    * probe item, the MIN over its d row counters — ≥ the true count
    * always (every occurrence landed in all d cells), ≤ true + εN w.h.p.
    * The artifact (≤ d·w rows) broadcasts; probes never shuffle.
    *
    * Empty-cell semantics: the grid stores only TOUCHED cells, so a
    * probe's (j, bucket) may be absent — true CMS semantics count an
    * absent cell as 0 (the item never hashed there, so its frequency is
    * 0). Hence LEFT join + coalesce(total, 0): every probe appears in
    * the output, and an unseen item estimates 0 instead of min() over
    * only its populated cells (which would inflate, or drop the probe
    * entirely on an inner join). */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, itemCol: String,
      d: Int = 3, w: Int = 64): DataFrame =
    probes.select(col(itemCol).as("item")).distinct()
      .select(col("item"), posexplode(cmsBuckets(col("item"), d, w)))
      .toDF("item", "j", "bucket")
      .join(broadcast(cms), Seq("j", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("total"), lit(0L))).as("cms_count"))
}
