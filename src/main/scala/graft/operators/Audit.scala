package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality audit: declarative rule checks over a table (the
  * great-expectations/dbt-test surface) — the gate a training-data or
  * warehouse load runs between write and publish, next to
  * [[Evolve.snapshotDiff]] in the write-audit-publish loop.
  *
  * Design: ALL rules evaluate in ONE map-side-combinable aggregation pass
  * (each rule is a Column predicate folded into a conditional sum), so
  * auditing 20 rules costs one table scan, not 20. A NULL predicate
  * result counts as a violation — a rule that cannot evaluate has failed,
  * the SQL-three-valued-logic trap callers otherwise hit one incident at
  * a time. */
object Audit {

  /** Per-rule violation counts + rates. `rules` maps rule name → predicate
    * that must hold for every row. One aggregate row, exploded to one row
    * per rule (rule, n_violations, n_rows, violation_rate). */
  def ruleReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggd = df.agg(count(lit(1)).as("n_rows"),
      rules.map { case (name, p) =>
        sum(when(p, 0L).otherwise(1L)).as(name) }: _*)
    aggd.select(col("n_rows"), explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(name).as("n_violations")) }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_violations").as("n_violations"),
        col("n_rows"),
        round(col("r.n_violations") / col("n_rows"), 6).as("violation_rate"))
  }

  /** Functional-dependency profiling census — "does `det → dep` actually
    * hold in the data?", the schema-inference / DQ-contract question
    * (Papenbrock et al. VLDB'15 frame FD discovery this way; this is the
    * verification side over a declared candidate list). Per candidate FD
    * the report carries the g3 error (Kivinen & Mannila 1995): the
    * MINIMUM number of rows to delete for the FD to hold exactly —
    * Σ over det-groups of (group size − its most common dep value's
    * count) — plus how many det groups witness a violation.
    *
    * Scale shape: one (det, dep) census then a det rollup, both
    * map-side-combinable hash aggregates bounded by value cross
    * products; the final fold is a one-row reduce. No window, no join,
    * no sort; all counts exact BIGINTs. */
  def fdCheck(df: DataFrame, fdName: String, detCols: Seq[String],
      depCol: String): DataFrame = {
    val sub = df.groupBy((detCols :+ depCol).map(col): _*)
      .agg(count(lit(1)).as("nv"))
    sub.groupBy(detCols.map(col): _*)
      .agg(sum(col("nv")).as("n"), max(col("nv")).as("top_nv"),
        count(lit(1)).as("n_dep"))
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(col("n") - col("top_nv")).as("g3_violations"),
        sum(when(col("n_dep") > 1, 1L).otherwise(0L)).as("violating_groups"))
      .select(lit(fdName).as("fd"), col("n_rows"), col("n_groups"),
        col("violating_groups"), col("g3_violations"),
        (col("g3_violations") === 0L).as("holds"))
  }

  /** Gini concentration of per-key activity counts — "do 1% of the keys
    * own 90% of the rows?", the skew-risk summary behind salting and
    * quota decisions. 0 = perfectly even, → 1 = one key owns everything.
    *
    * Computed WITHOUT a global row ranking: ranking 10^9 keys to feed
    * Σ i·x_i is the naive plan and it funnels everything into one sorted
    * partition. But x_i here is a COUNT with a small value domain, and
    * Gini is invariant to tie order, so the per-key relation collapses to
    * a (value → #keys) census first; a tied run of `cnt` keys starting
    * after `offset` smaller keys contributes x·(cnt·offset +
    * cnt·(cnt+1)/2) exactly. The run offsets come from
    * [[Sampling.orderedCensusCumsum]] range bands (the distinct-count
    * census is usually tiny but is not BOUNDED — a heavy-tailed key can
    * spread it), and every term stays integer until the single final
    * division. */
  def giniByKeyCount(df: DataFrame, keyCol: String): DataFrame = {
    val census = df.groupBy(col(keyCol)).agg(count(lit(1)).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("cnt"))
    Sampling.orderedCensusCumsum(census, col("x"),
        weights = Seq("cnt" -> col("cnt")))
      .withColumn("offset", col("cum_cnt"))
      .agg(
        sum(col("x") * (col("cnt") * col("offset") +
          call_function("div", col("cnt") * (col("cnt") + lit(1L)), lit(2L))))
          .as("sum_ix"),
        sum(col("x") * col("cnt")).as("sum_x"),
        sum(col("cnt")).as("n"))
      .select(col("n").as("n_keys"), col("sum_x").as("total"),
        round((lit(2L) * col("sum_ix") - (col("n") + 1) * col("sum_x")) /
          (col("n") * col("sum_x")).cast("double"), 6).as("gini"))
  }

  /** Order-independent table fingerprint: per-bucket (row count, XOR of a
    * 52-bit row hash) over md5(key columns) — two replicas of a table
    * compare by exchanging `buckets` tiny rows instead of 100 TB of data,
    * and a mismatch names the bucket to re-sync (the anti-entropy /
    * backup-verification primitive). XOR is the aggregator because it is
    * commutative, associative, self-inverse, and CANNOT overflow — the
    * checksum is layout- and order-independent by construction.
    * One map-side-combinable aggregation; output is `buckets` rows. */
  def tableChecksum(df: DataFrame, keyCols: Seq[String],
      buckets: Int = 64): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val h = call_function("graft_md5_prefix",
      concat_ws("|", keyCols.map(c => col(c).cast("string")): _*), lit(13))
    df.select((h % buckets).cast("int").as("bucket"), h.as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))
  }

  /** Pre-flight join-cardinality estimate: the EXACT output size of
    * `left ⋈ right` on an equi-key, computed from per-key counts WITHOUT
    * running the join — |A ⋈ B| = Σ_k ca(k)·cb(k). The 100 TB planning
    * tool: a join that would explode (hot key, unexpected many-to-many)
    * names its blowup and its worst key from two map-side-combinable
    * aggregations plus a join of two key-count relations, each no larger
    * than the key cardinality.
    *
    * Output (one row): est_rows, n_keys (keys present on BOTH sides),
    * max_key_pairs (the worst key's contribution), top_key_share
    * (max/est — ≈1 means one key IS the join; salt it). All-integer until
    * the single final division, so the numbers are engine-exact. */
  def joinCardinality(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val la = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("ca"))
    val ra = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cb"))
    la.join(ra, Seq("k"))
      .agg(sum(col("ca") * col("cb")).as("est_rows"),
        count(lit(1)).as("n_keys"),
        max(col("ca") * col("cb")).as("max_key_pairs"))
      .select(col("est_rows"), col("n_keys"), col("max_key_pairs"),
        round(col("max_key_pairs") / col("est_rows").cast("double"), 6)
          .as("top_key_share"))
  }

  /** Referential-integrity audit: fact rows whose key has no partner in
    * the dimension (left anti join — broadcastable whenever the dim key
    * set fits, which is the normal case for a 100 TB fact table). */
  def referentialOrphans(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String): DataFrame =
    fact.join(dim.select(col(dimKey).as(factKey)).distinct(),
      Seq(factKey), "left_anti")

  /** Robust per-group outlier census via MAD (median absolute deviation):
    * a value is an outlier when |x − median| > k·1.4826·MAD (1.4826
    * rescales MAD to σ under normality) — the census that survives the
    * very outliers a mean/stddev rule is corrupted by.
    *
    * Shape: two exact-percentile passes (median, then median of absolute
    * deviations) with the per-group stats BROADCAST back between passes —
    * the group-key relation is tiny; the table is the 100 TB side and is
    * only ever scanned, never shuffled on row identity. Exact
    * `percentile` buffers each group's values in one task (the winsorize
    * tradeoff, chosen for oracle parity); when groups outgrow a task,
    * swap to the mergeable GK sketch ([[Relational.approxQuantilesBy]]).
    * Stats are ROUNDED before the threshold comparison so both engines
    * agree at the boundary (the verify-recipe rule). */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 4).as("med"))
    val mad = df.join(broadcast(med), groupCol)
      .groupBy(col(groupCol))
      .agg(round(expr(s"percentile(abs($valueCol - med), 0.5)"), 4).as("mad"))
    val stats = med.join(mad, groupCol)
      .withColumn("thresh", round(lit(k) * 1.4826 * col("mad"), 4))
    df.join(broadcast(stats), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med"), first(col("mad")).as("mad"),
        first(col("thresh")).as("thresh"),
        sum(when(round(abs(col(valueCol) - col("med")), 4) > col("thresh"),
          1L).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_rate",
        round(col("n_outliers").cast("double") / col("n"), 6))
  }

  /** χ² independence census between two categorical columns: the
    * contingency table with per-cell expected counts (row·col/n) and χ²
    * contributions — "are returns independent of line status?" as one
    * map-side-combinable cell aggregation; the marginals are window sums
    * over the CELL relation (|A|·|B| rows, not the table). Marginal
    * products go through DOUBLE before multiplying so 10¹²-row tables
    * cannot overflow the long product. */
  def chiSquareIndependence(df: DataFrame, colA: String,
      colB: String): DataFrame = {
    // the FULL |A|x|B| grid, so empty cells contribute (0-exp)^2/exp —
    // omitting them understates the statistic exactly where dependence
    // is strongest. Both distinct relations are value-domain-sized; the
    // cross is broadcast.
    val counts = df.groupBy(col(colA), col(colB)).agg(count(lit(1)).as("cell_n"))
    val grid = df.select(col(colA)).distinct()
      .crossJoin(broadcast(df.select(col(colB)).distinct()))
    val cells = grid.join(counts, Seq(colA, colB), "left")
      .withColumn("n_obs", coalesce(col("cell_n"), lit(0L)))
      .withColumn("row_tot", sum(col("n_obs")).over(Window.partitionBy(col(colA))))
      .withColumn("col_tot", sum(col("n_obs")).over(Window.partitionBy(col(colB))))
      .withColumn("n", sum(col("n_obs")).over(Window.partitionBy()))
      .withColumn("exp_raw",
        col("row_tot").cast("double") * col("col_tot") / col("n"))
    cells.select(col(colA), col(colB), col("n_obs"),
      round(col("exp_raw"), 4).as("expected"),
      round((col("n_obs") - col("exp_raw")) * (col("n_obs") - col("exp_raw"))
        / col("exp_raw"), 6).as("chi2_part"))
  }

  /** One-row χ² summary with Cramér's V — the EFFECT SIZE the raw χ²
    * statistic hides (χ² grows with n; V = sqrt(χ²/(n·(min(r,c)−1))) is
    * the 0..1 association strength comparable across table sizes).
    * Composes [[chiSquareIndependence]]'s cell relation; everything here
    * runs on |A|·|B| rows. */
  def cramersV(df: DataFrame, colA: String, colB: String): DataFrame =
    chiSquareIndependence(df, colA, colB)
      .agg(sum(col("n_obs")).as("n"),
        round(sum(col("chi2_part")), 6).as("chi2"),
        count_distinct(col(colA)).as("r"),
        count_distinct(col(colB)).as("c"))
      .select(col("n"), col("chi2"),
        round(sqrt(col("chi2") /
          (col("n") * (least(col("r"), col("c")) - 1)).cast("double")), 6)
          .as("cramers_v"))

  /** Mutual information between two categorical columns, decomposed per
    * cell: MI = Σ p(a,b)·ln(p(a,b)/(p(a)p(b))) — the feature-relevance
    * read χ² doesn't give (χ² asks "dependent at all?", MI measures HOW
    * MANY NATS the columns share). Empty cells contribute exactly 0
    * (lim p→0 of p·ln p), so unlike [[chiSquareIndependence]] no grid is
    * needed — one observed-cell census + marginal window sums. Products
    * go through DOUBLE before multiplying (the 10¹²-row overflow rule).
    * Sum `mi_contrib` for the total; every term is a single ln on an
    * integer-derived ratio, identical in both engines. */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame =
    df.groupBy(col(colA), col(colB)).agg(count(lit(1)).as("n_obs"))
      .withColumn("row_tot", sum(col("n_obs")).over(Window.partitionBy(col(colA))))
      .withColumn("col_tot", sum(col("n_obs")).over(Window.partitionBy(col(colB))))
      .withColumn("n", sum(col("n_obs")).over(Window.partitionBy()))
      .select(col(colA), col(colB), col("n_obs"),
        round((col("n_obs") / col("n").cast("double")) *
          log((col("n_obs").cast("double") * col("n")) /
            (col("row_tot").cast("double") * col("col_tot"))), 6)
          .as("mi_contrib"))

  /** Column-entropy profile: per categorical column, distinct-value
    * count, Shannon entropy in bits, and the top value's share — the
    * "is this column a constant / an id / a balanced enum?" profiling
    * census. All requested columns stack into ONE scan (explode of a
    * column→value map, the ruleReport philosophy); the per-value census
    * is map-side combinable and everything after it operates on value
    * cardinality, not rows. The entropy sum divides by ln 2 AFTER
    * summing so both engines share one rounding path. */
  def entropyProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val stacked = df.select(explode(map(
      cols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
      .as(Seq("col_name", "value")))
    val census = stacked.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("total",
        sum(col("cnt")).over(Window.partitionBy(col("col_name"))))
    census.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"),
        round(-sum((col("cnt") / col("total")) *
          log(col("cnt") / col("total"))) / log(lit(2.0)), 6).as("entropy_bits"),
        round(max(col("cnt")) / max(col("total")).cast("double"), 6)
          .as("top_share"))
  }

  /** Score-calibration census: rows decile-bucketed by `scoreCol`, with
    * per-decile size, score RANGE (min/max — order statistics, chosen
    * over a float mean so the artifact is engine-exact) and observed
    * event rate — the reliability-diagram table behind "does the score
    * mean what it claims?". Ties break by (rounded score, key) so
    * boundaries are deterministic.
    *
    * NO global ntile window: the global rank decomposes over
    * [[graft.operators.Sampling.withRangeBand]] score bands — per-band
    * row counts roll up in a tiny census whose running sum broadcasts
    * back as each band's rank OFFSET, the corpus-side row_number window
    * is partitioned by band, and the standard-SQL ntile allocation
    * (first N mod 10 deciles take one extra row) is replayed from the
    * rank in exact integer arithmetic — bit-identical to
    * `ntile(10) OVER (ORDER BY score, k)` with the scored relation never
    * funneling through one sort task. */
  def calibrationByDecile(df: DataFrame, keyCol: String, scoreCol: String,
      event: org.apache.spark.sql.Column, bands: Int = 64): DataFrame = {
    val scored = df.select(col(keyCol).as("k"),
      round(col(scoreCol), 4).as("score"),
      when(event, 1L).otherwise(0L).as("event"))
    Sampling.bandedNtile(scored, col("score"), Seq(col("k")), 10,
        "decile", nBands = bands)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"),
        sum(col("event")).as("n_events"))
      .withColumn("event_rate",
        round(col("n_events").cast("double") / col("n"), 6))
  }

  /** Per-group distribution moments: mean, sd, skewness and excess
    * kurtosis — the shape census `describe` omits. Built from explicit
    * TWO-PASS central moments (pass 1 the rounded mean, pass 2 the
    * centered powers with the mean broadcast back) rather than the
    * engines' builtin skewness/kurtosis, whose bias-correction variants
    * disagree; the explicit formula is identical arithmetic in both. */
  def groupedMoments(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol)
    val mu = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), round(avg(v), 4).as("mean"))
    val dev = v - col("mean")
    df.join(broadcast(mu), groupCol)
      .groupBy(col(groupCol))
      .agg(first(col("n")).as("n"), first(col("mean")).as("mean"),
        avg(dev * dev).as("m2"), avg(dev * dev * dev).as("m3"),
        avg(dev * dev * dev * dev).as("m4"))
      .select(col(groupCol), col("n"), col("mean"),
        round(sqrt(col("m2")), 4).as("sd"),
        round(col("m3") / pow(col("m2"), 1.5), 4).as("skewness"),
        round(col("m4") / (col("m2") * col("m2")) - 3.0, 4).as("kurtosis"))
  }

  /** Metric stability by deterministic subsampling: rows hash into
    * `buckets` disjoint pseudo-replicas (the md5 base every sampling
    * surface shares — layout-independent), each replica computes the
    * metric, and the report is the spread of the replica estimates —
    * "how many digits of this dashboard number are real?" without
    * bootstrap RNG. sd_means estimates the SUBSAMPLE spread; se_mean =
    * sd/√B is the usual standard-error read.
    *
    * Determinism: bucket means round to 4 before the spread (sub-round
    * float-sum noise cannot leak), and the variance is the
    * subtract-mean-first form — no catastrophic cancellation, identical
    * expression both engines. One scan; everything after the per-bucket
    * aggregate operates on B rows. */
  def metricStability(df: DataFrame, idCol: String, valueCol: String,
      buckets: Int = 32): DataFrame = {
    val b = df.select(
        Sampling.hashBucket(col(idCol), buckets).as("bucket"),
        col(valueCol).as("v"))
      .groupBy(col("bucket")).agg(round(avg(col("v")), 4).as("m"))
    val mu = b.agg(round(avg(col("m")), 4).as("mu"))
    b.crossJoin(broadcast(mu))
      .agg(count(lit(1)).as("n_buckets"),
        first(col("mu")).as("mean_of_means"),
        round(sqrt(sum((col("m") - col("mu")) * (col("m") - col("mu"))) /
          (count(lit(1)) - 1)), 4).as("sd_means"))
      .withColumn("se_mean",
        round(col("sd_means") / sqrt(col("n_buckets").cast("double")), 4))
  }

  /** Benford first-significant-digit census + per-digit χ² decomposition
    * — the "were these numbers typed in by hand?" fraud/quality screen.
    * One scan, one 9-group aggregate; everything after the digit
    * extraction operates on 9 rows.
    *
    * The leading digit comes from floor(x / 10^floor(log10 x)). The
    * floor(log10) edge (log10(1000) can evaluate fractionally under 3,
    * yielding a "digit" of 10) is clamped to 1 — deterministically THE
    * SAME in both engines, because the arithmetic is identical IEEE ops
    * on identical doubles. */
  def benfordReport(df: DataFrame, valueCol: String): DataFrame = {
    val x = abs(col(valueCol))
    val d10 = floor(x / pow(lit(10.0), floor(log10(x)))).cast("int")
    val digit = when(d10 >= 10, 1).when(d10 < 1, 1).otherwise(d10)
    df.filter(x > 0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .withColumn("n", sum(col("n_obs")).over(Window.partitionBy()))
      .withColumn("exp_raw",
        col("n") * log10(lit(1.0) + lit(1.0) / col("digit")))
      .select(col("digit"), col("n_obs"), col("n"),
        round(col("exp_raw"), 4).as("expected"),
        round((col("n_obs") - col("exp_raw")) * (col("n_obs") - col("exp_raw"))
          / col("exp_raw"), 6).as("chi2_part"))
  }

  /** Cumulative Poisson(1) CDF values F(0)..F(7): a replicate weight is
    * the count of thresholds below the row's deterministic uniform —
    * the inverse-CDF draw, truncated at 8 (P[w > 8] ≈ 1e-6). Literal
    * decimal strings parse to identical doubles in both engines. */
  private val PoissonCdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  /** Poisson-bootstrap percentile CI for a per-group mean — the
    * distributed bootstrap: classical resampling-with-replacement needs
    * a multinomial draw coordinated across the whole dataset, but its
    * per-row counts converge to independent Poisson(1) weights, which
    * need NO coordination — each row derives its B weights from its own
    * id (the engine-wide md5 base, so the resample is reproducible
    * across engines, reruns, and data layout). One map-side explode of B
    * replicate indexes per row, one (group × B)-bucket hash agg with
    * map-side combine, then everything after operates on group×B rows:
    * the same shape at 60k rows and 100 TB, no per-group sort of DATA —
    * the percentile window sorts the B replicate means only.
    *
    * Replicate means round to 4 before ranking (float-sum noise cannot
    * reorder the percentile cut except at exact 1e-4 boundaries, where
    * the replicate index breaks the tie identically in both engines). */
  def poissonBootstrapCI(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String, replicates: Int = 200): DataFrame = {
    val loIdx = math.ceil(0.025 * replicates).toInt
    val hiIdx = replicates - loIdx + 1
    val u = (call_function("graft_md5_prefix",
        concat(col(idCol).cast("string"), lit(":"), col("b").cast("string")),
        lit(7)).cast("double") + 0.5) / (1L << 28).toDouble
    val w = PoissonCdf.map(t => when(u > t, 1).otherwise(0)).reduce(_ + _)
    val means = df
      .select(col(groupCol), col(idCol), col(valueCol).as("v"))
      .withColumn("b", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("w", w)
      .groupBy(col(groupCol), col("b"))
      .agg(round(sum(col("w") * col("v")) / sum(col("w")).cast("double"), 4)
        .as("m"))
    val ranked = means.withColumn("rn",
      row_number().over(Window.partitionBy(col(groupCol))
        .orderBy(col("m"), col("b"))))
    val base = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), round(avg(col(valueCol)), 4).as("mean_value"))
    base.join(
      ranked.groupBy(col(groupCol)).agg(
        max(when(col("rn") === loIdx, col("m"))).as("ci_lo"),
        max(when(col("rn") === hiIdx, col("m"))).as("ci_hi")),
      Seq(groupCol))
  }

  /** One-way ANOVA F-statistic of `valueCol` across `groupCol` — "does
    * the metric's MEAN differ across segments at all?", the g-group
    * generalization of the two-sample t (and the gate before pairwise
    * A/B drilldowns; [[Experiment]] hosts the 2-group forms).
    *
    * Exactness discipline (the engine-wide integer-micro rule): values
    * quantize to BIGINT micros, so the per-group (n, Σx, Σx²) triple is
    * EXACT — Σx a long, Σx² a DECIMAL(38,0) (micro² clears 2^63) — in
    * any partition order. F's micro² scale cancels:
    * SSB = Σᵢ Sᵢ²/nᵢ − S²/N, SSW = ΣQᵢ − ΣSᵢ²/nᵢ, and the only
    * non-exact steps are the g per-group divisions folded on the
    * group-census-sized relation (one map-side agg + one g-row fold).
    * Output one row: (n, g, f_stat) rounded to 4. */
  def anovaOneWay(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    val dec: Column => Column = _.cast("decimal(38,0)")
    val micro = round(col(valueCol).cast("double") * 1e6, 0).cast("long")
    val per = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), micro.as("xm"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ni"), sum(col("xm")).as("si"),
        sum(dec(col("xm")) * dec(col("xm"))).as("qi"))
    per.agg(sum(col("ni")).as("n"), count(lit(1)).as("g"),
        sum(col("si")).as("s"),
        sum(col("qi").cast("double")).as("q"),
        // Sᵢ²/nᵢ: exact DECIMAL numerator, one double division per group
        sum((dec(col("si")) * dec(col("si"))).cast("double") /
          col("ni").cast("double")).as("a"))
      .select(col("n"), col("g"),
        round(((col("a") - dec(col("s")).cast("double") *
            dec(col("s")).cast("double") / col("n").cast("double")) /
            (col("g") - 1).cast("double")) /
          ((col("q") - col("a")) / (col("n") - col("g")).cast("double")), 4)
          .as("f_stat"))
  }

  /** Welch's unequal-variance t-test between two samples of `valueCol` —
    * the parametric twin of [[mannWhitney]] (same two-sample question;
    * Welch never assumes equal variances, which is why it replaced
    * Student's t as the default). t = (m₁−m₂)/√(v₁/n₁+v₂/n₂) with the
    * Welch–Satterthwaite df, plus Cohen's d on the pooled sd as the
    * effect size the p-value hides.
    *
    * Exact integer-micro (n, Σx, Σx²) per sample — the ANOVA triple —
    * so every moment is layout-free; t and d are scale-invariant, so
    * the micro scale cancels and only the reported means divide back.
    * One map-side aggregate per sample, all arithmetic on the 1-row
    * fold. */
  def welchT(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val dec: Column => Column = _.cast("decimal(38,0)")
    val micro = round(col(valueCol).cast("double") * 1e6, 0).cast("long")
    def moments(df: DataFrame, tag: String): DataFrame =
      df.filter(col(valueCol).isNotNull).select(micro.as("x"))
        .agg(count(lit(1)).as(s"n$tag"), sum(col("x")).as(s"s$tag"),
          sum(dec(col("x")) * dec(col("x"))).as(s"q$tag"))
    def v(tag: String): Column =
      (dec(col(s"n$tag")) * col(s"q$tag") -
        dec(col(s"s$tag")) * dec(col(s"s$tag"))).cast("double") /
        (col(s"n$tag").cast("double") * (col(s"n$tag") - 1))
    def m(tag: String): Column = col(s"s$tag").cast("double") / col(s"n$tag")
    moments(a, "1").crossJoin(broadcast(moments(b, "2")))
      .withColumn("v1", v("1")).withColumn("v2", v("2"))
      .withColumn("se2", col("v1") / col("n1") + col("v2") / col("n2"))
      .select(col("n1"), col("n2"),
        round(m("1") / 1e6, 6).as("mean1"),
        round(m("2") / 1e6, 6).as("mean2"),
        round((m("1") - m("2")) / sqrt(col("se2")), 4).as("t_stat"),
        round(col("se2") * col("se2") /
          (col("v1") / col("n1") * (col("v1") / col("n1")) / (col("n1") - 1) +
           col("v2") / col("n2") * (col("v2") / col("n2")) / (col("n2") - 1)),
          2).as("df"),
        round((m("1") - m("2")) / sqrt(
          ((col("n1") - 1) * col("v1") + (col("n2") - 1) * col("v2")) /
            (col("n1") + col("n2") - 2)), 4).as("cohens_d"))
  }

  /** Mann–Whitney U rank-sum test between two samples of `valueCol` —
    * the DISTRIBUTION-FREE two-sample location test (no normality
    * assumption, robust to outliers; the nonparametric complement to
    * [[Experiment]]'s z/t forms and [[Drift]]'s KS statistic).
    *
    * Never ranks raw rows: both samples collapse to a DISTINCT-VALUE
    * census (n₁, n₂ per exact micro value), average ranks come from a
    * BANDED cumulative count over that census
    * ([[graft.operators.Sampling.orderedCensusCumsum]] — on a continuous
    * domain the census is Θ(corpus), so the prefix decomposes over range
    * bands with broadcast offsets, never one sort task), and
    * U₁ = ΣR₁ − n₁(n₁+1)/2 stays EXACT: average ranks are half-integers,
    * so 2·R₁ is an exact long fold. The tie-corrected normal
    * approximation z = (U₁ − n₁n₂/2) / σ_tie uses Σ(t³−t) — exact
    * BIGINT — and pays one sqrt on the one-row output. */
  def mannWhitney(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val micro = round(col(valueCol).cast("double") * 1e6, 0).cast("long")
    val tag = (df: DataFrame, one: Int) => df.filter(col(valueCol).isNotNull)
      .select(micro.as("v"), lit(one).as("in1"))
    val census = tag(a, 1).unionByName(tag(b, 0))
      .groupBy(col("v"))
      .agg(sum(col("in1")).cast("long").as("n1v"),
        sum(lit(1) - col("in1")).cast("long").as("n2v"))
      .withColumn("t", col("n1v") + col("n2v"))
    val ranked = Sampling.orderedCensusCumsum(census, col("v"),
        weights = Seq("t" -> col("t")))
      // 2·avg_rank of value v = 2·(count below) + t + 1 — exact long
      .withColumn("r2", lit(2) * col("cum_t") + col("t") + 1)
    ranked.agg(
        sum(col("n1v")).as("n1"), sum(col("n2v")).as("n2"),
        sum(col("n1v") * col("r2")).as("sr2"),
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
      .select(col("n1"), col("n2"),
        (col("sr2").cast("double") / 2 -
          col("n1").cast("double") * (col("n1") + 1) / 2).as("u1"),
        col("ties"))
      .withColumn("nn", (col("n1") + col("n2")).cast("double"))
      .select(col("n1"), col("n2"), col("u1"),
        round((col("u1") - col("n1").cast("double") * col("n2") / 2) /
          sqrt(col("n1").cast("double") * col("n2") / 12.0 *
            ((col("nn") + 1) - col("ties").cast("double") /
              (col("nn") * (col("nn") - 1)))), 4).as("z"))
  }
}
