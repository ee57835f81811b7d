package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation-platform statistics over the events ledger — the
  * "did the change work?" read-out a data platform owes its users once
  * it can already randomize (deterministic hash bucketing, `Sampling`)
  * and aggregate. Variants come from the same md5 unit-hash every
  * sampling surface shares, so assignment is reproducible across
  * engines, reruns and layouts.
  *
  * Determinism discipline (the CUSUM/ACF rule): per-user value sums are
  * exact integer CENTS; every reported statistic is either an exact
  * integer ratio divided ONCE at the output, or a double combination of
  * such ratios each rounded first. DECIMAL(38,0) carries the one-row
  * products of sums (n·Σxy − Σx·Σy clears 2⁶³ long before the sums
  * themselves do). */
object Experiment {

  private def centsOf(value: Column): Column =
    round(value * 100, 0).cast("long")

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013):
    * adjust each unit's post-period metric y by its PRE-period covariate
    * x — y_cuped = y − θ·(x − x̄), θ = cov(x,y)/var(x) pooled across
    * variants — and report per-variant means and variances of both the
    * raw and the adjusted metric. Pre-period behaviour is independent of
    * assignment, so the adjustment is unbiased and strips the variance
    * share that pre-existing heterogeneity explains: the same experiment
    * decides in a fraction of the traffic.
    *
    * Scale shape: the ledger folds to one row per unit in a single
    * map-side-combinable aggregate (pre/post split by one timestamp
    * predicate); θ and x̄ come from a ONE-ROW moment fold broadcast
    * back; per-variant outputs aggregate the unit relation once more.
    * Nothing corpus-sized is joined, windowed or sorted. */
  def cupedReport(events: DataFrame, cutoff: String,
      variants: Int = 2): DataFrame = {
    val perUser = events
      .select(col("user_id"),
        (col("ts") < lit(cutoff).cast("timestamp")).as("pre"),
        centsOf(col("value")).as("cents"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"))
      .withColumn("variant",
        (Sampling.hashBucket(col("user_id")) % variants).cast("int"))
    val dec: Column => Column = _.cast("decimal(38,0)")
    // pooled moments -> theta and x_bar, each ONE exact-integer ratio
    val pooled = perUser.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sx2"))
      .select(
        round((dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
          .cast("double") /
          (dec(col("n")) * col("sx2") - dec(col("sx")) * dec(col("sx")))
          .cast("double"), 6).as("theta"),
        // cents -> value units: /100 inside the single division
        round(col("sx").cast("double") / (col("n") * 100L), 6).as("x_bar"))
    val byVariant = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sx2"),
        sum(dec(col("y")) * dec(col("y"))).as("sy2"))
    // per-variant raw moments in value units, each rounded BEFORE the
    // double combination below (one rounding path in both engines)
    val n = col("n_units")
    val meanX = round(col("sx").cast("double") / (n * 100L), 6)
    val meanY = round(col("sy").cast("double") / (n * 100L), 6)
    val varY = round((dec(n) * col("sy2") - dec(col("sy")) * dec(col("sy")))
      .cast("double") / (n * n * 10000L).cast("double"), 6)
    val varX = round((dec(n) * col("sx2") - dec(col("sx")) * dec(col("sx")))
      .cast("double") / (n * n * 10000L).cast("double"), 6)
    val covXY = round((dec(n) * col("sxy") - dec(col("sx")) * dec(col("sy")))
      .cast("double") / (n * n * 10000L).cast("double"), 6)
    byVariant.crossJoin(broadcast(pooled))
      .withColumn("mean_y", meanY)
      .withColumn("var_y", varY)
      .withColumn("mean_cuped",
        round(meanY - col("theta") * (meanX - col("x_bar")), 6))
      .withColumn("var_cuped",
        round(varY - lit(2.0) * col("theta") * covXY +
          col("theta") * col("theta") * varX, 6))
      .select(col("variant"), col("n_units"), col("theta"), col("mean_y"),
        col("mean_cuped"), col("var_y"), col("var_cuped"),
        round((lit(1.0) - col("var_cuped") / col("var_y")) * 100, 2)
          .as("var_reduction_pct"))
  }

  /** Two-proportion z-test on a post-period conversion event — the
    * basic A/B read-out: per-variant exposure and conversion counts,
    * rates, absolute lift, and the pooled-variance z statistic
    * (variant 1 minus variant 0). Conversion = at least one `convType`
    * event of value ≥ `minValue` after the cutoff (the value floor keeps
    * the rate non-degenerate on a corpus where every unit eventually
    * fires every event type). All counts exact; rates and the pooled
    * rate are single integer ratios rounded 6; z combines the ROUNDED
    * components in one √ expression, rounded 4 — NULL (not an error)
    * when the pooled rate is 0 or 1, where the statistic is undefined. */
  def abTestZ(events: DataFrame, convType: String, cutoff: String,
      minValue: Double = 0.0): DataFrame = {
    val conv = events
      .filter(col("event_type") === convType &&
        col("ts") >= lit(cutoff).cast("timestamp") &&
        col("value") >= minValue)
      .select(col("user_id")).distinct()
      .withColumn("converted", lit(1L))
    val units = events.select(col("user_id")).distinct()
      .withColumn("variant", (Sampling.hashBucket(col("user_id")) % 2).cast("int"))
      .join(conv, Seq("user_id"), "left")
    val per = units.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("converted"), lit(0L))).as("c"))
      .withColumn("p", round(col("c").cast("double") / col("n"), 6))
    val a = per.filter(col("variant") === 0)
      .select(col("n").as("n0"), col("c").as("c0"), col("p").as("p0"))
    val b = per.filter(col("variant") === 1)
      .select(col("n").as("n1"), col("c").as("c1"), col("p").as("p1"))
    a.crossJoin(b)
      .withColumn("p_pool",
        round((col("c0") + col("c1")).cast("double") / (col("n0") + col("n1")), 6))
      .select(col("n0"), col("c0"), col("p0"), col("n1"), col("c1"), col("p1"),
        round(col("p1") - col("p0"), 6).as("lift"),
        when(col("p_pool") === 0.0 || col("p_pool") === 1.0,
          lit(null).cast("double"))
          .otherwise(round((col("p1") - col("p0")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 4)).as("z"))
  }

  /** Minimum detectable effect for the two-proportion A/B at the
    * standard 5%/80% operating point — the PRE-experiment power read
    * ("can this traffic even see the effect we care about?"):
    * MDE = (z_{α/2} + z_β)·√(p̄(1−p̄)(1/n₀+1/n₁)) with z constants
    * 1.959964 and 0.841621 (fixed literals — the ln-constant
    * acceptance), p̄ the observed baseline conversion over the SAME
    * unit/conversion definition as [[abTestZ]]. Exact unit counts, one
    * sqrt on the one-row output; relative MDE divides by the pooled
    * rate (NULL when the baseline is degenerate). */
  def minDetectableEffect(events: DataFrame, convType: String,
      cutoff: String, minValue: Double): DataFrame = {
    val conv = events
      .filter(col("event_type") === convType &&
        col("ts") >= lit(cutoff).cast("timestamp") &&
        col("value") >= minValue)
      .select(col("user_id")).distinct().withColumn("converted", lit(1))
    val units = events.select(col("user_id")).distinct()
      .join(conv, Seq("user_id"), "left")
      .select((Sampling.hashBucket(col("user_id")) % 2).cast("int").as("v"),
        coalesce(col("converted"), lit(0)).as("c"))
    val zSum = 1.959964 + 0.841621
    units.agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
        sum(col("c")).cast("long").as("conv"))
      .withColumn("p_pool",
        round(col("conv").cast("double") / (col("n0") + col("n1")), 6))
      .select(col("n0"), col("n1"), col("p_pool"),
        round(lit(zSum) * sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 6).as("mde_abs"),
        when(col("p_pool") === 0.0, lit(null).cast("double"))
          .otherwise(round(lit(zSum) *
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n0") + lit(1.0) / col("n1"))) /
            col("p_pool"), 6)).as("mde_rel"))
  }

  /** Sample-ratio-mismatch (SRM) guardrail — the first thing a trustworthy
    * experimentation system checks (Fabijan et al., KDD 2019 diagnosis
    * taxonomy): if the unit split deviates from the designed 50/50 beyond
    * chance, SOMETHING upstream (redirect loss, bot filtering, logging) is
    * biased and every downstream metric read is void. One-cell χ² vs the
    * expected half: χ² = (n₀−n₁)²/(n₀+n₁) (the 2-cell equal-split
    * simplification), flagged at the 0.001-level critical value 10.828 —
    * SRM checks run at tight α because they gate, not estimate. Exact
    * integer counts, one ratio, flag on the ROUNDED statistic. */
  def sampleRatioMismatch(events: DataFrame, variants: Int = 2): DataFrame = {
    require(variants == 2, "SRM guardrail implemented for the A/B split")
    val units = events.select(col("user_id")).distinct()
      .select((Sampling.hashBucket(col("user_id")) % 2).cast("int").as("v"))
    units.agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"))
      .select(col("n0"), col("n1"),
        round((col("n0") - col("n1")).cast("double") *
          (col("n0") - col("n1")) / (col("n0") + col("n1")), 4).as("chi2"))
      .withColumn("srm_flag", col("chi2") > 10.828)
  }

  /** Two-period difference-in-differences — the quasi-experimental
    * complement to [[abTestZ]] (randomized) for rollouts where only a
    * cohort got the change: DiD = (ȳ_treat,post − ȳ_treat,pre) −
    * (ȳ_ctrl,post − ȳ_ctrl,pre) cancels both the level difference
    * between cohorts and the common time trend; the parallel-trends
    * assumption carries the causal read.
    *
    * Unit of analysis = per (user, period) metric total, so repeated
    * events fold first (one map-side aggregate). The four (treat, post)
    * cell moments land in ONE row via conditional aggregation — no
    * pivot, no join — every n/Σ/Σ² an exact integer (cents, DECIMAL for
    * squares); cell means/variances are single rounded ratios, the DiD
    * estimate and its pooled standard error
    * √(Σ var_c/n_c) combine ROUNDED components in a fixed expression
    * (no float aggregation order anywhere), t = did/se, NULL when se is
    * 0 (degenerate cells) rather than an invented statistic. */
  def diffInDiff(events: DataFrame, cutoff: String,
      treatOf: Column => Column = u => Sampling.hashBucket(u) % 2 === 1)
      : DataFrame = {
    val dec: Column => Column = _.cast("decimal(38,0)")
    val perUnit = events
      .select(col("user_id"),
        (col("ts") >= lit(cutoff).cast("timestamp")).as("post"),
        centsOf(col("value")).as("cents"))
      .groupBy(col("user_id"), col("post"))
      .agg(sum(col("cents")).as("y"))
      .withColumn("treat", treatOf(col("user_id")))
    def cell(t: Boolean, p: Boolean, c: Column): Column =
      sum(when(col("treat") === t && col("post") === p, c).otherwise(lit(0L)))
    def cellN(t: Boolean, p: Boolean): Column =
      sum(when(col("treat") === t && col("post") === p, 1L).otherwise(0L))
    val cells = Seq(false -> false, false -> true, true -> false, true -> true)
    val tag = (t: Boolean, p: Boolean) => s"${if (t) "t" else "c"}${if (p) "1" else "0"}"
    val aggCols: Seq[Column] =
      cells.map { case (t, p) => cellN(t, p).as(s"n_${tag(t, p)}") } ++
      cells.map { case (t, p) => cell(t, p, col("y")).as(s"s_${tag(t, p)}") } ++
      cells.map { case (t, p) =>
        cell(t, p, dec(col("y")) * dec(col("y"))).as(s"q_${tag(t, p)}") }
    val folded = perUnit.agg(aggCols.head, aggCols.tail: _*)
    def mean(c: String): Column =
      round(col(s"s_$c").cast("double") / (col(s"n_$c") * 100L), 6)
    // SAMPLE variance (n·(n−1) denominator — the welchT convention: the
    // SE formula √(Σ v_c/n_c) expects sample variances, and the
    // population form biased se low by (n−1)/n per cell). The
    // denominator multiplies in DECIMAL(38,0): plain Long n²·10⁴ wraps
    // silently in non-ANSI Spark once a cell passes ~3·10⁷ units, while
    // the oracle's HUGEINT would not — a silent cross-engine divergence.
    def varc(c: String): Column =
      round((dec(col(s"n_$c")) * col(s"q_$c") -
        dec(col(s"s_$c")) * dec(col(s"s_$c"))).cast("double") /
        (dec(col(s"n_$c")) * dec(col(s"n_$c") - 1L) * dec(lit(10000L)))
          .cast("double"), 6)
    folded
      .select(
        col("n_c0"), col("n_c1"), col("n_t0"), col("n_t1"),
        mean("c0").as("m_c0"), mean("c1").as("m_c1"),
        mean("t0").as("m_t0"), mean("t1").as("m_t1"),
        varc("c0").as("v_c0"), varc("c1").as("v_c1"),
        varc("t0").as("v_t0"), varc("t1").as("v_t1"))
      .withColumn("did", round(
        (col("m_t1") - col("m_t0")) - (col("m_c1") - col("m_c0")), 6))
      .withColumn("se", round(sqrt(
        col("v_t1") / col("n_t1") + col("v_t0") / col("n_t0") +
        col("v_c1") / col("n_c1") + col("v_c0") / col("n_c0")), 6))
      .select(col("n_c0"), col("n_c1"), col("n_t0"), col("n_t1"),
        col("m_c0"), col("m_c1"), col("m_t0"), col("m_t1"),
        col("did"), col("se"),
        when(col("se") === 0.0, lit(null).cast("double"))
          .otherwise(round(col("did") / col("se"), 4)).as("t_stat"))
  }

  /** Cohen's kappa (Cohen 1960) — chance-corrected agreement between two
    * categorical raters, the label-quality read for any double-annotated
    * slice (human vs model labels, two labeling runs, weak-supervision
    * sources). Exact-integer algebra: with per-category marginals
    * (na_c, nb_c), kappa = (n·agree − Σ na_c·nb_c) / (n² − Σ na_c·nb_c)
    * — numerator and denominator stay integers (DECIMAL(38,0): n² wraps
    * Long past ~3·10⁹ rows), ONE division on the one-row output,
    * rounded 6dp. Plan: one map-side agree count, two category censuses
    * joined on category (bounded by label-space size, never the corpus),
    * all folded to a single row. */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val t = df.select(raterA.cast("string").as("a"),
      raterB.cast("string").as("b"))
    val totals = t.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
    val pe = t.groupBy(col("a").as("cat")).agg(count(lit(1)).as("na"))
      .join(t.groupBy(col("b").as("cat")).agg(count(lit(1)).as("nb")), "cat")
      .agg(coalesce(sum(col("na").cast("decimal(38,0)") * col("nb")),
        lit(0L).cast("decimal(38,0)")).as("pe_num"))
    val nDec = col("n").cast("decimal(38,0)")
    broadcast(totals).crossJoin(broadcast(pe))
      .select(col("n"), col("agree"),
        round((nDec * col("agree") - col("pe_num")).cast("double") /
          (nDec * col("n") - col("pe_num")).cast("double"), 6).as("kappa"))
  }
}
