package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * data-quality gate a continuously-ingesting training pipeline runs
  * before a new crawl batch is allowed into the mix: has the length /
  * quality / score distribution shifted against the reference corpus?
  *
  * Population Stability Index over fixed-width bins:
  * `PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)` with add-one smoothing over
  * the union of observed bins (so a bin present on only one side
  * contributes a finite penalty instead of ∞). Conventional read:
  * < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action.
  *
  * Scale shape: each snapshot collapses to its bin census in ONE
  * map-side-combined aggregate (bins ≤ hundreds, rows ≤ 100 TB); the
  * join/smoothing/log arithmetic runs on the two bin tables, never the
  * corpora. Nothing here is sampled — the censuses are exact. */
object Drift {

  /** Per-bin drift report between `base` and `current` over `metric`
    * binned at `binWidth`: (bin, n_base, n_cur, p_base, p_cur, contrib)
    * with smoothed shares; `contrib` sums to the PSI. Shares and
    * contributions are rounded (6/4) for cross-engine parity. */
  def psiReport(base: DataFrame, current: DataFrame, metric: Column,
      binWidth: Double): DataFrame = {
    def census(df: DataFrame, n: String) =
      df.select(floor(metric / binWidth).cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(n))
    val b = census(base, "n_base")
    val c = census(current, "n_cur")
    // union of observed bins; each side's total and bin count attach as a
    // single broadcast row so shares are computed map-side
    val joined = b.join(c, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_base")).as("t_base"),
      sum(col("n_cur")).as("t_cur"), count(lit(1)).as("n_bins"))
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_base"), col("n_cur"),
        round(((col("n_base") + 1) / (col("t_base") + col("n_bins")))
          .as("p"), 6).as("p_base"),
        round(((col("n_cur") + 1) / (col("t_cur") + col("n_bins")))
          .as("q"), 6).as("p_cur"))
      .withColumn("contrib",
        round((col("p_base") - col("p_cur")) * log(col("p_base") / col("p_cur")), 4))
  }

  /** The single-row PSI summary: total index + the worst bin's share move,
    * computed from the [[psiReport]] rows (bin-table sized). */
  def psiSummary(report: DataFrame): DataFrame =
    report.agg(
      round(sum(col("contrib")), 4).as("psi"),
      round(max(abs(col("p_base") - col("p_cur"))), 6).as("max_share_move"),
      count(lit(1)).as("n_bins"))

  /** CATEGORICAL drift — the vocabulary twin of the numeric [[psiReport]]:
    * per-term Jensen-Shannon contributions between two snapshots' token
    * distributions, restricted to the top-`topV` terms by combined count
    * with everything else folded into one `¤other` bucket (so both
    * distributions sum to 1 over an identical, bounded support and a
    * vocabulary explosion on either side cannot explode the report).
    * JS = Σ ½·p·ln(p/m) + ½·q·ln(q/m), m = (p+q)/2 — symmetric, finite
    * even when a term is absent on one side (0·ln0 = 0 by convention).
    *
    * Scale shape: each snapshot collapses to its term census in one
    * map-side-combined aggregate; the top-V cut and all divergence
    * arithmetic run on vocabulary-bounded relations. Shares round to 6
    * and contributions to 6 for cross-engine parity. */
  def vocabDrift(base: DataFrame, current: DataFrame, topV: Int): DataFrame = {
    import graft.functions.Text
    def census(df: DataFrame, n: String) =
      df.select(explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as(n))
    val joined = census(base, "n_base")
      .join(census(current, "n_cur"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .localCheckpoint(false) // feeds the top-V cut AND the other-fold
    val top = joined
      .orderBy((col("n_base") + col("n_cur")).desc, col("term")).limit(topV)
    val other = joined.join(top.select(col("term")), Seq("term"), "left_anti")
      .agg(coalesce(sum(col("n_base")), lit(0L)).as("n_base"),
        coalesce(sum(col("n_cur")), lit(0L)).as("n_cur"))
      .select(lit("¤other").as("term"), col("n_base"), col("n_cur"))
    val buckets = top.unionByName(other)
    val totals = buckets.agg(sum(col("n_base")).as("t_base"),
      sum(col("n_cur")).as("t_cur"))
    def side(p: Column, m: Column) =
      when(p > 0, p * log(p / m) * 0.5).otherwise(0.0)
    buckets.crossJoin(broadcast(totals))
      .select(col("term"), col("n_base"), col("n_cur"),
        round(col("n_base") / col("t_base"), 6).as("p_base"),
        round(col("n_cur") / col("t_cur"), 6).as("p_cur"))
      .withColumn("m", (col("p_base") + col("p_cur")) / 2)
      .withColumn("js_contrib",
        round(side(col("p_base"), col("m")) + side(col("p_cur"), col("m")), 6))
      .drop("m")
  }

  /** Two-sample Kolmogorov–Smirnov statistic — the binning-free drift
    * test (PSI/JS depend on a bin width; KS is the sup-distance between
    * the two EXACT empirical CDFs, sensitive to any shape change). The
    * sup over a step function is attained at an observed value, so:
    * per-value two-sided census (map-side combined), banded running
    * sums, max |F_a − F_b| over integer-ratio ECDFs — engine-exact. On a
    * continuous column the census is Θ(corpus), so the running sums come
    * from [[Sampling.orderedCensusCumsum]] range bands (broadcast band
    * offsets + band-partitioned windows), never one corpus-sized sort
    * task. */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): DataFrame =
    ksFromCensus(
      a.select(col(valueCol).as("v"), lit(1L).as("ia"), lit(0L).as("ib"))
        .unionByName(
          b.select(col(valueCol).as("v"), lit(0L).as("ia"), lit(1L).as("ib")))
        .groupBy(col("v"))
        .agg(sum(col("ia")).as("na"), sum(col("ib")).as("nb")))

  /** The KS fold over an already-built per-value (v, na, nb) census —
    * shared by [[ksStatistic]] and the streaming twin's serve step.
    * Inclusive running counts are banded exclusive prefixes + the
    * in-census value's own mass; totals ride the same broadcast. */
  def ksFromCensus(census: DataFrame): DataFrame =
    Sampling.orderedCensusCumsum(census, col("v"),
        weights = Seq("na" -> col("na"), "nb" -> col("nb")))
      .withColumn("ca", col("cum_na") + col("na"))
      .withColumn("cb", col("cum_nb") + col("nb"))
      .agg(max(col("total_na")).as("n_a"), max(col("total_nb")).as("n_b"),
        round(max(abs(col("ca").cast("double") / col("total_na") -
          col("cb").cast("double") / col("total_nb"))), 6).as("ks"))

  /** Two-sample MMD drift test on an EMBEDDING column — "has the
    * semantic distribution of the corpus shifted?", the vector-space
    * complement to [[psiReport]] (scalar bins) and [[ksStatistic]]
    * (scalar ECDFs): scalar metrics can agree while the embedding cloud
    * moves (topic rotation at constant length/quality), and this is the
    * detector for exactly that.
    *
    * Kernel choice is dictated by the cross-engine exactness rule: the
    * SIGNED-PROJECTION feature map φⱼ(x) = sign(wⱼ·x) with the md5-parity
    * ±1 matrix of [[Similarity.randomProjection]] (seed-namespaced
    * `mmd:`) — an unbiased estimate of the angular kernel
    * 1 − 2·∠(x,y)/π (Charikar's SimHash collision identity, STOC 2002).
    * Components quantize to integer micros, so every projection is an
    * EXACT long and its sign is exact — no float sum ever crosses an
    * engine boundary. With group sign-sums spⱼ, sqⱼ (exact longs),
    * MMD² = Σⱼ (spⱼ·n_q − sqⱼ·n_p)² / (m·(n_p·n_q)²) — exact BIGINT
    * numerator, ONE double division on the one-row output.
    *
    * Scale shape: the ±1 matrix folds into one broadcast row; the corpus
    * pays one unshuffled map-side pass (m exact dot products per vector)
    * into a (grp, j)-census aggregate — m·2 rows — and everything after
    * is census-sized. Output: (n_p, n_q, mmd2) rounded to 6; under the
    * null (same distribution) mmd2 ≈ m/(n_p·n_q)-scale noise. */
  def signedMmd(emb: DataFrame, inP: Column, m: Int = 16,
      inDims: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    val dec: Column => Column = _.cast("decimal(38,0)")
    val sgns = spark.range(m.toLong * inDims)
      .select(struct(col("id"),
        (lit(1L) - lit(2L) * (call_function("graft_md5_prefix",
          concat(lit("mmd:"), (col("id") / inDims).cast("long"), lit(":"),
            col("id") % inDims), lit(1)) % 2)).as("s")).as("r"))
      .agg(array_sort(collect_list(col("r"))).as("rs"))
      .select(transform(col("rs"), r => r.getField("s")).as("sgns"))
    // loud-failure guard IN the value path (a dropped helper column
    // would be pruned and never evaluate): an embedding shorter than
    // inDims would null its dots past the array end, the sign's
    // otherwise(0L) would map that to phi = 0, and the vector would
    // still count in n_p/n_q — silently diluting mmd2 toward 0. A
    // dimension mismatch must surface, not bias the statistic.
    val guarded = {
      val arr = col("embedding").cast("array<double>")
      when(size(arr) >= inDims, arr).otherwise(raise_error(concat(
        lit(s"signedMmd: embedding size "), size(arr).cast("string"),
        lit(s" < inDims=$inDims — dimension mismatch would bias mmd2 toward 0"))))
    }
    val proj = emb
      .select(inP.as("in_p"),
        transform(guarded, x => round(x * 1e6, 0).cast("long")).as("xm"))
      .crossJoin(broadcast(sgns))
      .select(col("in_p"), posexplode(
        transform(sequence(lit(0), lit(m - 1)), j => {
          val dot = aggregate(sequence(lit(0), lit(inDims - 1)), lit(0L),
            (acc, i) => acc +
              element_at(col("sgns"), (j * inDims + i + 1).cast("int")) *
              element_at(col("xm"), (i + 1).cast("int")))
          when(dot > 0, 1L).when(dot < 0, -1L).otherwise(0L)
        })))
      .toDF("in_p", "j", "phi")
    proj.groupBy(col("j"))
      .agg(sum(when(col("in_p"), col("phi")).otherwise(lit(0L))).as("sp"),
        sum(when(!col("in_p"), col("phi")).otherwise(lit(0L))).as("sq"),
        sum(when(col("in_p"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("in_p"), 1L).otherwise(0L)).as("nq"))
      // fⱼ numerator in DECIMAL end-to-end: sp·n_q ~ n² clears 2^63 long
      // before the square ever happens
      .withColumn("fnum",
        dec(col("sp")) * dec(col("nq")) - dec(col("sq")) * dec(col("np")))
      .agg(max(col("np")).as("n_p"), max(col("nq")).as("n_q"),
        sum(col("fnum") * col("fnum")).as("num"))
      .select(col("n_p"), col("n_q"),
        round(col("num").cast("double") /
          (lit(m.toDouble) * col("n_p").cast("double") * col("n_p") *
            col("n_q") * col("n_q")), 6).as("mmd2"))
  }
}
