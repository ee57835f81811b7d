package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series surfaces over the events stream: gap-filled resampling and
  * a bucketized pure-range interval join — the monitoring/feature-window
  * complement of the alert tier (reference analogue: the KQL time-window
  * rules, /root/reference/README.md:131-134).
  *
  * Both operators are designed around ONE corpus-wide pass: the raw events
  * are aggregated down to a (type × bucket)-bounded relation first, and
  * every later step — grid generation, threshold, the interval join probe
  * side — works off that small relation or broadcasts against the raw scan.
  */
object TimeSeries {

  /** Per-(type, bucket) counts with ZERO-FILLED gaps: buckets between a
    * type's first and last event that saw no traffic appear as explicit
    * (n_events = 0, total_value = 0.0) rows — the resample-then-fill step
    * every downstream rate/anomaly computation needs (a missing row and a
    * zero row are different facts to a rate detector).
    *
    * Scale shape: the only pass over the raw events is the first
    * aggregation (map-side combinable, output bounded by types × buckets).
    * The dense grid is generated from the per-type [min, max] span — a
    * types-sized relation exploded to the grid size — and LEFT-joins the
    * counts; the corpus is never touched again. At 100 TB of events the
    * grid for a year of hours is ~9k rows per type: trivially joinable.
    *
    * Poison guard: ONE corrupted far-future timestamp would make
    * `sequence(lo, hi)` materialize a multi-billion-element array in a
    * single row (an executor OOM that looks like a shuffle problem), so a
    * span wider than `maxBuckets` fails loudly at the grid step instead
    * — bad data should name itself, not kill the job sideways. */
  def resampleGapfill(events: DataFrame, typeCol: String = "event_type",
      bucket: String = "1 hour", maxBuckets: Int = 1000000): DataFrame = {
    val counts = events
      .groupBy(col(typeCol),
        window(col("ts"), bucket).getField("start").as("bucket_start"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
    gapfillTail(counts, typeCol, bucket, maxBuckets)
  }

  /** The guarded grid/zero-fill tail over a folded (typeCol, bucket_start,
    * n_events, total_value) census — shared by [[resampleGapfill]] and the
    * streaming twin's serve path so both carry the same poison guard.
    * Bucket width in seconds is taken as a DIFFERENCE of two session-TZ
    * casts, so the TZ offset cancels and the guard holds under any session
    * time zone (the anchor sits in early January, so no DST transition
    * falls inside any sane bucket span). */
  private[graft] def gapfillTail(counts: DataFrame, typeCol: String,
      bucket: String, maxBuckets: Int): DataFrame = {
    val bucketSecs = expr(
      s"CAST(TIMESTAMP '2000-01-03 00:00:00' + INTERVAL $bucket AS LONG)" +
        " - CAST(TIMESTAMP '2000-01-03 00:00:00' AS LONG)")
    val grid = counts.groupBy(col(typeCol))
      .agg(min(col("bucket_start")).as("lo"), max(col("bucket_start")).as("hi"))
      .withColumn("hi", when(
        col("hi").cast("long") - col("lo").cast("long") >
          lit(maxBuckets.toLong) * bucketSecs,
        raise_error(concat(lit(s"resampleGapfill: [lo, hi] span for type '"),
          col(typeCol), lit(s"' exceeds $maxBuckets buckets — poisoned timestamp?"))))
        .otherwise(col("hi")))
      .select(col(typeCol),
        explode(sequence(col("lo"), col("hi"), expr(s"interval $bucket")))
          .as("bucket_start"))
    grid.join(counts, Seq(typeCol, "bucket_start"), "left")
      .select(col(typeCol), col("bucket_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
  }

  /** Hot-traffic intervals: hours whose event count reaches the `quantile`
    * cut of ALL (type, hour) counts, padded to a [hour − 1h, hour + 2h)
    * window around the spike. The threshold is self-calibrating (a quantile
    * of the census, not a magic constant), so the operator stays meaningful
    * at any scale factor; it is ROUNDED to 4 before use (the winsorize
    * convention) so both engines cut at the identical boundary. The census
    * is (type × hours)-bounded and the single-row threshold is broadcast. */
  def hotIntervals(events: DataFrame, typeCol: String = "event_type",
      quantile: Double = 0.9): DataFrame = {
    val counts = events
      .groupBy(col(typeCol),
        window(col("ts"), "1 hour").getField("start").as("hot_hour"))
      .agg(count(lit(1)).as("n"))
    val thr = counts.agg(
      round(percentile(col("n"), lit(quantile)), 4).as("thr"))
    counts.join(broadcast(thr))
      .filter(col("n") >= col("thr"))
      .select(col(typeCol).as("hot_type"), col("hot_hour"),
        (col("hot_hour") - expr("interval 1 hour")).as("iv_start"),
        (col("hot_hour") + expr("interval 2 hours")).as("iv_end"))
  }

  /** Last-observation-carried-forward (LOCF): per `key`, ordered by
    * (`time`, `tie`), every null in `value` is replaced by the most recent
    * non-null — the canonical sensor/metric backfill (an instrument that
    * reports only on change needs LOCF before any rate or join-asof math).
    * One running `last(ignoreNulls)` window: a single shuffle on `key`,
    * per-key in-partition sort, no self-join, no explode — the
    * sessionization plan shape. Rows before a key's first observation
    * stay null (LOCF has nothing to carry). */
  def locf(df: DataFrame, key: String, time: String, tie: String,
      value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("filled", last(col(value), ignoreNulls = true).over(w))
  }

  /** Weekly cohort retention: each user's cohort is the week of their
    * first event; count distinct users of cohort c still active in week w
    * — the (cohort_week, week, n_users) matrix product analytics reads as
    * "of January's signups, how many came back in March". Two aggregates
    * co-partitioned on user_id (first-week + distinct active weeks) and
    * one (cohorts × weeks)-bounded final fold — each corpus-wide step is
    * map-side-combinable, nothing is quadratic. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val wk = date_trunc("week", col("ts"))
    val weeks = events.select(col("user_id"), wk.as("week"))
    val firsts = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.distinct().join(firsts, "user_id")
      .groupBy(col("cohort_week"), col("week"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .withColumn("week_offset",
        ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week")))
          / 604800L).cast("int"))
  }

  /** Per-cohort cumulative lifetime value — the REVENUE twin of
    * [[cohortRetention]]: users keyed by signup week (first activity),
    * each cohort's purchase value accumulated by week offset and
    * normalized per cohort member, the "when does a cohort pay back"
    * curve. Weekly cents fold map-side; the running sum windows over the
    * (cohorts × weeks)-bounded census PARTITIONED BY COHORT — never the
    * ledger. ltv_per_user is the cumulative exact-cent sum over the
    * cohort head-count, one division rounded 4. */
  def cohortLtv(events: DataFrame, valueType: String = "purchase"): DataFrame = {
    val wk = date_trunc("week", col("ts"))
    val firsts = events.select(col("user_id"), wk.as("week"))
      .groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val weekly = events.filter(col("event_type") === valueType)
      .select(col("user_id"), wk.as("week"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .join(firsts, "user_id")
      .groupBy(col("cohort_week"), col("week"))
      .agg(sum(col("cents")).as("wk_cents"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("week"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .withColumn("cum_cents", sum(col("wk_cents")).over(w))
      .withColumn("week_offset",
        ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week")))
          / 604800L).cast("int"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("cum_cents"),
        round(col("cum_cents").cast("double") / (col("cohort_size") * 100L), 4)
          .as("ltv_per_user"))
  }

  /** Trailing-window z-score anomaly flags over the GAP-FILLED hourly
    * series: for each (type, hour), z = (count − μ)/σ against the previous
    * `lookback` hours, flagged when |z| ≥ `zThresh`. Gap filling first is
    * the correctness point — without explicit zero rows the trailing
    * window would skip silent hours and both μ and the frame width would
    * be wrong. Only COMPLETE windows score (n_window = lookback) and
    * zero-variance windows are excluded (z undefined).
    *
    * A zero-variance window is NOT dropped: a constant history with a
    * deviating current value (the first burst after total silence — σ = 0,
    * x ≠ μ) is the most anomalous case of all, so it flags with z = null
    * (the magnitude is undefined, the fact isn't).
    *
    * Determinism: μ and σ are ROUNDED to 4 before the division and z is
    * rounded before the threshold compare, so the flag is identical across
    * engines regardless of windowed-aggregation accumulation order. Scale:
    * the window runs over the (types × hours)-bounded filled series, not
    * the raw events — one corpus pass total. */
  def anomalyZscore(events: DataFrame, lookback: Int = 24,
      zThresh: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_start"))
      .rowsBetween(-lookback, -1)
    resampleGapfill(events)
      .withColumn("n_window", count(col("n_events")).over(w))
      .withColumn("mu", round(avg(col("n_events")).over(w), 4))
      .withColumn("sigma", round(stddev_pop(col("n_events")).over(w), 4))
      .filter(col("n_window") === lookback)
      .withColumn("z", when(col("sigma") > 0,
        round((col("n_events") - col("mu")) / col("sigma"), 4)))
      .select(col("event_type"), col("bucket_start"), col("n_events"), col("z"),
        when(col("sigma") > 0, abs(col("z")) >= zThresh)
          .otherwise(col("n_events") =!= col("mu")).as("is_anomaly"))
  }

  /** Silence report — contiguous zero-traffic runs of at least
    * `minRunBuckets` buckets per type: the "heartbeat lost" alert the
    * volume alert cannot express (it fires on data; silence IS the
    * absence of data, which only the gap-filled series makes visible).
    * The islands-and-gaps pattern: an edge flag wherever the zero/nonzero
    * state flips (lag), a running edge count labels each run, zero runs
    * aggregate to (start, end, length). All windows run over the
    * (types × buckets)-bounded filled series — one corpus pass total. */
  def silenceReport(events: DataFrame, minRunBuckets: Int = 2,
      typeCol: String = "event_type", bucket: String = "1 hour"): DataFrame = {
    val w = Window.partitionBy(col(typeCol)).orderBy(col("bucket_start"))
    resampleGapfill(events, typeCol, bucket)
      .withColumn("is_zero", (col("n_events") === 0).cast("int"))
      .withColumn("edge", when(lag(col("is_zero"), 1).over(w).isNull ||
        lag(col("is_zero"), 1).over(w) =!= col("is_zero"), 1).otherwise(0))
      .withColumn("run_id", sum(col("edge")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("is_zero") === 1)
      .groupBy(col(typeCol), col("run_id"))
      .agg(min(col("bucket_start")).as("silence_start"),
        (max(col("bucket_start")) + expr(s"interval $bucket")).as("silence_end"),
        count(lit(1)).as("n_buckets"))
      .filter(col("n_buckets") >= minRunBuckets)
      .select(col(typeCol), col("silence_start"), col("silence_end"),
        col("n_buckets"))
  }

  /** Classical seasonal decomposition of the hourly series: trend =
    * centered `2·halfWindow+1`-bucket moving average (defined only where
    * the window is FULL — edge buckets get null, not a shrunk average),
    * seasonal = per-(type, hour-of-day) mean of the detrended values,
    * residual = observed − trend − seasonal. The what-is-normal baseline
    * behind the z-score anomaly tier: a nightly dip is seasonality, not an
    * incident.
    *
    * Cross-engine determinism: every intermediate stays INTEGER (window
    * SUM of counts, `span·n − trend_num`, the seasonal numerator/count)
    * and each output is ONE exact-integer division rounded once — no
    * accumulated double drift for the oracle to disagree with.
    *
    * Scale shape: one corpus pass (the resample agg); every window runs
    * over the (types × buckets)-bounded filled series; the seasonal
    * census is (types × period) rows, broadcast back. */
  def seasonalDecompose(events: DataFrame, typeCol: String = "event_type",
      bucket: String = "1 hour", halfWindow: Int = 12): DataFrame = {
    val span = 2 * halfWindow + 1
    val w = Window.partitionBy(col(typeCol)).orderBy(col("bucket_start"))
      .rowsBetween(-halfWindow, halfWindow)
    val trended = resampleGapfill(events, typeCol, bucket)
      .withColumn("trend_num",
        when(count(lit(1)).over(w) === span, sum(col("n_events")).over(w)))
      .withColumn("hod", hour(col("bucket_start")))
      .withColumn("detr_num",
        lit(span.toLong) * col("n_events") - col("trend_num"))
    val seasonal = trended.filter(col("trend_num").isNotNull)
      .groupBy(col(typeCol), col("hod"))
      .agg(sum(col("detr_num")).as("s_num"), count(lit(1)).as("s_cnt"))
    trended.join(broadcast(seasonal), Seq(typeCol, "hod"), "left")
      .select(col(typeCol), col("bucket_start"), col("n_events"),
        round(col("trend_num") / lit(span.toDouble), 4).as("trend"),
        round(col("s_num") / (lit(span.toDouble) * col("s_cnt")), 4)
          .as("seasonal"),
        round((col("detr_num") * col("s_cnt") - col("s_num")) /
          (lit(span.toDouble) * col("s_cnt")), 4).as("residual"))
  }

  /** CUSUM changepoint per type: the bucket where the cumulative
    * deviation from the series mean peaks — the level-shift detector
    * (deploy changed the traffic rate) that the per-bucket z-score
    * cannot see because every post-shift bucket is individually normal.
    *
    * The statistic is integer-scaled: K_t = n_buckets·cumsum_t −
    * t·total is exact integer arithmetic (argmax |K_t| ≡ argmax |CUSUM_t|
    * since CUSUM_t = K_t / n_buckets), so the argmax and its tie-break
    * (earliest bucket) are engine-exact; the reported magnitude is one
    * final division. All windows run over the bounded filled series. */
  def changepointCusum(events: DataFrame, typeCol: String = "event_type",
      bucket: String = "1 hour"): DataFrame = {
    val wOrd = Window.partitionBy(col(typeCol)).orderBy(col("bucket_start"))
    val wAll = Window.partitionBy(col(typeCol))
    val k = resampleGapfill(events, typeCol, bucket)
      .withColumn("t_idx", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum(col("n_events")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_buckets", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("n_events")).over(wAll))
      .withColumn("k_num",
        col("n_buckets") * col("cum") - col("t_idx") * col("total"))
    k.withColumn("rk", row_number().over(Window.partitionBy(col(typeCol))
        .orderBy(abs(col("k_num")).desc, col("bucket_start"))))
      .filter(col("rk") === 1)
      .select(col(typeCol), col("bucket_start").as("cp_bucket"),
        round(abs(col("k_num")) / col("n_buckets").cast("double"), 4)
          .as("cusum_abs"),
        col("n_buckets"))
  }

  /** Finite-horizon EWMA smoothing per user: each event's value blended
    * with its `k` predecessors under weights decay^j — the trend line a
    * dashboard draws over a noisy per-user metric. The textbook EWMA is a
    * recursion (unbounded horizon) that no engine computes distributed;
    * truncating at k bounds the state to k lags, puts the whole compute
    * in ONE ordered window (all lags share the frame — one sort, no
    * join), and loses only decay^(k+1) of the mass (~4% at 0.7^9).
    *
    * Cross-engine determinism, by construction: weights are EXACT decimal
    * strings (0.7^j expanded via BigDecimal, parsed once by each engine —
    * no runtime pow in the plan), and the weighted sum is a left-
    * associated chain both engines evaluate in the same IEEE order. Lags
    * past the series start drop out of numerator AND denominator, so the
    * head of each series renormalizes instead of biasing toward zero. */
  def ewmaSmooth(events: DataFrame, k: Int = 8,
      decay: String = "0.7"): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val weights = (0 to k).map(j => BigDecimal(decay).pow(j))
    val lags = (0 to k).map(j =>
      if (j == 0) col("value") else lag(col("value"), j).over(w))
    // branch on POSITION, not weight value: at decay = 1.0 every weight
    // equals the head's, and a value comparison would route null lags
    // (series head) into the unguarded current-row branch.
    val num = (0 to k).map { j =>
      val (wj, xj) = (weights(j), lags(j))
      if (j == 0) xj * lit(1.0)
      else when(xj.isNull, lit(0.0)).otherwise(xj * lit(wj.toDouble))
    }.reduceLeft(_ + _)
    val den = (0 to k).map { j =>
      val (wj, xj) = (weights(j), lags(j))
      if (j == 0) lit(1.0)
      else when(xj.isNull, lit(0.0)).otherwise(lit(wj.toDouble))
    }.reduceLeft(_ + _)
    events.select(col("user_id"), col("event_id"), col("value"),
      round(num / den, 6).as("ewma"))
  }

  /** Exponentially time-decayed demand per item: each observation
    * contributes 2^(−age/halfLife), so the census ranks items by RECENT
    * activity instead of all-time volume — the trending report. The
    * anchor is the ledger's own max date (reproducible, no wall clock),
    * folded to ONE broadcast scalar row; the decayed sum is one
    * map-side-combinable aggregation over the scan, and only the item
    * census (not the ledger) pays the top-`limit` rank window. */
  def decayedDemand(lineitem: DataFrame, halfLifeDays: Int = 180,
      limit: Int = 100): DataFrame = {
    val anchor = lineitem.agg(max(col("l_shipdate")).as("anchor"))
    val scored = lineitem.crossJoin(broadcast(anchor))
      .withColumn("w", pow(lit(2.0),
        -datediff(col("anchor"), col("l_shipdate")) / lit(halfLifeDays.toDouble)))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_obs"), round(sum(col("w")), 4).as("decayed"))
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("decayed").desc, col("l_partkey"))))
      .filter(col("rank") <= limit)
  }

  /** Theil–Sen robust trend over the daily event-count series: slope =
    * median of all pairwise slopes, intercept = median residual at day 0
    * — the trend estimate one outlier day cannot move (OLS, by contrast,
    * chases it). The pair expansion is over the DAILY CENSUS (the ledger
    * folds to ≤ a few thousand day rows first — that is the 100 TB side),
    * so C(days,2) is bounded arithmetic on a tiny relation, joined with
    * itself once. Slopes are integer-ratio doubles; the intercept is
    * computed against the ROUNDED slope so both engines agree. */
  /** Cross-correlation (lead–lag) between two event types' daily count
    * series at calendar lags −`maxLag`..+`maxLag` — "do clicks LEAD
    * purchases, and by how many days?": the peak lag is the actionable
    * read [[autocorrelation]] can't give (it sees one series only).
    * r_k = Σ_t Dx_t·Dy_{t+k} / √(ΣDx²·ΣDy²) — positive k means `typeA`
    * leads. Both series are ZERO-FILLED over the common [min, max] day
    * span first (a silent day is a real 0 for counts, and zero-filling
    * keeps the two series aligned on one day index).
    *
    * Engine-exact by the [[autocorrelation]] discipline: integer-scaled
    * deviations (n·cnt − T per series), DECIMAL(38,0) products/sums, the
    * √ and division once at the output. Scale shape: the corpus
    * collapses to two daily censuses in one filtered aggregate; the day
    * span, lag grid and one-row denominators are all broadcast-sized. */
  def crossCorrelation(events: DataFrame, typeA: String, typeB: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val daily = events
      .filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type").as("et"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("et"), col("day")).agg(count(lit(1)).as("cnt"))
    val span = daily.agg(min(col("day")).as("day0"), max(col("day")).as("day1"))
      .select(explode(sequence(col("day0"), col("day1"),
        expr("interval 1 day"))).as("day"))
    def dev(et: String): DataFrame = {
      val filled = span.join(daily.filter(col("et") === et), Seq("day"), "left")
        .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val tot = filled.agg(count(lit(1)).as("n"), sum(col("cnt")).as("t"),
        min(col("day")).as("day0"))
      filled.crossJoin(broadcast(tot))
        .select(datediff(col("day"), col("day0")).as("d"),
          (col("n") * col("cnt") - col("t")).cast("decimal(38,0)").as("dev"))
    }
    val (dx, dy) = (dev(typeA), dev(typeB))
    val den = dx.agg(sum(col("dev") * col("dev")).as("sx2"))
      .crossJoin(broadcast(dy.agg(sum(col("dev") * col("dev")).as("sy2"))))
    val lags = events.sparkSession.range(-maxLag, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    dx.crossJoin(broadcast(lags))
      .select(col("lag"), (col("d") + col("lag")).as("d_next"), col("dev"))
      .join(dy.select(col("d").as("d_next"), col("dev").as("dev_y")), "d_next")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dev") * col("dev_y")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        round(col("num").cast("double") /
          sqrt(col("sx2").cast("double") * col("sy2").cast("double")), 6)
          .as("ccf"))
  }

  /** Sample autocorrelation function of the daily event-count series at
    * calendar lags 1..`maxLag` — "does today predict next week?", the
    * seasonality/persistence read [[seasonalDecompose]]'s fixed 24h
    * period assumes rather than measures. r_k = Σ_t D_t·D_{t+k} / Σ_t D_t²
    * (the standard biased estimator: full-series denominator, overlapping
    * pairs in the numerator), with lags in CALENDAR days — a missing day
    * breaks the pair rather than silently splicing neighbours.
    *
    * Engine-exact: deviations are integer-scaled (the CUSUM rule) —
    * D_t = n·cnt_t − T is exact BIGINT, products and sums run in
    * DECIMAL(38,0) (≈10³⁸ headroom: safe to ~3·10⁹ events/day over a
    * 10-year series), and the single division happens at the output.
    *
    * Scale shape: the corpus collapses to the daily census in one
    * map-side-combinable aggregate; everything after (lag expansion,
    * self-join on day index, denominator fold) operates on the
    * days×lags grid — thousands of rows regardless of corpus size, with
    * the one-row total and denominator broadcast. */
  def autocorrelation(events: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val daily = events
      .select(date_trunc("day", col("ts")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val tot = daily.agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("t_sum"),
      min(col("day")).as("day0"))
    val indexed = daily.crossJoin(broadcast(tot))
      .select(datediff(col("day"), col("day0")).as("d"),
        (col("n_days") * col("cnt") - col("t_sum"))
          .cast("decimal(38,0)").as("dev"))
    val den = indexed.agg(sum(col("dev") * col("dev")).as("den"),
      count(lit(1)).as("n_days"))
    val lags = events.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    indexed.crossJoin(broadcast(lags))
      .select(col("lag"), (col("d") + col("lag")).as("d_next"), col("dev"))
      .join(indexed.select(col("d").as("d_next"), col("dev").as("dev_next")),
        "d_next")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dev") * col("dev_next")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_days"), col("n_pairs"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("acf"))
  }

  def theilSenDailyTrend(events: DataFrame): DataFrame = {
    val daily = events
      .select(date_trunc("day", col("ts")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val indexed = daily.crossJoin(broadcast(
        daily.agg(min(col("day")).as("day0"))))
      .select(datediff(col("day"), col("day0")).as("d"), col("cnt"))
    val slopes = indexed.as("a").join(broadcast(indexed.as("b")),
        col("a.d") < col("b.d"))
      .select(((col("b.cnt") - col("a.cnt")).cast("double") /
        (col("b.d") - col("a.d"))).as("slope"))
    val slopeRow = slopes.agg(count(lit(1)).as("n_pairs"),
      round(expr("percentile(slope, 0.5)"), 6).as("slope"))
    indexed.crossJoin(broadcast(slopeRow))
      .select(col("n_pairs"), col("slope"),
        (col("cnt") - col("slope") * col("d")).as("resid"))
      .groupBy(col("n_pairs"), col("slope"))
      .agg(count(lit(1)).as("n_days"),
        round(expr("percentile(resid, 0.5)"), 6).as("intercept"))
      .select(col("n_days"), col("n_pairs"), col("slope"), col("intercept"))
  }

  /** Per-key OLS trend: closed-form slope/intercept of value-over-time
    * for EVERY key in one map-side-combinable aggregation — "is this
    * part's price drifting" across millions of keys at once, no window,
    * no iteration. x is integer days from the global min date (one
    * broadcast scalar), so the denominator n·Σx²−(Σx)² is EXACT integer
    * arithmetic; only the y-sums are floats, and the intercept derives
    * from the ROUNDED slope. Keys need ≥ 2 distinct days (others drop —
    * slope undefined). */
  def groupedTrend(df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val d0 = df.agg(min(col(dateCol)).as("d0"))
    df.crossJoin(broadcast(d0))
      .select(col(keyCol), datediff(col(dateCol), col("d0")).cast("long").as("x"),
        col(valueCol).as("y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"))
      .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0)
      .withColumn("slope", round(
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
      .select(col(keyCol), col("n"), col("slope"),
        round((col("sy") - col("slope") * col("sx")) / col("n"), 4)
          .as("intercept"))
  }

  /** Time-to-convert distribution: each user's FIRST `fromType` event to
    * their first `toType` event at-or-after it, summarized as converter
    * count + delta-seconds percentiles and mean — the latency half of the
    * funnel census (q_funnel counts WHO converts; this measures HOW FAST).
    *
    * Shape: both event classes cut at the scan (pushed type predicate),
    * fold per-user map-side, and join once on user_id (both sides already
    * keyed by it). Deltas are integer seconds; the mean is an exact
    * integer-sum ratio and the percentiles interpolate over longs, so the
    * one-row summary is engine-exact. The global percentile buffers the
    * CONVERTER deltas (user-dimension-sized) in one task — the winsorize
    * tradeoff; swap to the GK sketch when converters outgrow a task. */
  def funnelTimeToConvert(events: DataFrame, fromType: String = "signup",
      toType: String = "purchase"): DataFrame = {
    val starts = events.filter(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(col("ts")).as("start_ts"))
    events.filter(col("event_type") === toType)
      .join(starts, "user_id")
      .filter(col("ts") >= col("start_ts"))
      .groupBy(col("user_id"), col("start_ts"))
      .agg(min(col("ts")).as("conv_ts"))
      .withColumn("delta_sec",
        col("conv_ts").cast("long") - col("start_ts").cast("long"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(delta_sec, 0.25)"), 4).as("p25"),
        round(expr("percentile(delta_sec, 0.5)"), 4).as("p50"),
        round(expr("percentile(delta_sec, 0.75)"), 4).as("p75"),
        round(expr("percentile(delta_sec, 0.9)"), 4).as("p90"),
        round(sum(col("delta_sec")).cast("double") / count(lit(1)), 4)
          .as("avg_sec"))
  }

  /** LAST-TOUCH conversion attribution: each conversion event claims the
    * most recent preceding touch event by the same user within the
    * attribution window — the "which click gets credit for this
    * purchase" join, expressed as ONE ignore-nulls running window instead
    * of a per-conversion lookup join (the as-of pattern specialized to
    * same-relation event streams).
    *
    * Scale shape: the type filter cuts the corpus to touches+conversions
    * AT THE SCAN (pushed predicate), and the single per-user ordered
    * window does the rest — no self-join, no per-conversion probe. The
    * window cutoff is applied AFTER the carry so an expired touch yields
    * (null, attributed=false) rather than silently claiming an older
    * touch. */
  def attributionLastTouch(events: DataFrame, convType: String = "purchase",
      touchType: String = "click", window: String = "24 hours"): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cutoff = col("ts") - expr(s"interval $window")
    events.filter(col("event_type").isin(convType, touchType))
      .withColumn("touch_ts",
        when(col("event_type") === touchType, col("ts")))
      .withColumn("last_touch", last(col("touch_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === convType)
      .select(col("event_id"), col("user_id"), col("ts").as("conv_ts"),
        when(col("last_touch") >= cutoff, col("last_touch")).as("touch_ts"),
        (col("last_touch").isNotNull && col("last_touch") >= cutoff)
          .as("attributed"))
  }

  /** LINEAR multi-touch attribution: every conversion splits one unit of
    * credit equally across ALL its same-user touches inside the
    * attribution window (the fairness complement to
    * [[attributionLastTouch]]); the report is per-touch credit — which
    * clicks actually drive conversions, not just which click was last.
    *
    * Shape: touches and conversions are two pushed-predicate slices of
    * the same scan, joined on user_id (an EQUI join — the range is a
    * residual predicate, never a join dimension), so fanout is bounded by
    * touches-per-user-per-window. Credit 1/n is an exact integer ratio
    * per conversion; per-touch credit sums round at the report edge. */
  def attributionLinear(events: DataFrame, convType: String = "purchase",
      touchType: String = "click", window: String = "24 hours"): DataFrame = {
    val touches = events.filter(col("event_type") === touchType)
      .select(col("user_id"), col("event_id").as("touch_event_id"),
        col("ts").as("touch_ts"))
    val convs = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_event_id"),
        col("ts").as("conv_ts"))
    val matched = convs.join(touches, "user_id")
      .filter(col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") > col("conv_ts") - expr(s"interval $window"))
    val credit = matched
      .withColumn("n_touches", count(lit(1)).over(
        Window.partitionBy(col("conv_event_id"))))
      .select(col("user_id"), col("touch_event_id"),
        (lit(1.0) / col("n_touches")).as("credit"))
    credit.groupBy(col("user_id"), col("touch_event_id"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col("credit")), 6).as("credit"))
  }

  /** Interval-UNION active time per user: each event holds a
    * [t, t+holdSeconds) activity interval; overlapping/touching intervals
    * merge, and the report is (islands, total covered seconds) — the
    * "how long was this user actually active" metric a plain
    * count·holdSeconds overstates wherever events overlap. Classic
    * islands-and-gaps: a running max of interval ends (one ordered
    * window) marks island starts; island coverage is max(end) − min(start)
    * in exact epoch-second longs. One window + two aggregations, all
    * per-user partitioned. */
  def activeTime(events: DataFrame, holdSeconds: Int = 300): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    events.select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("sec"))
      .withColumn("prev_max_end", max(col("sec") + holdSeconds).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("edge", when(col("prev_max_end").isNull ||
        col("sec") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("edge")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg((max(col("sec")) + holdSeconds - min(col("sec"))).as("covered"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("covered")).as("active_seconds"))
  }

  /** DAU / trailing-WAU stickiness per day — the engagement ratio
    * (distinct users today ÷ distinct users in the trailing `window`
    * days). Sliding DISTINCT counts cannot reuse a sum-style sliding
    * window (distinct doesn't subtract), and re-scanning the corpus per
    * day is quadratic; instead each (user, day) activity row is exploded
    * map-side to the `window` target days it contributes to, and ONE
    * distinct + count per target day finishes the job. Cost: two
    * map-side-combinable distinct aggregations over ≤ window·|user-days|
    * rows — no per-day scan, layout-free, exact. (The approximate path
    * at extreme cardinalities is the HLL rollup tier; this is the exact
    * one.) */
  def dauWauStickiness(events: DataFrame, window: Int = 7): DataFrame = {
    val ud = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(lit(0), lit(window - 1))).as("x"), col("day"))
      .select(col("user_id"), expr("date_add(day, x)").as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau").cast("double"), 4).as("stickiness"))
  }

  /** TIME-WEIGHTED average per key — the correct mean for irregularly
    * sampled series (a sensor that reports hourly when stable and
    * per-second in a storm would otherwise let the storm dominate a plain
    * average): each observation holds until the next one, so it weighs by
    * its holding duration; the last observation has no duration and drops
    * out. One `lead` window per key + one map-side-combinable fold —
    * the sessionization shuffle shape, nothing quadratic. */
  def timeWeightedAvg(df: DataFrame, key: String, time: String, tie: String,
      value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tie))
    df.withColumn("dur",
        lead(col(time), 1).over(w).cast("double") - col(time).cast("double"))
      .filter(col("dur").isNotNull)
      .groupBy(col(key))
      .agg(round(sum(col(value) * col("dur")) / sum(col("dur")), 4).as("twa"),
        count(lit(1)).as("n_intervals"))
  }

  /** LINEAR interpolation of nulls between observations — the upgrade of
    * [[locf]] when the quantity drifts rather than steps: a null at time t
    * between observations (t0, v0) and (t1, v1) fills with
    * v0 + (v1 − v0)·(t − t0)/(t1 − t0). Nulls before the first or after
    * the last observation stay null (nothing to anchor to; chain with
    * [[locf]] for the tail). TWO windows per key (running last-non-null
    * backward, running first-non-null forward) — still one shuffle on the
    * key: both windows share the same partitioning, Catalyst plans one
    * exchange. Exact double arithmetic, identical on any engine. */
  def interpolateLinear(df: DataFrame, key: String, time: String, tie: String,
      value: String): DataFrame = {
    val back = Window.partitionBy(col(key)).orderBy(col(time), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(key)).orderBy(col(time), col(tie))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val t = col(time).cast("double")
    val anchored = df
      .withColumn("v0", last(col(value), ignoreNulls = true).over(back))
      .withColumn("t0", last(when(col(value).isNotNull, t), ignoreNulls = true).over(back))
      .withColumn("v1", first(col(value), ignoreNulls = true).over(fwd))
      .withColumn("t1", first(when(col(value).isNotNull, t), ignoreNulls = true).over(fwd))
    anchored.withColumn("interp",
      when(col(value).isNotNull, col(value).cast("double"))
        .when(col("v0").isNotNull && col("v1").isNotNull && col("t1") =!= col("t0"),
          col("v0") + (col("v1") - col("v0")) * (t - col("t0")) / (col("t1") - col("t0")))
        .when(col("v0").isNotNull && col("v1").isNotNull, col("v0").cast("double")))
      .drop("v0", "t0", "v1", "t1")
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next event type | current) from every consecutive pair in each
    * user's time-ordered stream — the "what do users do after X" census
    * behind funnel design and next-action models. One `lead` window per
    * user (the sessionization shuffle shape), then a (types²)-bounded
    * count fold; the row normalizer is a window over that tiny relation.
    * Probabilities are exact long/long divisions rounded to 4. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p",
      round(col("n") / sum(col("n")).over(
        Window.partitionBy(col("event_type"))), 4))
  }

  /** Pure range join — NO equi key: every event whose ts falls inside an
    * interval's [iv_start, iv_end), aggregated per interval. Naively this
    * is an inequality join (a cartesian product that Spark would plan as
    * BroadcastNestedLoopJoin: every event row tested against every
    * interval). Instead it is BUCKETIZED: each interval explodes into the
    * hour buckets it covers (a constant ≤ ⌈span/1h⌉+1 expansion of the
    * tiny interval side), each event carries its single hour bucket
    * map-side, and the join becomes an EQUI-join on bucket with the range
    * as a post-filter. An event's bucket is unique, so no pair is emitted
    * twice and no dedup pass is needed.
    *
    * Scale shape: the exploded interval side is broadcast — the 100 TB
    * event scan is never shuffled; only rows that land in a hot bucket
    * survive into the (intervals-bounded) final aggregate. */
  def rangeJoinBucketed(intervals: DataFrame, events: DataFrame): DataFrame = {
    val iv = intervals.withColumn("bucket",
      explode(sequence(
        date_trunc("hour", col("iv_start")),
        date_trunc("hour", col("iv_end") - expr("interval 1 microsecond")),
        expr("interval 1 hour"))))
    val ev = events.withColumn("bucket",
      window(col("ts"), "1 hour").getField("start"))
    ev.join(broadcast(iv), Seq("bucket"))
      .filter(col("ts") >= col("iv_start") && col("ts") < col("iv_end"))
      .groupBy(col("hot_type"), col("hot_hour"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
  }

  /** Kaplan–Meier survival curve over per-user lifetimes — the churn
    * question ("what fraction of users are still active after t days?")
    * answered WITH right-censoring: a user whose last event falls inside
    * the final `censorDays` of the observation window hasn't churned,
    * they just ran out of window, and dropping or death-counting them
    * biases the curve (the classical survival-analysis correction).
    *
    * Lifetime t = days between a user's first and last event; users
    * last-seen within `censorDays` of the global max timestamp are
    * censored at t. At each distinct death time: n_risk = users with
    * lifetime ≥ t (censored included), d = deaths at t, and
    * S(t) = Π (1 − d/n_risk), computed as exp of the running sum of
    * ln((n−d)/n) — each factor is an exact integer ratio and the running
    * sum is a sequential ordered scan in both engines, so the curve is
    * cross-engine deterministic; a (n−d)=0 terminal factor short-circuits
    * to S=0 via a running min instead of reaching ln(0).
    *
    * Scale shape: one pass over events (per-user min/max, map-side
    * combined), then everything operates on the DAY-census — bounded by
    * the observation span, not the corpus; the global windows sort ≤
    * span-days rows. */
  def kaplanMeier(events: DataFrame, censorDays: Int = 7): DataFrame = {
    val horizon = events.agg(max(col("ts")).as("max_ts"))
    val life = events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .crossJoin(broadcast(horizon))
      .select(
        datediff(col("last_ts").cast("date"), col("first_ts").cast("date")).as("t"),
        when(col("last_ts") >=
          col("max_ts") - expr(s"INTERVAL $censorDays DAYS"), 0)
          .otherwise(1).as("observed"))
    val census = life.groupBy(col("t"))
      .agg(sum(col("observed")).as("d"), count(lit(1)).as("m"))
    val atRisk = census.withColumn("n_risk",
      sum(col("m")).over(Window.orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val deaths = atRisk.filter(col("d") > 0)
    val cum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deaths
      .withColumn("factor",
        (col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double"))
      .withColumn("survival",
        when(min(col("factor")).over(cum) === 0.0, 0.0)
          .otherwise(round(exp(sum(log(col("factor"))).over(cum)), 4)))
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("n_events"),
        col("survival"))
  }

  /** Seasonal-naive forecast-skill read (the MASE denominator logic,
    * Hyndman & Koehler 2006): per series, the mean absolute error of
    * the lag-7 (seasonal-naive) forecast over the mean absolute error
    * of the lag-1 (naive) forecast on the SAME days — < 1 means weekly
    * structure is real signal a forecaster should use, ≥ 1 means
    * yesterday already beats last-week. The honest pre-model baseline
    * census every forecasting pipeline should publish before anyone
    * fits anything.
    *
    * Exact integer micros end-to-end: daily totals, CALENDAR-lag
    * differences (self-joins on day − 1 / day − 7 over the daily census
    * — a row-lag `lag(m, 7)` would compare arbitrary offsets on series
    * with missing days, which is NOT the weekly seasonal-naive),
    * absolute sums; one division per series on the census-sized output,
    * rounded 4. Both MAEs average over the SAME rows (those with BOTH a
    * day−1 and a day−7 partner), so the ratio is a fair same-support
    * comparison. */
  def seasonalNaiveMase(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 1e6, 0).cast("long")).as("m"))
    def shifted(days: Int, as: String) = daily.select(col("event_type"),
      (col("day") + expr(s"INTERVAL $days DAYS")).as("day"), col("m").as(as))
    daily
      .join(shifted(1, "m_1"), Seq("event_type", "day"))
      .join(shifted(7, "m_7"), Seq("event_type", "day"))
      .withColumn("e1", abs(col("m") - col("m_1")))
      .withColumn("e7", abs(col("m") - col("m_7")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("e1")).as("ae1"), sum(col("e7")).as("ae7"))
      .select(col("event_type"), col("n_days"),
        expr("ae1 div n_days").as("mae_naive_micro"), // exact integer div
        expr("ae7 div n_days").as("mae_snaive_micro"),
        when(col("ae1") === 0, lit(null).cast("double"))
          .otherwise(round(col("ae7").cast("double") / col("ae1"), 4))
          .as("mase_weekly"))
  }

  /** Two-group log-rank test (Mantel 1966) over the same user-lifetime
    * construction as [[kaplanMeier]]: at every distinct event time,
    * group 1's observed deaths vs its hypergeometric expectation given
    * the at-risk split, summed — the standard "do these survival curves
    * differ?" statistic (KM draws the curves; this is the test).
    * z = (O₁ − ΣE₁)/√(ΣV), V the hypergeometric variance with the
    * (n−d)/(n−1) tie correction.
    *
    * Scale shape: lifetimes fold per user map-side; everything after
    * runs on the distinct-lifetime census (two reverse-cumulative
    * windows over the post-Aggregate census — the KM discipline); the
    * O/E/V folds are census-sized with one sqrt on the one-row output.
    * Integer O and at-risk counts are exact; E/V are per-time exact
    * ratios summed as doubles and rounded 4 (the entropy-fold
    * acceptance). */
  def logRankTest(events: DataFrame, censorDays: Int = 7): DataFrame = {
    val horizon = events.agg(max(col("ts")).as("max_ts"))
    val life = events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .crossJoin(broadcast(horizon))
      .select((col("user_id") % 2 === 1).as("g1"),
        datediff(col("last_ts").cast("date"), col("first_ts").cast("date"))
          .as("t"),
        when(col("last_ts") >=
          col("max_ts") - expr(s"INTERVAL $censorDays DAYS"), 0)
          .otherwise(1).as("observed"))
    val sizes = life.agg(
      sum(when(col("g1"), 1L).otherwise(0L)).as("n1_users"),
      sum(when(!col("g1"), 1L).otherwise(0L)).as("n2_users"))
    val census = life.groupBy(col("t"))
      .agg(sum(when(col("g1"), col("observed")).otherwise(0)).cast("long")
          .as("d1"),
        sum(col("observed")).cast("long").as("d"),
        sum(when(col("g1"), 1L).otherwise(0L)).as("m1"),
        count(lit(1)).as("m"))
    val rev = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = census
      .withColumn("n", sum(col("m")).over(rev))
      .withColumn("n1", sum(col("m1")).over(rev))
      .filter(col("d") > 0 && col("n") > 1)
      .select(col("d1"),
        (col("d").cast("double") * col("n1") / col("n")).as("e1"),
        (col("d").cast("double") * col("n1") / col("n") *
          (lit(1.0) - col("n1").cast("double") / col("n")) *
          (col("n") - col("d")).cast("double") / (col("n") - 1)).as("v"))
    terms.agg(sum(col("d1")).as("o1"), sum(col("e1")).as("e1r"),
        sum(col("v")).as("vr"))
      .crossJoin(broadcast(sizes))
      .select(col("n1_users"), col("n2_users"), col("o1"),
        round(col("e1r"), 4).as("e1"),
        when(col("vr") <= 0.0, lit(null).cast("double"))
          .otherwise(round((col("o1") - col("e1r")) / sqrt(col("vr")), 4))
          .as("z"))
  }

  /** Weekly-seasonality strength per series: the share of daily-total
    * variance explained by day-of-week means, R² = (Σ_w S_w²/n_w − S²/n)
    * / (Q − S²/n) — the one-number "is this metric weekly-periodic?"
    * gate before fitting seasonal models ([[seasonalDecompose]] assumes
    * the period; this MEASURES it). R² ≈ 1 strongly weekly, ≈ 0
    * aperiodic; a constant series has no variance to explain → NULL.
    *
    * Exactness: daily totals are exact micros; (n, S, Q) and the per-dow
    * (n_w, S_w) are exact BIGINT/DECIMAL folds; the ~7-row census pays
    * the only divisions. The day-of-week key is a grouping key ONLY
    * (never output), so engine dow-numbering conventions don't matter. */
  def seasonalityStrength(events: DataFrame): DataFrame = {
    val dec: Column => Column = _.cast("decimal(38,0)")
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 1e6, 0).cast("long")).as("m"))
    val byDow = daily
      .groupBy(col("event_type"), dayofweek(col("day").cast("date")).as("dw"))
      .agg(count(lit(1)).as("nw"), sum(col("m")).as("sw"))
    byDow.groupBy(col("event_type"))
      .agg(sum(col("nw")).as("n"), sum(col("sw")).as("s"),
        sum((dec(col("sw")) * dec(col("sw"))).cast("double") /
          col("nw").cast("double")).as("a"))
      .join(daily.groupBy(col("event_type"))
        .agg(sum(dec(col("m")) * dec(col("m"))).as("q")), "event_type")
      .withColumn("sst",
        col("q").cast("double") -
          (dec(col("s")) * dec(col("s"))).cast("double") / col("n"))
      .select(col("event_type"), col("n").as("n_days"),
        when(col("sst") <= 0.0, lit(null).cast("double"))
          .otherwise(round(
            (col("a") - (dec(col("s")) * dec(col("s"))).cast("double") /
              col("n")) / col("sst"), 4)).as("r2_weekly"))
  }

  /** Haar wavelet decomposition of the per-type daily value series over
    * the first `days` (a power of two) days — the multi-resolution
    * energy read behind series compression, trend/burst separation and
    * wavelet-domain anomaly flags: level-l block k carries the block
    * total (approximation) and the left-minus-right contrast (detail);
    * a spike lights up small-scale details, a level shift the coarse
    * ones.
    *
    * INTEGER end-to-end: daily totals are exact micros, missing days
    * densify to literal 0 on the types×days grid (types-sized — never a
    * corpus explode), and every coefficient is emitted as the UNSCALED
    * block sum / signed contrast (the 1/2^l Haar normalization is
    * presentation — dividing here would trade exact longs for floats).
    * One grid-sized aggregate per level, log₂(days) levels unioned. */
  def haarCoefficients(events: DataFrame, days: Int = 16): DataFrame = {
    require(days >= 2 && (days & (days - 1)) == 0,
      s"days must be a power of two >= 2, got $days")
    val nLevels = java.lang.Integer.numberOfTrailingZeros(days)
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 1e6, 0).cast("long")).as("m"))
    val anchor = daily.agg(min(col("day")).as("day0"))
    val idx = daily.crossJoin(broadcast(anchor))
      .select(col("event_type"),
        datediff(col("day").cast("date"), col("day0").cast("date")).as("i"),
        col("m"))
      .filter(col("i") < days)
    val grid = idx.select(col("event_type")).distinct()
      .select(col("event_type"),
        explode(sequence(lit(0), lit(days - 1))).as("i"))
      .join(idx, Seq("event_type", "i"), "left")
      .select(col("event_type"), col("i"), coalesce(col("m"), lit(0L)).as("m"))
      .localCheckpoint(false)
    (1 to nLevels).map { l =>
      val b = 1 << l
      grid.groupBy(col("event_type"), (col("i") / b).cast("long").as("k"))
        .agg(sum(col("m")).as("s_sum"),
          sum(when(col("i") % b < b / 2, col("m")).otherwise(-col("m")))
            .as("d_sum"))
        .select(col("event_type"), lit(l).as("level"), col("k"),
          col("s_sum"), col("d_sum"))
    }.reduce(_ unionByName _)
  }

  /** SAX symbolization (Lin, Keogh et al., DMKD 2007) of the per-type
    * daily value series: PAA blocks of `blockDays` days (exact
    * integer-micro block sums), per-series z-normalization, then a
    * 4-symbol alphabet at the standard-normal quartile breakpoints
    * ±0.6745 and 0 — the discretization behind motif mining, series
    * indexing, and cheap anomaly grammars over metric streams.
    *
    * Exactness discipline: block sums are exact longs; the z-score is
    * computed as (x·k − S) / √(k·Q − S²) — numerator exact, k·Q − S²
    * exact DECIMAL(38,0) — so ONE sqrt and one division produce it;
    * symbols compare breakpoints against the ROUNDED 4-dp z (both
    * engines bucket identical values). A zero-variance series has no
    * defined z: symbol and z go NULL rather than inventing a bucket.
    * Everything after the daily census is (type × blocks)-sized; the
    * day-zero anchor is a one-row broadcast. */
  def saxSymbols(events: DataFrame, blockDays: Int = 4): DataFrame = {
    val dec: Column => Column = _.cast("decimal(38,0)")
    val daily = events
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 1e6, 0).cast("long")).as("m"))
    val anchor = daily.agg(min(col("day")).as("day0"))
    val paa = daily.crossJoin(broadcast(anchor))
      .groupBy(col("event_type"),
        (datediff(col("day").cast("date"), col("day0").cast("date"))
          .cast("long") / blockDays).cast("long").as("bucket"))
      .agg(sum(col("m")).as("x"))
    val stats = paa.groupBy(col("event_type"))
      .agg(count(lit(1)).as("k"), sum(col("x")).as("s"),
        sum(dec(col("x")) * dec(col("x"))).as("q"))
      .withColumn("den2", dec(col("k")) * col("q") - dec(col("s")) * dec(col("s")))
    paa.join(stats, "event_type")
      .withColumn("z", when(col("den2") <= 0, lit(null).cast("double"))
        .otherwise(round(
          (dec(col("x")) * dec(col("k")) - dec(col("s"))).cast("double") /
            sqrt(col("den2").cast("double")), 4)))
      .select(col("event_type"), col("bucket"), col("x").as("paa_micro"),
        col("z"),
        when(col("z").isNull, lit(null).cast("string"))
          .when(col("z") < -0.6745, "a")
          .when(col("z") < 0.0, "b")
          .when(col("z") < 0.6745, "c")
          .otherwise("d").as("symbol"))
  }
}
