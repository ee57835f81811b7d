package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** Gap-filled resampling and the bucketized pure-range join: zero-fill
  * semantics, equivalence to the naive inequality join, and the
  * no-corpus-shuffle plan shape. */
class TimeSeriesSpec extends SparkSpec {

  test("resampleGapfill: silent buckets become explicit zero rows; traffic is conserved") {
    import spark.implicits._
    // type "a": events at hours 0 and 3 -> hours 1, 2 must appear as zeros;
    // type "b": single hour -> exactly one row, no padding outside its span
    val ev = Seq(
      ("a", "2024-01-01 00:10:00", 5.0),
      ("a", "2024-01-01 00:40:00", 7.0),
      ("a", "2024-01-01 03:05:00", 1.0),
      ("b", "2024-01-01 02:30:00", 2.0)
    ).toDF("event_type", "tss", "value")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"), col("value"))
    val got = TimeSeries.resampleGapfill(ev)
      .orderBy("event_type", "bucket_start").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 2L, 12.0),
      ("a", "2024-01-01 01:00:00.0", 0L, 0.0),
      ("a", "2024-01-01 02:00:00.0", 0L, 0.0),
      ("a", "2024-01-01 03:00:00.0", 1L, 1.0),
      ("b", "2024-01-01 02:00:00.0", 1L, 2.0)), got.mkString("; "))
    // on the real table: zero rows exist (a month of hours has gaps at
    // sf0.001) and the filled counts sum back to the raw event count
    val filled = TimeSeries.resampleGapfill(Tables(spark, sfDir, "events"))
    assert(filled.filter(col("n_events") === 0).count() > 0, "expected gap rows")
    val total = filled.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables(spark, sfDir, "events").count())
  }

  test("rangeJoinBucketed ≡ naive inequality join; intervals honor the census threshold") {
    val ev = Tables(spark, sfDir, "events")
    val iv = TimeSeries.hotIntervals(ev)
    assert(iv.count() > 0, "p90 census threshold must select some intervals")
    val bucketed = TimeSeries.rangeJoinBucketed(iv, ev)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    // ground truth: the unbucketized inequality join (fine at fixture scale)
    val naive = iv.join(ev, ev("ts") >= iv("iv_start") && ev("ts") < iv("iv_end"))
      .groupBy(col("hot_type"), col("hot_hour"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    assert(bucketed == naive)
  }

  test("resampleGapfill: a poisoned far-future timestamp fails loudly at the grid step, not as an executor OOM") {
    import spark.implicits._
    val ev = Seq(
      ("a", "2024-01-01 00:10:00", 1.0),
      ("a", "2999-01-01 00:10:00", 1.0) // ~8.5M hour buckets away
    ).toDF("event_type", "tss", "value")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"), col("value"))
    val e = intercept[Exception] {
      TimeSeries.resampleGapfill(ev, maxBuckets = 100000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("poisoned timestamp")), e.toString)
    // a span just under the cap still resamples fine
    assert(TimeSeries.resampleGapfill(ev, maxBuckets = 10000000).count() > 0)
  }

  test("locf: nulls carry the last observation forward per key; leading nulls stay null") {
    import spark.implicits._
    val df = Seq(
      (1L, 1, Some(10.0)), (1L, 2, None), (1L, 3, None), (1L, 4, Some(20.0)),
      (2L, 1, None), (2L, 2, Some(5.0)), (2L, 3, None)
    ).toDF("k", "seq", "v")
    val got = TimeSeries.locf(df, "k", "seq", "seq", "v")
      .orderBy("k", "seq").collect()
      .map(r => (r.getLong(0), r.getInt(1), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, 1, Some(10.0)), (1L, 2, Some(10.0)), (1L, 3, Some(10.0)), (1L, 4, Some(20.0)),
      (2L, 1, None), (2L, 2, Some(5.0)), (2L, 3, Some(5.0))), got.mkString(","))
  }

  test("silenceReport: contiguous zero runs detected with exact bounds; short blips and active hours excluded") {
    import spark.implicits._
    // type a: active 0-1, silent 2-4 (3h run), active 5, silent 6 (1h blip
    // below min), active 7
    val ev = Seq(0, 1, 5, 7).map(h => ("a", f"2024-01-01 0$h%d:15:00", 1.0))
      .toDF("event_type", "tss", "value")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"), col("value"))
    val got = TimeSeries.silenceReport(ev, minRunBuckets = 2)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString.take(13),
        r.getTimestamp(2).toString.take(13), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "2024-01-01 02", "2024-01-01 05", 3L)),
      got.mkString(","))
  }

  test("seasonalDecompose: exact integer-ratio trend/seasonal; residual zero on a pure periodic series; edges null") {
    import spark.implicits._
    // period-2 series 2,4,2,4,2,4 with halfWindow=1: trend is the 3-bucket
    // mean, seasonal absorbs the full alternation, residual is exactly 0
    val ev = Seq((0, 2), (1, 4), (2, 2), (3, 4), (4, 2), (5, 4)).flatMap {
      case (h, n) => Seq.fill(n)(("a", f"2024-01-01 0$h%d:30:00", 1.0))
    }.toDF("event_type", "tss", "value")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"), col("value"))
    val got = TimeSeries.seasonalDecompose(ev, halfWindow = 1)
      .collect().map(r => (r.getTimestamp(1).toString.take(13), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).sortBy(_._1)
    assert(got(0) == ("2024-01-01 00", 2L, None, None, None), got(0))
    assert(got(1) == ("2024-01-01 01", 4L, Some(2.6667), Some(1.3333), Some(0.0)), got(1))
    assert(got(2) == ("2024-01-01 02", 2L, Some(3.3333), Some(-1.3333), Some(0.0)), got(2))
    assert(got(5) == ("2024-01-01 05", 4L, None, None, None), got(5))
  }

  test("changepointCusum: argmax |CUSUM| lands on the level-shift boundary with the exact magnitude") {
    import spark.implicits._
    // rate 1/h for 3 hours then 5/h for 3 hours: CUSUM peaks at hour 2
    // (the last pre-shift bucket), |K|=36, cusum = 36/6 = 6.0
    val ev = Seq((0, 1), (1, 1), (2, 1), (3, 5), (4, 5), (5, 5)).flatMap {
      case (h, n) => Seq.fill(n)(("a", f"2024-01-01 0$h%d:10:00", 1.0))
    }.toDF("event_type", "tss", "value")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"), col("value"))
    val got = TimeSeries.changepointCusum(ev)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString.take(13),
        r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "2024-01-01 02", 6.0, 6L)), got.mkString(","))
  }

  test("groupedTrend: exact line recovered per key; single-day keys dropped") {
    import spark.implicits._
    // k1: y = 2x + 5 on days 0..3 (exact); k2: one day only -> dropped
    val rows = (0 to 3).map(x => ("k1", f"2024-01-${x + 1}%02d", 2.0 * x + 5)) :+
      (("k2", "2024-01-01", 9.0))
    val df = rows.toDF("k", "ds", "y")
      .select(col("k"), col("ds").cast("timestamp").as("d"), col("y"))
    val got = TimeSeries.groupedTrend(df, "k", "d", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == Map("k1" -> ((4L, 2.0, 5.0))), got.toString)
  }

  test("ewmaSmooth: head renormalizes over available lags; weights exact decimals") {
    import spark.implicits._
    val ev = Seq((1L, "u1", "2024-01-01 00:00:00", 1.0),
      (2L, "u1", "2024-01-01 00:01:00", 2.0),
      (3L, "u1", "2024-01-01 00:02:00", 3.0),
      (4L, "u2", "2024-01-01 00:00:00", 5.0))
      .toDF("event_id", "user_id", "tss", "value")
      .select(col("event_id"), col("user_id"),
        col("tss").cast("timestamp").as("ts"), col("value"))
    val got = TimeSeries.ewmaSmooth(ev)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // e1 = 1; e2 = (2 + 0.7)/(1.7); e3 = (3 + 1.4 + 0.49)/2.19
    assert(got == Map(1L -> 1.0, 2L -> 1.588235, 3L -> 2.232877,
      4L -> 5.0), got.toString)

    // decay = 1.0 degenerates every weight to the head's value — the
    // current-row term must still be identified by POSITION, so series
    // heads renormalize (running mean) instead of going null
    val flat = TimeSeries.ewmaSmooth(ev, decay = "1.0")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(flat == Map(1L -> 1.0, 2L -> 1.5, 3L -> 2.0, 4L -> 5.0),
      flat.toString)
  }

  test("decayedDemand: halflife decay exact at power-of-two ages; rank by decayed score") {
    import spark.implicits._
    val li = Seq(
      (1L, "2024-12-31"), (1L, "2024-07-04"), // ages 0, 180 -> 1 + 0.5
      (2L, "2024-01-06")                      // age 360 -> 0.25
    ).toDF("l_partkey", "sd")
      .select(col("l_partkey"), col("sd").cast("timestamp").as("l_shipdate"))
    val got = TimeSeries.decayedDemand(li, 180, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(_._4)
    assert(got.toSeq == Seq((1L, 2L, 1.5, 1), (2L, 1L, 0.25, 2)),
      got.mkString(","))
  }

  test("theilSenDailyTrend: one outlier day cannot move the slope; intercept from rounded slope") {
    import spark.implicits._
    // daily counts 10,12,14,16,100 on days 0..4: median pairwise slope
    // stays 2.0 (6 of 10 pairs), residual median 10
    val counts = Seq(10, 12, 14, 16, 100)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map(i => (d * 1000L + i, f"2024-02-0${d + 1} 08:00:00"))
    }
    val ev = rows.toDF("event_id", "tss")
      .select(col("event_id"), col("tss").cast("timestamp").as("ts"))
    val r = TimeSeries.theilSenDailyTrend(ev).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      ((5L, 10L, 2.0, 10.0)), r.toString)
  }

  test("funnelTimeToConvert: first-from to first-at-or-after-to deltas; pre-start conversions ignored") {
    import spark.implicits._
    val ev = Seq(
      (1L, "u1", "2024-01-01 00:00:00", "signup"),
      (2L, "u1", "2024-01-01 00:01:40", "purchase"), // +100 s (first)
      (3L, "u1", "2024-01-01 01:00:00", "purchase"), // later, ignored
      (4L, "u2", "2024-01-01 00:00:00", "purchase"), // BEFORE signup
      (5L, "u2", "2024-01-01 00:10:00", "signup"),
      (6L, "u2", "2024-01-01 00:15:00", "purchase"), // +300 s
      (7L, "u3", "2024-01-01 00:00:00", "signup")    // never converts
    ).toDF("event_id", "user_id", "tss", "event_type")
      .select(col("event_id"), col("user_id"),
        col("tss").cast("timestamp").as("ts"), col("event_type"))
    val r = TimeSeries.funnelTimeToConvert(ev).collect()(0)
    // deltas {100, 300}: p25=150, p50=200, p75=250, p90=280, mean=200
    assert(r.getLong(0) == 2L, r.toString)
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5)) == ((150.0, 200.0, 250.0, 280.0, 200.0)), r.toString)
  }

  test("attributionLastTouch: latest in-window touch claims the conversion; expired and missing touches yield false") {
    import spark.implicits._
    val ev = Seq(
      (1L, "u1", "2024-01-02 10:00:00", "click"),
      (2L, "u1", "2024-01-02 11:00:00", "click"),    // the LAST touch
      (3L, "u1", "2024-01-02 12:00:00", "purchase"), // attributed to #2
      (4L, "u2", "2024-01-01 00:00:00", "click"),
      (5L, "u2", "2024-01-03 12:00:00", "purchase"), // click expired (>24h)
      (6L, "u3", "2024-01-02 12:00:00", "purchase"), // no touch at all
      (7L, "u1", "2024-01-02 13:00:00", "view")      // non-touch type ignored
    ).toDF("event_id", "user_id", "tss", "event_type")
      .select(col("event_id"), col("user_id"),
        col("tss").cast("timestamp").as("ts"), col("event_type"))
    val got = TimeSeries.attributionLastTouch(ev)
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(3)).map(_.toString.take(19)), r.getBoolean(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (3L, Some("2024-01-02 11:00:00"), true),
      (5L, None, false),
      (6L, None, false)), got.mkString(","))
  }

  test("attributionLinear: credit splits equally across in-window touches and sums per touch") {
    import spark.implicits._
    val ev = Seq(
      (1L, "u1", "2024-01-02 10:00:00", "click"),
      (2L, "u1", "2024-01-02 11:00:00", "click"),
      (3L, "u1", "2024-01-02 12:00:00", "purchase"), // 0.5 to each click
      (4L, "u1", "2024-01-02 13:00:00", "purchase"), // 0.5 to each click
      (5L, "u2", "2024-01-01 00:00:00", "click"),
      (6L, "u2", "2024-01-03 12:00:00", "purchase")  // expired -> no credit
    ).toDF("event_id", "user_id", "tss", "event_type")
      .select(col("event_id"), col("user_id"),
        col("tss").cast("timestamp").as("ts"), col("event_type"))
    val got = TimeSeries.attributionLinear(ev)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(1L -> ((2L, 1.0)), 2L -> ((2L, 1.0))), got.toString)
  }

  test("activeTime: overlapping holds merge, touching holds merge, gaps split islands; coverage exact") {
    import spark.implicits._
    // u1: events at t=0, 100 (overlap), 300+100=400? — holds of 300s:
    // [0,300) ∪ [100,400) merge → [0,400); event at 1000 → [1000,1300)
    val ev = Seq((1L, "u1", 0L), (2L, "u1", 100L), (3L, "u1", 1000L),
      (4L, "u2", 50L))
      .toDF("event_id", "user_id", "sec0")
      .select(col("event_id"), col("user_id"),
        col("sec0").cast("timestamp").as("ts"))
    val got = TimeSeries.activeTime(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq(("u1", 2L, 700L), ("u2", 1L, 300L)),
      got.mkString(","))
  }

  test("dauWauStickiness: trailing-window distinct users via contribution explode, exact") {
    import spark.implicits._
    // u1 active day1; u2 active day1+day2. window=2:
    // day1: dau=2, wau({day0,day1})=2 → 1.0; day2: dau=1, wau=2 → 0.5
    val ev = Seq(("u1", "2024-01-01 10:00:00"), ("u2", "2024-01-01 11:00:00"),
      ("u2", "2024-01-02 09:00:00"))
      .toDF("user_id", "tss")
      .select(col("user_id"), col("tss").cast("timestamp").as("ts"))
    val got = TimeSeries.dauWauStickiness(ev, window = 2)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq == Seq(("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-02", 1L, 2L, 0.5)), got.mkString(","))
  }

  test("timeWeightedAvg: durations weigh the mean; the last observation drops") {
    import spark.implicits._
    // value 10 held 1s, value 20 held 3s, final value 99 holds nothing
    val df = Seq((1L, 0, 10.0), (1L, 1, 20.0), (1L, 4, 99.0),
      (2L, 0, 5.0)) // single observation -> no interval -> no row
      .toDF("k", "t", "v")
      .select(col("k"), col("t").cast("timestamp").as("ts"), col("v"))
    val got = TimeSeries.timeWeightedAvg(df, "k", "ts", "ts", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 17.5, 2L)), got.mkString(","))
  }

  test("interpolateLinear: nulls fill on the line between anchors; unanchored edges stay null; one exchange") {
    import spark.implicits._
    val df = Seq(
      (1, 1L, None), // before first observation -> stays null
      (2, 1L, Some(10.0)), (3, 1L, None), (4, 1L, None), (5, 1L, Some(40.0)),
      (6, 1L, None)  // after last observation -> stays null
    ).toDF("t", "k", "v")
      .select(col("t").cast("timestamp").as("ts"), col("k"), col("v"))
    val got = TimeSeries.interpolateLinear(df, "k", "ts", "ts", "v")
      .orderBy("ts").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(got.toSeq == Seq(None, Some(10.0), Some(20.0), Some(30.0),
      Some(40.0), None), got.mkString(","))
    // backward + forward windows share the key partitioning: ONE exchange
    val plan = TimeSeries.interpolateLinear(df, "k", "ts", "ts", "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"$exchanges exchanges:\n$plan")
  }

  test("cohortRetention: users counted in their first-event week's cohort, offsets in weeks") {
    import spark.implicits._
    // u1 joins week of Jan 1 (Mon), active again 2 weeks later;
    // u2 joins the NEXT week — two distinct cohorts
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-15 10:00:00"),
      (1L, "2024-01-15 11:00:00"), // same week twice -> counted once
      (2L, "2024-01-08 10:00:00")
    ).toDF("user_id", "tss")
      .select(col("user_id"), col("tss").cast("timestamp").as("ts"))
    val got = TimeSeries.cohortRetention(ev)
      .orderBy("cohort_week", "week").collect()
      .map(r => (r.getTimestamp(0).toString.take(10),
        r.getTimestamp(1).toString.take(10), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", "2024-01-01", 1L, 0),
      ("2024-01-01", "2024-01-15", 1L, 2),
      ("2024-01-08", "2024-01-08", 1L, 0)), got.mkString(","))
  }

  test("anomalyZscore: planted spike after a quiet stretch is flagged BECAUSE zero rows are in the frame") {
    import spark.implicits._
    // one event/hour for 30 hours, silence for 30 hours, then a 40-event
    // burst: the trailing-24h window before the burst is mostly zeros, so
    // z is huge — but ONLY if the silent hours exist as explicit rows
    val rows =
      (0 until 30).map(h =>
        ("a", f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:30:00", 1.0)) ++
      (0 until 40).map(_ => ("a", "2024-01-03 12:30:00", 1.0))
    val ev = rows.toDF("event_type", "tss", "value")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"), col("value"))
    val flagged = TimeSeries.anomalyZscore(ev)
      .filter(col("is_anomaly")).collect()
    val burst = flagged.filter(_.getTimestamp(1).toString.startsWith("2024-01-03 12:00"))
    assert(burst.nonEmpty, s"burst hour not flagged: ${flagged.mkString(";")}")
    // the burst's trailing day is ALL zeros: σ = 0 branch — flagged with
    // z undefined (null), not silently dropped
    assert(burst.head.isNullAt(3), burst.head.toString)
    // the first silent hours after the active stretch flag as NEGATIVE
    // z-score anomalies (traffic died), σ > 0 branch
    assert(flagged.exists(r => !r.isNullAt(3) && r.getDouble(3) < -3),
      flagged.mkString(";"))
    // quiet hours deep in the silence (all-zero window, x = μ) are normal
    val quiet = TimeSeries.anomalyZscore(ev)
      .filter(!col("is_anomaly") && col("n_events") === 0)
    assert(quiet.count() > 0)
  }

  test("markovTransitions: exact pair counts from per-user order; rows normalize to 1 per source type") {
    import spark.implicits._
    // u1: A->B->A ; u2: A->B ; pairs: A->B ×2, B->A ×1 — and the cross-user
    // boundary (u1's last A, u2's first A) must NOT pair
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "A"), (2L, 1L, "2024-01-01 01:00:00", "B"),
      (3L, 1L, "2024-01-01 02:00:00", "A"), (4L, 2L, "2024-01-01 00:30:00", "A"),
      (5L, 2L, "2024-01-01 01:30:00", "B")
    ).toDF("event_id", "user_id", "tss", "event_type")
      .select(col("event_id"), col("user_id"),
        col("tss").cast("timestamp").as("ts"), col("event_type"))
    val got = TimeSeries.markovTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(("A", "B") -> ((2L, 1.0)), ("B", "A") -> ((1L, 1.0))), got.toString)
    // real table: outgoing probabilities sum to 1 per source type
    val sums = TimeSeries.markovTransitions(Tables(spark, sfDir, "events"))
      .groupBy("event_type").agg(round(sum("p"), 2).as("total")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) <= 0.01, r.toString))
  }

  test("rangeJoinBucketed plan: the range join itself is an equi-join on bucket with the interval side broadcast") {
    val ev = Tables(spark, sfDir, "events")
    val plan = TimeSeries.rangeJoinBucketed(TimeSeries.hotIntervals(ev), ev)
      .queryExecution.executedPlan.toString
    // the inequality join must have become a broadcast HASH join keyed on
    // the hour bucket, carrying the ts range as a residual condition —
    // NOT a nested-loop over (events × intervals)
    assert(plan.contains("BroadcastHashJoin [bucket"), plan)
    assert(plan.contains("(ts"), plan) // residual range condition attached
    // the only nested-loop allowed is hotIntervals' single-row percentile
    // threshold attach (the engine-wide single-row-broadcast pattern)
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nlj <= 1, s"$nlj nested-loop joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("kaplanMeier: hand-computed curve on a planted cohort; censoring excluded from deaths") {
    import spark.implicits._
    // max ts = Jan 28, censor threshold Jan 21: users last-seen on/after
    // Jan 21 are censored, earlier last-seen users died (churned)
    def u(id: Long, first: String, last: String) =
      Seq((id, s"2024-01-$first 00:00:00"), (id, s"2024-01-$last 00:00:00"))
    val events = (u(1, "01", "03") ++ u(2, "01", "05") ++ u(3, "01", "10") ++
        u(4, "20", "28"))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = TimeSeries.kaplanMeier(events).orderBy("t_days")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // lifetimes: 2d, 4d, 9d died; 8d censored (last seen at the horizon).
    // t=2: n=4, d=1 -> 0.75; t=4: n=3 -> x2/3 = 0.5; t=9: the censored 8d
    // user has LEFT the risk set -> n=1, d=1 -> 0 via the zero guard
    assert(got.toSeq == Seq((2, 4L, 1L, 0.75), (4, 3L, 1L, 0.5), (9, 1L, 1L, 0.0)),
      got.mkString(", "))
  }

  test("autocorrelation: an alternating daily series matches the from-scratch ACF; missing days break pairs instead of splicing") {
    import spark.implicits._
    // daily counts over 8 consecutive days: 3,1,3,1,... (one event row per count)
    val counts = Seq(3, 1, 3, 1, 3, 1, 3, 1)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (f"2024-02-${d + 1}%02d 0$i:00:00")) }
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val got = TimeSeries.autocorrelation(ev, maxLag = 2).collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getDouble(3))).toMap
    def ref(k: Int): Double = {
      val n = counts.size; val mean = counts.sum.toDouble / n
      val dev = counts.map(_ - mean)
      val num = (0 until n - k).map(t => dev(t) * dev(t + k)).sum
      BigDecimal(num / dev.map(d => d * d).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(1) == (7L, ref(1)) && got(2) == (6L, ref(2)), got.toString)
    assert(got(1)._2 < -0.8 && got(2)._2 > 0.6, got.toString) // period-2 signature
    // drop day 3: calendar lag-1 pairs shrink to 5 (2-3 and 3-4 both break)
    val gapped = counts.zipWithIndex.filter(_._2 != 2).flatMap { case (c, d) =>
      (0 until c).map(i => (f"2024-02-${d + 1}%02d 0$i:00:00")) }
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val g = TimeSeries.autocorrelation(gapped, maxLag = 1).collect()(0)
    assert(g.getLong(2) == 5L, g.toString)
  }

  test("crossCorrelation: a planted 2-day lead peaks at lag +2; zero-fill keeps the series aligned") {
    import spark.implicits._
    // clicks bursty on days 1..8; purchases repeat the SAME pattern 2 days later
    val pattern = Seq(5, 1, 4, 1, 6, 1, 3, 1)
    val clicks = pattern.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => ("click", f"2024-03-${d + 1}%02d 0$i:00:00")) }
    val buys = pattern.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => ("purchase", f"2024-03-${d + 3}%02d 0$i:00:00")) }
    val ev = (clicks ++ buys).toDF("event_type", "s")
      .select(col("event_type"), col("s").cast("timestamp").as("ts"))
    val got = TimeSeries.crossCorrelation(ev, "click", "purchase", maxLag = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == (-4 to 4).toSet, got.keySet.toString)
    val peak = got.maxBy(_._2._2)
    assert(peak._1 == 2, s"peak at ${peak._1}, expected +2: $got")
    // the zero-padded span tails dilute the coefficient below 1
    assert(peak._2._2 > 0.7, got(2).toString)
    // span is 10 days (day 1 .. day 10): lag +4 overlaps 6 day-pairs
    assert(got(4)._1 == 6L, got(4).toString)
  }

  test("cohortLtv: cumulative value accrues per cohort member and never decreases") {
    import spark.implicits._
    // cohort A (users 1,2, week of Jan 1): purchases 10.00 wk0, 20.00 wk1
    // cohort B (user 3, week of Jan 8): purchase 5.00 wk0
    val ev = Seq(
      (1L, "signup", "2024-01-01 10:00:00", 0.0),
      (2L, "signup", "2024-01-02 10:00:00", 0.0),
      (1L, "purchase", "2024-01-03 10:00:00", 10.0),
      (1L, "purchase", "2024-01-10 10:00:00", 20.0),
      (3L, "signup", "2024-01-09 10:00:00", 0.0),
      (3L, "purchase", "2024-01-09 12:00:00", 5.0)
    ).toDF("user_id", "event_type", "s", "value")
      .select(col("user_id"), col("event_type"),
        col("s").cast("timestamp").as("ts"), col("value"))
    val got = TimeSeries.cohortLtv(ev).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    // cohort A: size 2; wk0 cum 10.00 -> 5.0/user; wk1 cum 30.00 -> 15.0/user
    assert(got(("2024-01-01", 0)) == (2L, 5.0), got.toString)
    assert(got(("2024-01-01", 1)) == (2L, 15.0), got.toString)
    // cohort B: size 1; wk0 cum 5.00 -> 5.0/user
    assert(got(("2024-01-08", 0)) == (1L, 5.0), got.toString)
  }

  test("seasonalNaiveMase: exact weekly pattern scores 0; constant series has no naive error (NULL)") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 09:00:00")
    // period-7 pattern over 14 days: lag-7 errors all zero -> mase 0;
    // lag-1 errors = 6 + six 1s = 12 over the 7 scored days
    val weekly = (0 until 14).map(i => ("p", t(i), (i % 7 + 1).toDouble))
    val const = (0 until 14).map(i => ("c", t(i), 5.0))
    val got = TimeSeries.seasonalNaiveMase(
      (weekly ++ const).toDF("event_type", "ts", "value")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4))))).toMap
    assert(got("p") == ((7L, 12000000L / 7L, 0L, Some(0.0))), got.toString)
    assert(got("c") == ((7L, 0L, 0L, None)), got.toString)
  }

  test("logRankTest: hand-computed O-E fold on a planted early-death group; balanced groups score ~0") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00")
    // odd users (g1) die at t=2,4; even users at t=10,12; user 6 censors
    // at t=20 (within 7d of max). Hand fold: O1=2, E1=0.4+0.25=0.65,
    // V=0.24+0.1875=0.4275, z=1.35/sqrt(0.4275)=2.0647
    val ev = Seq(
      (1L, t(0)), (1L, t(2)), (3L, t(0)), (3L, t(4)),
      (2L, t(0)), (2L, t(10)), (4L, t(0)), (4L, t(12)),
      (6L, t(0)), (6L, t(20))).toDF("user_id", "ts")
    val r = TimeSeries.logRankTest(ev).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 3L, 2L)),
      r.toString)
    assert(r.getDouble(3) == 0.65 && r.getDouble(4) == 2.0647, r.toString)
    // identical lifetime structure in both groups -> O = E, z = 0
    val bal = Seq(
      (1L, t(0)), (1L, t(3)), (2L, t(0)), (2L, t(3)),
      (3L, t(0)), (3L, t(8)), (4L, t(0)), (4L, t(8)),
      (5L, t(0)), (5L, t(20)), (8L, t(0)), (8L, t(20)))
      .toDF("user_id", "ts")
    val b = TimeSeries.logRankTest(bal).collect()(0)
    assert(b.getDouble(4) == 0.0, b.toString)
  }

  test("seasonalityStrength: perfect weekly pattern scores 1, anti-periodic scores 0, constant is NULL") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(day: Int) = Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(day).atTime(12, 0).toString
        .replace('T', ' ') + ":00")
    // 14 days, value = f(day-of-week): within-dow variance 0 -> R² = 1
    val weekly = (0 until 14).map(i => ("w", t(i), (i % 7 + 1).toDouble))
    // value alternates with period 2: day d and d+7 have OPPOSITE
    // parity, so every dow mean is equal -> R² = 0 exactly
    val anti = (0 until 14).map(i => ("x", t(i), (i % 2 + 1).toDouble))
    val const = (0 until 14).map(i => ("c", t(i), 5.0))
    val got = TimeSeries.seasonalityStrength(
      (weekly ++ anti ++ const).toDF("event_type", "ts", "value"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got("w") == ((14L, Some(1.0))), got.toString)
    assert(got("x") == ((14L, Some(0.0))), got.toString)
    assert(got("c") == ((14L, None)), got.toString)
  }

  test("haarCoefficients: hand-computed pyramid on 4 days; missing days densify to zero") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    val full = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex
      .map { case (v, i) => ("m", t(i), v) }.toDF("event_type", "ts", "value")
    val got = TimeSeries.haarCoefficients(full, days = 4).collect()
      .map(r => (r.getInt(1), r.getLong(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    // level 1: (1+2, 1-2), (3+4, 3-4); level 2: (10, (1+2)-(3+4))
    assert(got == Map((1, 0L) -> ((3000000L, -1000000L)),
      (1, 1L) -> ((7000000L, -1000000L)),
      (2, 0L) -> ((10000000L, -4000000L))), got.toString)
    // gaps: only days 0 and 3 exist -> slots 1, 2 are literal zeros
    val gappy = Seq(("m", t(0), 1.0), ("m", t(3), 4.0))
      .toDF("event_type", "ts", "value")
    val g = TimeSeries.haarCoefficients(gappy, days = 4).collect()
      .map(r => (r.getInt(1), r.getLong(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(g == Map((1, 0L) -> ((1000000L, 1000000L)),
      (1, 1L) -> ((4000000L, -4000000L)),
      (2, 0L) -> ((5000000L, -3000000L))), g.toString)
  }

  test("saxSymbols: planted two-block series scores z = ±1 (a/d); constant series goes NULL") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // type m: block0 (days 0-3) sums 10.0, block1 (days 4-7) sums 30.0
    // k=2, S=40e6, kQ−S² = 400e12 -> z = ∓1.0 exactly
    val m = Seq(1.0, 2.0, 3.0, 4.0, 10.0, 12.0, 8.0, 0.0).zipWithIndex
      .map { case (v, i) => ("m", t(i), v) }
    // type c: identical blocks -> zero variance -> NULL z and symbol
    val c = (0 to 7).map(i => ("c", t(i), 5.0))
    val df = (m ++ c).toDF("event_type", "ts", "value")
    val got = TimeSeries.saxSymbols(df, blockDays = 4).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(got(("m", 0L)) == ((10000000L, Some(-1.0), Some("a"))), got.toString)
    assert(got(("m", 1L)) == ((30000000L, Some(1.0), Some("d"))), got.toString)
    assert(got(("c", 0L)) == ((20000000L, None, None)), got.toString)
    assert(got(("c", 1L)) == ((20000000L, None, None)), got.toString)
  }
}
