package graft.operators

import org.apache.spark.sql.DataFrame
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
    * grid for a year of hours is ~9k rows per type: trivially joinable. */
  def resampleGapfill(events: DataFrame, typeCol: String = "event_type",
      bucket: String = "1 hour"): DataFrame = {
    val counts = events
      .groupBy(col(typeCol),
        window(col("ts"), bucket).getField("start").as("bucket_start"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
    val grid = counts.groupBy(col(typeCol))
      .agg(min(col("bucket_start")).as("lo"), max(col("bucket_start")).as("hi"))
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
}
