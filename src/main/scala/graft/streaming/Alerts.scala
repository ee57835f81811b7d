package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables

/** Monitoring/alerting surface (SURVEY.md §2.9): the reference's Azure
  * monitor rules re-expressed as Spark plans over the `events` table —
  * (1) a volume threshold per tumbling window (the "Ingress > 1 GB" metric
  * alert, `/root/reference/README.md:217-233`), and (2) a row-count alert
  * on a matched operation name (the KQL `contains "regeneratekey"` rule,
  * `/root/reference/README.md:238-244`).
  *
  * Each rule exists in two forms with the SAME aggregation logic:
  * a batch form (oracle-checkable) and a Structured Streaming form
  * (readStream + watermark + tumbling window + foreachBatch sink).
  */
object Alerts {

  /** Azure-style severity band (0 = critical .. 4 = verbose, mirroring the
    * reference's "Sévérité 0-4" rule scale,
    * `/root/reference/README.md:217-244`), derived from how far the
    * (ROUNDED — oracle-parity) measure overshoots the rule threshold. */
  def severity(total: Column, threshold: Double): Column =
    when(total > 4 * threshold, 0)
      .when(total > 3 * threshold, 1)
      .when(total > 2 * threshold, 2)
      .when(total > 1.5 * threshold, 3)
      .otherwise(4)
      .cast("int")

  /** Batch form of the volume alert: 5-minute tumbling windows where the
    * summed value exceeds `threshold`, graded with the rule's severity
    * band. The window start is projected as a flat timestamp so the result
    * is an ordinary relation. */
  def volumeAlertBatch(spark: SparkSession, dir: String, threshold: Double): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "5 minutes").getField("start").as("window_start"))
      .agg(round(sum(col("value")), 2).as("total_value"), count(lit(1)).as("n_events"))
      .filter(col("total_value") > threshold)
      .withColumn("severity", severity(col("total_value"), threshold))

  /** Sliding-window variant (window length 10 min, slide 5 min): each
    * event lands in length/slide = 2 overlapping windows. Same shuffle
    * profile as the tumbling form — the explode happens map-side. */
  def slidingVolumeAlertBatch(spark: SparkSession, dir: String, threshold: Double): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes")
        .getField("start").as("window_start"))
      .agg(round(sum(col("value")), 2).as("total_value"), count(lit(1)).as("n_events"))
      .filter(col("total_value") > threshold)

  /** Batch form of the operation-match alert (KQL `contains` is
    * case-insensitive — hence lower()): matching error events per user with
    * the rule's >= 1 row threshold. */
  def operationAlertBatch(spark: SparkSession, dir: String, needle: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(lower(col("event_type")).contains(needle))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"))
      .filter(col("n_matches") >= 1)

  /** Streaming form of the operation-match alert: stateless filter →
    * per-user counts in update mode (the KQL rule's >= 1 row threshold
    * fires on first match).
    *
    * STATE CAVEAT: the running count is keyed by user_id with no watermark,
    * so state is O(distinct users that ever matched) for the life of the
    * query — matching the KQL rule's all-time semantics. For an unbounded
    * keyspace at 100 TB/day, prefer the windowed [[volumeAlertStream]]
    * shape (watermark finalizes and DROPS old windows) or roll the count
    * into a window column here so state stays O(active windows × users). */
  def operationAlertStream(events: DataFrame, needle: String,
      onAlert: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .filter(lower(col("event_type")).contains(needle))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) => onAlert(batch, id) }
      .start()

  /** Streaming form of the volume alert. Watermark bounds state: windows
    * older than the watermark are finalized and dropped, so state size is
    * O(active windows), independent of stream length. `foreachBatch` is
    * the action sink (the reference sends mail/SMS; we hand each alert
    * micro-batch to a callback). The measure is rounded exactly like the
    * batch form, so batch and streaming shapes of the same rule agree at
    * severity band boundaries. */
  def volumeAlertStream(events: DataFrame, threshold: Double,
      onAlert: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val alerts = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(round(sum(col("value")), 2).as("total_value"), count(lit(1)).as("n_events"))
      .filter(col("total_value") > threshold)
      .select(col("window.start").as("window_start"), col("total_value"), col("n_events"),
        severity(col("total_value"), threshold).as("severity"))
    alerts.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) => onAlert(batch, id) }
      .start()
  }

  /** Batch twin of [[operationAlertStreamWindowed]] — the oracle-checkable
    * form of the bounded per-(window, user) rule. */
  def operationAlertWindowedBatch(spark: SparkSession, dir: String,
      needle: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(lower(col("event_type")).contains(needle))
      .groupBy(window(col("ts"), "5 minutes").getField("start").as("window_start"),
        col("user_id"))
      .agg(count(lit(1)).as("n_matches"))

  /** Bounded-state form of the operation-match alert: matched counts keyed
    * by (tumbling window, user) with a watermark, so state is
    * O(active windows × users seen in them) — windows behind the watermark
    * are finalized and DROPPED, unlike [[operationAlertStream]]'s all-time
    * running counts (whose state grows with every user that ever matched).
    * This is the shape to run against an unbounded keyspace at 100 TB/day;
    * the rule's >= 1 threshold still fires on a user's first match within
    * the window. */
  def operationAlertStreamWindowed(events: DataFrame, needle: String,
      windowLen: String = "5 minutes", delay: String = "10 minutes")(
      onAlert: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withWatermark("ts", delay)
      .filter(lower(col("event_type")).contains(needle))
      .groupBy(window(col("ts"), windowLen), col("user_id"))
      .agg(count(lit(1)).as("n_matches"))
      .select(col("window.start").as("window_start"), col("user_id"), col("n_matches"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) => onAlert(batch, id) }
      .start()
}
