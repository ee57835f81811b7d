package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Tables

/** Funnel correlation — the interval-join operator class: for every click,
  * the purchases by the same user within the following `windowMinutes`.
  *
  * Batch form: a range equi-join (user equi-key + time-bound non-equi
  * condition) — Catalyst plans the equi-part as the shuffle key, so the
  * time range only filters within user partitions; no cross product.
  *
  * Streaming form: a stream-stream inner interval join. Watermarks on both
  * sides bound the join state: a buffered click can be dropped once the
  * purchase-side watermark passes click_ts + window, which is what makes
  * the operator runnable forever at 100 TB/day — state is O(events in the
  * interval), not O(stream). */
object Funnel {

  /** Batch: (click, purchase) pairs within the window, millisecond-exact
    * bounds for oracle parity. */
  def clickToPurchase(spark: SparkSession, dir: String, windowMinutes: Int): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    clicks.join(purchases,
        col("user_id") === col("p_user")
          && unix_millis(col("purchase_ts")) > unix_millis(col("click_ts"))
          && unix_millis(col("purchase_ts")) <=
            unix_millis(col("click_ts")) + windowMinutes * 60000L)
      .select(col("user_id"), col("click_id"),
        unix_millis(col("click_ts")).as("click_ms"),
        unix_millis(col("purchase_ts")).as("purchase_ms"),
        col("purchase_value"))
  }

  /** Streaming: stream-stream inner join with event-time interval bound;
    * watermarks let the engine discard expired buffered rows. */
  def clickToPurchaseStream(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int, watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user")
        && col("purchase_ts") > col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }
}
