package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructType, TimestampType}

/** Streaming twin of [[graft.operators.TimeSeries.attributionLastTouch]]
  * — continuous last-touch attribution over an event-time-ordered stream:
  * each micro-batch
  *
  *   1. attributes its conversions against the union of IN-BATCH touches
  *      (the same strictly-preceding ignore-nulls window the batch
  *      operator uses) and the persisted per-user latest-touch state,
  *   2. appends the attributed conversions to `attribPath`, and
  *   3. appends its own per-user latest touch rows to `touchPath` — so
  *      later batches see earlier touches without replaying any history.
  *
  * State lives in the touch TABLE, not in streaming state (the
  * StreamingNearDup shape): one row per (batch, user) — bounded by the
  * active-user count per interval, with the probe reading a per-user max.
  * Executor memory stays O(micro-batch) regardless of history length.
  *
  * Ordering contract: batches arrive in event-time order per user (the
  * watermark discipline) — carried touches are then never later than
  * batch conversions, and the tie-break guard `(ts, event_id) <` makes a
  * cross-batch same-timestamp touch attribute EXACTLY as the batch
  * operator's (ts, event_id) window ordering would. The same guard makes
  * a REPLAYED batch (at-least-once foreachBatch) ignore its own
  * already-appended future touches, so replay emits the same rows —
  * duplicates are removed downstream by event_id, as with the other
  * streaming artifacts. */
object StreamingAttribution {

  /** Touch-state schema: per (batch, user) latest touch (ts, event_id). */
  val TouchSchema: StructType = new StructType()
    .add("user_id", LongType).add("touch_ts", TimestampType)
    .add("touch_event_id", LongType)

  def ensureTouchTable(spark: SparkSession, touchPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(touchPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        TouchSchema).write.parquet(touchPath)
  }

  /** One batch of attribution against carried state: `carried` holds ONE
    * row per user — the latest (touch_ts, touch_event_id) seen before
    * this batch. Emits the batch's conversions with the same columns as
    * the batch operator. */
  def attributeBatch(batch: DataFrame, carried: DataFrame,
      convType: String = "purchase", touchType: String = "click",
      window: String = "24 hours"): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cutoff = col("ts") - expr(s"interval $window")
    batch.filter(col("event_type").isin(convType, touchType))
      .withColumn("tstruct", when(col("event_type") === touchType,
        struct(col("ts").as("t"), col("event_id").as("e"))))
      .withColumn("in_last", last(col("tstruct"), ignoreNulls = true).over(w))
      .filter(col("event_type") === convType)
      .join(carried, Seq("user_id"), "left")
      // carried touch counts only if strictly before the conversion in
      // the batch operator's (ts, event_id) ordering — this is both the
      // cross-batch tie-break and the replay guard
      .withColumn("carried_ok",
        when(col("touch_ts") < col("ts") ||
          (col("touch_ts") === col("ts") &&
            col("touch_event_id") < col("event_id")),
          struct(col("touch_ts").as("t"), col("touch_event_id").as("e"))))
      .withColumn("last_s", greatest(col("in_last"), col("carried_ok")))
      .select(col("event_id"), col("user_id"), col("ts").as("conv_ts"),
        when(col("last_s.t") >= cutoff, col("last_s.t")).as("touch_ts"),
        (col("last_s.t").isNotNull && col("last_s.t") >= cutoff)
          .as("attributed"))
  }

  /** Start the ingest: `incoming` carries (event_id, user_id, ts,
    * event_type). Attributed conversions land in `attribPath`; per-batch
    * per-user latest touches accumulate in `touchPath`. */
  def start(incoming: DataFrame, touchPath: String, attribPath: String,
      convType: String = "purchase", touchType: String = "click",
      window: String = "24 hours",
      checkpointDir: Option[String] = None): StreamingQuery = {
    ensureTouchTable(incoming.sparkSession, touchPath)
    val writer = incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        try {
          val carried = spark.read.schema(TouchSchema).parquet(touchPath)
            .groupBy(col("user_id"))
            .agg(max(struct(col("touch_ts"), col("touch_event_id"))).as("m"))
            .select(col("user_id"), col("m.touch_ts").as("touch_ts"),
              col("m.touch_event_id").as("touch_event_id"))
          attributeBatch(b, carried, convType, touchType, window)
            .write.mode("append").parquet(attribPath)
          b.filter(col("event_type") === touchType)
            .groupBy(col("user_id"))
            .agg(max(struct(col("ts"), col("event_id"))).as("m"))
            .select(col("user_id"), col("m.ts").as("touch_ts"),
              col("m.event_id").as("touch_event_id"))
            .write.mode("append").parquet(touchPath)
        } finally b.unpersist(false)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
