package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables
import graft.operators.TimeSeries

/** Streaming last-touch attribution: micro-batches probing the persisted
  * touch table attribute EXACTLY as the batch operator does over the full
  * event log, and a replayed batch (state already containing its own
  * touches) emits the same rows. */
class StreamingAttributionSpec extends SparkSpec {

  private type Attr = (Long, Option[Timestamp], Boolean)

  private def attrSet(df: org.apache.spark.sql.DataFrame): Set[Attr] =
    df.select("event_id", "touch_ts", "attributed").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)), r.getBoolean(2)))
      .toSet

  test("streamed event-time-ordered batches == batch attribution over the full log") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("attrib").toString
    val (touchPath, attribPath) = (s"$tmp/touch", s"$tmp/attrib")

    val events = Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "event_type")
    val cut1 = "2024-01-10"
    val cut2 = "2024-01-20"
    val batches = Seq(
      events.filter(col("ts") < cut1),
      events.filter(col("ts") >= cut1 && col("ts") < cut2),
      events.filter(col("ts") >= cut2))
    assert(batches.forall(_.count() > 0), "split must produce 3 batches")

    val mem = MemoryStream[(Long, Long, Timestamp, String)]
    val q = StreamingAttribution.start(
      mem.toDF().toDF("event_id", "user_id", "ts", "event_type"),
      touchPath, attribPath)
    try {
      batches.foreach { b =>
        mem.addData(b.as[(Long, Long, Timestamp, String)].collect()
          .toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = attrSet(spark.read.parquet(attribPath))
    val expected = attrSet(TimeSeries.attributionLastTouch(events))
    assert(streamed == expected,
      s"streamed-only=${(streamed -- expected).take(5)} " +
        s"missing=${(expected -- streamed).take(5)}")
    assert(streamed.exists(_._3), "fixture must attribute something")
    assert(streamed.exists(!_._3), "fixture must leave something unattributed")
  }

  test("replayed batch (own touches already in state) emits the same rows") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, "2024-01-02 10:00:00", "click"),
      (2L, 7L, "2024-01-02 12:00:00", "purchase"), // -> click #1
      (3L, 7L, "2024-01-02 13:00:00", "click")     // AFTER the purchase
    ).toDF("event_id", "user_id", "tss", "event_type")
      .select(col("event_id"), col("user_id"),
        col("tss").cast("timestamp").as("ts"), col("event_type"))
    val noState = Seq.empty[(Long, Timestamp, Long)]
      .toDF("user_id", "touch_ts", "touch_event_id")
    val first = attrSet(StreamingAttribution.attributeBatch(ev, noState))
    // replay: the state now holds this batch's LATEST touch (event 3,
    // 13:00) — later than the purchase; the (ts, event_id) guard must
    // ignore it, not attribute the 12:00 purchase to a 13:00 click
    val replayedState = Seq((7L,
      Timestamp.valueOf("2024-01-02 13:00:00"), 3L))
      .toDF("user_id", "touch_ts", "touch_event_id")
    val replay = attrSet(StreamingAttribution.attributeBatch(ev, replayedState))
    assert(first == replay, s"first=$first replay=$replay")
    assert(first.head ==
      ((2L, Some(Timestamp.valueOf("2024-01-02 10:00:00")), true)))
  }
}
