package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Interval joins: batch range join well-formedness and the stream-stream
  * interval join with watermark-bounded state. */
class FunnelSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("batch funnel: every pair is same-user and inside the (0, 30min] window") {
    val f = Funnel.clickToPurchase(spark, sfDir, 30)
    assert(f.filter(col("purchase_ms") <= col("click_ms")).count() == 0)
    assert(f.filter(col("purchase_ms") > col("click_ms") + 30 * 60000L).count() == 0)
    assert(f.count() > 0)  // the events table does contain conversions
  }

  test("stream-stream interval join emits in-window pairs and drops out-of-window ones") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val out = Funnel.clickToPurchaseStream(
      clicks.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "value"), windowMinutes = 30)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(0)))
      purchases.addData(
        (1L, ts(10), 5.0),    // in window -> emit
        (2L, ts(45), 7.0),    // past 30 min -> silent
        (3L, ts(10), 9.0))    // no click -> silent
      q.processAllAvailable()
      val rows = spark.table("funnel_out").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 1L && rows.head.getDouble(3) == 5.0)
    } finally q.stop()
  }
}
