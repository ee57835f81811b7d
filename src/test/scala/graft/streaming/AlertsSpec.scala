package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** §2.9: the stateful streaming alert — tumbling window + watermark +
  * foreachBatch — exercised through MemoryStream with controlled event
  * times. Mirrors the reference's threshold alert semantics
  * (`/root/reference/README.md:217-244`). */
class AlertsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("operationAlertStream fires per matching user with running counts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val events = mem.toDF().toDF("user_id", "event_type")
    val alerts = mutable.Buffer[Row]()
    val q = Alerts.operationAlertStream(events, "error",
      (batch, _) => alerts.synchronized { alerts ++= batch.collect() })
    try {
      mem.addData((1L, "Error"), (1L, "ERROR_fatal"), (2L, "click"))
      q.processAllAvailable()
      val byUser = alerts.synchronized(alerts.map(r => r.getLong(0) -> r.getLong(1)).toMap)
      assert(byUser.get(1L).contains(2L))   // case-insensitive contains, both rows
      assert(!byUser.contains(2L))          // non-matching user never alerts
    } finally q.stop()
  }

  test("operationAlertStreamWindowed fires per (window, user) and EXPIRES state behind the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val events = mem.toDF().toDF("user_id", "event_type", "ts")
    val alerts = mutable.Buffer[Row]()
    val q = Alerts.operationAlertStreamWindowed(events, "error") {
      (batch, _) => alerts.synchronized { alerts ++= batch.collect() }
    }
    try {
      // window [00:00, 00:05): user 1 matches twice, user 2 never
      mem.addData((1L, "Error", ts(0)), (1L, "ERROR_fatal", ts(2)), (2L, "click", ts(1)))
      q.processAllAvailable()
      assert(alerts.synchronized(alerts.exists(r =>
        r.getAs[Timestamp]("window_start") == ts(0) && r.getLong(1) == 1L && r.getLong(2) == 2L)))
      assert(alerts.synchronized(!alerts.exists(_.getLong(1) == 2L)))

      // two later windows advance the watermark to 01:50
      mem.addData((2L, "error_a", ts(60)))
      q.processAllAvailable()
      mem.addData((3L, "error_b", ts(120)))
      q.processAllAvailable()

      // a batch running at watermark 01:50 must have dropped the state of
      // windows [00:00,00:05) and [01:00,01:05) — only [02:00,02:05)
      // survives. (Unbounded operationAlertStream would hold all 3 users.)
      mem.addData((4L, "error_late", ts(20)))   // behind watermark: dropped
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators(0)
      assert(st.numRowsTotal == 1, s"expected 1 live (window,user) state row, got ${st.numRowsTotal}")
      assert(alerts.synchronized(!alerts.exists(_.getLong(1) == 4L)), "late event must not alert")
    } finally q.stop()
  }

  test("severity bands the threshold overshoot on the 0-4 Azure scale") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val sevs = Seq(1500.0, 1000.0, 700.0, 500.0, 350.0).toDF("total")
      .select(Alerts.severity(col("total"), 300.0).as("sev"))
      .collect().map(_.getInt(0)).toSeq
    assert(sevs == Seq(0, 1, 2, 3, 4))
    // batch volume alert carries the banded severity column
    val batch = Alerts.volumeAlertBatch(spark, sfDir, 300.0)
    assert(batch.columns.contains("severity"))
  }

  test("volumeAlertStream fires on over-threshold windows and drops late data past the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val events = mem.toDF().toDF("ts", "value")

    val alerts = mutable.Buffer[Row]()
    val query = Alerts.volumeAlertStream(events, 300.0,
      (batch, _) => alerts.synchronized { alerts ++= batch.collect() })
    try {
      // window [00:00, 00:05): 200 + 250 = 450 > 300 -> alert
      mem.addData((ts(0), 200.0), (ts(2), 250.0))
      query.processAllAvailable()
      assert(alerts.synchronized(alerts.exists(r =>
        r.getAs[Timestamp]("window_start") == ts(0)
          && r.getAs[Double]("total_value") == 450.0
          && r.getAs[Int]("severity") == 4)))   // 450 !> 1.5x300 -> verbose band

      // window [01:00, 01:05): single 400 -> alert; watermark advances to
      // max event time (01:00) - 10 min = 00:50
      mem.addData((ts(60), 400.0))
      query.processAllAvailable()
      assert(alerts.synchronized(alerts.exists(r =>
        r.getAs[Timestamp]("window_start") == ts(60)
          && r.getAs[Double]("total_value") == 400.0)))

      // late event at 00:20 (< watermark 00:50) is DROPPED: its window
      // [00:20, 00:25) must never alert even though 999 > threshold
      val before = alerts.synchronized(alerts.size)
      mem.addData((ts(20), 999.0))
      query.processAllAvailable()
      assert(alerts.synchronized(!alerts.exists(r =>
        r.getAs[Timestamp]("window_start") == ts(20))))

      // an under-threshold window never alerts
      mem.addData((ts(70), 10.0))
      query.processAllAvailable()
      assert(alerts.synchronized(!alerts.exists(r =>
        r.getAs[Timestamp]("window_start") == ts(70))))

      // severity band boundary: raw sum 450.004 rounds to 450.0, which is
      // NOT > 1.5x300 — the stream must band it 4 exactly like the batch
      // form (the measure is rounded BEFORE banding on both paths)
      mem.addData((ts(75), 200.0), (ts(77), 250.004))
      query.processAllAvailable()
      assert(alerts.synchronized(alerts.exists(r =>
        r.getAs[Timestamp]("window_start") == ts(75)
          && r.getAs[Double]("total_value") == 450.0
          && r.getAs[Int]("severity") == 4)))
    } finally query.stop()
  }
}
