package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sessionization: batch/streaming agreement on gap semantics, custom
  * state via flatMapGroupsWithState with event-time timeout. */
class SessionsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("batch sessionization splits on gaps > 30 minutes") {
    val sessions = Sessions.sessionsBatch(spark, sfDir, 30)
    // sessions are well-formed: start <= end, n_events >= 1
    assert(sessions.filter(col("session_start") > col("session_end")).count() == 0)
    assert(sessions.filter(col("n_events") < 1).count() == 0)
    // total event count is preserved by the partition into sessions
    val total = sessions.agg(sum("n_events")).head().getLong(0)
    assert(total == graft.lake.Tables(spark, sfDir, "events").count())
  }

  test("native session_window sessionization == the lag/running-sum form") {
    // semantics differ only at a gap of EXACTLY 30 min (windows [t, t+gap)
    // merge on overlap, so == gap splits; the lag form's > merges) — no
    // such boundary pair exists in the fixture, so the session sets match
    val native = Sessions.sessionsWindowed(spark, sfDir, 30)
    val batch = Sessions.sessionsBatch(spark, sfDir, 30)
      .select(col("user_id"),
        unix_millis(col("session_start")).as("start_ms"),
        unix_millis(col("session_end")).as("end_ms"),
        col("n_events"), col("total_value"))
    assert(native.count() == batch.count())
    assert(native.except(batch).count() == 0 && batch.except(native).count() == 0)
  }

  test("streaming sessionization emits closed sessions on gap and on watermark timeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")

    val out = Sessions.sessionizeStream(spark, events, gapMinutes = 30,
      watermark = "10 minutes")
    val query = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // user 1: two events 5 min apart -> one open session
      mem.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0))
      query.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0)  // nothing closed yet

      // a 2-hour-later event closes the first session (gap > 30 min)
      mem.addData((1L, ts(120), 5.0))
      query.processAllAvailable()
      val closed = spark.table("sessions_out").as[Sessions.CompletedSession].collect()
      assert(closed.length == 1)
      assert(closed.head.user_id == 1L && closed.head.n_events == 2
        && closed.head.total_value == 3.0
        && closed.head.session_start == ts(0) && closed.head.session_end == ts(5))

      // advance the watermark far past the open session's timeout
      // (another user's event drives the watermark); the idle session at
      // ts(120) flushes via EventTimeTimeout on a subsequent batch
      mem.addData((2L, ts(600), 1.0))
      query.processAllAvailable()
      mem.addData((2L, ts(601), 1.0))
      query.processAllAvailable()
      val all = spark.table("sessions_out").as[Sessions.CompletedSession].collect()
      assert(all.exists(s => s.user_id == 1L && s.session_start == ts(120)
        && s.n_events == 1 && s.total_value == 5.0),
        s"timeout flush missing: ${all.mkString(", ")}")
    } finally query.stop()
  }

  test("batch and streaming sessionization agree on a replayed slice") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // deterministic fixture: two users, gaps of 40 and 90 minutes
    val fixture = Seq(
      (10L, ts(0), 1.0), (10L, ts(10), 1.0), (10L, ts(50), 2.0),   // gap 40 -> 2 sessions
      (11L, ts(0), 3.0), (11L, ts(90), 4.0))                       // gap 90 -> 2 sessions
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val out = Sessions.sessionizeStream(spark, mem.toDF().toDF("user_id", "ts", "value"),
      gapMinutes = 30, watermark = "1 minute")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessions_replay").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      mem.addData((99L, ts(10000), 0.0)); q.processAllAvailable()
      mem.addData((99L, ts(10001), 0.0)); q.processAllAvailable()
      val streamed = spark.table("sessions_replay")
        .filter(col("user_id") < 99)
        .as[Sessions.CompletedSession].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value))
        .toSet
      assert(streamed == Set(
        (10L, ts(0), ts(10), 2, 2.0), (10L, ts(50), ts(50), 1, 2.0),
        (11L, ts(0), ts(0), 1, 3.0), (11L, ts(90), ts(90), 1, 4.0)))
    } finally q.stop()
  }
}
