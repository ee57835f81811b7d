package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.lake.Tables

/** Sessionization — the canonical custom-state streaming operator a
  * log-analytics engine needs beyond tumbling windows (SURVEY.md §2.9 covers
  * threshold alerts; this is the `flatMapGroupsWithState` surface).
  *
  * Batch and streaming forms share the same session semantics: events of a
  * user belong to one session while consecutive gaps stay under
  * `gapMinutes`; a larger gap closes the session.
  *
  * Scale: the batch form is a per-user window (user_id is high-cardinality,
  * so partitions stay small) + one aggregation. The streaming form keeps
  * O(1) state per active user and relies on event-time timeouts + watermark
  * to flush idle sessions, so state is bounded by ACTIVE users, not stream
  * length.
  */
object Sessions {

  /** Batch sessionization: gap-flag via lag, running sum -> session id,
    * aggregate per (user, session). Gap arithmetic in integer
    * MILLISECONDS (unix_millis) so the oracle (epoch_ms) is exact. */
  def sessionsBatch(spark: SparkSession, dir: String, gapMinutes: Int): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = gapMinutes * 60000L
    val flagged = ev
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
  }

  /** Built-in-first sessionization: Spark's native `session_window`
    * (gap-merged windows inside the aggregation operator — no custom
    * state code, works identically over a stream with a watermark).
    * Same sessions as [[sessionsBatch]] except the WINDOW's end is
    * last-event + gap by definition, so `session_end` here is
    * `window.end - gap` — asserted equal to the lag/running-sum form in
    * SessionsSpec. */
  def sessionsWindowed(spark: SparkSession, dir: String, gapMinutes: Int): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        (unix_millis(col("session_window.end")) - gapMinutes * 60000L).as("end_ms"),
        col("n_events"), col("total_value"))

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class OpenSession(start: Long, last: Long, n: Int, total: Double)
  final case class CompletedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  /** Streaming sessionization: per-user open-session state; events past the
    * gap close and emit the previous session; event-time timeout (watermark
    * driven) flushes sessions idle past the gap. */
  def sessionizeStream(spark: SparkSession, events: DataFrame, gapMinutes: Int,
      watermark: String = "30 minutes"): Dataset[CompletedSession] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(userId: Long, it: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[CompletedSession] = {
      def done(s: OpenSession) = CompletedSession(userId,
        new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
      if (it.isEmpty && state.hasTimedOut) {
        // watermark passed last+gap: the open session can never grow
        val out = state.getOption.map(done).toList
        state.remove()
        return out.iterator
      }
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
      var open = state.getOption
      val closed = Seq.newBuilder[CompletedSession]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open = open match {
          case Some(s) if t - s.last > gapMs =>
            closed += done(s)
            Some(OpenSession(t, t, 1, e.value))
          case Some(s) =>
            Some(OpenSession(s.start, math.max(s.last, t), s.n + 1, s.total + e.value))
          case None =>
            Some(OpenSession(t, t, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.result().iterator
    }

    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("value")).as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
