package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables
import graft.operators.TimeSeries

/** Streaming traffic census: streamed micro-batch appends serve the same
  * gap-filled series as the batch resample over the full history, with
  * split buckets folding across batch boundaries. */
class StreamingResampleSpec extends SparkSpec {

  test("streamed appends ≡ batch resampleGapfill, incl. buckets split across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("census").toString + "/c"

    val ev = Tables(spark, sfDir, "events")
      .select(col("event_type"), col("ts"), col("value"))
    val rows = ev.as[(String, java.sql.Timestamp, Double)].collect().toIndexedSeq
    // split by row PARITY (not by time): nearly every hour bucket lands in
    // both halves, so serve-time folding of partial census rows is
    // exercised on virtually the whole series
    val (day1, day2) = rows.zipWithIndex.partition(_._2 % 2 == 0) match {
      case (a, b) => (a.map(_._1), b.map(_._1))
    }

    val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = StreamingResample.start(
      mem.toDF().toDF("event_type", "ts", "value"), censusPath = path)
    try {
      mem.addData(day1: _*)
      q.processAllAvailable()
      mem.addData(day2: _*)
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))
    val served = StreamingResample.serve(spark, path).collect().map(key).toSet
    val batch = TimeSeries.resampleGapfill(ev).collect().map(key).toSet
    assert(served == batch,
      s"served ${served.size} rows != batch ${batch.size}")
    // multi-row partials actually existed (a bucket crossed the split)
    val partials = spark.read.parquet(path)
      .groupBy("event_type", "bucket_start").count().filter(col("count") > 1)
    assert(partials.count() > 0, "fixture split produced no split buckets")

    // foreachBatch is at-least-once: replay batch 0's partials verbatim
    // (same batch_id) — serve must collapse them, not double-count
    val replay = spark.read.parquet(path).filter(col("batch_id") === 0)
    replay.write.mode("append").parquet(path)
    val servedAfterReplay =
      StreamingResample.serve(spark, path).collect().map(key).toSet
    assert(servedAfterReplay == batch, "replayed batch double-counted at serve")
  }
}
