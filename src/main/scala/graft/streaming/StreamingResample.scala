package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TimeSeries

/** Streaming twin of [[TimeSeries.resampleGapfill]] — a live traffic
  * census: each micro-batch aggregates ITS OWN rows down to ADDITIVE
  * (event_type, bucket_start, n, sum_value) partial rows and appends them
  * to the persisted census; the serve path sums the partials, then runs
  * the same grid/zero-fill tail as the batch operator, so serving is
  * row-identical to a batch resample over everything ever ingested.
  *
  * The accumulator rows are ADDITIVE (counts and sums), the BM25-stats /
  * span-census pattern: history is never rescanned or rewritten, executor
  * memory is O(buckets in the micro-batch), and a bucket split across
  * many micro-batches is simply several partial rows that fold at serve
  * time. Additive rows are not idempotent and foreachBatch is
  * AT-LEAST-once, so each partial carries its foreachBatch `batch_id` and
  * serve() collapses replays with a (batch_id, event_type, bucket_start)
  * dedup before folding — the [[StreamingTrending]] delivery contract.
  * Downstream, [[TimeSeries.anomalyZscore]]'s window math runs unchanged
  * over the served series. */
object StreamingResample {

  /** One micro-batch's additive census partials, stamped with the
    * foreachBatch epoch so replays are collapsible at serve time. */
  private def partialsOf(batch: DataFrame, batchId: Long,
      bucket: String): DataFrame =
    batch.groupBy(col("event_type"),
        window(col("ts"), bucket).getField("start").as("bucket_start"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .withColumn("batch_id", lit(batchId))

  /** Start the ingest: append each micro-batch's partial rows to
    * `censusPath`. `incoming` must carry (event_type, ts, value). */
  def start(incoming: DataFrame, censusPath: String,
      bucket: String = "1 hour",
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = incoming.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        partialsOf(batch, batchId, bucket).write.mode("append").parquet(censusPath)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** Serve the gap-filled series from the census — row-identical to
    * [[TimeSeries.resampleGapfill]] over the full ingested history: drops
    * replayed partials, folds the (buckets-bounded) remainder, then runs
    * the SAME guarded grid/zero-fill tail as the batch operator (shared
    * code, so the poison-timestamp maxBuckets guard applies here too). */
  def serve(spark: SparkSession, censusPath: String,
      bucket: String = "1 hour", maxBuckets: Int = 1000000): DataFrame = {
    val counts = spark.read.parquet(censusPath)
      .dropDuplicates("batch_id", "event_type", "bucket_start")
      .groupBy(col("event_type"), col("bucket_start"))
      .agg(sum(col("n")).as("n_events"),
        round(sum(col("sum_value")), 2).as("total_value"))
    TimeSeries.gapfillTail(counts, "event_type", bucket, maxBuckets)
  }
}
