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
  * time. Unlike the sketch tier a replayed batch WOULD double-count —
  * additive rows are not idempotent — so exactly-once here comes from the
  * checkpointed foreachBatch epoch, the same contract the span census
  * documents. Downstream, [[TimeSeries.anomalyZscore]]'s window math runs
  * unchanged over the served series. */
object StreamingResample {

  /** One micro-batch's additive census partials. */
  private def partialsOf(batch: DataFrame, bucket: String): DataFrame =
    batch.groupBy(col("event_type"),
        window(col("ts"), bucket).getField("start").as("bucket_start"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Start the ingest: append each micro-batch's partial rows to
    * `censusPath`. `incoming` must carry (event_type, ts, value). */
  def start(incoming: DataFrame, censusPath: String,
      bucket: String = "1 hour",
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        partialsOf(batch, bucket).write.mode("append").parquet(censusPath)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** Serve the gap-filled series from the census — row-identical to
    * [[TimeSeries.resampleGapfill]] over the full ingested history. Folds
    * the (buckets-bounded) partials, then the same grid/zero-fill tail. */
  def serve(spark: SparkSession, censusPath: String,
      bucket: String = "1 hour"): DataFrame = {
    val counts = spark.read.parquet(censusPath)
      .groupBy(col("event_type"), col("bucket_start"))
      .agg(sum(col("n")).as("n_events"),
        round(sum(col("sum_value")), 2).as("total_value"))
    val grid = counts.groupBy(col("event_type"))
      .agg(min(col("bucket_start")).as("lo"), max(col("bucket_start")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr(s"interval $bucket")))
          .as("bucket_start"))
    grid.join(counts, Seq("event_type", "bucket_start"), "left")
      .select(col("event_type"), col("bucket_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
  }
}
