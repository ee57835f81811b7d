package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of [[graft.operators.TimeSeries.decayedDemand]] —
  * continuously maintained exponentially-decayed demand. The key identity:
  * a decayed sum measured at anchor a rebases to a later anchor a' by ONE
  * multiplication, Σ·2^(−(a'−a)/h) — so each micro-batch appends an
  * ADDITIVE partial (its own per-item decayed sums at its own max date)
  * and the serve step folds all partials by rebasing each to the global
  * max anchor and summing. History is never re-scanned, rows per batch
  * are O(items-in-batch), and the partial table compacts like any other
  * additive census (StreamingResample shape).
  *
  * Delivery semantics: partials carry their foreachBatch `batch_id`; a
  * replayed batch appends identical rows and the serve-side
  * (batch_id, item) dedup collapses them — at-least-once ingest,
  * exactly-once serve. */
object StreamingTrending {

  /** One batch's additive partial: per-item (n_obs, decayed-at-anchor). */
  def batchPartial(batch: DataFrame, batchId: Long,
      halfLifeDays: Int): DataFrame = {
    val anchor = batch.agg(max(col("l_shipdate")).as("anchor"))
    batch.crossJoin(broadcast(anchor))
      .withColumn("w", pow(lit(2.0),
        -datediff(col("anchor"), col("l_shipdate")) /
          lit(halfLifeDays.toDouble)))
      .groupBy(col("l_partkey"), col("anchor"))
      .agg(count(lit(1)).as("n_obs"), sum(col("w")).as("decayed"))
      .withColumn("batch_id", lit(batchId))
  }

  /** Fold the partial table: rebase every partial to the global max
    * anchor, sum per item, rank the top `limit`. Mirrors the batch
    * operator's output columns. */
  def serve(spark: SparkSession, partialsPath: String, halfLifeDays: Int,
      limit: Int = 100): DataFrame = {
    val partials = spark.read.parquet(partialsPath)
      .dropDuplicates("batch_id", "l_partkey")
    val global = partials.agg(max(col("anchor")).as("ga"))
    val scored = partials.crossJoin(broadcast(global))
      .withColumn("rb", col("decayed") * pow(lit(2.0),
        -datediff(col("ga"), col("anchor")) / lit(halfLifeDays.toDouble)))
      .groupBy(col("l_partkey"))
      .agg(sum(col("n_obs")).as("n_obs"), round(sum(col("rb")), 4).as("decayed"))
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("decayed").desc, col("l_partkey"))))
      .filter(col("rank") <= limit)
  }

  /** Start the ingest: `incoming` carries (l_partkey, l_shipdate). */
  def start(incoming: DataFrame, partialsPath: String,
      halfLifeDays: Int = 180,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = incoming.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batchPartial(batch, batchId, halfLifeDays)
          .write.mode("append").parquet(partialsPath)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
