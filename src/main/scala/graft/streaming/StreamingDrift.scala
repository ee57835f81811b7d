package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Drift

/** Streaming twin of [[Drift.ksStatistic]] — a continuously-maintained
  * two-sample drift monitor: the KS input is a per-value (na, nb) census,
  * which is ADDITIVE, so each micro-batch of the CURRENT stream appends
  * its own value census as a partial and the serve step folds partials
  * against the (static) reference census stored the same way. History is
  * never rescanned; partials compact like any additive artifact; batch
  * ids dedup at-least-once replays (the StreamingTrending contract). */
object StreamingDrift {

  /** The reference side's census, written once (or refreshed on a
    * schedule): per-value counts of the baseline sample. */
  def writeReference(ref: DataFrame, valueCol: String, path: String): Unit =
    ref.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("na"))
      .write.mode("overwrite").parquet(path)

  /** One current-side batch → additive (v, nb) partial rows. */
  def batchPartial(batch: DataFrame, valueCol: String,
      batchId: Long): DataFrame =
    batch.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("nb"))
      .withColumn("batch_id", lit(batchId))

  /** Fold reference census + current partials into the KS report —
    * identical math to the batch operator (integer-ratio ECDFs, banded
    * running sums over the value census — [[Drift.ksFromCensus]]). */
  def serve(spark: SparkSession, refPath: String,
      partialsPath: String): DataFrame = {
    val ref = spark.read.parquet(refPath)
      .select(col("v"), col("na"), lit(0L).as("nb"))
    val cur = spark.read.parquet(partialsPath)
      .dropDuplicates("batch_id", "v")
      .groupBy(col("v")).agg(sum(col("nb")).as("nb"))
      .select(col("v"), lit(0L).as("na"), col("nb"))
    Drift.ksFromCensus(ref.unionByName(cur)
      .groupBy(col("v")).agg(sum(col("na")).as("na"), sum(col("nb")).as("nb")))
  }

  /** Start the current-side ingest: `incoming` carries `valueCol`. */
  def start(incoming: DataFrame, valueCol: String, partialsPath: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = incoming.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batchPartial(batch, valueCol, batchId)
          .write.mode("append").parquet(partialsPath)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
