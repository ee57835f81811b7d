package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Evolve

/** Streaming twin of [[Evolve.scd2Merge]] — continuous CDC ingest into a
  * versioned dimension: each micro-batch of updates merges against the
  * persisted dimension snapshot and publishes the next snapshot (read →
  * merge → localCheckpoint → overwrite, the compaction pattern; the
  * checkpoint materializes the result BEFORE the overwrite touches the
  * files being read).
  *
  * Replay safety comes from the merge SEMANTICS, not from bookkeeping:
  * re-merging an already-applied batch finds every update row equal to
  * the now-live version — a pass-through — so at-least-once foreachBatch
  * delivery converges to the same snapshot (spec-asserted), the property
  * that makes idempotent merge, not blind append, the right CDC
  * accumulator for dimensions.
  *
  * Contract: update batches are key-unique (compact CDC to latest-per-key
  * upstream; a duplicated key would open duplicate versions). The whole
  * snapshot is rewritten per batch — right for DIMENSION-sized tables
  * (the 100 TB side of an SCD2 star is the fact table, not the
  * dimension); at larger dimension sizes partition `current` by
  * valid_to nullness so only the live partition rewrites, as the batch
  * operator's docstring prescribes. */
object StreamingScd2 {

  /** Publish the seed snapshot (rows already in SCD2 shape: attrs +
    * valid_from / valid_to). */
  def init(seed: DataFrame, dimPath: String): Unit =
    seed.write.mode("overwrite").parquet(dimPath)

  /** Start the ingest. `asOfOf` stamps each micro-batch's effective time
    * (deterministic per batchId — wall-clock stamps would break replay). */
  def start(updates: DataFrame, dimPath: String, key: String,
      attrs: Seq[String], asOfOf: Long => Column,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val spark = updates.sparkSession
    val writer = updates.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val current = spark.read.parquet(dimPath)
        val merged = Evolve
          .scd2Merge(current, batch, key, attrs, asOfOf(batchId))
          .localCheckpoint(true)
        merged.write.mode("overwrite").parquet(dimPath)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
