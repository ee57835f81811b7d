package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Sketches

/** Streaming twin of the [[Sketches]] HLL artifact — live distinct-count
  * dashboards over an event/document stream: each micro-batch sketches
  * its own rows (one map-side-combined aggregate over the DELTA only) and
  * APPENDS the resulting cell sketches to the persisted artifact. The
  * serve path ([[Sketches.hllServe]]) already merges multi-row cells with
  * `hll_union_agg`, so readers need no compaction to be correct —
  * [[compact]] is pure maintenance that bounds artifact row count at one
  * row per cell whenever convenient.
  *
  * Replay safety for free: HLL union is register-wise max — IDEMPOTENT —
  * so a replayed micro-batch (foreachBatch is at-least-once) appends
  * sketch rows that merge to the exact same state. No self-pair guard, no
  * dedup pass, no transactional append needed; estimates are identical
  * whether a batch landed once or five times (spec-asserted). This is the
  * property that makes sketches, not raw counts, the right streaming
  * accumulator: a replayed COUNT row would double-count.
  *
  * Executor memory is O(cells in the micro-batch); history is never
  * rescanned. */
object StreamingSketches {

  /** Start the ingest: append each micro-batch's (cells..., sketch) rows
    * to `sketchPath`. `incoming` must carry `cells` and `value`. */
  def start(incoming: DataFrame, cells: Seq[String], value: String,
      sketchPath: String, lgK: Int = Sketches.HllLgK,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sketches.hllBuild(batch, cells, value, lgK)
          .write.mode("append").parquet(sketchPath)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** Rewrite the artifact at one row per cell (union-merge, overwrite).
    * Correctness never requires it; run it when the appended row count
    * is worth reclaiming. */
  def compact(spark: SparkSession, sketchPath: String,
      cells: Seq[String]): Unit = {
    val merged = spark.read.parquet(sketchPath)
      .groupBy(cells.map(col): _*)
      .agg(org.apache.spark.sql.functions.hll_union_agg(col("sketch")).as("sketch"))
      .localCheckpoint(true) // materialize before overwriting the source
    merged.write.mode("overwrite").parquet(sketchPath)
  }
}
