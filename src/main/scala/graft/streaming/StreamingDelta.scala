package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.lake.DeltaTable

/** Streaming ingest into a Delta-log table with EXACTLY-ONCE batch
  * delivery — the protocol's own `txn`-action design: each micro-batch
  * commits `appendIdempotent(batch, appId, batchId)`, so a
  * `foreachBatch` replay after a crash (at-least-once delivery) finds
  * its (appId, batchId) high-water mark already committed and no-ops.
  * Unlike the artifact sinks that tolerate replay by downstream dedup
  * (the [[StreamingBloom]] convention), the Delta sink's dedup is IN
  * the commit protocol — a replayed batch cannot land twice even with
  * no distinct-running consumer, and the watermark itself rides the
  * table's checkpoints so it survives log compaction.
  *
  * Scale shape: each micro-batch is one append commit (O(batch) work,
  * atomic publish); periodic [[DeltaTable.compact]] (`dataChange=false`
  * — CDC consumers skip it) folds micro-batch files into scan-sized
  * ones; [[DeltaTable.vacuum]] bounds disk. */
object StreamingDelta {

  /** Start the sink. `appId` identifies this writer's txn lineage —
    * restarting the SAME logical pipeline must reuse the appId (with its
    * streaming checkpoint), or replayed batches lose their watermark. */
  def sink(stream: DataFrame, root: String, appId: String,
      checkpointDir: Option[String] = None,
      compactEvery: Int = 0): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dt = DeltaTable(root)
        dt.appendIdempotent(batch, appId, batchId).foreach { _ =>
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
            dt.compact()
        }
        ()
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** One batch of the sink's work, exposed for deterministic replay
    * specs (the streaming suites' convention). */
  def deliver(root: String, appId: String, batchId: Long,
      batch: DataFrame): Option[Long] =
    DeltaTable(root).appendIdempotent(batch, appId, batchId)
}
