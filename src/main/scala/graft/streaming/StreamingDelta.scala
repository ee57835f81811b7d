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

  /** Incremental Delta SOURCE → Delta SINK relay with exactly-once
    * END-TO-END semantics — the mirror of the sink's `txn` design: the
    * consumer's high-water mark is the source VERSION it last folded,
    * persisted as the txn water-mark (consumerId, sourceVersion) on the
    * SINK table, so the mark commits ATOMICALLY with the data it
    * covers. One call = one micro-batch: read the source's CDC feed
    * over `(mark, latest]` (ONLY the new commits' files are opened —
    * [[DeltaTable.changes]] never scans the table), apply `transform`,
    * append to the sink under the txn. Returns the sink version, or
    * None when there is nothing new OR a replay finds its mark already
    * committed (crash between read and commit replays the batch; crash
    * after commit no-ops — at-least-once delivery, exactly-once
    * effect). `dataChange=false` maintenance (OPTIMIZE/ZORDER) on the
    * source contributes nothing, per the CDC contract.
    *
    * `transform` sees the raw CDC frame (table columns plus
    * `_change_type`/`_commit_version`) when `cdc=true`; by default it
    * sees just the INSERTED rows in table schema — the append-only
    * pipeline shape every incremental consumer in this package uses.
    *
    * BOUNDED PULLS (r16, the maxFilesPerTrigger discipline): a consumer
    * that has been idle for months must not fold its whole backlog into
    * ONE micro-batch — `maxFilesPerPull`/`maxBytesPerPull` cap how many
    * data-changing add files (and bytes) one pull consumes, extending
    * the range commit-by-commit while the caps hold (the txn watermark
    * is a VERSION, so batches land on commit boundaries and exactly-once
    * composes unchanged; the first backlog commit always rides, so every
    * pull makes progress even past-cap). An N-commit backlog drains
    * over ⌈N/commits-per-cap⌉ pulls; each pull's watermark commits
    * atomically with exactly the data it covers. */
  def relay(spark: org.apache.spark.sql.SparkSession, sourceRoot: String,
      sinkRoot: String, consumerId: String, cdc: Boolean = false,
      maxFilesPerPull: Int = Int.MaxValue,
      maxBytesPerPull: Long = Long.MaxValue)(
      transform: DataFrame => DataFrame): Option[Long] = {
    val src = DeltaTable(sourceRoot)
    val snk = DeltaTable(sinkRoot)
    val latest = src.latestVersion.getOrElse(return None)
    val mark = snk.txnVersion(consumerId).getOrElse(-1L)
    if (latest <= mark) return None
    // cap the pull at a commit boundary: take backlog commits in order
    // while the file/byte budget holds (the first one unconditionally)
    val upTo =
      if (maxFilesPerPull == Int.MaxValue && maxBytesPerPull == Long.MaxValue)
        latest
      else {
        // parse commits LAZILY, one version at a time, and stop at the
        // first that busts the budget — draining an N-commit backlog in
        // P capped pulls costs O(N) total commit parses, not O(N·P)
        var end = mark
        var files = 0L
        var bytes = 0L
        var halted = false
        while (!halted && end < latest) {
          // a missing commit version (a gap in _delta_log) halts the
          // budget loop at the boundary rather than throwing an opaque
          // NoSuchElementException — the pull consumes what exists
          src.commitSizes(end, end + 1).headOption match {
            case Some((_, n, b))
                if end == mark ||
                  (files + n <= maxFilesPerPull &&
                    bytes + b <= maxBytesPerPull) =>
              end += 1; files += n; bytes += b
            case _ => halted = true
          }
        }
        end
      }
    val feed = src.changes(spark, mark, upTo)
    val batch =
      if (cdc) feed
      else feed.where(org.apache.spark.sql.functions.col("_change_type")
        === "insert").drop("_change_type", "_commit_version")
    snk.appendIdempotent(transform(batch), consumerId, upTo)
  }
}
