package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables
import graft.operators.Curate

/** End-to-end streaming curation: micro-batch ingest over the real
  * documents table serves the same curated corpus as the batch pipeline,
  * and at-least-once replay cannot change it. */
class StreamingCurateSpec extends SparkSpec {

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getString(4))

  test("streamed micro-batches ≡ batch curate; replayed batch is collapsed at serve") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scurate").toString

    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val rows = docs.as[(Long, String, String)].collect().toIndexedSeq
    // parity split: duplicates and near-dup clusters straddle the batch
    // boundary, so cross-batch survivor choice and CC are exercised
    val (b1, b2) = rows.zipWithIndex.partition(_._2 % 2 == 0) match {
      case (a, b) => (a.map(_._1), b.map(_._1))
    }

    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingCurate.start(
      mem.toDF().toDF("doc_id", "lang", "text"), root)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val served = StreamingCurate.serve(spark, root).collect().map(key).toSet
    val batch = Curate.curate(spark, sfDir).collect().map(key).toSet
    assert(served == batch,
      s"served ${served.size} rows != batch ${batch.size}")

    // at-least-once: replay batch 0's artifact rows verbatim (same
    // batch_id); the keyed dedup must collapse them
    Seq("docs", "bands").foreach { a =>
      val replay = spark.read.parquet(s"$root/$a").filter(col("batch_id") === 0)
      replay.write.mode("append").parquet(s"$root/$a")
    }
    val afterReplay = StreamingCurate.serve(spark, root).collect().map(key).toSet
    assert(afterReplay == batch, "replayed batch changed the served corpus")
  }

  test("pullFromDelta: incremental Delta-source ingest ≡ batch curate; crash-replay collapses") {
    import graft.lake.DeltaTable
    val root = java.nio.file.Files.createTempDirectory("scurate-d").toString
    val srcRoot = root + "/src"
    val src = DeltaTable(srcRoot)
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))

    // the corpus lands in the Delta table across three commits, duplicate
    // clusters straddling the boundaries
    src.append(docs.filter(col("doc_id") % 3 === 0))
    assert(StreamingCurate.pullFromDelta(spark, srcRoot, root).contains(0L))
    src.append(docs.filter(col("doc_id") % 3 === 1))

    // crash between artifact append and cursor advance: the artifacts
    // for source v1 land (batch_id = source version 1) but the cursor
    // still says v0 was the last consumed
    val crashed = src.changes(spark, 0L, 1L)
      .where(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version")
    StreamingCurate.ingestBatch(crashed, batchId = 1L, root)
    // ... and a NEW source commit lands BEFORE the retry — the case a
    // range pull keyed by its endpoint got wrong (it re-ingested v1's
    // rows under batch_id=2, which the keyed dedup cannot collapse)
    src.append(docs.filter(col("doc_id") % 3 === 2))
    // the retry consumes v1 (replayed under the SAME batch_id=1, so the
    // keyed dedup collapses it) and then v2, one commit at a time
    assert(StreamingCurate.pullFromDelta(spark, srcRoot, root).contains(2L))
    // caught up: no new commits -> no-op
    assert(StreamingCurate.pullFromDelta(spark, srcRoot, root).isEmpty)

    val served = StreamingCurate.serve(spark, root).collect().map(key).toSet
    val batch = Curate.curate(spark, sfDir).collect().map(key).toSet
    assert(served == batch, s"served ${served.size} rows != batch ${batch.size}")

    // a second crash-replay of v2 verbatim is also collapsed
    val replayed = src.changes(spark, 1L, 2L)
      .where(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version")
    StreamingCurate.ingestBatch(replayed, batchId = 2L, root)
    assert(StreamingCurate.pullFromDelta(spark, srcRoot, root).isEmpty)
    val afterReplay = StreamingCurate.serve(spark, root).collect().map(key).toSet
    assert(afterReplay == batch, "replayed pull changed the served corpus")
  }
}
