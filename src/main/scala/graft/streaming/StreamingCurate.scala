package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.Text
import graft.operators.{Curate, Dedup, Sampling}

/** Streaming twin of the end-to-end [[Curate.curate]] pipeline — the
  * composition the per-operator streaming twins exist FOR: a continuously
  * ingested document stream served as the same curated corpus the batch
  * pipeline produces (quality filter → exact dedup → near-dup components
  * → survivors → deterministic split).
  *
  * Ingest (per micro-batch, all map-side over the batch): quality-gate,
  * fingerprint, then append TWO narrow artifacts —
  *   docs ledger:  (doc_id, lang, n_tokens, fingerprint, batch_id)
  *   band artifact:(doc_id, band, bucket, batch_id)
  * The batch's TEXT is read exactly once, at ingest; neither artifact
  * carries it, so serving never re-reads or re-shingles history — the
  * incremental contract every artifact twin in this package shares.
  *
  * Serve folds the ledgers: exact-dedup survivors are the min-id row per
  * fingerprint over the WHOLE ledger (so survivor choice is identical to
  * the batch pipeline no matter how documents were split across
  * micro-batches — a first-arrival-wins ingest would diverge the moment
  * a duplicate's smaller doc_id arrived later), then near-dup CC runs
  * over the persisted bands of those survivors via
  * [[Dedup.connectedComponentsFromBands]] (per-doc signatures are
  * independent, so filtering the band artifact to survivors equals
  * banding the survivor corpus). Delivery is the [[StreamingTrending]]
  * contract: foreachBatch is at-least-once, partials carry `batch_id`,
  * and serve collapses replays with a keyed dedup before folding. */
object StreamingCurate {

  private def docsPath(root: String) = s"$root/docs"
  private def bandsPath(root: String) = s"$root/bands"

  /** One micro-batch's artifact rows: the quality-gated slice of `batch`
    * (which must carry doc_id, lang, text), fingerprinted and banded.
    * Package-visible so the spec can simulate a crash BETWEEN artifact
    * append and cursor advance (the at-least-once window
    * [[pullFromDelta]]'s replay contract covers). */
  private[streaming] def ingestBatch(batch: DataFrame, batchId: Long,
      root: String): Unit = {
    val quality = batch
      .withColumn("n_tokens", Text.tokenCount(col("text")))
      .filter(col("n_tokens") >= Curate.MinTokens)
      .localCheckpoint(false) // two consumers; never re-read the stream source
    quality
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        Text.fingerprint(col("text")).as("fingerprint"),
        lit(batchId).as("batch_id"))
      .write.mode("append").parquet(docsPath(root))
    Dedup.minhashBandsOf(quality.select(col("doc_id"), col("text")))
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(bandsPath(root))
  }

  /** Start the ingest: `incoming` must carry (doc_id, lang, text). */
  def start(incoming: DataFrame, root: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = incoming.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, root)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** Incremental ingest FROM a Delta table — the open-format source the
    * r11 Delta sink was missing its mirror of: pull ONLY the source
    * commits past this consumer's high-water mark into the curate
    * artifacts, so a corpus landed via [[StreamingDelta.sink]] feeds
    * curation without any consumer ever re-reading (or re-shingling)
    * history. The mark is a `txn` water-mark on a tiny CURSOR Delta
    * table under the artifact root ([[graft.lake.DeltaTable
    * .appendIdempotent]]'s primitive, pointed at bookkeeping).
    *
    * Commits are consumed ONE SOURCE VERSION AT A TIME, with
    * batch_id = that commit version and the cursor advanced after each:
    * artifact append happens FIRST, cursor advance second, so a crash
    * between them replays exactly one commit — under the SAME batch_id
    * it used the first time, because the batch_id is the commit's own
    * version, never the pull's end-of-range. (A range pull keyed by its
    * endpoint broke replay: crash after ingesting (mark, v1] as
    * batch_id=v1, let a fresh commit land, and the retry re-ingested
    * the same rows as batch_id=v2 — serve's `(batch_id, doc_id)` dedup
    * cannot collapse cross-batch duplicates, so the served corpus
    * duplicated rows.) Per-commit granularity costs one job pair per
    * source commit when catching up — the source's own write
    * granularity, and the only unit with stable replay keys.
    * Returns the newest source version consumed, or None when caught
    * up. */
  def pullFromDelta(spark: SparkSession, sourceRoot: String, root: String,
      consumerId: String = "curate"): Option[Long] = {
    import graft.lake.DeltaTable
    val src = DeltaTable(sourceRoot)
    val cursor = DeltaTable(s"$root/_cursor")
    val latest = src.latestVersion.getOrElse(return None)
    val mark =
      if (cursor.latestVersion.isEmpty) -1L
      else cursor.txnVersion(consumerId).getOrElse(-1L)
    if (latest <= mark) return None
    import spark.implicits._
    var v = mark + 1
    while (v <= latest) {
      val fresh = src.changes(spark, v - 1, v)
        .where(col("_change_type") === "insert")
        .drop("_change_type", "_commit_version")
      ingestBatch(fresh, batchId = v, root)
      cursor.appendIdempotent(
        Seq((consumerId, v)).toDF("consumer", "source_version"),
        consumerId, v)
      v += 1
    }
    Some(latest)
  }

  /** The curated corpus over everything ever ingested — row-identical to
    * [[Curate.curate]] on the same documents. */
  def serve(spark: SparkSession, root: String,
      ccIterations: Int = 3): DataFrame = {
    val ledger = spark.read.parquet(docsPath(root))
      .dropDuplicates("batch_id", "doc_id") // at-least-once replay guard
    val survivors = ledger
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(col("fingerprint"))))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"))
    val bands = spark.read.parquet(bandsPath(root))
      .dropDuplicates("batch_id", "doc_id", "band")
      .select(col("doc_id"), col("band"), col("bucket"))
      .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi")
    // ccIterations <= 0: the fixpoint-certified form (same convention as
    // Curate.curate, so streamed serve stays row-identical to batch)
    val cc =
      if (ccIterations <= 0) Dedup.connectedComponentsFromBandsCertified(bands)
      else Dedup.connectedComponentsFromBands(bands, ccIterations)
    survivors.join(cc, "doc_id")
      .filter(col("cluster_id") === col("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        Sampling.hashBucket(col("doc_id")).as("bucket"))
      .withColumn("split", Sampling.splitExpr(col("bucket")))
  }
}
