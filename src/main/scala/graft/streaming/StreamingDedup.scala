package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Streaming exact deduplication for a continuously-ingested document
  * stream — the streaming shape of [[graft.operators.Dedup.exactDedup]]
  * (BASELINE.json north star: dedup as a first-class pipeline stage).
  *
  * The FIRST arrival of each normalized-text fingerprint is emitted;
  * duplicates arriving within the watermark delay are dropped.
  * `dropDuplicatesWithinWatermark` bounds state the way a 100 TB/day
  * ingest needs: a fingerprint's state row is evicted once the watermark
  * passes its event time + delay, so state is O(documents per delay
  * window), independent of stream length — a plain `dropDuplicates`
  * would accumulate every fingerprint ever seen. The trade is explicit:
  * a duplicate arriving AFTER its original's state expired is emitted
  * again (cross-window dedup belongs to a downstream batch
  * [[graft.operators.Dedup.exactDedup]] compaction pass).
  */
object StreamingDedup {

  /** `docs` must carry (text, ts). Returns the deduplicated stream with
    * the fingerprint column attached; write with outputMode("append"). */
  def dedupStream(docs: DataFrame, delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint", Text.fingerprint(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fingerprint")
}
