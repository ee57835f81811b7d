package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.lake.{Ingest, LakePaths, Readers, Tables, Writers}
import graft.operators._
import graft.streaming.{Alerts, Funnel, Sessions}
import RegistryShared._

/** Registry slice — multimodal binary columns: metadata, histograms, frames, resize, dHash near-dup.
  * Split out of SparkEntry (same conventions; see SparkEntry scaladoc). */
object MultimodalRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- multimodal (north star; codec stubbed, plumbing real)
    "q_mm_meta" -> ((s, d) => Multimodal.mediaMeta(s, d)),
    "q_mm_hist" -> ((s, d) => Multimodal.byteHistogramFeatures(s, d)),
    "q_mm_resize" -> ((s, d) => Multimodal.resizeFeatures(s, d)),
    "q_mm_frames" -> ((s, d) => Multimodal.frameSampleFeatures(s, d)),
    // 1-D dHash fingerprint — exact integer cell-mean comparisons
    "q_mm_phash" -> ((s, d) => Multimodal.dhashSignature(s, d)),
    // multimodal near-dup pairs: dHash through the SimHash chunk banding
    "q_mm_phash_pairs" -> ((s, d) => Multimodal.phashPairs(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q_mm_phash" ->
      s"""WITH sigs AS ($phashCoreSql)
         |SELECT doc_id, simhash AS phash FROM sigs""".stripMargin,
    "q_mm_phash_pairs" -> bandedHammingPairsSql(phashCoreSql),

    "q_mm_hist" -> mmHistSql,
    // ASCII corpus (verified): byte == char code, so ascii(substr(..)) in
    // the oracle mirrors the codec's byte reads exactly
    "q_mm_resize" -> {
      val cols = (0 until 16).map(k =>
        s"max(CASE WHEN chunk = $k THEN v END) AS t$k").mkString(",\n         |  ")
      s"""WITH b AS (
         |  SELECT doc_id, (CAST(i - 1 AS BIGINT) * 16) // length(text) AS chunk,
         |    ascii(substr(text, i, 1)) AS code
         |  FROM documents, unnest(range(1, len(text) + 1)) AS t(i)
         |  WHERE length(text) >= 16),
         |c AS (
         |  SELECT doc_id, chunk, round(avg(code), 4) AS v
         |  FROM b GROUP BY doc_id, chunk)
         |SELECT doc_id,
         |  $cols
         |FROM c GROUP BY doc_id""".stripMargin
    },
    // frame sample: byte at 0-based position 16*i is the hex-digit pair at
    // (32*i+1, 32*i+2); count = min(ceil(n/16), 8) — mirrors
    // FakeCodec.sampleFrames(stride=16, max=8).
    "q_mm_frames" ->
      """WITH h AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_transform(range(0, CAST(least(ceil(n / 16.0), 8) AS BIGINT)),
        |      i -> (instr('0123456789ABCDEF', substring(hx, 32 * i + 1, 1)) - 1) * 16
        |         + (instr('0123456789ABCDEF', substring(hx, 32 * i + 2, 1)) - 1)) AS fb
        |  FROM h)
        |SELECT doc_id, CAST(len(fb) AS INTEGER) AS n_sampled,
        |  CAST(list_sum(fb) AS BIGINT) AS checksum
        |FROM s""".stripMargin,

    "q_mm_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'png'
        |       WHEN octet_length(encode(text)) % 3 = 1 THEN 'jpeg'
        |       ELSE 'webp' END AS format,
        |  CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) % 24 + 1 AS INTEGER) AS n_frames
        |FROM documents""".stripMargin,
  )
}
