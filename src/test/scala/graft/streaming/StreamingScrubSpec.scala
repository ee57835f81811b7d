package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Text

/** Every map-side curation operator is streaming-ready as-is: the same
  * Column expressions (PII scrub, quality gate, token budget) applied to a
  * stream produce exactly the batch result — no operator rewrite, no
  * state. */
class StreamingScrubSpec extends SparkSpec {

  private def scrub(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
        Text.redactPii(col("text")).as("clean"),
        Text.tokenCount(col("text")).as("n_tokens"))
      .filter(col("n_tokens") >= 3)

  test("stateless scrub pipeline: streamed micro-batches == batch result") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      (1L, "mail me at bob@example.com for the data"),
      (2L, "ssn 123-45-6789 leaked in this doc"),
      (3L, "too short"),                              // 2 tokens -> dropped
      (4L, "server 10.1.2.3 answered +1 555-867-5309 yesterday"))

    val mem = MemoryStream[(Long, String)]
    val q = scrub(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("scrub_mem")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("scrub_mem").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = scrub(rows.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
    assert(batch.exists(_._2.contains("<EMAIL>"))
      && batch.exists(_._2.contains("<SSN>"))
      && batch.exists(t => t._2.contains("<IP>") && t._2.contains("<PHONE>")))
    assert(!batch.exists(_._1 == 3L))
  }
}
