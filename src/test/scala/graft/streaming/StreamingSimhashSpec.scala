package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables
import graft.operators.Dedup

/** Streaming SimHash twin: micro-batches probing the persisted chunk
  * artifact produce EXACTLY the pairs the batch-incremental operator finds
  * when replayed over the same deltas, and the chunk table accumulates to
  * the full corpus' chunks (so no history is ever re-hashed). */
class StreamingSimhashSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed union of micro-batch deltas == batch-incremental replay") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("simhashstream").toString
    val (chunksPath, pairsPath) = (s"$tmp/chunks", s"$tmp/pairs")

    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 300)
    val delta1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val delta2 = docs.filter(col("doc_id") >= 400)

    // day 0: the corpus chunk table is a persisted artifact
    Dedup.simhashChunksOf(corpus).write.parquet(chunksPath)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingSimhash.start(
      mem.toDF().toDF("doc_id", "text"), chunksPath, pairsPath)
    try {
      mem.addData(delta1.as[(Long, String)].collect().toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(delta2.as[(Long, String)].collect().toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = pairSet(spark.read.parquet(pairsPath))
    val expected =
      pairSet(Dedup.incrementalSimhashFromChunks(
        Dedup.simhashChunksOf(corpus), Dedup.simhashChunksOf(delta1))) ++
      pairSet(Dedup.incrementalSimhashFromChunks(
        Dedup.simhashChunksOf(corpus.unionByName(delta1)),
        Dedup.simhashChunksOf(delta2)))
    assert(streamed == expected,
      s"streamed-only=${(streamed -- expected).take(5)} " +
        s"missing=${(expected -- streamed).take(5)}")

    // the chunk artifact now covers the whole corpus — identical to
    // chunking all documents in one batch
    val chunkSet = spark.read.parquet(chunksPath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val fullSet = Dedup.simhashChunksOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(chunkSet == fullSet, "accumulated chunk table must equal full-corpus chunks")
  }

  test("incremental + within-delta pairs decompose the full batch pair set") {
    import spark.implicits._
    // planted fingerprint-identical copies across the corpus/delta split:
    // batch over everything == corpus-only ∪ incremental(corpus, delta)
    val base = (10 until 40).map(i => (i.toLong, s"filler$i distinct words number $i"))
    val copies = Seq(1L, 2L, 101L, 102L).map(id => (id, "same exact duplicated text here"))
    val all = spark.createDataFrame(base ++ copies).toDF("doc_id", "text")
    val corpus = all.filter(col("doc_id") < 100)
    val delta  = all.filter(col("doc_id") >= 100)
    val full = pairSet(Dedup.simhashNearDupPairsOf(all))
    val decomposed =
      pairSet(Dedup.simhashNearDupPairsOf(corpus)) ++
      pairSet(Dedup.incrementalSimhashFromChunks(
        Dedup.simhashChunksOf(corpus), Dedup.simhashChunksOf(delta)))
    assert(decomposed == full,
      s"extra=${(decomposed -- full).take(5)} missing=${(full -- decomposed).take(5)}")
    // the planted cross pair is present with hamming 0
    val inc = Dedup.incrementalSimhashFromChunks(
      Dedup.simhashChunksOf(corpus), Dedup.simhashChunksOf(delta)).collect()
    assert(inc.exists(r => r.getLong(0) == 1L && r.getLong(1) == 101L
      && r.getInt(2) == 0))
  }

  test("ensureChunkTable: fresh path gets an empty readable chunk table") {
    val tmp = java.nio.file.Files.createTempDirectory("simhashstream0").toString
    StreamingSimhash.ensureChunkTable(spark, s"$tmp/chunks")
    val df = spark.read.parquet(s"$tmp/chunks")
    assert(df.schema == StreamingSimhash.ChunkSchema && df.count() == 0)
  }
}
