package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables
import graft.operators.Dedup

/** Streaming containment twin: micro-batches probing the persisted
  * postings/probes/dfstats artifacts produce EXACTLY the pairs the
  * batch-incremental operator finds when replayed over the same deltas,
  * and a single batch over a fresh index reproduces the batch operator. */
class StreamingContainmentSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def seedIndex(docs: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    val sets = Dedup.shingleSetRelation(docs)
    val postings = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
    postings.write.parquet(s"$dir/postings")
    Dedup.containmentProbeRelation(sets).write.parquet(s"$dir/probes")
    postings.groupBy(col("shingle")).agg(count(lit(1)).as("n"))
      .write.parquet(s"$dir/dfstats")
  }

  test("single batch over a fresh index == the batch containment-LSH operator") {
    val tmp = java.nio.file.Files.createTempDirectory("contain0").toString
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    StreamingContainment.ensureIndex(spark, s"$tmp/idx")
    val fromEmpty = Dedup.incrementalContainmentPairs(
      spark.read.schema(StreamingContainment.PostingSchema).parquet(s"$tmp/idx/postings"),
      spark.read.schema(StreamingContainment.PostingSchema).parquet(s"$tmp/idx/probes"),
      spark.read.schema(StreamingContainment.DfSchema).parquet(s"$tmp/idx/dfstats"),
      docs, 0.6)
    val batch = Dedup.containmentLshPairsOf(docs, 0.6)
    assert(pairSet(fromEmpty) == pairSet(batch))
    assert(pairSet(batch).nonEmpty, "fixture must contain containment pairs")
  }

  test("streamed union of micro-batch deltas == batch-incremental replay; both probe directions fire") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("contain").toString
    val (indexDir, pairsPath) = (s"$tmp/idx", s"$tmp/pairs")

    // planted pairs exercising BOTH probe directions across the split:
    // small doc 500 (delta) inside host 1 (corpus) — delta probes corpus;
    // small doc 2 (corpus) inside host 501 (delta) — corpus probes delta
    val subA = (0 until 30).map(i => s"suba$i").mkString(" ")
    val subB = (0 until 30).map(i => s"subb$i").mkString(" ")
    val hostA = ((0 until 200).map(i => s"pada$i") :+ subA).mkString(" ")
    val hostB = ((0 until 200).map(i => s"padb$i") :+ subB).mkString(" ")
    val fillers = (10 until 60).map(i =>
      (i.toLong, s"filler$i words nothing shared here at all index $i"))
    val corpusRows = Seq((1L, hostA), (2L, subB)) ++ fillers.take(25)
    val delta1Rows = Seq((500L, subA)) ++ fillers.slice(25, 40)
    val delta2Rows = Seq((501L, hostB)) ++ fillers.slice(40, 50)

    val corpus = corpusRows.toDF("doc_id", "text")
    val delta1 = delta1Rows.toDF("doc_id", "text")
    val delta2 = delta2Rows.toDF("doc_id", "text")
    seedIndex(corpus, indexDir)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingContainment.start(
      mem.toDF().toDF("doc_id", "text"), indexDir, pairsPath, threshold = 0.9)
    try {
      mem.addData(delta1Rows: _*)
      q.processAllAvailable()
      mem.addData(delta2Rows: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = pairSet(spark.read.parquet(pairsPath))
    def replayStep(ex: org.apache.spark.sql.DataFrame,
        inc: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val sets = Dedup.shingleSetRelation(ex)
      pairSet(Dedup.incrementalContainmentPairs(
        sets.select(col("doc_id"), explode(col("sh")).as("shingle")),
        Dedup.containmentProbeRelation(sets),
        sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
          .groupBy(col("shingle")).agg(count(lit(1)).as("n")),
        inc, 0.9))
    }
    val expected = replayStep(corpus, delta1) ++
      replayStep(corpus.unionByName(delta1), delta2)
    assert(streamed == expected,
      s"streamed-only=${(streamed -- expected).take(5)} " +
        s"missing=${(expected -- streamed).take(5)}")
    // both planted subset pairs surfaced, one per probe direction
    assert(streamed.contains((1L, 500L)), "delta-probes-corpus pair missing")
    assert(streamed.contains((2L, 501L)), "corpus-probes-delta pair missing")
  }
}
