package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables
import graft.operators.TimeSeries

/** Streaming decayed-demand: rebased additive partials fold to the batch
  * operator's report, and replayed batches dedup away. */
class StreamingTrendingSpec extends SparkSpec {

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getInt(3))).sortBy(_._4).toSeq

  test("streamed partials fold to the batch decayed-demand report") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("trend").toString
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_shipdate"))
    val cut = "1998-01-01"
    val batches = Seq(li.filter(col("l_shipdate") < cut),
      li.filter(col("l_shipdate") >= cut))
    assert(batches.forall(_.count() > 0))

    val mem = MemoryStream[(Long, Timestamp)]
    val q = StreamingTrending.start(
      mem.toDF().toDF("l_partkey", "l_shipdate"), s"$tmp/partials")
    try {
      batches.foreach { b =>
        mem.addData(b.as[(Long, Timestamp)].collect().toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = report(StreamingTrending.serve(spark, s"$tmp/partials", 180))
    val batch = report(TimeSeries.decayedDemand(li, 180, 100))
    assert(streamed.length == batch.length)
    // same items in the same rank order; scores equal up to the rebase
    // identity's float noise (2^a * 2^b vs 2^(a+b)), well under 1e-3
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s._1 == b._1 && s._2 == b._2 && s._4 == b._4, s"$s vs $b")
      assert(math.abs(s._3 - b._3) < 1e-3, s"$s vs $b")
    }
  }

  test("replayed batch partials dedup on (batch_id, item)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("trendrp").toString
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_shipdate")).limit(500)
    // same batch id written twice — an at-least-once replay
    StreamingTrending.batchPartial(li, 7L, 180)
      .write.mode("append").parquet(s"$tmp/p")
    val once = report(StreamingTrending.serve(spark, s"$tmp/p", 180))
    StreamingTrending.batchPartial(li, 7L, 180)
      .write.mode("append").parquet(s"$tmp/p")
    val twice = report(StreamingTrending.serve(spark, s"$tmp/p", 180))
    assert(once == twice, "replay must not change the report")
  }
}
