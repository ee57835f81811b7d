package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables
import graft.operators.Drift

/** Streaming KS drift: additive value-census partials fold to the exact
  * batch statistic, and replays dedup away. */
class StreamingDriftSpec extends SparkSpec {

  test("streamed current-side batches fold to the batch KS statistic; replay dedups") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ksdrift").toString
    val orders = Tables(spark, sfDir, "orders")
    val ref = orders.filter(col("o_orderstatus") === "F")
    val cur = orders.filter(col("o_orderstatus") === "O")
      .select(col("o_totalprice"))
    StreamingDrift.writeReference(ref, "o_totalprice", s"$tmp/ref")

    val batches = Seq(cur.filter(col("o_totalprice") < 150000),
      cur.filter(col("o_totalprice") >= 150000))
    assert(batches.forall(_.count() > 0))
    val mem = MemoryStream[Double]
    val q = StreamingDrift.start(mem.toDF().toDF("o_totalprice"),
      "o_totalprice", s"$tmp/p")
    try {
      batches.foreach { b =>
        mem.addData(b.as[Double].collect().toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = StreamingDrift.serve(spark, s"$tmp/ref", s"$tmp/p")
      .collect()(0)
    val batch = Drift.ksStatistic(ref,
      orders.filter(col("o_orderstatus") === "O"), "o_totalprice")
      .collect()(0)
    assert((streamed.getLong(0), streamed.getLong(1), streamed.getDouble(2)) ==
      ((batch.getLong(0), batch.getLong(1), batch.getDouble(2))),
      s"$streamed vs $batch")

    // replay: re-append batch 0's partial under the same batch_id
    StreamingDrift.batchPartial(batches.head.toDF("o_totalprice"),
      "o_totalprice", 0L).write.mode("append").parquet(s"$tmp/p")
    val replayed = StreamingDrift.serve(spark, s"$tmp/ref", s"$tmp/p")
      .collect()(0)
    assert(replayed.getDouble(2) == streamed.getDouble(2) &&
      replayed.getLong(1) == streamed.getLong(1), "replay must not change KS")
  }
}
