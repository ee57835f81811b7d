package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming exact dedup: first-arrival wins, duplicates within the
  * watermark are dropped, and state EXPIRES — a fingerprint seen again
  * long after its original is re-emitted (bounded state, documented
  * trade). */
class StreamingDedupSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("dedupStream: drops in-window duplicates (normalized), expires state past the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val out = mutable.Buffer[Row]()
    val q = StreamingDedup.dedupStream(docs, "10 minutes")
      .select("doc_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= batch.collect() }; ()
      }
      .start()
    try {
      def ids = out.synchronized(out.map(_.getLong(0)).toSet)
      // same fingerprint (whitespace-normalized) twice + one distinct doc
      mem.addData((1L, "the same document", ts(0)),
        (2L, "the  SAME   document", ts(2)), (3L, "a different one", ts(1)))
      q.processAllAvailable()
      assert(ids == Set(1L, 3L), s"expected first arrivals only, got $ids")

      // advance the watermark far past ts(0)+10min
      mem.addData((4L, "advancing the clock", ts(60)))
      q.processAllAvailable()
      // duplicate of doc 1 after expiry: state is gone -> re-emitted
      mem.addData((5L, "the same document", ts(61)))
      q.processAllAvailable()
      assert(ids.contains(5L), "expired fingerprint must be re-emitted (state bounded)")
      // state holds only fingerprints within the live window
      val st = q.lastProgress.stateOperators(0)
      assert(st.numRowsTotal <= 3, s"state not bounded: ${st.numRowsTotal} rows")
    } finally q.stop()
  }
}
