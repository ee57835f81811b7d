package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.lake.Readers

/** Streaming JSONL ingest: files landing in the directory become
  * micro-batches, each file ingested exactly once. */
class JsonlStreamSpec extends SparkSpec {

  test("new JSONL files are picked up incrementally, exactly once") {
    val dir = Files.createTempDirectory("graft-jsonl-stream").toString
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    Files.writeString(Paths.get(dir, "a.json"),
      """{"doc_id":1,"text":"aa"}
        |{"doc_id":2,"text":"bb"}
        |""".stripMargin)

    val q = Readers.jsonlStream(spark, dir, schema)
      .writeStream.format("memory").queryName("jsonl_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_mem").count() == 2)

      // a later drop is a new micro-batch; the old file is not re-read
      Files.writeString(Paths.get(dir, "b.json"),
        """{"doc_id":3,"text":"cc"}
          |""".stripMargin)
      q.processAllAvailable()
      val ids = spark.table("jsonl_mem").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
