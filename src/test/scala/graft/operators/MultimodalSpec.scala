package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** Multimodal plumbing: the codec is a declared stub, but the schema,
  * mapPartitions batch shape and feature math are real and asserted. */
class MultimodalSpec extends SparkSpec {

  test("FakeCodec is deterministic and length-driven") {
    val m1 = Multimodal.FakeCodec.decode(7L, "hello world".getBytes("UTF-8"))
    val m2 = Multimodal.FakeCodec.decode(7L, "hello world".getBytes("UTF-8"))
    assert(m1 == m2 && m1.n_bytes == 11
      && m1.width == (11 % 640) + 1 && m1.height == (11 % 480) + 1)
  }

  test("FakeCodec.sampleFrames: stride and cap") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val frames = Multimodal.FakeCodec.sampleFrames(bytes, stride = 10, max = 5)
    assert(frames.length == 5 && frames(0) == 0.toByte && frames(1) == 10.toByte)
  }

  test("decodeMeta covers every document with a typed row") {
    val docs = Tables(spark, sfDir, "documents")
    val meta = Multimodal.decodeMeta(spark, sfDir)
    assert(meta.count() == docs.count())
    assert(meta.toDF().columns.toSeq ==
      Seq("doc_id", "n_bytes", "format", "width", "height", "n_frames"))
  }

  test("byte histogram: 16 flat count columns that sum to n_bytes per row") {
    val h = Multimodal.byteHistogramFeatures(spark, sfDir)
    assert(h.columns.toSeq == "doc_id" +: "n_bytes" +: (0 until 16).map(k => s"h$k"))
    val mismatch = h.filter(
      (0 until 16).map(k => col(s"h$k")).reduce(_ + _) =!= col("n_bytes"))
    assert(mismatch.count() == 0)
  }

  test("resize grid: box-filter means per cell; cell values bounded by byte range") {
    val r = Multimodal.resizeFeatures(spark, sfDir)
    assert(r.columns.toSeq == "doc_id" +: (0 until 16).map(k => s"t$k"))
    assert(r.count() > 0)
    // every cell mean is a valid byte average (and non-null: payloads
    // shorter than the grid were filtered out)
    (0 until 16).foreach { k =>
      val bad = r.filter(col(s"t$k").isNull ||
        col(s"t$k") < 0 || col(s"t$k") > 255)
      assert(bad.count() == 0, s"cell t$k out of range")
    }
    // spot check: the exact codec arithmetic on one real payload
    import spark.implicits._
    val doc = graft.lake.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].head()
    val bytes = doc._2.getBytes("UTF-8")
    val n = bytes.length
    val expected0 = {
      val cell = bytes.zipWithIndex.filter { case (_, i) => i.toLong * 16 / n == 0 }
      val m = cell.map(_._1 & 0xff).sum.toDouble / cell.length
      BigDecimal(m).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = r.filter(col("doc_id") === doc._1).select("t0").head().getDouble(0)
    assert(got == expected0, s"t0 $got != $expected0")
  }
}
