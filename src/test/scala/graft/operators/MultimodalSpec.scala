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

  test("dhashSignature: bit-parity with a brute-force recompute; short payloads dropped") {
    import spark.implicits._
    val payload = (0 until 200).map(i => ((i * 37 + 11) % 251).toByte).toArray
    val media = Seq((1L, payload), (2L, Array.fill(10)(7.toByte)))
      .toDF("doc_id", "payload")
    val got = Multimodal.dhashSignatureOf(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L), got.toString) // doc 2 shorter than grid
    // brute force: 61 box-filter cells, bit j = mean(j) > mean(j+1)
    val cells = 61
    val sums = new Array[Long](cells); val cnts = new Array[Long](cells)
    payload.zipWithIndex.foreach { case (b, i) =>
      val k = (i.toLong * cells / payload.length).toInt
      sums(k) += b & 0xff; cnts(k) += 1
    }
    val expect = (0 until 60).map { j =>
      if (sums(j).toDouble / cnts(j) > sums(j + 1).toDouble / cnts(j + 1))
        1L << j else 0L
    }.sum
    assert(got(1L) == expect, s"${got(1L)} != $expect")
    assert(got(1L) > 0L, "fixture must set some bits")
  }

  test("phashPairs: planted near-identical payloads found, distant payloads not paired") {
    import spark.implicits._
    val base = (0 until 400).map(i => ((i * 53 + 29) % 241).toByte).toArray
    // near-dup: flip a handful of bytes inside ONE cell region — at most
    // a couple of dHash bits move
    val near = base.clone(); (0 until 3).foreach(i => near(i) = 0.toByte)
    // far: reversed payload — cell profile scrambled
    val far = base.reverse
    val media = Seq((1L, base), (2L, near), (3L, far))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.phashPairsOf(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"near pair missing: $pairs")
    assert(pairs.forall(p => !(p._2 == 3L || p._1 == 3L)),
      s"far payload must not pair: $pairs")
    assert(pairs.forall(_._3 <= 3))
    // identical payloads collapse at distance 0
    val dup = Seq((1L, base), (2L, base.clone())).toDF("doc_id", "payload")
    val d0 = Multimodal.phashPairsOf(dup).collect()
    assert(d0.length == 1 && d0(0).getInt(2) == 0, d0.mkString(","))
  }
}
