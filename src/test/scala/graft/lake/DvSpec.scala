package graft.lake

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Deletion-vector serialization fidelity: the RoaringBitmapArray
  * portable format + Roaring 32-bit containers + the DV file framing
  * must round-trip exactly, verify checksums, and fail loudly on every
  * structural surprise. Pure JVM, no SparkSession needed. */
class DvSpec extends AnyFunSuite {

  private def rt(rows: Array[Long]): Unit = {
    val got = DeletionVectors.deserialize(DeletionVectors.serialize(rows))
    assert(got.toSeq == rows.toSeq, s"roundtrip lost rows (n=${rows.length})")
  }

  test("bitmap roundtrip: array containers, sparse and dense-ish") {
    rt(Array(0L))
    rt(Array(0L, 1L, 2L, 63L, 64L, 65L, 4095L, 4096L))
    rt((0L until 4096L).toArray)              // exactly the array-container cap
    rt(Array(65535L, 65536L, 131071L))        // container-key boundaries
  }

  test("bitmap roundtrip: BITMAP container (cardinality > 4096 in one chunk)") {
    rt((0L until 9000L).toArray)              // first chunk becomes a bitmap
    rt((0L until 70000L by 3L).toArray)       // mixed array + bitmap chunks
  }

  test("bitmap roundtrip: high-32-bit buckets (the 64-bit array layer)") {
    rt(Array(5L, (1L << 32) + 7L, (1L << 32) + 8L, (3L << 32)))
  }

  test("unsorted / duplicate / negative input refuses loudly") {
    intercept[IllegalArgumentException](DeletionVectors.serialize(Array(2L, 1L)))
    intercept[IllegalArgumentException](DeletionVectors.serialize(Array(1L, 1L)))
    intercept[IllegalArgumentException](DeletionVectors.serialize(Array(-1L)))
    intercept[IllegalArgumentException](DeletionVectors.serialize(Array.emptyLongArray))
  }

  test("bad magic and run-container cookie refuse loudly") {
    val good = DeletionVectors.serialize(Array(1L, 2L, 3L))
    val badMagic = good.clone(); badMagic(0) = (badMagic(0) ^ 1).toByte
    assert(intercept[IllegalArgumentException](
      DeletionVectors.deserialize(badMagic)).getMessage.contains("magic"))
    // patch the inner 32-bit cookie (bytes 16..19: magic 4 + count 8 + key 4)
    val runCookie = good.clone()
    runCookie(16) = (12346 & 0xff).toByte
    runCookie(17) = ((12346 >> 8) & 0xff).toByte
    assert(intercept[IllegalArgumentException](
      DeletionVectors.deserialize(runCookie)).getMessage.contains("run"))
  }

  test("Z85 roundtrip and invalid input") {
    val bytes = Array.tabulate(32)(i => (i * 37 + 5).toByte)
    assert(DeletionVectors.unz85(DeletionVectors.z85(bytes)).toSeq == bytes.toSeq)
    intercept[IllegalArgumentException](DeletionVectors.z85(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](DeletionVectors.unz85("abc"))
    intercept[IllegalArgumentException](DeletionVectors.unz85("ab\"de"))
  }

  test("DV file: multi-DV write, offset addressing, CRC verify, descriptor JSON") {
    val root = java.nio.file.Files.createTempDirectory("dvspec").toString
    val a = Array(1L, 5L, 9L)
    val b = (0L until 5000L).toArray
    val (_, descs) = DeletionVectors.writeFile(root, Seq(a, b))
    assert(descs.size == 2 && descs.forall(_.storageType == "u"))
    assert(descs(0).cardinality == 3 && descs(1).cardinality == 5000)
    assert(descs(0).pathOrInlineDv == descs(1).pathOrInlineDv) // shared file
    // JSON roundtrip preserves every protocol field
    val back = descs.map(d => DeletionVectors.fromJson(DeletionVectors.toJson(d)))
    assert(back == descs)
    assert(DeletionVectors.read(root, descs(0)).toSeq == a.toSeq)
    assert(DeletionVectors.read(root, descs(1)).toSeq == b.toSeq)
    // corrupt one payload byte -> CRC refuses
    val uuid = {
      val enc = descs.head.pathOrInlineDv
      enc.substring(enc.length - 20)
    }
    val file = java.nio.file.Files.list(java.nio.file.Paths.get(root))
      .iterator().next()
    val bytes = java.nio.file.Files.readAllBytes(file)
    bytes(descs(0).offset.get + 4 + 2) = (bytes(descs(0).offset.get + 4 + 2) ^ 1).toByte
    java.nio.file.Files.write(file, bytes)
    assert(intercept[IllegalArgumentException](
      DeletionVectors.read(root, descs(0))).getMessage.contains("CRC"))
    // ...but the OTHER DV in the same file still reads (independent CRC)
    assert(DeletionVectors.read(root, descs(1)).length == 5000)
  }

  test("inline storage: bitmap rides the descriptor itself, any alignment") {
    // sweep cardinalities so the serialized length hits every mod-4
    // residue (array containers are 2-byte units — Z85 padding must
    // round-trip exactly via sizeInBytes truncation)
    for (n <- 1 to 9) {
      val rows = (0 until n).map(i => i.toLong * 7 + 3).toArray
      val d = DeletionVectors.inline(rows)
      assert(d.storageType == "i" && d.offset.isEmpty)
      assert(DeletionVectors.read("/nonexistent", d).toSeq == rows.toSeq, s"n=$n")
    }
  }

  test("descriptorsFor: small DVs inline, large ones share one file, input order kept") {
    val root = java.nio.file.Files.createTempDirectory("dvspec2").toString
    val small = Array(1L, 2L, 3L)
    val big = (0L until 6000L).toArray // bitmap container: > InlineMaxBytes
    val small2 = Array(9L)
    val ds = DeletionVectors.descriptorsFor(root, Seq(small, big, small2))
    assert(ds.map(_.storageType) == Seq("i", "u", "i"))
    assert(ds.map(_.cardinality) == Seq(3L, 6000L, 1L))
    assert(DeletionVectors.read(root, ds(0)).toSeq == small.toSeq)
    assert(DeletionVectors.read(root, ds(1)).toSeq == big.toSeq)
    assert(DeletionVectors.read(root, ds(2)).toSeq == small2.toSeq)
    // exactly ONE .bin on disk (the two inline DVs wrote nothing)
    val bins = java.nio.file.Files.list(java.nio.file.Paths.get(root))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("deletion_vector_")).toSeq
    assert(bins.size == 1, bins)
    // an all-small batch writes NO file at all
    val root2 = java.nio.file.Files.createTempDirectory("dvspec3").toString
    val ds2 = DeletionVectors.descriptorsFor(root2, Seq(small, small2))
    assert(ds2.forall(_.storageType == "i"))
    assert(!java.nio.file.Files.list(java.nio.file.Paths.get(root2))
      .iterator().hasNext)
  }
}
