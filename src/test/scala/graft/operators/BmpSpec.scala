package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Real-codec fidelity: [[BmpCodec]] must parse genuine BMP bytes —
  * header fields, bottom-up row order, 4-byte row padding, BGR channel
  * order — exactly, and fail loudly on anything else. Pure JVM, no
  * SparkSession needed. */
class BmpSpec extends AnyFunSuite {

  test("roundtrip: known 2x2 RGB pixels decode to exact Rec.601 luma, top-down") {
    // top-down plant: (0,0)=pure red, (1,0)=pure green,
    //                 (0,1)=pure blue, (1,1)=white
    val px = Map((0, 0) -> (255, 0, 0), (1, 0) -> (0, 255, 0),
      (0, 1) -> (0, 0, 255), (1, 1) -> (255, 255, 255))
    val bytes = BmpCodec.encode(2, 2, (x, y) => px((x, y)))
    val img = BmpCodec.decode(bytes)
    assert(img.width == 2 && img.height == 2)
    val luma = img.luma.map(_ & 0xff).toSeq
    // integer Rec.601: red 299*255/1000=76, green 587*255/1000=149,
    // blue 114*255/1000=29, white 255; row-major TOP-DOWN
    assert(luma == Seq(76, 149, 29, 255), luma.toString)
  }

  test("row padding: every stride case (w=4..7) reads the right bytes") {
    for (w <- 4 to 7; h <- Seq(3, 5)) {
      // pixel value = its top-down raster index, so any stride slip or
      // row-order flip scrambles the sequence
      val bytes = BmpCodec.encode(w, h, (x, y) => {
        val v = (y * w + x) % 256; (v, v, v) })
      val img = BmpCodec.decode(bytes)
      val got = img.luma.map(_ & 0xff).toSeq
      val want = (0 until w * h).map(i => ((i % 256) * 1000 / 1000))
      assert(got == want, s"w=$w h=$h: $got")
      assert(bytes.length == 54 + BmpCodec.rowStride(w) * h)
    }
  }

  test("negative height (top-down storage) decodes to the same image") {
    val bu = BmpCodec.encode(3, 2, (x, y) => (x * 40 + y * 100, 0, 0))
    // flip to top-down: height field negative, rows NOT mirrored
    val td = bu.clone()
    def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    putLe32(td, 22, -2)
    // rows were stored bottom-up; with top-down flag the decoder reads
    // them in storage order, so the decoded image is vertically mirrored
    val a = BmpCodec.decode(bu).luma.map(_ & 0xff).grouped(3).map(_.toSeq).toSeq
    val b = BmpCodec.decode(td).luma.map(_ & 0xff).grouped(3).map(_.toSeq).toSeq
    assert(a == b.reverse, s"$a vs $b")
  }

  test("loud failure on garbage, wrong magic, unsupported bpp, truncation") {
    intercept[IllegalArgumentException](BmpCodec.decode(Array[Byte](1, 2, 3)))
    val ok = BmpCodec.encode(4, 3, (_, _) => (1, 2, 3))
    val badMagic = ok.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](BmpCodec.decode(badMagic))
    val badBpp = ok.clone(); badBpp(28) = 8
    intercept[IllegalArgumentException](BmpCodec.decode(badBpp))
    intercept[IllegalArgumentException](BmpCodec.decode(ok.take(60)))
  }

  test("2-D dHash: identical images collide; a local brightness edit stays near; an inverted image lands far") {
    def grad(bias: Int)(x: Int, y: Int) = {
      val v = math.min(255, x * 16 + y * 8 + bias); (v, v, v) }
    val base = BmpCodec.dhash(BmpCodec.decode(BmpCodec.encode(16, 16, grad(0))))
    val same = BmpCodec.dhash(BmpCodec.decode(BmpCodec.encode(16, 16, grad(0))))
    assert(base == same)
    // uniform brightness shift: gradient ordering unchanged -> tiny distance
    val shifted = BmpCodec.dhash(BmpCodec.decode(BmpCodec.encode(16, 16, grad(10))))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(base, shifted) <= 3, s"shift moved ${ham(base, shifted)} bits")
    // inverted gradient: every neighbour comparison flips -> far
    val inv = BmpCodec.dhash(BmpCodec.decode(BmpCodec.encode(16, 16,
      (x, y) => { val v = 255 - math.min(255, x * 16 + y * 8); (v, v, v) })))
    assert(ham(base, inv) >= 30, s"inversion only moved ${ham(base, inv)} bits")
  }
}
