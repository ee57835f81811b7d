package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Real-codec fidelity: [[PngCodec]] must parse genuine PNG bytes —
  * chunk framing + CRCs, zlib IDAT, and the INVERSE of all five
  * scanline filters — exactly, and fail loudly on anything else
  * (palette, 16-bit, interlace, corrupt CRC, truncated IDAT). Pure
  * JVM, no SparkSession needed. */
class PngSpec extends AnyFunSuite {

  private def gray(v: Int) = (v, v, v, 255)

  test("roundtrip: known 2x2 RGB pixels decode to exact Rec.601 luma, top-down") {
    val px = Map((0, 0) -> (255, 0, 0, 255), (1, 0) -> (0, 255, 0, 255),
      (0, 1) -> (0, 0, 255, 255), (1, 1) -> (255, 255, 255, 255))
    val bytes = PngCodec.encode(2, 2, 2, (x, y) => px((x, y)))
    val img = PngCodec.decode(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.luma.map(_ & 0xff).toSeq == Seq(76, 149, 29, 255))
  }

  test("every filter type (0..4) inverts exactly, RGB and RGBA") {
    for (colorType <- Seq(2, 6); filter <- 0 to 4) {
      val w = 7; val h = 5
      def pix(x: Int, y: Int) = {
        val base = y * w + x
        ((base * 31) % 256, (base * 57 + 13) % 256, (base * 91 + 200) % 256,
          (base * 17 + 40) % 256)
      }
      val bytes = PngCodec.encode(w, h, colorType, pix, _ => filter)
      val img = PngCodec.decode(bytes)
      val expect = for (y <- 0 until h; x <- 0 until w) yield {
        val (r, g, b, _) = pix(x, y)
        (299 * r + 587 * g + 114 * b) / 1000
      }
      assert(img.luma.map(_ & 0xff).toSeq == expect,
        s"colorType=$colorType filter=$filter")
    }
  }

  test("mixed per-row filters invert (the cross-row Up/Average/Paeth state chain)") {
    val w = 6; val h = 10
    def pix(x: Int, y: Int) = gray((x * 37 + y * 101) % 256)
    val bytes = PngCodec.encode(w, h, 2, pix, y => y % 5)
    val img = PngCodec.decode(bytes)
    val expect = for (y <- 0 until h; x <- 0 until w)
      yield (x * 37 + y * 101) % 256
    assert(img.luma.map(_ & 0xff).toSeq == expect)
  }

  test("dHash reuses the BMP luma path: same pixels through both codecs, same signature") {
    val w = 12; val h = 16
    def rgb(x: Int, y: Int) = ((x * x + y) % 256, (x + y * y) % 256,
      (x * y + 7) % 256)
    val viaBmp = BmpCodec.decode(BmpCodec.encode(w, h, rgb))
    val viaPng = PngCodec.decode(PngCodec.encode(w, h, 2,
      (x, y) => { val (r, g, b) = rgb(x, y); (r, g, b, 255) }, y => y % 5))
    assert(viaBmp.luma.toSeq == viaPng.luma.toSeq,
      "two real decoders disagree on identical pixels")
    assert(BmpCodec.dhash(viaBmp) == BmpCodec.dhash(viaPng))
  }

  test("alpha is planted but luma-invisible (colorType 6 vs 2)") {
    val w = 5; val h = 4
    val rgb6 = PngCodec.decode(PngCodec.encode(w, h, 6,
      (x, y) => (x * 11 % 256, y * 23 % 256, 77, (x + y * 50) % 256)))
    val rgb2 = PngCodec.decode(PngCodec.encode(w, h, 2,
      (x, y) => (x * 11 % 256, y * 23 % 256, 77, 0)))
    assert(rgb6.luma.toSeq == rgb2.luma.toSeq)
  }

  test("loud failures: signature, CRC, palette, 16-bit, interlace, truncation") {
    val good = PngCodec.encode(3, 3, 2, (x, y) => gray(x * 40 + y))
    // bad signature
    val badSig = good.clone(); badSig(0) = 0
    assert(intercept[IllegalArgumentException](PngCodec.decode(badSig))
      .getMessage.contains("signature"))
    // flipped bit inside IHDR data -> CRC mismatch, loud
    val badCrc = good.clone(); badCrc(8 + 8 + 8) = (badCrc(8 + 8 + 8) ^ 1).toByte
    assert(intercept[IllegalArgumentException](PngCodec.decode(badCrc))
      .getMessage.contains("CRC"))
    // palette / grayscale colorTypes and 16-bit depth refuse BEFORE any
    // pixel work (patch IHDR byte + fix its CRC so CRC passes)
    def patched(ihdrOff: Int, value: Byte): Array[Byte] = {
      val b = good.clone()
      b(8 + 8 + ihdrOff) = value
      val crc = new java.util.zip.CRC32
      crc.update(b, 8 + 4, 4 + 13)
      val v = crc.getValue
      val at = 8 + 8 + 13
      b(at) = (v >>> 24).toByte; b(at + 1) = (v >>> 16).toByte
      b(at + 2) = (v >>> 8).toByte; b(at + 3) = v.toByte
      b
    }
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(patched(9, 3))).getMessage.contains("palette"))
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(patched(8, 16))).getMessage.contains("bitDepth"))
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(patched(12, 1))).getMessage.contains("interlace"))
    // truncated payload
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(good.take(good.length - 6)))
      .getMessage.toLowerCase.contains("truncated"))
  }

  test("ancillary chunks are skipped but still CRC-checked") {
    val good = PngCodec.encode(2, 2, 2, (x, y) => gray(x + y))
    // splice a tEXt chunk after IHDR (offset 8 signature + 25 IHDR)
    val ins = 8 + 25
    val data = "graft".getBytes("US-ASCII")
    val chunk = new java.io.ByteArrayOutputStream()
    val hdr = Array[Byte](0, 0, 0, data.length.toByte)
    chunk.write(hdr); chunk.write("tEXt".getBytes("US-ASCII"))
    chunk.write(data)
    val crc = new java.util.zip.CRC32
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(data)
    val v = crc.getValue
    chunk.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
    val spliced = good.take(ins) ++ chunk.toByteArray ++ good.drop(ins)
    assert(PngCodec.decode(spliced).luma.toSeq ==
      PngCodec.decode(good).luma.toSeq)
    // same splice with a corrupted CRC refuses loudly
    val bad = spliced.clone()
    bad(ins + 8) = (bad(ins + 8) ^ 1).toByte
    assert(intercept[IllegalArgumentException](PngCodec.decode(bad))
      .getMessage.contains("CRC"))
  }
}
