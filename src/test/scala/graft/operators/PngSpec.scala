package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Real-codec fidelity: [[PngCodec]] must parse genuine PNG bytes —
  * chunk framing + CRCs, zlib IDAT, all five 8-bit colorTypes
  * (grayscale 0/4, truecolor 2/6, palette 3 with PLTE lookup), BOTH
  * interlace methods (sequential + Adam7's seven independently-
  * filtered passes) and the INVERSE of all five scanline filters —
  * exactly, and fail loudly on anything else (16-bit, unknown
  * interlace methods, corrupt CRC, truncated or preset-dictionary
  * IDAT, missing PLTE, out-of-range palette index). Pure JVM, no
  * SparkSession needed. */
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

  test("grayscale (0) and gray+alpha (4): gray channel IS the luma, every filter") {
    for (colorType <- Seq(0, 4); filter <- 0 to 4) {
      val w = 6; val h = 4
      def pix(x: Int, y: Int) =
        ((x * 53 + y * 97) % 256, 0, 0, (x * 7 + y) % 256)
      val bytes = PngCodec.encode(w, h, colorType, pix, _ => filter)
      val dec = PngCodec.decodeInfo(bytes)
      assert(dec.colorType == colorType)
      val expect = for (y <- 0 until h; x <- 0 until w)
        yield (x * 53 + y * 97) % 256
      assert(dec.image.luma.map(_ & 0xff).toSeq == expect,
        s"colorType=$colorType filter=$filter")
    }
  }

  test("palette (3): PLTE lookup resolves to the same Rec.601 luma, every filter") {
    val palette = Array.tabulate(16)(j =>
      (j * 16, (j * 11 + 3) % 256, (j * 5 + 200) % 256))
    for (filter <- 0 to 4) {
      val w = 9; val h = 6
      def pix(x: Int, y: Int) = ((x * 5 + y * 3) % 16, 0, 0, 0)
      val bytes = PngCodec.encode(w, h, 3, pix, _ => filter, palette)
      val dec = PngCodec.decodeInfo(bytes)
      assert(dec.colorType == 3)
      val expect = for (y <- 0 until h; x <- 0 until w) yield {
        val (r, g, b) = palette((x * 5 + y * 3) % 16)
        (299 * r + 587 * g + 114 * b) / 1000
      }
      assert(dec.image.luma.map(_ & 0xff).toSeq == expect, s"filter=$filter")
    }
  }

  test("decodeInfo surfaces the PARSED colorType for every class") {
    val palette = Array((10, 20, 30), (200, 100, 50))
    for (ct <- Seq(0, 2, 3, 4, 6)) {
      val bytes = PngCodec.encode(3, 2, ct,
        (x, y) => ((x + y) % 2, 5, 9, 77),
        palette = if (ct == 3) palette else null)
      assert(PngCodec.decodeInfo(bytes).colorType == ct)
    }
  }

  test("palette loud failures: missing PLTE, out-of-range index, oversized PLTE") {
    val palette = Array((0, 0, 0), (255, 255, 255))
    val good = PngCodec.encode(4, 3, 3, (x, y) => ((x + y) % 2, 0, 0, 0),
      palette = palette)
    // excise the PLTE chunk (offset 8 sig + 25 IHDR; PLTE = 12 + 6 bytes)
    val plteAt = 8 + 25
    val noPlte = good.take(plteAt) ++ good.drop(plteAt + 12 + 6)
    assert(intercept[IllegalArgumentException](PngCodec.decode(noPlte))
      .getMessage.contains("PLTE"))
    // the ENCODER refuses an index past its palette
    assert(intercept[IllegalArgumentException](
      PngCodec.encode(2, 2, 3, (x, y) => (x, 0, 0, 0),
        palette = Array((1, 2, 3)))).getMessage.contains("out of range"))
    // the DECODER refuses an in-stream index past the PLTE end: encode
    // with a 3-entry palette, then shrink PLTE to 1 entry (excise 6 data
    // bytes, rewrite length + CRC) so planted index 1 lands out of range
    val wide = PngCodec.encode(2, 2, 3, (x, y) => (x, 0, 0, 0),
      palette = Array((1, 2, 3), (4, 5, 6), (7, 8, 9)))
    val shrunk = {
      val pre = wide.take(plteAt)          // up to PLTE length field
      val post = wide.drop(plteAt + 12 + 9) // past old PLTE chunk
      val data = wide.slice(plteAt + 8, plteAt + 8 + 3) // first entry only
      val out = new java.io.ByteArrayOutputStream()
      out.write(pre)
      out.write(Array[Byte](0, 0, 0, 3))
      val t = "PLTE".getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      val v = crc.getValue
      out.write(Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte))
      out.write(post)
      out.toByteArray
    }
    assert(intercept[IllegalArgumentException](PngCodec.decode(shrunk))
      .getMessage.contains("out of range"))
    assert(PngCodec.decode(wide).width == 2) // in-range control decodes
  }

  test("preset-dictionary (FDICT) IDAT fails loudly instead of spinning") {
    // Craft a zlib stream that REQUIRES a preset dictionary: Deflater
    // with setDictionary emits FDICT in the zlib header; a decoder that
    // only checks needsInput loops forever on inflate() == 0.
    val w = 2; val h = 2
    val raw = new Array[Byte]((w * 3 + 1) * h) // filter 0 rows, zero pixels
    val defl = new java.util.zip.Deflater()
    defl.setDictionary("graftdict".getBytes("US-ASCII"))
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](256)
    val z = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    // assemble signature + IHDR(2x2, ct 2) + IDAT(fdict stream) + IEND
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte))
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val n = data.length
      out.write(Array((n >>> 24).toByte, (n >>> 16).toByte,
        (n >>> 8).toByte, n.toByte))
      val t = ctype.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      val v = crc.getValue
      out.write(Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte))
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte; ihdr(8) = 8; ihdr(9) = 2
    chunk("IHDR", ihdr)
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val ex = intercept[IllegalArgumentException](PngCodec.decode(out.toByteArray))
    assert(ex.getMessage.contains("dictionary")
      || ex.getMessage.toLowerCase.contains("truncated"))
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

  test("loud failures: signature, CRC, PLTE-less palette, 16-bit, interlace, truncation") {
    val good = PngCodec.encode(3, 3, 2, (x, y) => gray(x * 40 + y))
    // bad signature
    val badSig = good.clone(); badSig(0) = 0
    assert(intercept[IllegalArgumentException](PngCodec.decode(badSig))
      .getMessage.contains("signature"))
    // flipped bit inside IHDR data -> CRC mismatch, loud
    val badCrc = good.clone(); badCrc(8 + 8 + 8) = (badCrc(8 + 8 + 8) ^ 1).toByte
    assert(intercept[IllegalArgumentException](PngCodec.decode(badCrc))
      .getMessage.contains("CRC"))
    // PLTE-less palette, 16-bit depth and interlace refuse BEFORE any
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
    // sub-byte depths still refuse (16 is SUPPORTED since r16, with its
    // own roundtrip suite below)
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(patched(8, 4))).getMessage.contains("bitDepth"))
    // Adam7 (method 1) DECODES now; an UNKNOWN method still refuses
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(patched(12, 2))).getMessage.contains("interlace"))
    // truncated payload
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(good.take(good.length - 6)))
      .getMessage.toLowerCase.contains("truncated"))
  }

  test("16-bit depth (r16): every non-palette colorType, every filter, Adam7 too; HIGH byte is the luma; 16-bit palette refuses") {
    // the encoder plants a position-dependent NON-ZERO low byte in every
    // 16-bit sample — a decoder reading the wrong byte (or the wrong
    // left-neighbour distance in the filter inverse) cannot roundtrip
    for (ct <- Seq(0, 2, 4, 6); filter <- 0 to 4) {
      val w = 7; val h = 5
      def pix(x: Int, y: Int) = {
        val base = y * w + x
        ((base * 31) % 256, (base * 57 + 13) % 256, (base * 91 + 200) % 256,
          (base * 17 + 40) % 256)
      }
      val bytes = PngCodec.encode(w, h, ct, pix, _ => filter,
        bitDepth = 16)
      val dec = PngCodec.decodeInfo(bytes)
      assert(dec.colorType == ct)
      val expect = for (y <- 0 until h; x <- 0 until w) yield {
        val (r, g, b, _) = pix(x, y)
        if (ct == 0 || ct == 4) r
        else (299 * r + 587 * g + 114 * b) / 1000
      }
      assert(dec.image.luma.map(_ & 0xff).toSeq == expect,
        s"16-bit colorType=$ct filter=$filter")
      // 16-bit == 8-bit pixels through the shared luma path
      val eight = PngCodec.decode(PngCodec.encode(w, h, ct, pix, _ => filter))
      assert(dec.image.luma.toSeq == eight.luma.toSeq)
    }
    // Adam7 at 16-bit: odd dims with empty passes, mixed filters
    for (ct <- Seq(0, 2, 6); (w, h) <- Seq((13, 7), (1, 1), (2, 3))) {
      def pix(x: Int, y: Int) = ((x * 31 + y * 57) % 256,
        (x * 91 + y * 13) % 256, (x * 7 + y * 101) % 256, (x + y * 50) % 256)
      val i7 = PngCodec.decode(PngCodec.encode(w, h, ct, pix, y => y % 5,
        interlace = true, bitDepth = 16))
      val plain = PngCodec.decode(PngCodec.encode(w, h, ct, pix, y => y % 5))
      assert(i7.luma.toSeq == plain.luma.toSeq, s"16-bit Adam7 ct=$ct ${w}x$h")
    }
    // 16-bit palette is illegal per the spec — both sides refuse
    intercept[IllegalArgumentException](PngCodec.encode(2, 2, 3,
      (_, _) => (0, 0, 0, 0), palette = Array((1, 2, 3)), bitDepth = 16))
    val good = PngCodec.encode(3, 3, 3,
      (x, y) => ((x + y) % 2, 0, 0, 0), palette = Array((0, 0, 0), (9, 9, 9)))
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
      PngCodec.decode(patched(8, 16)))
      .getMessage.contains("illegal for colorType 3"))
  }

  test("Adam7 interlace: every colorType roundtrips, mixed filters, odd dims with empty passes") {
    val palette = Array.tabulate(16)(j =>
      (j * 16, (j * 11 + 3) % 256, (j * 5 + 200) % 256))
    // dims chosen so passes are exercised unevenly: 13x7 (several short
    // passes), 8x8 (all seven non-empty), 1x1 (ONLY pass 1 non-empty),
    // 2x3 (passes 2,4 empty horizontally at these dims)
    for (ct <- Seq(0, 2, 3, 4, 6); (w, h) <- Seq((13, 7), (8, 8), (1, 1), (2, 3))) {
      def pix(x: Int, y: Int) =
        if (ct == 3) ((x * 5 + y * 3) % 16, 0, 0, 0)
        else ((x * 31 + y * 57) % 256, (x * 91 + y * 13) % 256,
          (x * 7 + y * 101) % 256, (x + y * 50) % 256)
      val pal = if (ct == 3) palette else null
      val seq7 = PngCodec.decodeInfo(PngCodec.encode(w, h, ct, pix,
        y => y % 5, pal, interlace = true))
      val plain = PngCodec.decodeInfo(PngCodec.encode(w, h, ct, pix,
        y => y % 5, pal))
      assert(seq7.colorType == ct)
      assert(seq7.image.luma.toSeq == plain.image.luma.toSeq,
        s"Adam7 vs sequential mismatch: ct=$ct ${w}x$h")
    }
  }

  test("Adam7: per-pass filter state is independent (Up/Paeth see the PASS's previous row)") {
    // a 16x16 gradient with all-Paeth filters: any cross-pass state
    // bleed (prev row carried between passes) corrupts reconstruction
    val w = 16; val h = 16
    def pix(x: Int, y: Int) = ((x * x * 3 + y * y * 7 + x * y) % 256, 0, 0, 255)
    val bytes = PngCodec.encode(w, h, 0, pix, _ => 4, null, interlace = true)
    val img = PngCodec.decode(bytes)
    val expect = for (y <- 0 until h; x <- 0 until w)
      yield (x * x * 3 + y * y * 7 + x * y) % 256
    assert(img.luma.map(_ & 0xff).toSeq == expect)
    // truncating the interlaced stream is still loud
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(bytes.take(bytes.length - 8)))
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

  test("sub-byte depths (r17): 1/2/4-bit gray and palette roundtrip every filter at odd widths; the JDK's own reader agrees; illegal pairs refuse") {
    for (d <- Seq(1, 2, 4); ct <- Seq(0, 3); filter <- 0 to 4) {
      val w = 13; val h = 5 // odd width: a partial trailing scanline byte
      val maxV = (1 << d) - 1
      val pal = (0 to maxV)
        .map(i => (i * 255 / maxV, (i * 40) % 256, (i * 90 + 3) % 256))
        .toArray
      def sample(x: Int, y: Int) = (x * 3 + y * 7) % (maxV + 1)
      val bytes = PngCodec.encode(w, h, ct,
        (x, y) => (sample(x, y), 0, 0, 0), _ => filter,
        palette = if (ct == 3) pal else null, bitDepth = d)
      val dec = PngCodec.decodeInfo(bytes)
      assert(dec.colorType == ct)
      val expect = for (y <- 0 until h; x <- 0 until w) yield {
        val s = sample(x, y)
        if (ct == 0) s * 255 / maxV // spec sample scaling
        else { val (r, g, b) = pal(s); (299 * r + 587 * g + 114 * b) / 1000 }
      }
      assert(dec.image.luma.map(_ & 0xff).toSeq == expect,
        s"d=$d ct=$ct filter=$filter")
      // FOREIGN interop: the JDK's ImageIO PNG reader (libpng-class
      // implementation this codebase never wrote) sees the same pixels
      // through the same packing — encoder and decoder can't share a
      // bit-order bug without the foreign reader disagreeing
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val foreign = for (y <- 0 until h; x <- 0 until w) yield {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        (299 * r + 587 * g + 114 * b) / 1000
      }
      assert(foreign == expect, s"foreign d=$d ct=$ct filter=$filter")
    }
    // Adam7: per-pass sub-byte packing restarts at every pass scanline
    for (d <- Seq(1, 2, 4)) {
      val w = 9; val h = 6; val maxV = (1 << d) - 1
      def sample(x: Int, y: Int) = (x + y) % (maxV + 1)
      val bytes = PngCodec.encode(w, h, 0, (x, y) => (sample(x, y), 0, 0, 0),
        y => y % 5, interlace = true, bitDepth = d)
      val luma = PngCodec.decode(bytes).luma.map(_ & 0xff).toSeq
      val expect =
        for (y <- 0 until h; x <- 0 until w) yield sample(x, y) * 255 / maxV
      assert(luma == expect, s"adam7 d=$d")
    }
    // spec-illegal pairs refuse on BOTH sides: sub-byte multi-channel
    for (ct <- Seq(2, 4, 6)) {
      assert(intercept[IllegalArgumentException](PngCodec.encode(4, 4, ct,
        (_, _) => (0, 0, 0, 0), bitDepth = 4))
        .getMessage.contains("unsupported"))
    }
    val good8 = PngCodec.encode(3, 3, 2, (x, y) => gray(x * 40 + y))
    def patchDepth(b0: Array[Byte], value: Byte): Array[Byte] = {
      val b = b0.clone()
      b(8 + 8 + 8) = value
      val crc = new java.util.zip.CRC32
      crc.update(b, 8 + 4, 4 + 13)
      val v = crc.getValue
      val at = 8 + 8 + 13
      b(at) = (v >>> 24).toByte; b(at + 1) = (v >>> 16).toByte
      b(at + 2) = (v >>> 8).toByte; b(at + 3) = v.toByte
      b
    }
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(patchDepth(good8, 2))) // 2-bit RGB: illegal
      .getMessage.contains("illegal for colorType"))
  }
}
