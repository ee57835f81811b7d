package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TIFF codec spec. The JDK ships a full ImageIO TIFF plugin (reader
  * AND writer, JDK 9+), so the foreign evidence runs BOTH ways: the
  * JDK writer's LZW-compressed bytes (with its own predictor choice)
  * decode exactly, and the JDK reader agrees on bytes this encoder
  * produced. */
class TiffSpec extends AnyFunSuite {

  private def lumaOf(r: Int, g: Int, b: Int): Int =
    (299 * r + 587 * g + 114 * b) / 1000

  test("roundtrip: 8-bit grayscale, both byte orders, multi-strip") {
    for (be <- Seq(false, true); rps <- Seq(0, 3, 1)) {
      def px(x: Int, y: Int): Int = (x * 7 + y * 31) % 256
      val d = TiffCodec.decode(TiffCodec.encode(11, 8, photometric = 1,
        bps = 8, px, bigEndian = be, rowsPerStrip = rps))
      assert(d.bigEndian == be && d.nPages == 1 && d.bitsPerSample == 8)
      for (y <- 0 until 8; x <- 0 until 11)
        assert((d.image.luma(y * 11 + x) & 0xff) == px(x, y), s"($x,$y) be=$be")
    }
  }

  test("roundtrip: 1-bit and 4-bit gray, BlackIsZero and WhiteIsZero") {
    for (bps <- Seq(1, 4); photo <- Seq(0, 1)) {
      val max = (1 << bps) - 1
      def px(x: Int, y: Int): Int = (x + y) % (max + 1)
      val d = TiffCodec.decode(TiffCodec.encode(13, 6, photo, bps, px))
      for (y <- 0 until 6; x <- 0 until 13) {
        val raw = px(x, y)
        val g = if (photo == 0) max - raw else raw
        assert((d.image.luma(y * 13 + x) & 0xff) == g * 255 / max,
          s"bps=$bps photo=$photo ($x,$y)")
      }
    }
  }

  test("roundtrip: RGB and palette (16-bit ColorMap high byte)") {
    def rgb(x: Int, y: Int): Int =
      (((x * 37) % 256) << 16) | (((y * 73 + 19) % 256) << 8) |
        ((x * 5 + y * 131 + 7) % 256)
    val d = TiffCodec.decode(TiffCodec.encode(9, 7, photometric = 2,
      bps = 8, rgb))
    for (y <- 0 until 7; x <- 0 until 9) {
      val v = rgb(x, y)
      assert((d.image.luma(y * 9 + x) & 0xff) ==
        lumaOf((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff))
    }
    // palette: 16 entries, stored as 16-bit (value << 8)
    val cmap = Array.tabulate(48) { i =>
      val j = i % 16
      val c = (i / 16) match {
        case 0 => (37 * j) % 256
        case 1 => (73 * j + 19) % 256
        case _ => (131 * j + 7) % 256
      }
      c << 8
    }
    for (bps <- Seq(4, 8)) {
      val cm = if (bps == 4) cmap
        else Array.tabulate(768)(i => if (i % 256 < 16) cmap(i / 256 * 16 + i % 256) else 0)
      def idx(x: Int, y: Int): Int = (x + y * 3) % 16
      val dp = TiffCodec.decode(TiffCodec.encode(10, 5, photometric = 3,
        bps = bps, idx, colorMap = cm))
      for (y <- 0 until 5; x <- 0 until 10) {
        val j = idx(x, y)
        assert((dp.image.luma(y * 10 + x) & 0xff) ==
          lumaOf((37 * j) % 256, (73 * j + 19) % 256, (131 * j + 7) % 256),
          s"bps=$bps ($x,$y)")
      }
    }
  }

  test("roundtrip: PackBits compression with real runs") {
    def px(x: Int, y: Int): Int = if (x < 8) 200 else (x + y) % 256
    val d = TiffCodec.decode(TiffCodec.encode(20, 9, photometric = 1,
      bps = 8, px, packBits = true, rowsPerStrip = 4))
    assert(d.compression == 32773)
    for (y <- 0 until 9; x <- 0 until 20)
      assert((d.image.luma(y * 20 + x) & 0xff) == px(x, y), s"($x,$y)")
  }

  private def jdkWrite(img: java.awt.image.BufferedImage,
      compression: String, pages: Int = 1): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("tiff").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    if (compression == "None")
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    else {
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(compression)
    }
    if (pages == 1) writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    else {
      writer.prepareWriteSequence(null)
      (0 until pages).foreach { _ =>
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), p)
      }
      writer.endWriteSequence()
    }
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("FOREIGN parity: the JDK TIFF writer's LZW bytes decode exactly") {
    import java.awt.image.BufferedImage
    for (gray <- Seq(true, false); comp <- Seq("LZW", "PackBits", "None")) {
      val w = 21; val h = 13
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        if (gray) img.getRaster.setSample(x, y, 0, (x * 11 + y * 29) % 256)
        else img.setRGB(x, y, (((x * 37) % 256) << 16) |
          (((y * 73 + 19) % 256) << 8) | ((x + y * 131 + 7) % 256))
      }
      val bytes = jdkWrite(img, comp)
      val d = TiffCodec.decode(bytes)
      assert(d.image.width == w && d.image.height == h, s"$comp gray=$gray")
      for (y <- 0 until h; x <- 0 until w) {
        // gray: compare raw raster samples (getRGB on TYPE_BYTE_GRAY
        // applies a colorspace conversion that bends the value)
        val want = if (gray) img.getRaster.getSample(x, y, 0)
          else {
            val rgb = img.getRGB(x, y)
            lumaOf((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          }
        assert((d.image.luma(y * w + x) & 0xff) == want,
          s"$comp gray=$gray ($x,$y): ${d.image.luma(y * w + x) & 0xff} != $want")
      }
    }
  }

  test("FOREIGN parity: the JDK reader decodes our bytes (gray + RGB + PackBits)") {
    for ((photo, bps, pb) <- Seq((1, 8, false), (2, 8, false), (1, 8, true))) {
      def px(x: Int, y: Int): Int =
        if (photo == 2) (((x * 37) % 256) << 16) | (((y * 41 + 3) % 256) << 8) |
          ((x + y) % 256)
        else (x * 13 + y * 17) % 256
      val bytes = TiffCodec.encode(14, 10, photo, bps, px, packBits = pb)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"JDK refused photo=$photo pb=$pb")
      val mine = TiffCodec.decode(bytes)
      for (y <- 0 until 10; x <- 0 until 14) {
        val want = if (photo != 2) img.getRaster.getSample(x, y, 0)
          else {
            val rgb = img.getRGB(x, y)
            lumaOf((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          }
        assert((mine.image.luma(y * 14 + x) & 0xff) == want,
          s"photo=$photo pb=$pb ($x,$y)")
      }
    }
  }

  test("multi-page containers count pages; the first page decodes") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(6, 4, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 6)
      img.getRaster.setSample(x, y, 0, (x * 40 + y * 16) % 256)
    val bytes = jdkWrite(img, "LZW", pages = 3)
    val d = TiffCodec.decode(bytes)
    assert(d.nPages == 3)
    for (y <- 0 until 4; x <- 0 until 6)
      assert((d.image.luma(y * 6 + x) & 0xff) ==
        img.getRaster.getSample(x, y, 0))
  }

  test("loud failures: magic, tiles, deflate, truncation, bad colormap") {
    val ok = TiffCodec.encode(6, 4, 1, 8, (x, y) => (x + y) % 256)
    val badMagic = ok.clone(); badMagic(2) = 41
    assert(intercept[IllegalArgumentException](TiffCodec.decode(badMagic))
      .getMessage.contains("magic"))
    val badOrder = ok.clone(); badOrder(0) = 'Z'
    assert(intercept[IllegalArgumentException](TiffCodec.decode(badOrder))
      .getMessage.contains("byte-order"))
    assert(intercept[IllegalArgumentException](
      TiffCodec.decode(ok.take(ok.length - 5)))
      .getMessage.contains("overrun"))
    // deflate (8) refuses by compression code: patch tag 259's value.
    // entries start at 10 (count at 8), sorted by tag; find tag 259
    def patchTag(b: Array[Byte], tag: Int, v: Int): Array[Byte] = {
      val out = b.clone()
      val n = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
      (0 until n).foreach { i =>
        val e = 10 + 12 * i
        val t = (b(e) & 0xff) | ((b(e + 1) & 0xff) << 8)
        if (t == tag) { out(e + 8) = (v & 0xff).toByte
          out(e + 9) = ((v >> 8) & 0xff).toByte }
      }
      out
    }
    assert(intercept[IllegalArgumentException](
      TiffCodec.decode(patchTag(ok, 259, 8)))
      .getMessage.contains("compression 8"))
    assert(intercept[IllegalArgumentException](
      TiffCodec.decode(patchTag(ok, 262, 6)))
      .getMessage.contains("photometric"))
  }
}
