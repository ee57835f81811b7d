package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BmpCodec, JpegCodec}

/** JFIF decoder (baseline + progressive) vs the JDK's OWN codec (a
  * real foreign libjpeg-derived implementation): flat fixtures must
  * round-trip EXACTLY at quality 1.0 (the closed-form-oracle
  * property), gradients must agree with the JDK's decoder within IDCT
  * rounding, restart markers must reset predictors, progressive scan
  * scripts (spectral selection + successive approximation, EOBRUN, AC
  * refinement) must reconstruct the same pixels, and the loud-fail
  * matrix must refuse arithmetic/truncated streams by name. */
class JpegSpec extends AnyFunSuite {

  private def encodeImg(img: BufferedImage, quality: Float,
      progressive: Boolean = false, dri: Int = 0): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val meta =
      if (dri <= 0) null
      else {
        // plant a DRI marker through the writer's native metadata tree
        val m = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), p)
        val fmt = "javax_imageio_jpeg_image_1.0"
        val tree = m.getAsTree(fmt)
        val seq = {
          val kids = tree.getChildNodes
          (0 until kids.getLength).map(kids.item)
            .find(_.getNodeName == "markerSequence").get
        }
        val driNode = new javax.imageio.metadata.IIOMetadataNode("dri")
        driNode.setAttribute("interval", dri.toString)
        seq.insertBefore(driNode, seq.getFirstChild)
        m.setFromTree(fmt, tree)
        m
      }
    writer.write(null, new IIOImage(img, null, meta), p)
    ios.close(); writer.dispose()
    baos.toByteArray
  }

  private def grayImage(w: Int, h: Int, f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y))
    img
  }

  private def rgbImage(w: Int, h: Int,
      f: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def rec601(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  test("flat images round-trip EXACTLY at quality 1.0 — gray and subsampled YCbCr, edge MCUs in both dims") {
    for (g <- Seq(0, 1, 37, 128, 200, 255); (w, h) <- Seq((8, 8), (11, 9),
        (24, 17), (16, 16), (33, 21))) {
      val grayDec = JpegCodec.decode(JpegCodec.encode(w, h, gray = true,
        (_, _) => (g, g, g)))
      assert(grayDec.nComponents == 1)
      assert(grayDec.image.width == w && grayDec.image.height == h)
      assert(grayDec.image.luma.forall(b => (b & 0xff) == g),
        s"gray flat $g at ${w}x$h: got ${grayDec.image.luma.map(_ & 0xff).distinct.toSeq}")
      val rgbDec = JpegCodec.decode(JpegCodec.encode(w, h, gray = false,
        (_, _) => (g, g, g)))
      assert(rgbDec.nComponents == 3)
      assert(rgbDec.image.luma.forall(b => (b & 0xff) == g),
        s"rgb flat $g at ${w}x$h: got ${rgbDec.image.luma.map(_ & 0xff).distinct.toSeq}")
    }
  }

  test("grayscale gradient agrees with the JDK's own decoder within IDCT rounding") {
    val w = 40; val h = 25
    val img = grayImage(w, h, (x, y) => (x * 7 + y * 11) % 256)
    val bytes = encodeImg(img, 1.0f)
    val ours = JpegCodec.decode(bytes)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ours.image.width == w && ours.image.height == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = ours.image.luma(y * w + x) & 0xff
      val b = theirs.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(a - b))
    }
    assert(maxDiff <= 2, s"max luma diff vs JDK decoder: $maxDiff")
  }

  test("color gradient (constant chroma) through the 4:2:0 path agrees with the JDK decoder") {
    val w = 37; val h = 19
    val img = rgbImage(w, h, (x, y) => {
      val v = (x * 5 + y * 13) % 256; (v, v, v)
    })
    val bytes = encodeImg(img, 1.0f)
    val ours = JpegCodec.decode(bytes)
    assert(ours.nComponents == 3)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = ours.image.luma(y * w + x) & 0xff
      val b = rec601(theirs.getRGB(x, y))
      maxDiff = math.max(maxDiff, math.abs(a - b))
    }
    assert(maxDiff <= 2, s"max luma diff vs JDK decoder: $maxDiff")
  }

  test("saturated flat color through YCbCr convert agrees with the JDK decoder") {
    for ((r, g, b) <- Seq((200, 30, 60), (10, 220, 90), (64, 64, 250))) {
      val bytes = encodeImg(rgbImage(18, 10, (_, _) => (r, g, b)), 1.0f)
      val ours = JpegCodec.decode(bytes)
      val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until 10; x <- 0 until 18) {
        val a = ours.image.luma(y * 18 + x) & 0xff
        val bb = rec601(theirs.getRGB(x, y))
        assert(math.abs(a - bb) <= 2, s"($r,$g,$b) at ($x,$y): $a vs $bb")
      }
    }
  }

  test("restart markers: DRI/RSTn streams decode with predictor resets") {
    val w = 64; val h = 24 // several MCU rows so RSTs actually appear
    val img = grayImage(w, h, (x, y) => (x * 3 + y * 17) % 256)
    val bytes = encodeImg(img, 1.0f, dri = 2)
    // the stream really carries DRI + RST markers
    def hasMarker(m: Int): Boolean =
      bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(hasMarker(0xdd), "fixture must carry a DRI marker")
    assert(hasMarker(0xd0) || hasMarker(0xd1), "fixture must carry RSTn")
    val ours = JpegCodec.decode(bytes)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff, math.abs(
        (ours.image.luma(y * w + x) & 0xff) - theirs.getRaster.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"max luma diff with restarts: $maxDiff")
  }

  test("lower-quality (non-unit quant tables, 16-bit-capable path) still matches the JDK decoder") {
    val w = 32; val h = 16
    val img = grayImage(w, h, (x, y) => (x * 9 + y * 5) % 256)
    val bytes = encodeImg(img, 0.6f)
    val ours = JpegCodec.decode(bytes)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff, math.abs(
        (ours.image.luma(y * w + x) & 0xff) - theirs.getRaster.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"max luma diff at q=0.6: $maxDiff")
  }

  test("loud-fail matrix: arithmetic, truncation, garbage, bad precision") {
    val base = encodeImg(grayImage(16, 16, (x, y) => (x + y) % 256), 1.0f)
    // arithmetic coding: flip SOF0 (0xC0) to SOF9 (0xC8)
    val arith = base.clone()
    val sofAt = arith.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    arith(sofAt + 1) = 0xc8.toByte
    val e2 = intercept[IllegalArgumentException](JpegCodec.decode(arith))
    assert(e2.getMessage.contains("arithmetic"))
    // truncated scan
    val e3 = intercept[IllegalArgumentException](
      JpegCodec.decode(base.take(base.length - 10)))
    assert(e3.getMessage.contains("truncated") || e3.getMessage.contains("marker"))
    // garbage / missing SOI
    val e4 = intercept[IllegalArgumentException](
      JpegCodec.decode("not a jpeg at all".getBytes))
    assert(e4.getMessage.contains("SOI"))
    // 12-bit / wrong-precision refusal rides the SOF parse; synthesize by
    // patching the precision byte (SOF0 len(2) precision(1))
    val prec = base.clone()
    prec(sofAt + 4) = 12.toByte
    val e5 = intercept[IllegalArgumentException](JpegCodec.decode(prec))
    assert(e5.getMessage.contains("precision"))
  }

  test("PROGRESSIVE flat images round-trip EXACTLY at quality 1.0 — gray and YCbCr") {
    for (g <- Seq(3, 77, 128, 250); (w, h) <- Seq((8, 8), (19, 11), (33, 21))) {
      val grayDec = JpegCodec.decode(JpegCodec.encode(w, h, gray = true,
        (_, _) => (g, g, g), progressive = true))
      assert(grayDec.nComponents == 1)
      assert(grayDec.image.luma.forall(b => (b & 0xff) == g),
        s"prog gray flat $g at ${w}x$h")
      val rgbDec = JpegCodec.decode(JpegCodec.encode(w, h, gray = false,
        (_, _) => (g, g, g), progressive = true))
      assert(rgbDec.nComponents == 3)
      assert(rgbDec.image.luma.forall(b => (b & 0xff) == g),
        s"prog rgb flat $g at ${w}x$h")
    }
  }

  test("PROGRESSIVE gradients agree with the JDK's own decoder — gray and subsampled color") {
    val w = 41; val h = 26
    val gimg = grayImage(w, h, (x, y) => (x * 7 + y * 11) % 256)
    val gbytes = encodeImg(gimg, 1.0f, progressive = true)
    // the stream really is progressive (SOF2) with several scans
    def count(m: Int, b: Array[Byte]): Int = b.sliding(2).count(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(count(0xc2, gbytes) == 1, "fixture must be SOF2")
    assert(count(0xda, gbytes) > 1, "fixture must carry multiple scans")
    val ours = JpegCodec.decode(gbytes)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(gbytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff, math.abs(
        (ours.image.luma(y * w + x) & 0xff) - theirs.getRaster.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"progressive gray max diff: $maxDiff")
    // constant-chroma color through the progressive 4:2:0 scan script
    val cimg = rgbImage(29, 18, (x, y) => {
      val v = (x * 5 + y * 13) % 256; (v, v, v)
    })
    val cbytes = encodeImg(cimg, 1.0f, progressive = true)
    assert(count(0xc2, cbytes) == 1)
    val ours2 = JpegCodec.decode(cbytes)
    assert(ours2.nComponents == 3)
    val theirs2 = ImageIO.read(new java.io.ByteArrayInputStream(cbytes))
    var maxDiff2 = 0
    for (y <- 0 until 18; x <- 0 until 29)
      maxDiff2 = math.max(maxDiff2, math.abs(
        (ours2.image.luma(y * 29 + x) & 0xff) - rec601(theirs2.getRGB(x, y))))
    assert(maxDiff2 <= 2, s"progressive color max diff: $maxDiff2")
  }

  test("PROGRESSIVE lower-quality stream (refinement bits doing real work) matches the JDK decoder") {
    val w = 48; val h = 32
    val img = grayImage(w, h, (x, y) => (x * x + 3 * y * x + y) % 256)
    val bytes = encodeImg(img, 0.5f, progressive = true)
    val ours = JpegCodec.decode(bytes)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff, math.abs(
        (ours.image.luma(y * w + x) & 0xff) - theirs.getRaster.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"progressive q=0.5 max diff: $maxDiff")
  }

  test("extended sequential (SOF1) decodes through the baseline path") {
    val base = encodeImg(grayImage(16, 16, (x, y) => (x * 3 + y) % 256), 1.0f)
    val sofAt = base.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    val sof1 = base.clone()
    sof1(sofAt + 1) = 0xc1.toByte
    val a = JpegCodec.decode(base).image.luma.toSeq
    val b = JpegCodec.decode(sof1).image.luma.toSeq
    assert(a == b)
  }

  test("decoded luma grid feeds the shared dHash path") {
    val dec = JpegCodec.decode(JpegCodec.encode(32, 24, gray = true,
      (x, y) => { val v = (x * 11 + y * 3) % 256; (v, v, v) }))
    val sig = BmpCodec.dhash(dec.image)
    val dec2 = JpegCodec.decode(JpegCodec.encode(32, 24, gray = true,
      (x, y) => { val v = (x * 11 + y * 3) % 256; (v, v, v) }))
    assert(sig == BmpCodec.dhash(dec2.image)) // deterministic
  }

  test("EXIF orientation: APP1 parses in both byte orders; all 8 rotations map pixels exactly; defaults and refusals") {
    // a 2×3 asymmetric grid makes every orientation's output distinct:
    // closed-form reference computed by the SAME displayed←stored
    // mapping every EXIF-aware viewer implements
    val w = 16; val h = 24
    def v(x: Int, y: Int): Int = ((y / 8) * 2 + x / 8) * 40 + 7
    val raw = JpegCodec.encode(w, h, gray = true,
      (x, y) => { val g = v(x, y); (g, g, g) })
    assert(JpegCodec.exifOrientation(raw) == 1) // no APP1 at all
    for (o <- 1 to 8; be <- Seq(false, true)) {
      val bytes = JpegCodec.spliceExifOrientation(raw, o, be)
      assert(JpegCodec.exifOrientation(bytes) == o)
      val img = JpegCodec.decodeOriented(bytes).image
      val (ow, oh) = if (o >= 5) (h, w) else (w, h)
      assert(img.width == ow && img.height == oh)
      var yd = 0
      while (yd < oh) {
        var xd = 0
        while (xd < ow) {
          val (xs, ys) = o match {
            case 1 => (xd, yd)
            case 2 => (w - 1 - xd, yd)
            case 3 => (w - 1 - xd, h - 1 - yd)
            case 4 => (xd, h - 1 - yd)
            case 5 => (yd, xd)
            case 6 => (yd, h - 1 - xd)
            case 7 => (w - 1 - yd, h - 1 - xd)
            case 8 => (w - 1 - yd, xd)
          }
          assert((img.luma(yd * ow + xd) & 0xff) == v(xs, ys),
            s"o=$o be=$be at ($xd,$yd)")
          xd += 1
        }
        yd += 1
      }
    }
    // a non-Exif APP1 (XMP) is skipped, not parsed as TIFF
    val xmp = {
      val payload = "http://ns.adobe.com/xap/1.0/".getBytes("US-ASCII") ++
        Array[Byte](0) ++ "<x:xmpmeta/>".getBytes("US-ASCII")
      val len = payload.length + 2
      raw.take(2) ++ Array[Byte](0xff.toByte, 0xe1.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload ++
        raw.drop(2)
    }
    assert(JpegCodec.exifOrientation(xmp) == 1)
    // structurally broken Exif fails LOUDLY: bad byte-order mark,
    // out-of-range orientation value
    val spliced = JpegCodec.spliceExifOrientation(raw, 6, bigEndian = false)
    val badBom = spliced.clone()
    // SOI(2) + FFE1(2) + len(2) + "Exif\0\0"(6) → TIFF BOM at 12
    badBom(12) = 'X'.toByte
    val e1 = intercept[IllegalArgumentException](
      JpegCodec.exifOrientation(badBom))
    assert(e1.getMessage.contains("byte order"))
    val bad9 = JpegCodec.spliceExifOrientation(raw, 9, bigEndian = true)
    val e2 = intercept[IllegalArgumentException](
      JpegCodec.exifOrientation(bad9))
    assert(e2.getMessage.contains("out of [1, 8]"))
    // type-LONG (4) orientation, which real encoders emit, is accepted
    // at count 1 in BOTH byte orders (r18 tolerance)
    for (o <- 1 to 8; be <- Seq(false, true)) {
      val long4 = JpegCodec.spliceExifOrientation(raw, o, be, tagType = 4)
      assert(JpegCodec.exifOrientation(long4) == o, s"LONG o=$o be=$be")
    }
    // every OTHER tag type still refuses (ASCII=2, RATIONAL=5)
    for (t <- Seq(2, 5); be <- Seq(false, true)) {
      val bad = JpegCodec.spliceExifOrientation(raw, 6, be, tagType = t)
      assert(intercept[IllegalArgumentException](
        JpegCodec.exifOrientation(bad))
        .getMessage.contains("type/count"), s"type=$t be=$be")
    }
  }

  test("Adobe CMYK (transform 0): inverted-ink samples convert exactly") {
    // stored samples = 255 - ink; flat unit-quantized planes decode
    // bit-exactly, so luma has an integer closed form
    for ((sc, sm, sy, sk) <- Seq((255, 255, 255, 255), // white
        (255, 255, 255, 0),                            // full K: black
        (200, 100, 50, 230), (0, 128, 255, 77))) {
      val d = JpegCodec.decode(JpegCodec.encodeAdobe(13, 9,
        Array(sc, sm, sy, sk), transform = 0))
      assert(d.nComponents == 4)
      assert(d.image.width == 13 && d.image.height == 9)
      val r = sc * sk / 255; val g = sm * sk / 255; val b = sy * sk / 255
      val expect = (299 * r + 587 * g + 114 * b) / 1000
      assert(d.image.luma.forall(l => (l & 0xff) == expect),
        s"($sc,$sm,$sy,$sk): got ${d.image.luma(0) & 0xff}, want $expect")
    }
  }

  test("Adobe YCCK (transform 2): gray-CMY via the YCbCr inverse, K untouched") {
    // stored (y, cb, cr, k) = (s, 128, 128, sk): the YCbCr inverse
    // returns c = m = y = s exactly (zero chroma), then R = s*sk/255
    for ((s, sk) <- Seq((255, 255), (180, 200), (64, 100), (10, 255))) {
      val d = JpegCodec.decode(JpegCodec.encodeAdobe(17, 8,
        Array(s, 128, 128, sk), transform = 2))
      assert(d.nComponents == 4)
      val c = s * sk / 255
      val expect = (299 * c + 587 * c + 114 * c) / 1000
      assert(d.image.luma.forall(l => (l & 0xff) == expect),
        s"($s,$sk): got ${d.image.luma(0) & 0xff}, want $expect")
    }
  }

  test("Adobe 3-component transform 0 decodes as DIRECT RGB") {
    val (r, g, b) = (40, 90, 200)
    val d = JpegCodec.decode(JpegCodec.encodeAdobe(8, 8,
      Array(r, g, b), transform = 0))
    assert(d.nComponents == 3)
    val expect = (299 * r + 587 * g + 114 * b) / 1000
    assert(d.image.luma.forall(l => (l & 0xff) == expect))
    // the same samples WITHOUT the RGB flag would pass through the
    // YCbCr inverse and land elsewhere — prove the flag is load-bearing
    val ycc = JpegCodec.decode(JpegCodec.encodeAdobe(8, 8,
      Array(r, g, b), transform = 1))
    assert((ycc.image.luma(0) & 0xff) != expect)
  }

  test("4-component stream declaring YCbCr (transform 1) refuses") {
    val e = intercept[IllegalArgumentException](JpegCodec.decode(
      JpegCodec.encodeAdobe(8, 8, Array(1, 2, 3, 4), transform = 1)))
    assert(e.getMessage.contains("transform 1"))
  }

  test("12-bit extended sequential: grayscale narrows to the top 8 bits") {
    // flat 12-bit values hit every >>4 bucket boundary: the DC-only
    // block reconstructs v exactly at 12-bit then narrows
    for (v <- Seq(0, 15, 16, 2048, 4080, 4095)) {
      val d = JpegCodec.decode(JpegCodec.encodeAdobe(11, 9, Array(v),
        transform = -1, precision = 12))
      assert(d.nComponents == 1)
      assert(d.image.luma.forall(l => (l & 0xff) == (v >> 4)),
        s"v=$v: got ${d.image.luma(0) & 0xff}, want ${v >> 4}")
    }
  }

  test("12-bit YCbCr at zero chroma converts exactly after narrowing") {
    // stored (y, 2048, 2048): planes narrow to (y>>4, 128, 128), the
    // YCbCr inverse is the identity at zero chroma
    for (y12 <- Seq(160, 2048, 4000)) {
      val d = JpegCodec.decode(JpegCodec.encodeAdobe(9, 8,
        Array(y12, 2048, 2048), transform = -1, precision = 12))
      assert(d.nComponents == 3)
      assert(d.image.luma.forall(l => (l & 0xff) == (y12 >> 4)))
    }
  }

  test("LOSSLESS (SOF3): every predictor round-trips 2-D gradients exactly") {
    for (pred <- 1 to 7; p <- Seq(8, 12, 16)) {
      val max = (1 << p) - 1
      def px(x: Int, y: Int): Int = (x * 37 + y * 91 + pred * 5) % (max + 1)
      val d = JpegCodec.decode(JpegCodec.encodeLossless(13, 9, p, pred, px))
      assert(d.nComponents == 1)
      assert(d.image.width == 13 && d.image.height == 9)
      var i = 0
      while (i < 13 * 9) {
        val v = px(i % 13, i / 13)
        val want = if (p >= 8) v >> (p - 8) else v << (8 - p)
        assert((d.image.luma(i) & 0xff) == want,
          s"pred=$pred p=$p i=$i: got ${d.image.luma(i) & 0xff}, want $want")
        i += 1
      }
    }
  }

  test("LOSSLESS: point transform shifts output; category 16 fires at P=16") {
    // pt = 2 at P = 8: stored 6-bit samples, output = stored << 2
    def px(x: Int, y: Int): Int = (x + y * 7) % 64
    val d = JpegCodec.decode(JpegCodec.encodeLossless(9, 7, 8, 4, px, pt = 2))
    (0 until 9 * 7).foreach { i =>
      assert((d.image.luma(i) & 0xff) == (px(i % 9, i / 9) << 2))
    }
    // P = 16, first sample 0: diff = 0 - 32768 (default pred) = -32768
    // -> category 16, no magnitude bits — the one special case
    val d16 = JpegCodec.decode(JpegCodec.encodeLossless(4, 3, 16, 1,
      (x, y) => if (x == 0 && y == 0) 0 else 40000))
    assert((d16.image.luma(0) & 0xff) == 0)
    assert((d16.image.luma(1) & 0xff) == (40000 >> 8))
  }

  test("LOSSLESS: DRI restarts reset the prediction to the default") {
    def px(x: Int, y: Int): Int = (x * 11 + y * 29) % 256
    val d = JpegCodec.decode(JpegCodec.encodeLossless(10, 8, 8, 7, px,
      restartInterval = 13))
    (0 until 80).foreach { i =>
      assert((d.image.luma(i) & 0xff) == px(i % 10, i / 10), s"i=$i")
    }
  }

  test("LOSSLESS refusals: multi-component, bad predictor, low precision") {
    val ok = JpegCodec.encodeLossless(4, 4, 8, 1, (_, _) => 7)
    // flip component count in SOF3 (find FF C3, count at +9)
    var i = 2
    while (!((ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc3)) i += 1
    val multi = ok.clone(); multi(i + 9) = 3
    assert(intercept[IllegalArgumentException](JpegCodec.decode(multi))
      .getMessage.contains("components"))
    // predictor 0 in SOS ss field
    var j = 2
    while (!((ok(j) & 0xff) == 0xff && (ok(j + 1) & 0xff) == 0xda)) j += 1
    val badPred = ok.clone(); badPred(j + 7) = 0
    assert(intercept[IllegalArgumentException](JpegCodec.decode(badPred))
      .getMessage.contains("predictor"))
    val badP = ok.clone(); badP(i + 4) = 1
    assert(intercept[IllegalArgumentException](JpegCodec.decode(badP))
      .getMessage.contains("precision"))
  }

  test("12-bit baseline (SOF0) refuses; 8-bit SOF1 stays legal") {
    // hand-flip the SOF marker on a 12-bit SOF1 stream back to SOF0
    val ok = JpegCodec.encodeAdobe(8, 8, Array(1000), transform = -1,
      precision = 12)
    var i = 2
    while (!((ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc1)) i += 1
    val bad = ok.clone(); bad(i + 1) = 0xc0.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.decode(bad))
    assert(e.getMessage.contains("12"))
  }
}
