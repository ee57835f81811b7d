package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** GIF codec: LZW roundtrips (dynamic widths, KwKwK, dictionary-full
  * CLEAR), palette sizes, interlace, local color tables, extension
  * traversal, loud failures — and FOREIGN parity against the JDK's own
  * ImageIO GIF reader/writer in BOTH directions (bytes this codebase
  * never produced), the PngSpec discipline. Pure JVM — no Spark. */
class GifSpec extends AnyFunSuite {

  private def grayPal(n: Int): Array[(Int, Int, Int)] =
    Array.tabulate(n)(j => (j * 255 / (n - 1), j * 255 / (n - 1),
      j * 255 / (n - 1)))

  private def lumaOf(r: Int, g: Int, b: Int): Int =
    (299 * r + 587 * g + 114 * b) / 1000

  test("encode → decode roundtrips pixels across palette sizes, dims and patterns") {
    for (palSize <- Seq(2, 4, 16, 256); pat <- 0 until 3) {
      val pal = Array.tabulate(palSize)(j =>
        ((j * 37) % 256, (j * 91 + 17) % 256, (j * 151 + 5) % 256))
      val w = 13 + palSize % 7; val h = 9 + pat
      def px(x: Int, y: Int): Int = pat match {
        case 0 => (x + y * w) % palSize          // gradient
        case 1 => if ((x / 3) % 2 == 0) 0 else palSize - 1 // runs (KwKwK)
        case _ => (x * y + 7 * x) % palSize      // mixed
      }
      val bytes = GifCodec.encode(w, h, pal, px)
      val dec = GifCodec.decode(bytes)
      assert(dec.image.width == w && dec.image.height == h)
      assert(dec.version == "GIF89a" && dec.nFrames == 1)
      assert(dec.globalPaletteSize == palSize && !dec.localPalette)
      val expect = for (y <- 0 until h; x <- 0 until w) yield {
        val (r, g, b) = pal(px(x, y)); lumaOf(r, g, b)
      }
      assert(dec.image.luma.map(_ & 0xff).toSeq == expect,
        s"pal=$palSize pat=$pat")
    }
  }

  test("constant-color runs stress KwKwK and the dictionary-full CLEAR path") {
    // one long run: every LZW step is the just-added (KwKwK) code; a
    // big enough image forces the 12-bit dictionary to fill and CLEAR
    val pal = grayPal(4)
    val w = 200; val h = 150
    val flat = GifCodec.decode(GifCodec.encode(w, h, pal, (_, _) => 2))
    val g2 = lumaOf(pal(2)._1, pal(2)._2, pal(2)._3)
    assert(flat.image.luma.map(_ & 0xff).forall(_ == g2))
    assert(flat.image.luma.length == w * h)
    // high-entropy pixels max dictionary GROWTH instead (fills 4096 and
    // forces the encoder's CLEAR/reset path over 30k pixels)
    val noisy = GifCodec.encode(w, h, grayPal(256),
      (x, y) => (x * 7919 + y * 104729) % 256)
    val dn = GifCodec.decode(noisy)
    val exp = for (y <- 0 until h; x <- 0 until w)
      yield (x * 7919 + y * 104729) % 256 // gray palette: luma == index
    assert(dn.image.luma.map(_ & 0xff).toSeq == exp)
  }

  test("interlaced images deinterlace to the same pixels; local color tables resolve") {
    val pal = Array.tabulate(16)(j => ((16 * j) % 256, (16 * j + 64) % 256,
      (16 * j + 128) % 256))
    for (h <- Seq(1, 2, 3, 4, 5, 8, 11, 17); local <- Seq(false, true)) {
      val w = 7
      def px(x: Int, y: Int): Int = (x + 3 * y) % 16
      val plain = GifCodec.decode(GifCodec.encode(w, h, pal, px,
        interlace = false, localPalette = local))
      val laced = GifCodec.decode(GifCodec.encode(w, h, pal, px,
        interlace = true, localPalette = local))
      assert(laced.interlaced && !plain.interlaced)
      assert(laced.localPalette == local)
      assert(laced.image.luma.toSeq == plain.image.luma.toSeq,
        s"h=$h local=$local")
    }
  }

  test("comment extensions and GCE blocks are traversed; transparency index surfaces") {
    val pal = grayPal(4)
    val bytes = GifCodec.encode(5, 4, pal, (x, y) => (x + y) % 4,
      comment = Some("made by a spec " * 30)) // multi-sub-block comment
    val dec = GifCodec.decode(bytes)
    assert(dec.image.width == 5 && dec.transparentIndex == -1)
    // splice a GCE with a transparent index before the image descriptor
    val gce = Array[Byte](0x21, 0xf9.toByte, 4, 1, 0, 0, 2, 0)
    val at = bytes.indexOf(0x2c.toByte)
    val spliced = bytes.take(at) ++ gce ++ bytes.drop(at)
    val dt = GifCodec.decode(spliced)
    assert(dt.transparentIndex == 2)
    assert(dt.image.luma.toSeq == dec.image.luma.toSeq) // opaque palette RGB
  }

  test("FOREIGN parity: the JDK's ImageIO reader decodes our bytes to the same pixels") {
    for (palSize <- Seq(2, 16, 256); lace <- Seq(false, true)) {
      val pal = Array.tabulate(palSize)(j =>
        ((j * 53) % 256, (j * 101 + 31) % 256, (j * 197 + 11) % 256))
      val w = 19; val h = 13
      def px(x: Int, y: Int): Int = (x * 5 + y * 11 + x * y) % palSize
      val bytes = GifCodec.encode(w, h, pal, px, interlace = lace)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"JDK refused our GIF pal=$palSize lace=$lace")
      assert(img.getWidth == w && img.getHeight == h)
      val mine = GifCodec.decode(bytes).image.luma.map(_ & 0xff).toSeq
      val foreign = for (y <- 0 until h; x <- 0 until w) yield {
        val rgb = img.getRGB(x, y)
        lumaOf((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      }
      assert(foreign == mine, s"JDK disagrees pal=$palSize lace=$lace")
    }
  }

  test("FOREIGN parity: bytes the JDK's ImageIO writer produced decode exactly") {
    import java.awt.image.{BufferedImage, IndexColorModel}
    for (palSize <- Seq(2, 16, 256)) {
      val r = Array.tabulate(palSize)(j => ((j * 37) % 256).toByte)
      val g = Array.tabulate(palSize)(j => ((j * 73 + 19) % 256).toByte)
      val b = Array.tabulate(palSize)(j => ((j * 131 + 7) % 256).toByte)
      val bits = math.max(1, 31 - Integer.numberOfLeadingZeros(palSize))
      val icm = new IndexColorModel(bits, palSize, r, g, b)
      val w = 23; val h = 17
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (x * 3 + y * 7 + x * y) % palSize)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", bos))
      val dec = GifCodec.decode(bos.toByteArray)
      assert(dec.image.width == w && dec.image.height == h)
      val expect = for (y <- 0 until h; x <- 0 until w) yield {
        val rgb = img.getRGB(x, y)
        lumaOf((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      }
      assert(dec.image.luma.map(_ & 0xff).toSeq == expect,
        s"JDK-written GIF pal=$palSize")
    }
  }

  test("multi-frame GIFs report the frame count; first frame decodes") {
    // hand-assemble a 2-frame GIF by duplicating the image section
    val pal = grayPal(4)
    val one = GifCodec.encode(4, 3, pal, (x, y) => (x + y) % 4)
    val imgStart = one.indexOf(0x2c.toByte)
    val imgEnd = one.length - 1 // before trailer
    val section = one.slice(imgStart, imgEnd)
    val two = one.take(imgEnd) ++ section ++ Array(one.last)
    val dec = GifCodec.decode(two)
    assert(dec.nFrames == 2)
    assert(dec.image.luma.toSeq ==
      GifCodec.decode(one).image.luma.toSeq)
  }

  test("loud failures: bad signature, truncation, missing color table, bad LZW, trailing garbage") {
    val pal = grayPal(4)
    val good = GifCodec.encode(6, 5, pal, (x, y) => (x + y) % 4)
    def bad(mut: Array[Byte] => Array[Byte], expect: String): Unit = {
      val e = intercept[IllegalArgumentException](
        GifCodec.decode(mut(good.clone())))
      assert(e.getMessage.contains(expect), e.getMessage)
    }
    bad(b => { b(0) = 'X'.toByte; b }, "signature")
    bad(_.take(10), "13-byte")
    bad(_.dropRight(1), "truncated")
    bad(b => b ++ Array[Byte](7), "after trailer")
    // an out-of-range LZW code refuses by name: splice a stream whose
    // second code references a dictionary entry that cannot exist yet
    val codeBad = {
      val at = good.indexOf(0x2c.toByte)
      // descriptor(10) + mcs(1): replace the data sub-blocks with a
      // hand-packed stream [clear=4, literal 0, code 4095] at mcs=2
      // (width 3 after clear): bits 100 000 then garbage high codes
      val payload = Array[Byte](0x04, 0xf8.toByte, 0x7f, 0x3f)
      good.take(at + 11) ++ Array[Byte](payload.length.toByte) ++
        payload ++ Array[Byte](0, 0x3b)
    }
    val e2 = intercept[IllegalArgumentException](GifCodec.decode(codeBad))
    assert(e2.getMessage.contains("LZW") || e2.getMessage.contains("pixel"),
      e2.getMessage)
    // no color table at all: strip the GCT flag + table bytes
    val noPal = {
      val b = good.clone()
      val screenPacked = b(10) & 0xff
      val gctLen = 3 * (2 << (screenPacked & 7))
      b(10) = (screenPacked & 0x7f).toByte
      b.take(13) ++ b.drop(13 + gctLen)
    }
    val e = intercept[IllegalArgumentException](GifCodec.decode(noPal))
    assert(e.getMessage.contains("color table"))
  }

  // ---- animation (r18) ------------------------------------------------

  private def animFixture(nFrames: Int, disposal: Int = 0,
      transparent: Boolean = false): Array[Byte] = {
    val pal = Array.tabulate(16)(j =>
      ((j * 37) % 256, (j * 73 + 19) % 256, (j * 131 + 7) % 256))
    val frames = (0 until nFrames).map { k =>
      GifCodec.FrameSpec(x = k * 2, y = k, width = 6, height = 5,
        pixel = (x, y) =>
          if (transparent && (x + y + k) % 3 == 0) -1
          else (x + y * 2 + k * 5) % 15, // 15: index 15 reserved for trans
        disposal = disposal, delayCs = 3 + k)
    }
    GifCodec.encodeAnimation(20, 12, pal, frames)
  }

  test("animation: every frame's rect, pixels, disposal and delay decode") {
    val anim = GifCodec.decodeAnimation(animFixture(4, disposal = 1))
    assert(anim.width == 20 && anim.height == 12)
    assert(anim.frames.size == 4)
    anim.frames.zipWithIndex.foreach { case (f, k) =>
      assert((f.x, f.y, f.width, f.height) == (k * 2, k, 6, 5))
      assert(f.disposal == 1 && f.delayCs == 3 + k)
      assert(!f.transparent.exists(identity))
    }
    // maxFrames caps decode but the full container still validates
    assert(GifCodec.decodeAnimation(animFixture(4), 2).frames.size == 2)
  }

  test("animation FOREIGN parity: JDK ImageIO reads the same frames") {
    val bytes = animFixture(3, transparent = true)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val n = reader.getNumImages(true)
    assert(n == 3)
    val anim = GifCodec.decodeAnimation(bytes)
    (0 until n).foreach { k =>
      val img = reader.read(k)
      val f = anim.frames(k)
      assert(img.getWidth == f.width && img.getHeight == f.height)
      for (y <- 0 until f.height; x <- 0 until f.width) {
        val argb = img.getRGB(x, y)
        val i = y * f.width + x
        if ((argb >>> 24) == 0) assert(f.transparent(i), s"k=$k ($x,$y)")
        else {
          assert(!f.transparent(i), s"k=$k ($x,$y)")
          val want = lumaOf((argb >> 16) & 0xff, (argb >> 8) & 0xff,
            argb & 0xff)
          assert((f.luma(i) & 0xff) == want, s"k=$k ($x,$y)")
        }
      }
    }
    reader.dispose()
  }

  test("animation compositing: disposal none accumulates; 2 restores background; 3 restores previous") {
    val pal = Array.tabulate(4)(j => (j * 80, j * 80, j * 80))
    def lum(j: Int): Int = GifCodec
      .decode(GifCodec.encode(1, 1, pal, (_, _) => j)).image.luma(0) & 0xff
    // frame 0: fills screen with color 1; frame 1: 1x1 rect color 2 at
    // (1,1) disposal 2; frame 2: 1x1 rect color 3 at (0,0) disposal 3;
    // frame 3: full screen transparent (shows the canvas as-is)
    val bytes = GifCodec.encodeAnimation(3, 2, pal, Seq(
      GifCodec.FrameSpec(0, 0, 3, 2, (_, _) => 1),
      GifCodec.FrameSpec(1, 1, 1, 1, (_, _) => 2, disposal = 2),
      GifCodec.FrameSpec(0, 0, 1, 1, (_, _) => 2, disposal = 3),
      GifCodec.FrameSpec(0, 0, 3, 2, (_, _) => -1)))
    val anim = GifCodec.decodeAnimation(bytes)
    val shown = GifCodec.composite(anim)
    assert(shown.size == 4)
    val c1 = lum(1); val c2 = lum(2); val bg = lum(0)
    assert(anim.bgLuma == bg)
    // after frame 0: all c1
    assert(shown(0).luma.map(_ & 0xff).toSeq == Seq.fill(6)(c1))
    // frame 1 shows c2 at (1,1)
    assert((shown(1).luma(1 * 3 + 1) & 0xff) == c2)
    // frame 2 shows c2 at (0,0); its disposal-3 then restores the
    // canvas, and frame 1's disposal-2 had already cleared (1,1) to bg
    assert((shown(2).luma(0) & 0xff) == c2)
    assert((shown(2).luma(1 * 3 + 1) & 0xff) == bg)
    // frame 3 draws nothing: canvas as after frame 2's restore = all c1
    // except (1,1) which frame 1's disposal cleared to bg
    val last = shown(3).luma.map(_ & 0xff).toSeq
    assert(last == Seq(c1, c1, c1, c1, bg, c1))
  }
}
