package graft.operators

/** Pure-JVM GIF (87a/89a) codec — the web-scrape workhorse the
  * multimodal tier refused through r17: LZW decompression, global and
  * local color tables, four-pass interlace, extension-block traversal,
  * all against the public GIF89a specification (CompuServe, 1990).
  * Web corpora are full of GIFs; a codec tier that refuses them
  * quarantines a double-digit share of real image payloads.
  *
  * Scope: the FIRST image descriptor decodes to the shared luma grid
  * ([[BmpCodec.Image]], Rec.601 exact-integer luma — the same path BMP/
  * PNG/JPEG feed); later frames of an animation are structurally
  * walked (frame count reported) but not composited — perceptual
  * pipelines hash the first frame. A Graphic Control Extension's
  * transparent index is surfaced but the pixel keeps its palette RGB
  * (no compositing context exists for frame 1 over "nothing").
  *
  * Decode FAILS LOUDLY on anything it does not understand (bad
  * signature, missing color table, LZW code beyond the dictionary,
  * sub-block overrun, pixel shortfall, missing trailer) — the
  * engine-wide loud-failure discipline; a real corpus routes failures
  * to a counted quarantine, never silently fakes pixels.
  *
  * LZW layout (public spec appendix): an initial "minimum code size"
  * byte mcs; codes packed LSB-FIRST into a byte stream carried in
  * length-prefixed sub-blocks (≤255 bytes, 0 terminator); CLEAR =
  * 2^mcs resets the dictionary, EOI = CLEAR+1 ends it; code width
  * starts at mcs+1 and grows to at most 12 bits as entries fill. */
object GifCodec {

  /** Decoded first frame + the container facts an oracle can pin. */
  final case class Decoded(image: BmpCodec.Image, version: String,
      globalPaletteSize: Int, localPalette: Boolean, interlaced: Boolean,
      nFrames: Int, transparentIndex: Int)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"GIF: $msg")

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** LZW-decode exactly `n` pixel indexes from the sub-block stream at
    * `pos`; returns (pixels, position past the block terminator). */
  private def lzwDecodeAt(bytes: Array[Byte], pos0: Int,
      n: Int): (Array[Byte], Int) = {
    var pos = pos0
    def need(k: Int): Unit =
      if (pos + k > bytes.length) fail(s"truncated at $pos (need $k)")
    need(1)
    val mcs = bytes(pos) & 0xff; pos += 1
    if (mcs < 2 || mcs > 11) fail(s"LZW minimum code size $mcs")
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096 + 1)
    val out = new Array[Byte](n)
    var outN = 0
    var nextCode = eoi + 1
    var width = mcs + 1
    var prevCode = -1
    var bitBuf = 0L; var bitCnt = 0
    var blockLeft = 0
    var done = false
    def readCode(): Int = {
      while (bitCnt < width) {
        if (blockLeft == 0) {
          need(1); blockLeft = bytes(pos) & 0xff; pos += 1
          if (blockLeft == 0) fail("LZW stream ended before EOI")
        }
        need(1)
        bitBuf |= (bytes(pos) & 0xff).toLong << bitCnt
        bitCnt += 8; pos += 1; blockLeft -= 1
      }
      val c = (bitBuf & ((1 << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      c
    }
    while (!done) {
      val code = readCode()
      if (code == clear) {
        nextCode = eoi + 1; width = mcs + 1; prevCode = -1
      } else if (code == eoi) {
        if (outN != n) fail(s"EOI after $outN of $n pixels")
        done = true
      } else {
        var sp = 0
        var firstByte: Byte = 0
        if (code < clear) {
          firstByte = code.toByte
          stack(sp) = firstByte; sp += 1
        } else if (code < nextCode) {
          var c = code
          while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
          firstByte = c.toByte
          stack(sp) = firstByte; sp += 1
        } else if (code == nextCode && prevCode >= 0 && nextCode < 4096) {
          stack(sp) = 0; sp += 1
          var c = prevCode
          while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
          firstByte = c.toByte
          stack(sp) = firstByte; sp += 1
          stack(0) = firstByte
        } else fail(s"LZW code $code beyond dictionary ($nextCode)")
        if (outN + sp > n) fail(s"pixel overflow: ${outN + sp} > $n")
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        if (prevCode >= 0 && nextCode < 4096) {
          prefix(nextCode) = prevCode
          suffix(nextCode) = firstByte
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prevCode = code
      }
    }
    if (blockLeft != 0) { need(blockLeft); pos += blockLeft }
    need(1)
    var term = bytes(pos) & 0xff; pos += 1
    while (term != 0) { need(term); pos += term; need(1)
      term = bytes(pos) & 0xff; pos += 1 }
    (out, pos)
  }

  def decode(bytes: Array[Byte]): Decoded = {
    if (bytes.length < 13) fail(s"${bytes.length} bytes < 13-byte header")
    val version = new String(bytes, 0, 6, "US-ASCII")
    if (version != "GIF87a" && version != "GIF89a")
      fail(s"bad signature '$version'")
    val sw = u16(bytes, 6); val sh = u16(bytes, 8)
    val packed = bytes(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctSize = if (hasGct) 2 << (packed & 7) else 0
    var pos = 13
    def need(n: Int): Unit =
      if (pos + n > bytes.length) fail(s"truncated at $pos (need $n)")
    val gct = new Array[Int](gctSize)
    if (hasGct) {
      need(3 * gctSize)
      var i = 0
      while (i < gctSize) {
        gct(i) = ((bytes(pos) & 0xff) << 16) | ((bytes(pos + 1) & 0xff) << 8) |
          (bytes(pos + 2) & 0xff)
        pos += 3; i += 1
      }
    }

    var first: Option[BmpCodec.Image] = None
    var firstInterlaced = false
    var firstLocal = false
    var nFrames = 0
    var transparent = -1   // pending GCE, applies to the NEXT image
    var firstTransparent = -1
    var sawTrailer = false

    def skipSubBlocks(): Unit = {
      var len = { need(1); val l = bytes(pos) & 0xff; pos += 1; l }
      while (len != 0) {
        need(len); pos += len
        need(1); len = bytes(pos) & 0xff; pos += 1
      }
    }

    def lzwDecode(n: Int): Array[Byte] = {
      val (out, p2) = lzwDecodeAt(bytes, pos, n)
      pos = p2
      out
    }

    while (!sawTrailer) {
      need(1)
      val block = bytes(pos) & 0xff; pos += 1
      block match {
        case 0x3b => sawTrailer = true
        case 0x21 => // extension: label + sub-blocks
          need(1)
          val label = bytes(pos) & 0xff; pos += 1
          if (label == 0xf9) {
            // Graphic Control Extension: one 4-byte sub-block
            need(2)
            val len = bytes(pos) & 0xff
            if (len != 4) fail(s"GCE sub-block length $len != 4")
            val gp = bytes(pos + 1) & 0xff
            transparent =
              if ((gp & 1) != 0) bytes(pos + 4) & 0xff else -1
            pos += 1 + len
            need(1)
            if ((bytes(pos) & 0xff) != 0) fail("GCE not 0-terminated")
            pos += 1
          } else skipSubBlocks() // comment / application / plain text
        case 0x2c => // image descriptor
          need(9)
          val ix = u16(bytes, pos); val iy = u16(bytes, pos + 2)
          val iw = u16(bytes, pos + 4); val ih = u16(bytes, pos + 6)
          val ip = bytes(pos + 8) & 0xff
          pos += 9
          if (iw <= 0 || ih <= 0) fail(s"image ${iw}x$ih empty")
          if (ix + iw > sw || iy + ih > sh)
            fail(s"frame ($ix,$iy ${iw}x$ih) exceeds screen ${sw}x$sh")
          val interlaced = (ip & 0x40) != 0
          val hasLct = (ip & 0x80) != 0
          val lctSize = if (hasLct) 2 << (ip & 7) else 0
          val lct = new Array[Int](lctSize)
          if (hasLct) {
            need(3 * lctSize)
            var i = 0
            while (i < lctSize) {
              lct(i) = ((bytes(pos) & 0xff) << 16) |
                ((bytes(pos + 1) & 0xff) << 8) | (bytes(pos + 2) & 0xff)
              pos += 3; i += 1
            }
          }
          val pal = if (hasLct) lct else gct
          if (pal.isEmpty) fail("no color table (neither local nor global)")
          val indexes = lzwDecode(iw * ih)
          if (first.isEmpty) {
            // first frame must fill the screen for a well-defined luma
            // grid without compositing
            if (ix != 0 || iy != 0 || iw != sw || ih != sh)
              fail(s"first frame ($ix,$iy ${iw}x$ih) does not cover " +
                s"the ${sw}x$sh screen — compositing is not implemented")
            val luma = new Array[Byte](iw * ih)
            var p = 0
            while (p < indexes.length) {
              val idx = indexes(p) & 0xff
              if (idx >= pal.length)
                fail(s"pixel index $idx >= palette size ${pal.length}")
              val c = pal(idx)
              val r = (c >> 16) & 0xff; val g = (c >> 8) & 0xff
              val b = c & 0xff
              // deinterlace: stored row p/iw lands at display row per
              // the 4-pass schedule
              val sr = p / iw
              val dr = if (!interlaced) sr else deinterlaceRow(sr, ih)
              luma(dr * iw + p % iw) =
                ((299 * r + 587 * g + 114 * b) / 1000).toByte
              p += 1
            }
            first = Some(BmpCodec.Image(iw, ih, luma))
            firstInterlaced = interlaced
            firstLocal = hasLct
            firstTransparent = transparent
          }
          nFrames += 1
          transparent = -1
        case other => fail(f"unknown block 0x$other%02x at ${pos - 1}")
      }
    }
    if (pos != bytes.length) fail(s"${bytes.length - pos} bytes after trailer")

    Decoded(first.getOrElse(fail("no image descriptor before trailer")),
      version, gctSize, firstLocal, firstInterlaced, nFrames,
      firstTransparent)
  }

  /** ONE decoded animation frame: the rect's luma + transparency mask
    * (a transparent pixel leaves the canvas unchanged), its placement,
    * the GCE disposal method (0/1 = leave, 2 = restore background over
    * the rect, 3 = restore the pre-frame canvas) and delay. */
  final case class Frame(x: Int, y: Int, width: Int, height: Int,
      luma: Array[Byte], transparent: Array[Boolean], disposal: Int,
      delayCs: Int, interlaced: Boolean, localPalette: Boolean)

  /** A decoded multi-frame GIF: screen dims, the background color's
    * luma (−1 when the background index has no palette entry), frames
    * in stream order. */
  final case class Animation(width: Int, height: Int, bgLuma: Int,
      frames: Vector[Frame])

  private def lumaOf(rgb: Int): Byte = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
    ((299 * r + 587 * g + 114 * (rgb & 0xff)) / 1000).toByte
  }

  /** Decode EVERY frame of an animation (r18 — [[decode]] keeps its
    * first-frame contract): frames may be partial rects anywhere on the
    * screen, with per-frame local palettes, interlace, transparency and
    * disposal. Same loud-failure discipline as [[decode]]. */
  def decodeAnimation(bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue): Animation = {
    if (bytes.length < 13) fail(s"${bytes.length} bytes < 13-byte header")
    val version = new String(bytes, 0, 6, "US-ASCII")
    if (version != "GIF87a" && version != "GIF89a")
      fail(s"bad signature '$version'")
    val sw = u16(bytes, 6); val sh = u16(bytes, 8)
    val packed = bytes(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctSize = if (hasGct) 2 << (packed & 7) else 0
    val bgIndex = bytes(11) & 0xff
    var pos = 13
    def need(n: Int): Unit =
      if (pos + n > bytes.length) fail(s"truncated at $pos (need $n)")
    def readPalette(n: Int): Array[Int] = {
      need(3 * n)
      val t = Array.tabulate(n) { i =>
        ((bytes(pos + 3 * i) & 0xff) << 16) |
          ((bytes(pos + 3 * i + 1) & 0xff) << 8) |
          (bytes(pos + 3 * i + 2) & 0xff)
      }
      pos += 3 * n
      t
    }
    val gct = if (hasGct) readPalette(gctSize) else Array.empty[Int]
    val bgLuma =
      if (hasGct && bgIndex < gct.length) lumaOf(gct(bgIndex)) & 0xff
      else -1
    val frames = Vector.newBuilder[Frame]
    var nDone = 0
    var transparent = -1
    var disposal = 0
    var delayCs = 0
    var sawTrailer = false
    def skipSubBlocks(): Unit = {
      var len = { need(1); val l = bytes(pos) & 0xff; pos += 1; l }
      while (len != 0) {
        need(len); pos += len
        need(1); len = bytes(pos) & 0xff; pos += 1
      }
    }
    while (!sawTrailer) {
      need(1)
      val block = bytes(pos) & 0xff; pos += 1
      block match {
        case 0x3b => sawTrailer = true
        case 0x21 =>
          need(1)
          val label = bytes(pos) & 0xff; pos += 1
          if (label == 0xf9) {
            need(2)
            val len = bytes(pos) & 0xff
            if (len != 4) fail(s"GCE sub-block length $len != 4")
            val gp = bytes(pos + 1) & 0xff
            disposal = (gp >> 2) & 7
            if (disposal > 3) fail(s"disposal method $disposal > 3")
            delayCs = u16(bytes, pos + 2)
            transparent = if ((gp & 1) != 0) bytes(pos + 4) & 0xff else -1
            pos += 1 + len
            need(1)
            if ((bytes(pos) & 0xff) != 0) fail("GCE not 0-terminated")
            pos += 1
          } else skipSubBlocks()
        case 0x2c =>
          need(9)
          val ix = u16(bytes, pos); val iy = u16(bytes, pos + 2)
          val iw = u16(bytes, pos + 4); val ih = u16(bytes, pos + 6)
          val ip = bytes(pos + 8) & 0xff
          pos += 9
          if (iw <= 0 || ih <= 0) fail(s"frame ${iw}x$ih empty")
          if (ix + iw > sw || iy + ih > sh)
            fail(s"frame ($ix,$iy ${iw}x$ih) exceeds screen ${sw}x$sh")
          val interlaced = (ip & 0x40) != 0
          val hasLct = (ip & 0x80) != 0
          val pal = if (hasLct) readPalette(2 << (ip & 7)) else gct
          if (pal.isEmpty) fail("no color table (neither local nor global)")
          val (indexes, p2) = lzwDecodeAt(bytes, pos, iw * ih)
          pos = p2
          if (nDone < maxFrames) {
            val luma = new Array[Byte](iw * ih)
            val trans = new Array[Boolean](iw * ih)
            var p = 0
            while (p < indexes.length) {
              val idx = indexes(p) & 0xff
              if (idx >= pal.length)
                fail(s"pixel index $idx >= palette size ${pal.length}")
              val sr = p / iw
              val dr = if (!interlaced) sr else deinterlaceRow(sr, ih)
              val di = dr * iw + p % iw
              if (idx == transparent) trans(di) = true
              else luma(di) = lumaOf(pal(idx))
              p += 1
            }
            frames += Frame(ix, iy, iw, ih, luma, trans, disposal,
              delayCs, interlaced, hasLct)
          }
          nDone += 1
          transparent = -1; disposal = 0; delayCs = 0
        case other => fail(f"unknown block 0x$other%02x at ${pos - 1}")
      }
    }
    if (pos != bytes.length) fail(s"${bytes.length - pos} bytes after trailer")
    if (nDone == 0) fail("no image descriptor before trailer")
    Animation(sw, sh, bgLuma, frames.result())
  }

  /** Composite an animation per the GIF89a disposal rules: the canvas
    * starts as the background luma (0 when the background is
    * undefined); each frame draws its non-transparent pixels; disposal
    * 2 then clears the frame's rect back to background, disposal 3
    * restores the pre-frame canvas. Returns the canvas AFTER each
    * frame draws (before its disposal runs — what a viewer shows). */
  def composite(anim: Animation): Vector[BmpCodec.Image] = {
    val bg = (if (anim.bgLuma < 0) 0 else anim.bgLuma).toByte
    val canvas = Array.fill[Byte](anim.width * anim.height)(bg)
    anim.frames.map { f =>
      val before =
        if (f.disposal == 3) canvas.clone() else null
      var yy = 0
      while (yy < f.height) {
        var xx = 0
        while (xx < f.width) {
          val si = yy * f.width + xx
          if (!f.transparent(si))
            canvas((f.y + yy) * anim.width + (f.x + xx)) = f.luma(si)
          xx += 1
        }
        yy += 1
      }
      val shown = BmpCodec.Image(anim.width, anim.height, canvas.clone())
      f.disposal match {
        case 2 =>
          var y2 = 0
          while (y2 < f.height) {
            var x2 = 0
            while (x2 < f.width) {
              canvas((f.y + y2) * anim.width + (f.x + x2)) = bg
              x2 += 1
            }
            y2 += 1
          }
        case 3 =>
          System.arraycopy(before, 0, canvas, 0, canvas.length)
        case _ => ()
      }
      shown
    }
  }

  /** One frame for [[encodeAnimation]]: a rect, its pixel indexes
    * (−1 = transparent; requires a GCE), disposal and delay. */
  final case class FrameSpec(x: Int, y: Int, width: Int, height: Int,
      pixel: (Int, Int) => Int, disposal: Int = 0, delayCs: Int = 4,
      interlace: Boolean = false)

  /** Fixture/spec encoder for MULTI-FRAME GIFs: a GIF89a stream with a
    * Netscape-style application extension (walkers must skip it), one
    * GCE + image descriptor per frame (transparent index = palette
    * size − 1 when any pixel is −1), real LZW per frame. */
  def encodeAnimation(screenW: Int, screenH: Int,
      palette: Array[(Int, Int, Int)],
      frames: Seq[FrameSpec]): Array[Byte] = {
    require(frames.nonEmpty, "encodeAnimation: no frames")
    require(palette.length >= 2 && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1,
      s"encodeAnimation: palette size ${palette.length}")
    val palBits = 31 - Integer.numberOfLeadingZeros(palette.length)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(screenW); w16(screenH)
    w8(0x80 | ((palBits - 1) & 7) | (((palBits - 1) & 7) << 4))
    w8(0) // background index 0
    w8(0)
    palette.foreach { case (r, g, b) => w8(r); w8(g); w8(b) }
    // application extension (NETSCAPE2.0 loop) — skipped by walkers
    w8(0x21); w8(0xff); w8(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    w8(3); w8(1); w16(0); w8(0)
    val transIdx = palette.length - 1
    frames.foreach { f =>
      require(f.x >= 0 && f.y >= 0 && f.width > 0 && f.height > 0 &&
        f.x + f.width <= screenW && f.y + f.height <= screenH,
        s"frame rect out of screen")
      require(f.disposal >= 0 && f.disposal <= 3, s"disposal ${f.disposal}")
      var anyTransparent = false
      val px = new Array[Int](f.width * f.height)
      var i = 0
      var y = 0
      while (y < f.height) {
        var x = 0
        while (x < f.width) {
          val v = f.pixel(x, y)
          if (v == -1) { anyTransparent = true; px(i) = transIdx }
          else {
            require(v >= 0 && v < palette.length,
              s"frame pixel($x,$y) = $v outside palette")
            px(i) = v
          }
          i += 1; x += 1
        }
        y += 1
      }
      // GCE
      w8(0x21); w8(0xf9); w8(4)
      w8((f.disposal << 2) | (if (anyTransparent) 1 else 0))
      w16(f.delayCs)
      w8(if (anyTransparent) transIdx else 0)
      w8(0)
      // image descriptor + frame LZW via the single-frame encoder's
      // machinery: re-encode through encode() would rebuild headers, so
      // inline the LZW here by delegating to a 1-frame encode and
      // splicing — simplest correct path: rebuild with encode() on a
      // standalone image then copy its descriptor+data block
      val one = encode(f.width, f.height, palette,
        (x, y) => px(y * f.width + x), interlace = f.interlace)
      // locate the descriptor (0x2c) in the standalone stream: header
      // 13 + GCT 3*palette (encode always writes a GCT, no comment)
      val dOff = 13 + 3 * palette.length
      if ((one(dOff) & 0xff) != 0x2c) fail("internal: descriptor offset")
      // copy from descriptor to just before the trailer, patching the
      // placement (bytes 1-4 of the descriptor)
      val body = java.util.Arrays.copyOfRange(one, dOff, one.length - 1)
      body(1) = (f.x & 0xff).toByte; body(2) = ((f.x >> 8) & 0xff).toByte
      body(3) = (f.y & 0xff).toByte; body(4) = ((f.y >> 8) & 0xff).toByte
      out.write(body, 0, body.length)
    }
    w8(0x3b)
    out.toByteArray
  }

  /** Display row for stored row `sr` of an `h`-row interlaced image —
    * the spec's 4-pass schedule (rows 0,8,16… then 4,12… then 2,6,10…
    * then 1,3,5…). */
  private[operators] def deinterlaceRow(sr: Int, h: Int): Int = {
    val p1 = (h + 7) / 8          // pass 1: start 0, step 8
    val p2 = (h + 3) / 8          // pass 2: start 4, step 8
    val p3 = (h + 1) / 4          // pass 3: start 2, step 4
    if (sr < p1) sr * 8
    else if (sr < p1 + p2) 4 + (sr - p1) * 8
    else if (sr < p1 + p2 + p3) 2 + (sr - p1 - p2) * 4
    else 1 + (sr - p1 - p2 - p3) * 2
  }

  /** Fixture/spec encoder: palette-indexed pixels → a standard GIF89a
    * byte stream with REAL LZW compression (dynamic code widths, CLEAR
    * on a full dictionary), optional interlace, optional local color
    * table, and an optional comment extension planted before the image
    * so specs prove extension traversal. */
  def encode(width: Int, height: Int, palette: Array[(Int, Int, Int)],
      pixel: (Int, Int) => Int, interlace: Boolean = false,
      localPalette: Boolean = false,
      comment: Option[String] = None): Array[Byte] = {
    require(width > 0 && height > 0, s"encode: empty ${width}x$height")
    require(palette.length >= 2 && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1,
      s"encode: palette size ${palette.length} not a power of two in [2, 256]")
    val palBits = 31 - Integer.numberOfLeadingZeros(palette.length)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    // logical screen: GCT present unless the image carries a local one
    w8((if (localPalette) 0 else 0x80) | ((palBits - 1) & 7)
      | (((palBits - 1) & 7) << 4))
    w8(0); w8(0) // background index, aspect
    def writePalette(): Unit = palette.foreach { case (r, g, b) =>
      w8(r); w8(g); w8(b)
    }
    if (!localPalette) writePalette()
    comment.foreach { c =>
      w8(0x21); w8(0xfe)
      c.getBytes("US-ASCII").grouped(255).foreach { chunk =>
        w8(chunk.length); out.write(chunk)
      }
      w8(0)
    }
    // image descriptor at (0,0) covering the screen
    w8(0x2c); w16(0); w16(0); w16(width); w16(height)
    w8((if (localPalette) 0x80 else 0) | (if (interlace) 0x40 else 0)
      | (if (localPalette) (palBits - 1) & 7 else 0))
    if (localPalette) writePalette()
    // pixel indexes in STORED order (interlace reorders rows)
    val rows: Seq[Int] =
      if (!interlace) 0 until height
      else (0 until height by 8) ++ (4 until height by 8) ++
        (2 until height by 4) ++ (1 until height by 2)
    val px = new Array[Int](width * height)
    var i = 0
    rows.foreach { y =>
      var x = 0
      while (x < width) {
        val v = pixel(x, y)
        require(v >= 0 && v < palette.length,
          s"encode: pixel($x,$y) = $v outside palette")
        px(i) = v; i += 1; x += 1
      }
    }
    // ---- LZW encode ---------------------------------------------------
    val mcs = math.max(2, palBits)
    w8(mcs)
    val clear = 1 << mcs
    val eoi = clear + 1
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width_ = mcs + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += width_
      while (bitCnt >= 8) {
        data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    // dictionary: (prefixCode << 8 | byte) → code. Width scheduling
    // mirrors the DECODER's dictionary count, not the encoder's own:
    // the decoder adds one entry per data code after a segment's first
    // (its table lags the encoder's by one until the final code), so
    // each emitted code must use the width the decoder will READ it at.
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    var decNext = eoi + 1 // the decoder's table size after this code
    var emitted = 0       // data codes emitted since the last CLEAR
    def emitData(code: Int): Unit = {
      emit(code)
      emitted += 1
      if (emitted >= 2 && decNext < 4096) {
        decNext += 1
        if (decNext == (1 << width_) && width_ < 12) width_ += 1
      }
    }
    emit(clear)
    var prefixCode = px(0)
    i = 1
    while (i < px.length) {
      val k = px(i)
      val key = Integer.valueOf((prefixCode << 8) | k)
      val hit = dict.get(key)
      if (hit != null) prefixCode = hit.intValue()
      else {
        emitData(prefixCode)
        if (nextCode < 4096) {
          dict.put(key, Integer.valueOf(nextCode))
          nextCode += 1
        } else {
          // full dictionary: reset both sides, per the CLEAR mechanism
          emit(clear)
          dict = new java.util.HashMap[Integer, Integer]()
          nextCode = eoi + 1; decNext = eoi + 1
          width_ = mcs + 1; emitted = 0
        }
        prefixCode = k
      }
      i += 1
    }
    emitData(prefixCode)
    emit(eoi)
    if (bitCnt > 0) data.write((bitBuf & 0xff).toInt)
    // sub-block framing
    val payload = data.toByteArray
    payload.grouped(255).foreach { chunk =>
      w8(chunk.length); out.write(chunk)
    }
    w8(0)    // image-data terminator
    w8(0x3b) // trailer
    out.toByteArray
  }
}
