package graft.operators

/** Pure-JVM baseline TIFF decoder (public TIFF 6.0 specification,
  * Adobe 1992) — the scanned-document / scientific-imagery format of
  * web corpora, and the container EXIF already borrowed its IFD
  * structure from. Zero dependencies.
  *
  * Scope (TIFF 6.0 "Baseline" plus the two ubiquitous extensions):
  * both byte orders, multi-IFD (multi-page) containers with the first
  * page decoded and pages counted, chunky planar configuration,
  * strip-based layout (any RowsPerStrip), compressions NONE (1),
  * LZW (5, MSB-first codes with the de facto EARLY-CHANGE width
  * bump and horizontal-differencing Predictor 2) and PACKBITS
  * (32773), photometrics WhiteIsZero / BlackIsZero (1/4/8-bit),
  * RGB / RGBA (8-bit, extra samples ignored for luma), and
  * Palette with 16-bit ColorMap entries (high byte). Everything
  * else — tiles, planar=2, JPEG-in-TIFF, deflate, 16-bit samples,
  * floating point — FAILS LOUDLY per the engine-wide discipline.
  *
  * Decodes to the shared [[BmpCodec.Image]] top-down luma grid
  * (exact-integer Rec.601) like every codec in the tier. */
object TiffCodec {

  /** Decoded first page + container facts an oracle can pin. */
  final case class Decoded(image: BmpCodec.Image, bigEndian: Boolean,
      compression: Int, photometric: Int, bitsPerSample: Int,
      samplesPerPixel: Int, nPages: Int)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"TIFF: $msg")

  def decode(bytes: Array[Byte]): Decoded = {
    if (bytes.length < 8) fail(s"${bytes.length} bytes < 8-byte header")
    val be = (bytes(0) & 0xff, bytes(1) & 0xff) match {
      case (0x4d, 0x4d) => true
      case (0x49, 0x49) => false
      case _            => fail("bad byte-order mark (II/MM)")
    }
    def u16(at: Int): Int = {
      if (at + 2 > bytes.length) fail(s"u16 read past end at $at")
      if (be) ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
      else ((bytes(at + 1) & 0xff) << 8) | (bytes(at) & 0xff)
    }
    def u32(at: Int): Long = {
      if (at + 4 > bytes.length) fail(s"u32 read past end at $at")
      if (be) ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
        ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
      else ((bytes(at + 3) & 0xffL) << 24) | ((bytes(at + 2) & 0xffL) << 16) |
        ((bytes(at + 1) & 0xffL) << 8) | (bytes(at) & 0xffL)
    }
    if (u16(2) != 42) fail(s"magic ${u16(2)} != 42")

    // walk the IFD chain: decode IFD0, count the rest
    val ifd0 = u32(4)
    if (ifd0 < 8 || ifd0 > bytes.length - 2) fail(s"IFD0 offset $ifd0")
    var nPages = 0
    var next = ifd0
    var guard = 0
    while (next != 0) {
      if (guard > 65535) fail("IFD chain loop")
      guard += 1
      nPages += 1
      val n = u16(next.toInt)
      val after = next.toInt + 2 + 12 * n
      next = u32(after)
    }

    // IFD0 entries: tag -> (type, count, value-or-offset position)
    val n0 = u16(ifd0.toInt)
    var entries = Map.empty[Int, (Int, Long, Int)]
    var i = 0
    while (i < n0) {
      val e = ifd0.toInt + 2 + 12 * i
      entries += (u16(e) -> ((u16(e + 2), u32(e + 4), e + 8)))
      i += 1
    }
    val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8)

    /** Integer values of a SHORT/LONG/BYTE tag (inline when they fit
      * the 4-byte value field, else at the pointed offset). */
    def values(tag: Int): Option[Array[Long]] = entries.get(tag).map {
      case (t, count, vpos) =>
        val sz = typeSize.getOrElse(t, fail(s"tag $tag type $t unsupported"))
        if (t == 2 || t == 5) fail(s"tag $tag type $t not integral")
        val total = sz * count
        val base = if (total <= 4) vpos.toLong else u32(vpos)
        Array.tabulate(count.toInt) { k =>
          val at = (base + sz * k).toInt
          sz match {
            case 1 => (bytes(at) & 0xff).toLong
            case 2 => u16(at).toLong
            case _ => u32(at)
          }
        }
    }
    def one(tag: Int, default: Long = -1): Long =
      values(tag).map(_.head).getOrElse {
        if (default >= 0) default else fail(s"required tag $tag missing")
      }

    val width = one(256).toInt
    val height = one(257).toInt
    if (width <= 0 || height <= 0) fail(s"bad dims ${width}x$height")
    val compression = one(259, default = 1).toInt
    val photometric = one(262).toInt
    val spp = one(277, default = 1).toInt
    val bpsArr = values(258).getOrElse(Array(1L))
    if (bpsArr.distinct.length != 1)
      fail("heterogeneous BitsPerSample unsupported")
    val bps = bpsArr.head.toInt
    val planar = one(284, default = 1).toInt
    if (planar != 1) fail(s"planar configuration $planar unsupported (chunky only)")
    val predictor = one(317, default = 1).toInt
    if (predictor != 1 && predictor != 2)
      fail(s"predictor $predictor unsupported")
    if (predictor == 2 && bps != 8)
      fail("predictor 2 with non-8-bit samples unsupported")
    val rowsPerStrip = one(278, default = height.toLong).toInt
    val stripOffsets = values(273).getOrElse(fail("no StripOffsets"))
    val stripCounts = values(279).getOrElse(fail("no StripByteCounts"))
    if (stripOffsets.length != stripCounts.length)
      fail("StripOffsets/StripByteCounts length mismatch")
    val expectStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    if (stripOffsets.length != expectStrips)
      fail(s"${stripOffsets.length} strips != expected $expectStrips")

    photometric match {
      case 0 | 1 =>
        if (spp != 1) fail(s"grayscale with $spp samples")
        if (bps != 1 && bps != 4 && bps != 8)
          fail(s"grayscale $bps-bit unsupported (1/4/8)")
      case 2 =>
        if (bps != 8) fail(s"RGB $bps-bit unsupported (8 only)")
        if (spp < 3) fail(s"RGB with $spp samples")
      case 3 =>
        if (spp != 1) fail(s"palette with $spp samples")
        if (bps != 4 && bps != 8) fail(s"palette $bps-bit unsupported (4/8)")
      case p => fail(s"photometric $p unsupported (0/1/2/3)")
    }
    val colorMap: Array[Long] =
      if (photometric == 3)
        values(320).getOrElse(fail("palette image without ColorMap"))
      else null
    if (colorMap != null && colorMap.length != 3 * (1 << bps))
      fail(s"ColorMap length ${colorMap.length} != ${3 * (1 << bps)}")

    // ---- strip decompression ----
    val rowBytes = (width * spp * bps + 7) / 8
    def unpackBits(src: Array[Byte], off: Int, len: Int,
        want: Int): Array[Byte] = {
      val out = new Array[Byte](want)
      var p = off; var o = 0
      val end = off + len
      while (o < want) {
        if (p >= end) fail("PackBits underrun")
        val c = src(p); p += 1
        if (c >= 0) {
          val run = c + 1
          if (p + run > end || o + run > want) fail("PackBits literal overrun")
          System.arraycopy(src, p, out, o, run)
          p += run; o += run
        } else if (c != -128) {
          val run = 1 - c
          if (p >= end || o + run > want) fail("PackBits repeat overrun")
          java.util.Arrays.fill(out, o, o + run, src(p))
          p += 1; o += run
        } // -128: noop per spec
      }
      out
    }
    /** TIFF LZW (spec §13): MSB-first code packing, 256 = Clear,
      * 257 = EOI, first data code after Clear is 9 bits, width bumps
      * at table sizes 510/1022/2046 (the de facto "early change" every
      * real writer uses). */
    def lzw(src: Array[Byte], off: Int, len: Int, want: Int): Array[Byte] = {
      val out = new Array[Byte](want)
      var o = 0
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      val stack = new Array[Byte](4097)
      var nextCode = 258
      var codeWidth = 9
      var prevCode = -1
      var bitBuf = 0L; var bitCnt = 0
      var p = off
      val end = off + len
      var done = false
      def read(): Int = {
        while (bitCnt < codeWidth) {
          if (p >= end) fail("LZW stream exhausted before EOI")
          bitBuf = (bitBuf << 8) | (src(p) & 0xffL)
          p += 1; bitCnt += 8
        }
        val c = ((bitBuf >>> (bitCnt - codeWidth)) & ((1 << codeWidth) - 1)).toInt
        bitCnt -= codeWidth
        c
      }
      while (!done) {
        val code = read()
        if (code == 256) { nextCode = 258; codeWidth = 9; prevCode = -1 }
        else if (code == 257) {
          if (o != want) fail(s"LZW EOI after $o of $want bytes")
          done = true
        } else {
          var sp = 0
          var first: Byte = 0
          if (code < 256) { first = code.toByte; stack(sp) = first; sp += 1 }
          else if (code < nextCode && code >= 258) {
            var c = code
            while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
            first = c.toByte
            stack(sp) = first; sp += 1
          } else if (code == nextCode && prevCode >= 0 && nextCode < 4096) {
            stack(sp) = 0; sp += 1
            var c = prevCode
            while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
            first = c.toByte
            stack(sp) = first; sp += 1
            stack(0) = first
          } else fail(s"LZW code $code beyond table ($nextCode)")
          if (o + sp > want) fail(s"LZW output overrun ${o + sp} > $want")
          while (sp > 0) { sp -= 1; out(o) = stack(sp); o += 1 }
          if (prevCode >= 0 && nextCode < 4096) {
            prefix(nextCode) = prevCode
            suffix(nextCode) = first
            nextCode += 1
            // EARLY CHANGE: width grows when ONE entry remains at the
            // current width (510/1022/2046), per every real encoder
            if (nextCode + 1 == (1 << codeWidth) && codeWidth < 12)
              codeWidth += 1
          }
          prevCode = code
        }
      }
      out
    }

    val raster = new Array[Byte](rowBytes * height)
    var strip = 0
    while (strip < stripOffsets.length) {
      val rows = math.min(rowsPerStrip, height - strip * rowsPerStrip)
      val want = rowBytes * rows
      val sOff = stripOffsets(strip).toInt
      val sLen = stripCounts(strip).toInt
      if (sOff < 0 || sLen < 0 || sOff + sLen > bytes.length)
        fail(s"strip $strip [$sOff, +$sLen] overruns file")
      val data = compression match {
        case 1 =>
          if (sLen != want) fail(s"strip $strip: $sLen bytes != $want")
          java.util.Arrays.copyOfRange(bytes, sOff, sOff + sLen)
        case 5     => lzw(bytes, sOff, sLen, want)
        case 32773 => unpackBits(bytes, sOff, sLen, want)
        case c => fail(s"compression $c unsupported (1/5/32773)")
      }
      if (predictor == 2) {
        // horizontal differencing: accumulate per sample across each row
        var r = 0
        while (r < rows) {
          var x = spp
          val base = r * rowBytes
          while (x < width * spp) {
            data(base + x) = (data(base + x) + data(base + x - spp)).toByte
            x += 1
          }
          r += 1
        }
      }
      System.arraycopy(data, 0, raster, strip * rowsPerStrip * rowBytes, want)
      strip += 1
    }

    // ---- raster -> luma ----
    val luma = new Array[Byte](width * height)
    val maxGray = (1 << bps) - 1
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val l: Int = photometric match {
          case 0 | 1 =>
            val raw = bps match {
              case 8 => raster(y * rowBytes + x) & 0xff
              case 4 =>
                (raster(y * rowBytes + (x >> 1)) >> (4 * (1 - (x & 1)))) & 0xf
              case _ =>
                (raster(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
            }
            val g = if (photometric == 0) maxGray - raw else raw
            g * 255 / maxGray
          case 2 =>
            val o = y * rowBytes + x * spp
            val r = raster(o) & 0xff
            val g = raster(o + 1) & 0xff
            val b = raster(o + 2) & 0xff
            (299 * r + 587 * g + 114 * b) / 1000
          case _ =>
            val idx = bps match {
              case 8 => raster(y * rowBytes + x) & 0xff
              case _ =>
                (raster(y * rowBytes + (x >> 1)) >> (4 * (1 - (x & 1)))) & 0xf
            }
            // ColorMap entries are 16-bit; the high byte is the 8-bit
            // channel every renderer uses
            val r = (colorMap(idx) >> 8).toInt & 0xff
            val g = (colorMap((1 << bps) + idx) >> 8).toInt & 0xff
            val b = (colorMap(2 * (1 << bps) + idx) >> 8).toInt & 0xff
            (299 * r + 587 * g + 114 * b) / 1000
        }
        luma(y * width + x) = l.toByte
        x += 1
      }
      y += 1
    }
    Decoded(BmpCodec.Image(width, height, luma), be, compression,
      photometric, bps, spp, nPages)
  }

  /** Fixture/spec encoder: a minimal single-IFD TIFF in either byte
    * order — grayscale 1/4/8-bit, RGB, or palette — with compression
    * NONE or PACKBITS (real run-length packing) and a configurable
    * RowsPerStrip. LZW streams come from the JDK ImageIO TIFF writer
    * in the spec (foreign bytes), not from here. `pixel` returns the
    * raw sample(s) per (x, y): gray level, palette index, or packed
    * 0xRRGGBB for RGB. */
  def encode(width: Int, height: Int, photometric: Int, bps: Int,
      pixel: (Int, Int) => Int, bigEndian: Boolean = false,
      packBits: Boolean = false, rowsPerStrip: Int = 0,
      colorMap: Array[Int] = null): Array[Byte] = {
    val spp = if (photometric == 2) 3 else 1
    val rps = if (rowsPerStrip <= 0) height else rowsPerStrip
    val rowBytes = (width * spp * bps + 7) / 8
    // raw rows
    val raster = new Array[Byte](rowBytes * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = pixel(x, y)
        photometric match {
          case 2 =>
            raster(y * rowBytes + 3 * x) = ((v >> 16) & 0xff).toByte
            raster(y * rowBytes + 3 * x + 1) = ((v >> 8) & 0xff).toByte
            raster(y * rowBytes + 3 * x + 2) = (v & 0xff).toByte
          case _ => bps match {
            case 8 => raster(y * rowBytes + x) = v.toByte
            case 4 =>
              val at = y * rowBytes + (x >> 1)
              raster(at) = (raster(at) | (v << (4 * (1 - (x & 1))))).toByte
            case _ =>
              val at = y * rowBytes + (x >> 3)
              raster(at) = (raster(at) | ((v & 1) << (7 - (x & 7)))).toByte
          }
        }
        x += 1
      }
      y += 1
    }
    def packBitsEncode(row: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < row.length) {
        var run = 1
        while (i + run < row.length && run < 128 && row(i + run) == row(i))
          run += 1
        if (run >= 2) {
          out.write(1 - run); out.write(row(i)); i += run
        } else {
          var lit = 1
          while (i + lit < row.length && lit < 128 &&
              (i + lit + 1 >= row.length || row(i + lit) != row(i + lit + 1)))
            lit += 1
          out.write(lit - 1)
          out.write(row, i, lit)
          i += lit
        }
      }
      out.toByteArray
    }
    val nStrips = (height + rps - 1) / rps
    val strips = Array.tabulate(nStrips) { s =>
      val rows = math.min(rps, height - s * rps)
      val raw = java.util.Arrays.copyOfRange(raster, s * rps * rowBytes,
        s * rps * rowBytes + rows * rowBytes)
      if (packBits) packBitsEncode(raw) else raw
    }
    // assemble: header + IFD + value arrays + strips
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (bigEndian) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit =
      if (bigEndian) { w8((v >> 24).toInt); w8((v >> 16).toInt)
        w8((v >> 8).toInt); w8(v.toInt) }
      else { w8(v.toInt); w8((v >> 8).toInt)
        w8((v >> 16).toInt); w8((v >> 24).toInt) }
    w8(if (bigEndian) 0x4d else 0x49); w8(if (bigEndian) 0x4d else 0x49)
    w16(42); w32(8)
    case class Entry(tag: Int, typ: Int, count: Int, inline: Option[Long],
        deferred: Option[Array[Long]])
    val tags = scala.collection.mutable.ArrayBuffer.empty[Entry]
    def short1(tag: Int, v: Long): Unit =
      tags += Entry(tag, 3, 1, Some(v), None)
    short1(256, width); short1(257, height)
    short1(258, bps); short1(259, if (packBits) 32773 else 1)
    short1(262, photometric)
    tags += Entry(273, 4, nStrips, None, Some(Array.fill(nStrips)(0L)))
    short1(277, spp); short1(278, rps)
    tags += Entry(279, 4, nStrips, None,
      Some(strips.map(_.length.toLong).toArray))
    if (photometric == 3) {
      require(colorMap != null && colorMap.length == 3 * (1 << bps),
        "palette encode needs a full ColorMap")
      tags += Entry(320, 3, colorMap.length, None,
        Some(colorMap.map(_.toLong)))
    }
    val sorted = tags.sortBy(_.tag)
    val ifdAt = 8
    val ifdSize = 2 + 12 * sorted.length + 4
    var dataAt = ifdAt + ifdSize
    // lay out deferred arrays, then strips
    val deferredAt = scala.collection.mutable.Map.empty[Int, Long]
    sorted.foreach { e =>
      e.deferred.foreach { arr =>
        val sz = (if (e.typ == 3) 2 else 4) * arr.length
        if (sz > 4) { deferredAt(e.tag) = dataAt; dataAt += sz }
      }
    }
    val stripAt = new Array[Long](nStrips)
    strips.zipWithIndex.foreach { case (sdata, i) =>
      stripAt(i) = dataAt; dataAt += sdata.length
    }
    w16(sorted.length)
    sorted.foreach { e =>
      w16(e.tag); w16(e.typ)
      w32(e.count)
      val arr = e.deferred.map { a =>
        if (e.tag == 273) stripAt else a
      }
      (e.inline, arr) match {
        case (Some(v), _) =>
          // inline value occupies the HIGH-ORDER bytes of the field
          // per the spec: for SHORT, write value then pad
          if (e.typ == 3) { w16(v.toInt); w16(0) } else w32(v)
        case (_, Some(a)) =>
          val sz = (if (e.typ == 3) 2 else 4) * a.length
          if (sz <= 4) {
            a.foreach(v => if (e.typ == 3) w16(v.toInt) else w32(v))
            if (sz == 2) w16(0)
          } else w32(deferredAt(e.tag))
        case _ => fail("internal: entry with no value")
      }
    }
    w32(0) // no next IFD
    sorted.foreach { e =>
      e.deferred.foreach { a0 =>
        val a = if (e.tag == 273) stripAt else a0
        val sz = (if (e.typ == 3) 2 else 4) * a.length
        if (sz > 4) a.foreach(v => if (e.typ == 3) w16(v.toInt) else w32(v))
      }
    }
    strips.foreach(s => out.write(s, 0, s.length))
    out.toByteArray
  }
}
