package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — the multimodal tier's second REAL image format
  * (round-11 verdict residual: "a user pointing the multimodal tier at
  * a real scrape hits PNG before BMP"). Zero dependencies:
  * `java.util.zip.Inflater/Deflater` are the JDK's zlib, and the PNG
  * container (public spec, RFC 2083) is plain chunk framing on top.
  *
  * Supported, deliberately minimal-but-real: ALL FIVE colorTypes —
  * grayscale (0), truecolor (2, RGB), palette (3, PLTE lookup),
  * grayscale+alpha (4) and truecolor+alpha (6, RGBA) — at bit depth 8,
  * AND bit depth 16 for the non-palette types (r16: each sample is a
  * big-endian 16-bit word; luma takes the HIGH byte, the spec's own
  * 16→8 downsample, and the filter's left-neighbour distance is the
  * full pixel byte width), AND the SUB-BYTE depths 1/2/4 for
  * grayscale and palette (r17: samples packed MSB-first within each
  * scanline byte, ceil byte stride, 1-byte filter distance, grayscale
  * samples scaled ×255/(2^d−1) per the spec — 1-bit B/W and 4-bit
  * palette icons are a real slice of any web scrape) — in BOTH
  * interlace methods (0 = sequential, 1 = Adam7: seven
  * independently-filtered sub-images in one zlib stream, empty passes
  * contributing zero bytes), ALL FIVE scanline filters (None/Sub/Up/
  * Average/Paeth) — the part of the format that actually exercises a
  * decoder.
  * Palette PNGs are the single most common class in real web scrapes
  * (icons, logos, screenshots), so colorType 3 is first-class: the
  * PLTE chunk is CRC-verified, bounds-checked (≤256 entries, every
  * index < palette size) and resolved to the same luma path. Chunk
  * CRCs are VERIFIED (a bit-flipped scrape payload fails loudly,
  * never decodes to garbage pixels).
  *
  * Decode FAILS LOUDLY on anything else (bad signature, bad CRC,
  * spec-illegal depth/colorType pairs (sub-byte multi-channel, 16-bit
  * palette), unknown interlace methods, missing/oversized PLTE,
  * out-of-range palette index, truncated or preset-dictionary zlib
  * stream) — the engine-wide loud-failure discipline; a real corpus
  * routes failures to a counted quarantine, never silently fakes
  * pixels. Decoded output is the SAME top-down luma grid as
  * [[BmpCodec.Image]] (integer Rec.601; alpha ignored), so the 2-D
  * dHash and every downstream near-dup tier reuse one pixel path. */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Samples (channels) per pixel for a supported colorType; bytes per
    * pixel = channels × bytes-per-channel (bitDepth / 8). */
  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 3 => 1 // palette index
    case 4 => 2 // grayscale + alpha
    case 6 => 4 // RGBA
    case other => throw new IllegalArgumentException(
      s"PNG: unknown colorType $other")
  }

  /** A decoded PNG: the shared top-down luma grid plus the colorType
    * OBSERVED in IHDR — surfaced so downstream stats report what the
    * decoder actually parsed, never a recomputation of the fixture. */
  final case class Decoded(image: BmpCodec.Image, colorType: Int)

  /** Parse a PNG into a top-down luma grid ([[BmpCodec.Image]]).
    * Verifies the signature and every chunk CRC, walks chunks to IEND,
    * inflates the concatenated IDAT stream, and inverts the per-row
    * filter. */
  def decode(payload: Array[Byte]): BmpCodec.Image = decodeInfo(payload).image

  /** [[decode]] plus the parsed IHDR colorType. */
  def decodeInfo(payload: Array[Byte]): Decoded = {
    require(payload.length >= 8 + 25,
      s"PNG: ${payload.length} bytes < signature + IHDR")
    require(Signature.indices.forall(i => payload(i) == Signature(i)),
      "PNG: bad signature")

    var off = 8
    var width = 0; var height = 0; var colorType = -1; var interlace = 0
    var bitDepth = 8
    var sawIhdr = false; var sawIend = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      require(off + 8 <= payload.length, "PNG: truncated chunk header")
      val len = be32(payload, off)
      require(len >= 0 && off + 12L + len <= payload.length,
        s"PNG: truncated chunk (len $len at offset $off)")
      val ctype = new String(payload, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(payload, off + 4, 4 + len)
      val stored = be32(payload, off + 8 + len).toLong & 0xffffffffL
      require(crc.getValue == stored,
        s"PNG: CRC mismatch in $ctype chunk (corrupt payload)")
      ctype match {
        case "IHDR" =>
          require(len == 13, s"PNG: IHDR length $len != 13")
          val d = off + 8
          width = be32(payload, d); height = be32(payload, d + 4)
          bitDepth = payload(d + 8) & 0xff
          colorType = payload(d + 9) & 0xff
          interlace = payload(d + 12) & 0xff
          require(width > 0 && height > 0, s"PNG: bad dims ${width}x$height")
          channelsOf(colorType) // validates colorType loudly
          // legal depth sets per RFC 2083 §4.1.1: grayscale (0) allows
          // 1/2/4/8/16, palette (3) 1/2/4/8, the multi-channel types
          // (2/4/6) 8/16 only — SUB-BYTE depths (r17) pack samples
          // MSB-first within scanline bytes
          val okDepths: Set[Int] = colorType match {
            case 0 => Set(1, 2, 4, 8, 16)
            case 3 => Set(1, 2, 4, 8)
            case _ => Set(8, 16)
          }
          require(okDepths(bitDepth),
            s"PNG: bitDepth $bitDepth illegal for colorType $colorType " +
              s"(spec allows ${okDepths.toSeq.sorted.mkString("/")})")
          require(interlace == 0 || interlace == 1,
            s"PNG: unknown interlace method $interlace")
          sawIhdr = true
        case "PLTE" =>
          require(sawIhdr, "PNG: PLTE before IHDR")
          require(len > 0 && len % 3 == 0 && len <= 256 * 3,
            s"PNG: PLTE length $len not a multiple of 3 in 3..768")
          require(palette == null, "PNG: duplicate PLTE chunk")
          palette = java.util.Arrays.copyOfRange(payload, off + 8, off + 8 + len)
        case "IDAT" =>
          require(sawIhdr, "PNG: IDAT before IHDR")
          require(colorType != 3 || palette != null, "PNG: IDAT before PLTE "
            + "(palette colorType 3 requires a PLTE chunk first)")
          idat.write(payload, off + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) skipped, CRC-checked
      }
      off += 12 + len
    }
    require(sawIhdr, "PNG: no IHDR chunk")
    require(colorType != 3 || palette != null, "PNG: palette colorType 3 "
      + "without a PLTE chunk")

    // bits per pixel drives both the scanline byte stride (ceil) and
    // the filter distance (floor, min 1) — the spec's two roles
    val bitsPP = channelsOf(colorType) * bitDepth
    def rowBytes(pw: Int): Int = (pw * bitsPP + 7) / 8
    // Adam7 (interlace 1) splits the image into SEVEN independent
    // sub-images, each filtered like a little PNG of its own and
    // concatenated in the one zlib stream; passes whose sub-image is
    // empty for these dims contribute ZERO bytes (not even a filter
    // byte). interlace 0 is the degenerate single pass at stride 1.
    val passes: Seq[(Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1)) else Adam7Passes
    val dims = passes.map { case (x0, y0, dx, dy) =>
      (if (width > x0) (width - x0 + dx - 1) / dx else 0,
        if (height > y0) (height - y0 + dy - 1) / dy else 0)
    }
    val total = dims.map { case (pw, ph) =>
      if (pw == 0 || ph == 0) 0 else (rowBytes(pw) + 1) * ph
    }.sum
    val raw = inflateExact(idat.toByteArray, total)

    val luma = new Array[Byte](width * height)
    var rawOff = 0
    passes.zip(dims).foreach { case ((x0, y0, dx, dy), (pw, ph)) =>
      if (pw > 0 && ph > 0)
        rawOff = defilterPass(raw, rawOff, pw, ph, bitDepth, colorType,
          palette,
          (px, py, v) => luma((y0 + py * dy) * width + (x0 + px * dx)) = v)
    }
    require(rawOff == total, s"PNG: consumed $rawOff of $total raw bytes")
    Decoded(BmpCodec.Image(width, height, luma), colorType)
  }

  /** The seven Adam7 passes as (xStart, yStart, xStep, yStep). */
  private val Adam7Passes: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Invert the per-row filter of ONE pass's scanlines (a pw×ph
    * sub-image starting at `rawOff` in the inflated stream) and emit
    * each pixel's luma through `put(passX, passY, luma)`. Returns the
    * offset just past the pass. Filtering context (left/up neighbours)
    * is PER PASS, as the spec prescribes — row 0 of every pass has an
    * all-zero `prev`. */
  private def defilterPass(raw: Array[Byte], rawOff: Int, pw: Int, ph: Int,
      bitDepth: Int, colorType: Int, palette: Array[Byte],
      put: (Int, Int, Byte) => Unit): Int = {
    val bitsPP = channelsOf(colorType) * bitDepth
    val stride = (pw * bitsPP + 7) / 8
    // the spec's filter distance: bytes per complete pixel, floor, min
    // 1 — sub-byte rows filter byte-to-previous-byte
    val bpp = math.max(1, bitsPP / 8)
    val bpc = math.max(1, bitDepth / 8)
    val cur = new Array[Byte](stride)
    val prev = new Array[Byte](stride)
    var y = 0
    while (y < ph) {
      val rowOff = rawOff + y * (stride + 1)
      val filter = raw(rowOff) & 0xff
      System.arraycopy(raw, rowOff + 1, cur, 0, stride)
      filter match {
        case 0 => () // None
        case 1 => // Sub: left neighbour at distance bpp
          var i = bpp
          while (i < stride) { cur(i) = (cur(i) + cur(i - bpp)).toByte; i += 1 }
        case 2 => // Up
          var i = 0
          while (i < stride) { cur(i) = (cur(i) + prev(i)).toByte; i += 1 }
        case 3 => // Average: floor((left + up) / 2)
          var i = 0
          while (i < stride) {
            val left = if (i >= bpp) cur(i - bpp) & 0xff else 0
            cur(i) = (cur(i) + ((left + (prev(i) & 0xff)) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth predictor
          var i = 0
          while (i < stride) {
            val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
            val b = prev(i) & 0xff
            val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
            cur(i) = (cur(i) + paeth(a, b, c)).toByte
            i += 1
          }
        case other => throw new IllegalArgumentException(
          s"PNG: unknown filter type $other in row $y")
      }
      def lumaOfPalette(idx: Int, x: Int, y: Int): Byte = {
        if (idx * 3 + 2 >= palette.length) throw new IllegalArgumentException(
          s"PNG: palette index $idx out of range " +
            s"(${palette.length / 3} entries) at ($x,$y)")
        val r = palette(idx * 3) & 0xff
        val g = palette(idx * 3 + 1) & 0xff
        val b = palette(idx * 3 + 2) & 0xff
        ((299 * r + 587 * g + 114 * b) / 1000).toByte
      }
      var x = 0
      while (x < pw) {
        val v: Byte =
          if (bitDepth < 8) {
            // SUB-BYTE samples (r17): packed MSB-first within each
            // scanline byte, one channel only (colorTypes 0 and 3 —
            // the spec allows no others below 8 bits)
            val bitOff = x * bitDepth
            val maxV = (1 << bitDepth) - 1
            val s = ((cur(bitOff >> 3) & 0xff) >>
              (8 - bitDepth - (bitOff & 7))) & maxV
            colorType match {
              case 0 => ((s * 255) / maxV).toByte // sample scaling, spec §2.7
              case 3 => lumaOfPalette(s, x, y)
            }
          } else {
            val o = x * bpp
            // 16-bit samples are big-endian words; the HIGH byte at each
            // channel offset IS the spec's 16->8 downsample (bpc = 1 makes
            // this the identity 8-bit path)
            colorType match {
              case 0 | 4 => cur(o) // gray IS the luma; alpha (4) ignored
              case 2 | 6 => // alpha (colorType 6) ignored for luma
                val r = cur(o) & 0xff
                val g = cur(o + bpc) & 0xff
                val b = cur(o + 2 * bpc) & 0xff
                ((299 * r + 587 * g + 114 * b) / 1000).toByte
              case 3 => lumaOfPalette(cur(o) & 0xff, x, y)
            }
          }
        put(x, y, v)
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    rawOff + (stride + 1) * ph
  }

  /** The Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
    * the linear estimate a + b − c, ties resolved a, then b, then c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflateExact(deflated: Array[Byte], want: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(deflated)
    val out = new Array[Byte](want)
    var got = 0
    try {
      while (got < want && !inf.finished()) {
        val n = inf.inflate(out, got, want - got)
        // n == 0 while unfinished covers BOTH truncation (needsInput) and
        // a preset-dictionary stream (needsDictionary, zlib FDICT) — the
        // latter used to slip past a needsInput-only check and spin this
        // loop forever on a crafted payload (chunk CRCs are
        // attacker-computable, so CRC checks don't protect here).
        if (n == 0 && !inf.finished()) throw new IllegalArgumentException(
          "PNG: truncated or dictionary-requiring IDAT stream")
        got += n
      }
      require(got == want,
        s"PNG: IDAT inflated to $got bytes, expected $want")
      out
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"PNG: corrupt IDAT zlib: $e")
    } finally inf.end()
  }

  /** Fixture/spec encoder: top-down (r, g, b[, a]) pixel function →
    * standard PNG bytes with a CALLER-CHOSEN filter per row
    * (`filterOf(y)` ∈ 0..4), so the oracled roundtrip exercises every
    * filter's inverse, not just the easy None path. All five 8-bit
    * colorTypes: 2 (RGB, alpha ignored), 6 (RGBA), 0 (grayscale — the
    * pixel function's `r` channel is the gray value), 4 (gray+alpha —
    * `r` and `a`), 3 (palette — `r` is the palette INDEX; `palette`
    * required, emitted as a PLTE chunk). `interlace = true` emits the
    * Adam7 form: seven independently-filtered sub-images concatenated
    * in one zlib stream (`filterOf` is indexed over EMITTED scanlines
    * in pass order). */
  def encode(width: Int, height: Int, colorType: Int,
      rgba: (Int, Int) => (Int, Int, Int, Int),
      filterOf: Int => Int = _ => 0,
      palette: Array[(Int, Int, Int)] = null,
      interlace: Boolean = false,
      bitDepth: Int = 8): Array[Byte] = {
    require(width > 0 && height > 0, s"encode: bad dims ${width}x$height")
    require(colorType != 3 || (palette != null && palette.nonEmpty
      && palette.length <= 256), "encode: colorType 3 needs 1..256 palette entries")
    require((colorType match {
      case 0 => Set(1, 2, 4, 8, 16)
      case 3 => Set(1, 2, 4, 8)
      case _ => Set(8, 16)
    })(bitDepth),
      s"encode: bitDepth $bitDepth unsupported for colorType $colorType")
    // 16-bit fixtures: the pixel function's 0..255 channel value lands
    // in the HIGH byte; the LOW byte carries a position-dependent
    // non-zero pattern, so a decoder that read the wrong byte (or the
    // wrong stride) cannot roundtrip. Sub-byte depths floor to a
    // 1-byte filter distance, per the spec.
    val bpc = math.max(1, bitDepth / 8)
    val bpp = math.max(1, channelsOf(colorType) * bitDepth / 8)
    val passes = if (!interlace) Seq((0, 0, 1, 1)) else Adam7Passes
    val rawOut = new java.io.ByteArrayOutputStream()
    var globalRow = 0
    passes.foreach { case (x0, y0, dx, dy) =>
      val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
      val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        val stride =
          if (bitDepth < 8) (pw * bitDepth + 7) / 8 else pw * bpp
        val prev = new Array[Byte](stride)
        val cur = new Array[Byte](stride)
        var py = 0
        while (py < ph) {
          java.util.Arrays.fill(cur, 0.toByte) // sub-byte rows OR bits in
          var px = 0
          while (px < pw) {
            val ax = x0 + px * dx
            val ay = y0 + py * dy
            val (r, g, b, a) = rgba(ax, ay)
            if (bitDepth < 8) {
              // SUB-BYTE fixtures: the pixel function's first channel
              // IS the raw sample (gray level for colorType 0, palette
              // index for 3) in [0, 2^d − 1], packed MSB-first
              val maxV = (1 << bitDepth) - 1
              require(r >= 0 && r <= maxV,
                s"encode: sub-byte sample $r out of [0, $maxV]")
              if (colorType == 3) require(r < palette.length,
                s"encode: palette index $r out of range (${palette.length})")
              val bitOff = px * bitDepth
              cur(bitOff >> 3) = (cur(bitOff >> 3) |
                (r << (8 - bitDepth - (bitOff & 7)))).toByte
            } else {
              val o = px * bpp
              val low = ((ax * 7 + ay * 13) & 0xff).toByte
              def putCh(ch: Int, v: Int): Unit =
                if (bpc == 1) cur(o + ch) = v.toByte
                else { cur(o + ch * 2) = v.toByte; cur(o + ch * 2 + 1) = low }
              colorType match {
                case 0 => putCh(0, r) // gray
                case 4 => putCh(0, r); putCh(1, a)
                case 3 =>
                  require(r >= 0 && r < palette.length,
                    s"encode: palette index $r out of range (${palette.length})")
                  cur(o) = r.toByte
                case _ =>
                  putCh(0, r); putCh(1, g); putCh(2, b)
                  if (channelsOf(colorType) == 4) putCh(3, a)
              }
            }
            px += 1
          }
          val filter = filterOf(globalRow)
          require(filter >= 0 && filter <= 4, s"encode: bad filter $filter")
          rawOut.write(filter)
          var i = 0
          while (i < stride) {
            val left = if (i >= bpp) cur(i - bpp) & 0xff else 0
            val up = prev(i) & 0xff
            val upLeft = if (i >= bpp) prev(i - bpp) & 0xff else 0
            val predicted = filter match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) >> 1
              case 4 => paeth(left, up, upLeft)
            }
            rawOut.write(((cur(i) & 0xff) - predicted) & 0xff)
            i += 1
          }
          System.arraycopy(cur, 0, prev, 0, stride)
          py += 1
          globalRow += 1
        }
      }
    }
    val raw = rawOut.toByteArray

    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new java.io.ByteArrayOutputStream()
    while (!deflater.finished())
      zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte // compression/filter 0
    ihdr(12) = if (interlace) 1 else 0
    writeChunk(out, "IHDR", ihdr)
    if (colorType == 3) {
      val plte = new Array[Byte](palette.length * 3)
      var j = 0
      while (j < palette.length) {
        val (r, g, b) = palette(j)
        plte(j * 3) = r.toByte; plte(j * 3 + 1) = g.toByte
        plte(j * 3 + 2) = b.toByte
        j += 1
      }
      writeChunk(out, "PLTE", plte)
    }
    writeChunk(out, "IDAT", zout.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, ctype: String,
      data: Array[Byte]): Unit = {
    val hdr = new Array[Byte](8)
    hdr(0) = (data.length >>> 24).toByte; hdr(1) = (data.length >>> 16).toByte
    hdr(2) = (data.length >>> 8).toByte; hdr(3) = data.length.toByte
    val t = ctype.getBytes("US-ASCII")
    System.arraycopy(t, 0, hdr, 4, 4)
    out.write(hdr, 0, 8)
    out.write(data, 0, data.length)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    val v = crc.getValue
    out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte,
      v.toByte), 0, 4)
  }
}
