package graft.operators

/** Pure-JVM BMP (Windows DIB) codec — the multimodal tier's REAL image
  * format (round-11 close of the "codec is a stand-in" residual): a
  * zero-dependency parser for the one mainstream raster format that
  * needs none (24-bpp uncompressed, BITMAPINFOHEADER), so the
  * `mapPartitions` decode boundary in [[Multimodal]] exercises genuine
  * header parsing, row padding, and bottom-up row order instead of the
  * deterministic fake.
  *
  * Layout (public spec, e.g. the Windows BITMAPFILEHEADER /
  * BITMAPINFOHEADER documentation): 14-byte file header ('BM', file
  * size, pixel-data offset) + 40-byte info header (width, height,
  * planes=1, bpp, compression=0) + pixel rows bottom-up, each row
  * 3·width bytes zero-padded to a 4-byte boundary, channels in BGR
  * order.
  *
  * Decode FAILS LOUDLY on anything it does not understand (bad magic,
  * bpp ≠ 24, compressed, truncated pixel array) — the engine-wide
  * loud-failure discipline; a real corpus routes failures to a counted
  * quarantine, never silently fakes pixels. */
object BmpCodec {

  /** Decoded image: top-down row-major 8-bit luma grid (integer
    * Rec.601: (299·R + 587·G + 114·B) div 1000 — exact, engine-free). */
  final case class Image(width: Int, height: Int, luma: Array[Byte])

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Bytes per padded pixel row. */
  def rowStride(width: Int): Int = (width * 3 + 3) / 4 * 4

  /** Parse a 24-bpp uncompressed BMP into a top-down luma grid. */
  def decode(payload: Array[Byte]): Image = {
    require(payload.length >= 54,
      s"BMP: ${payload.length} bytes < 54-byte header")
    require(payload(0) == 'B' && payload(1) == 'M',
      "BMP: bad magic (expected 'BM')")
    val pixOff = le32(payload, 10)
    val hdrSize = le32(payload, 14)
    require(hdrSize >= 40, s"BMP: info header $hdrSize < 40 (not a DIB)")
    val width = le32(payload, 18)
    val heightRaw = le32(payload, 22)
    // negative height = top-down row order (legal per the spec)
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    val bpp = le16(payload, 28)
    val compression = le32(payload, 30)
    require(width > 0 && height > 0, s"BMP: bad dims ${width}x$heightRaw")
    require(bpp == 24, s"BMP: bpp $bpp unsupported (24 only)")
    require(compression == 0, s"BMP: compression $compression unsupported")
    val stride = rowStride(width)
    require(payload.length >= pixOff + stride.toLong * height,
      s"BMP: truncated pixel array (need ${pixOff + stride.toLong * height}, " +
        s"have ${payload.length})")
    val luma = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val rowOff = pixOff + srcRow * stride
      var x = 0
      while (x < width) {
        val o = rowOff + x * 3
        val b = payload(o) & 0xff
        val g = payload(o + 1) & 0xff
        val r = payload(o + 2) & 0xff
        luma(y * width + x) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, luma)
  }

  /** Fixture/spec encoder: top-down (r, g, b) pixel function → standard
    * bottom-up 24-bpp BMP bytes (padding included) — what the specs and
    * the synthetic-payload oracle query decode back. */
  def encode(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"encode: bad dims ${width}x$height")
    val stride = rowStride(width)
    val pixBytes = stride * height
    val out = new Array[Byte](54 + pixBytes)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + pixBytes); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, width); putLe32(22, height)
    putLe16(26, 1); putLe16(28, 24); putLe32(30, 0); putLe32(34, pixBytes)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        val o = rowOff + x * 3
        out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** 2-D dHash over a decoded luma grid: box-filter the image to a
    * (cols+1)×rows cell grid of luma means and set bit (r·cols + c)
    * when cell (r, c) outshines its right neighbour — the SAME
    * brighter-than-neighbour rule as [[Multimodal.dhashSignatureOf]]'s
    * 1-D stream form, now fed by real pixels. cols=6, rows=8 → 48 bits,
    * inside the SimHash tier's 60-bit banding. Cell means compare via
    * cross-multiplied integer sums — no doubles, engine-exact. */
  def dhash(img: Image, cols: Int = 6, rows: Int = 8): Long = {
    require((cols) * rows <= 60, s"dhash bits ${cols * rows} > 60")
    val gw = cols + 1
    val sums = Array.ofDim[Long](rows, gw)
    val cnts = Array.ofDim[Long](rows, gw)
    var y = 0
    while (y < img.height) {
      val r = (y.toLong * rows / img.height).toInt
      var x = 0
      while (x < img.width) {
        val c = (x.toLong * gw / img.width).toInt
        sums(r)(c) += img.luma(y * img.width + x) & 0xff
        cnts(r)(c) += 1
        x += 1
      }
      y += 1
    }
    var sig = 0L
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        if (sums(r)(c) * cnts(r)(c + 1) > sums(r)(c + 1) * cnts(r)(c))
          sig |= 1L << (r * cols + c)
        c += 1
      }
      r += 1
    }
    sig
  }
}
