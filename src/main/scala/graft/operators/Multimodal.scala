package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.Tables

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata (BASELINE.json north star).
  *
  * FOUR REAL pure-JVM codecs run at the `mapPartitions` boundary — BMP
  * ([[BmpCodec]]), PNG ([[PngCodec]], all five 8-bit colorTypes + both
  * interlace methods), JPEG ([[JpegCodec]], baseline + progressive,
  * verified against the JDK encoder's bytes) and RIFF/WAVE PCM
  * ([[WavCodec]]) — all decoding to ONE shared top-down luma grid (or
  * PCM samples) so dHash and every near-dup tier reuse a single pixel
  * path. [[FakeCodec]] remains only as the generic-container stand-in
  * for formats outside that set (video etc.): same signature, same
  * per-partition batch shape, so swapping in a JNI/FFI decode keeps
  * every plan unchanged.
  */
object Multimodal {

  /** Typed metadata produced by "decoding" a binary payload. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, n_frames: Int)

  /** Deterministic fake codec: derives plausible metadata purely from the
    * payload bytes. A real implementation would parse the container header
    * here — same signature, same batch shape. */
  object FakeCodec {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
      MediaMeta(docId, n, fmt, (n % 640).toInt + 1, (n % 480).toInt + 1, (n % 24).toInt + 1)
    }

    /** Deterministic fake frame-sample: every `stride`-th byte, capped. */
    def sampleFrames(payload: Array[Byte], stride: Int, max: Int): Array[Byte] =
      payload.grouped(stride).map(_.head).take(max).toArray
  }

  /** The documents table viewed as a media table: text payload cast to an
    * opaque binary column (stands in for image/audio bytes). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"), col("lang"))

  /** Decode → typed metadata via mapPartitions: one iterator pass per
    * partition, no per-row closure dispatch, columnar output schema. This
    * is the pattern a real decode (or an Arrow-batched python worker)
    * plugs into. */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => FakeCodec.decode(id, bytes) })
  }

  /** Metadata projection as a DataFrame (oracle-comparable: the fake codec
    * formulas are pure byte-length arithmetic, expressible in SQL). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeMeta(spark, dir).toDF()
  }

  /** Frame-sampling stage shape: every `stride`-th byte (capped at `max`)
    * stands in for keyframe extraction. The sampled frames stay binary;
    * the query-facing projection emits their count and a checksum so the
    * result is oracle-comparable while the byte plumbing is exercised. */
  def frameSampleFeatures(spark: SparkSession, dir: String,
      stride: Int = 16, max: Int = 8): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val frames = FakeCodec.sampleFrames(bytes, stride, max)
          (id, frames.length, frames.map(b => (b & 0xff).toLong).sum)
        }
      }
      .toDF("doc_id", "n_sampled", "checksum")
  }

  /** Resize stage shape: the payload downsampled to a fixed `cells`-cell
    * grid of byte averages — the 1-D stand-in for image resizing (cell k
    * averages the bytes i with ⌊i·cells/n⌋ = k, the box-filter downsample
    * a real resize kernel generalizes). Payloads shorter than the grid are
    * dropped (a real pipeline routes them to a pad/upscale path). Same
    * mapPartitions batch shape as the decode; output is a fixed-width
    * array projected to flat columns. Cell means are rounded HALF_UP to 4
    * in the codec (matching SQL `round`) for oracle parity. */
  def resizeFeatures(spark: SparkSession, dir: String,
      cells: Int = 16): DataFrame = {
    import spark.implicits._
    val raw = mediaTable(spark, dir)
      .filter(length(col("payload")) >= cells)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val sums = new Array[Long](cells)
          val cnts = new Array[Long](cells)
          var i = 0
          while (i < n) {
            val k = (i.toLong * cells / n).toInt
            sums(k) += bytes(i) & 0xff; cnts(k) += 1; i += 1
          }
          (id, (0 until cells).map(k => BigDecimal(sums(k).toDouble / cnts(k))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray)
        }
      }
      .toDF("doc_id", "grid")
    val gridCols = (0 until cells).map(k => element_at(col("grid"), k + 1).as(s"t$k"))
    raw.select(col("doc_id") +: gridCols: _*)
  }

  /** Perceptual (difference) hash over the payload: the byte stream
    * box-filters to `cells` cell averages (the [[resizeFeatures]] grid)
    * and bit j records whether cell j's mean exceeds cell j+1's — the
    * 1-D dHash, the standard near-dup fingerprint for images (a real
    * image codec would feed a 2-D luma grid into the SAME bit rule).
    * 61 cells → 60 bits, so the fingerprint drops straight into the
    * SimHash tier's Hamming banding.
    *
    * The comparison is EXACT integer arithmetic — cell means compare via
    * cross-multiplied byte sums (sum_a·n_b > sum_b·n_a), no doubles, so
    * the signature is bit-identical in any engine. Payloads shorter than
    * the grid are dropped (the resize contract). */
  def dhashSignature(spark: SparkSession, dir: String,
      cells: Int = 61): DataFrame =
    dhashSignatureOf(mediaTable(spark, dir), cells)

  /** [[dhashSignature]] over an explicit (doc_id, payload) relation —
    * what specs use to plant near-identical payloads. */
  def dhashSignatureOf(media: DataFrame, cells: Int = 61): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(cells - 1 <= 60, s"dHash bits = cells-1 must fit 60; got $cells")
    media
      .filter(length(col("payload")) >= cells)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val sums = new Array[Long](cells)
          val cnts = new Array[Long](cells)
          var i = 0
          while (i < n) {
            val k = (i.toLong * cells / n).toInt
            sums(k) += bytes(i) & 0xff; cnts(k) += 1; i += 1
          }
          var sig = 0L
          var j = 0
          while (j < cells - 1) {
            if (sums(j) * cnts(j + 1) > sums(j + 1) * cnts(j)) sig |= 1L << j
            j += 1
          }
          (id, sig)
        }
      }.toDF("doc_id", "phash")
  }

  /** Multimodal near-dup pairs: dHash fingerprints through the SimHash
    * tier's chunk banding ([[Dedup.simhashPairsFromChunks]]) — pigeonhole
    * completeness for Hamming ≤ 3 and the same hot-bucket star cap, so a
    * mass-duplicated payload expands linearly, never quadratically. */
  def phashPairs(spark: SparkSession, dir: String, maxDist: Int = 3,
      maxBucket: Int = Dedup.MaxBucket): DataFrame =
    phashPairsOf(mediaTable(spark, dir), maxDist, maxBucket)

  def phashPairsOf(media: DataFrame, maxDist: Int = 3,
      maxBucket: Int = Dedup.MaxBucket): DataFrame =
    Dedup.simhashPairsFromChunks(
      Dedup.chunksOfSignatures(
        dhashSignatureOf(media).withColumnRenamed("phash", "simhash")),
      maxDist, maxBucket)

  /** Deterministic synthetic BMP per doc id: width 4..7 (3·w mod 4 hits
    * every row-padding case), height 3..5, channel formula
    * base = id·7 + y·w + x, (r, g, b) = (base, base+85, base+170) mod
    * 256. ENCODED to real BMP bytes and DECODED back by the real parser
    * — header, bottom-up rows, padding all exercised; the pixel formula
    * gives the oracle a closed form to check the decode against. */
  private def syntheticBmp(id: Long): (Array[Byte], BmpCodec.Image) = {
    val w = (4 + id % 4).toInt
    val h = (3 + id % 3).toInt
    val payload = BmpCodec.encode(w, h, (x, y) => {
      val base = id * 7 + y.toLong * w + x
      ((base % 256).toInt, ((base + 85) % 256).toInt,
        ((base + 170) % 256).toInt)
    })
    (payload, BmpCodec.decode(payload))
  }

  /** REAL-codec roundtrip stats: per doc, the synthetic BMP's decoded
    * dimensions, byte size and luma census. The oracle recomputes the
    * luma census straight from the pixel formula — any header, stride,
    * row-order or channel-order bug in [[BmpCodec]] shows up as a
    * mismatch. Map-side only; no shuffle beyond the scan. */
  def bmpRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (payload, img) = syntheticBmp(id)
        val lum = img.luma.map(_ & 0xff)
        (id, img.width, img.height, payload.length.toLong,
          lum.map(_.toLong).sum, lum.min, lum.max)
      })
      .toDF("doc_id", "width", "height", "n_bytes",
        "luma_sum", "luma_min", "luma_max")
  }

  /** REAL-pixel 2-D dHash ([[BmpCodec.dhash]]: 6×8 brighter-than-right-
    * neighbour bits over the decoded luma grid) on the synthetic BMPs —
    * the real-payload twin of [[dhashSignature]]'s 1-D byte-stream form.
    * Cell means compare via cross-multiplied integer sums, so the oracle
    * replays the identical bits from the pixel formula. */
  def bmpDhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (_, img) = syntheticBmp(id)
        (id, BmpCodec.dhash(img))
      })
      .toDF("doc_id", "phash")
  }

  /** 16-entry fixture palette for colorType-3 PNGs: entry j =
    * (17j, (17j+85) mod 256, (17j+170) mod 256) — 17·15 = 255, so the
    * red channel IS 17j exactly and the oracle luma closed form stays
    * pure integer arithmetic on the index. */
  private val PngPalette: Array[(Int, Int, Int)] =
    Array.tabulate(16)(j => (j * 17, (j * 17 + 85) % 256, (j * 17 + 170) % 256))

  /** Deterministic synthetic PNG per doc id: the SAME pixel base
    * formula as [[syntheticBmp]] (base = id·7 + y·w + x), width 4..7,
    * height 3..5, colorType CYCLING through all five 8-bit PNG classes
    * by id mod 5 — 0 grayscale (gray = base mod 256), 2 RGB, 3 palette
    * (index = base mod 16 into [[PngPalette]]), 4 gray+alpha, 6 RGBA —
    * alpha (base+40 mod 256) planted but luma-invisible — the scanline
    * filter cycling through all five PNG filter types ((id + y) mod 5),
    * and EVEN ids encoded ADAM7-INTERLACED (seven independently-
    * filtered passes; decoded pixels are identical, so the luma oracle
    * needs no interlace term — but a deinterlace bug in any pass
    * scatter/filter chain breaks the census), so the oracled path
    * itself proves every filter inverse, every colorType's pixel path
    * (PLTE lookup included), BOTH interlace methods, zlib round-trip,
    * chunk framing and CRC. */
  private def syntheticPng(id: Long): (Array[Byte], PngCodec.Decoded) = {
    val w = (4 + id % 4).toInt
    val h = (3 + id % 3).toInt
    val colorType = Array(0, 2, 3, 4, 6)((id % 5).toInt)
    val payload = PngCodec.encode(w, h, colorType, (x, y) => {
      val base = id * 7 + y.toLong * w + x
      val r = if (colorType == 3) (base % 16).toInt else (base % 256).toInt
      (r, ((base + 85) % 256).toInt,
        ((base + 170) % 256).toInt, ((base + 40) % 256).toInt)
    }, y => ((id + y) % 5).toInt,
      palette = if (colorType == 3) PngPalette else null,
      interlace = id % 2 == 0)
    (payload, PngCodec.decodeInfo(payload))
  }

  /** REAL-codec PNG roundtrip stats: per doc, the synthetic PNG's
    * decoded dimensions, OBSERVED colorType (parsed from IHDR by the
    * decoder — not recomputed from the fixture, so a decoder that
    * mis-handles one colorType's bpp cannot silently satisfy the
    * oracle) and luma census — the PNG twin of [[bmpRoundtrip]] (byte
    * size is NOT oracled: deflate output is not SQL-replayable). Any
    * filter-inverse, palette-lookup, zlib, chunk-walk or CRC bug in
    * [[PngCodec]] shows up as a mismatch. Map-side only; no shuffle
    * beyond the scan. */
  def pngRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (_, dec) = syntheticPng(id)
        val img = dec.image
        val lum = img.luma.map(_ & 0xff)
        (id, img.width, img.height, dec.colorType,
          lum.map(_.toLong).sum, lum.min, lum.max)
      })
      .toDF("doc_id", "width", "height", "color_type",
        "luma_sum", "luma_min", "luma_max")
  }

  /** SUB-BYTE PNG roundtrip (r17): per doc, a 1/2/4-bit (by id mod 3)
    * grayscale (even ids) or palette (odd ids) PNG — the B/W-scan and
    * small-icon classes of a real scrape — with cycling filters and
    * Adam7 on half the ids; samples s(x,y) = (id·3 + y·w + x) mod 2^d,
    * gray scaled ×255/(2^d−1) per the spec, palette entry j =
    * (17j, 17j+85, 17j+170) mod 256 through Rec.601 — closed form all
    * the way. Any bit-unpacking, ceil-stride, filter-distance or
    * per-pass packing bug is a hash mismatch. Map-side only. */
  def pngSubByteRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val d = Array(1, 2, 4)((id % 3).toInt)
        val maxV = (1 << d) - 1
        val ct = if (id % 2 == 0) 0 else 3
        val w = (5 + id % 6).toInt
        val h = (4 + id % 3).toInt
        val pal = (0 to maxV).map(j =>
          ((17 * j) % 256, (17 * j + 85) % 256, (17 * j + 170) % 256))
          .toArray
        val bytes = PngCodec.encode(w, h, ct,
          (x, y) => (((id * 3 + y.toLong * w + x) % (maxV + 1)).toInt,
            0, 0, 0),
          y => ((id + y) % 5).toInt,
          palette = if (ct == 3) pal else null,
          interlace = id % 4 < 2, bitDepth = d)
        val dec = PngCodec.decodeInfo(bytes)
        val lum = dec.image.luma.map(_ & 0xff)
        (id, d, dec.colorType, dec.image.width, dec.image.height,
          lum.map(_.toLong).sum, lum.min, lum.max)
      })
      .toDF("doc_id", "bit_depth", "color_type", "width", "height",
        "luma_sum", "luma_min", "luma_max")
  }

  /** Synthetic GIF per doc id (r18): palette size cycles 4/16/256 by
    * id mod 3, pixel index v(x,y) = (id·3 + y·w + x) mod palSize,
    * palette entry j = ((37j) mod 256, (73j+19) mod 256, (131j+7) mod
    * 256) — closed form all the way. Even ids INTERLACE (the 4-pass
    * row schedule), every 5th id carries a LOCAL color table, every
    * 3rd a multi-block comment extension — so the oracled path itself
    * proves LZW (dynamic widths + KwKwK), both table scopes, extension
    * traversal and deinterlacing. */
  private def syntheticGif(id: Long): GifCodec.Decoded = {
    val palSize = Array(4, 16, 256)((id % 3).toInt)
    val w = (5 + id % 6).toInt
    val h = (4 + id % 5).toInt
    val pal = Array.tabulate(palSize)(j =>
      ((37 * j) % 256, (73 * j + 19) % 256, (131 * j + 7) % 256))
    val bytes = GifCodec.encode(w, h, pal,
      (x, y) => ((id * 3 + y.toLong * w + x) % palSize).toInt,
      interlace = id % 2 == 0,
      localPalette = id % 5 == 0,
      comment = if (id % 3 == 0) Some("c" * (1 + (id % 7)).toInt) else None)
    GifCodec.decode(bytes)
  }

  /** REAL-codec GIF roundtrip stats (r18): per doc, the synthetic GIF's
    * decoded dimensions, frame count, luma census AND the
    * position-weighted luma sum Σ(i+1)·luma(i) over DISPLAY order —
    * sum/min/max are invariant under row permutation, so the weighted
    * term is what catches a deinterlace bug. The oracle recomputes
    * everything from the pixel/palette closed form. Map-side only. */
  def gifRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val dec = syntheticGif(id)
        val lum = dec.image.luma.map(_ & 0xff)
        val wsum = lum.zipWithIndex
          .map { case (l, i) => (i + 1).toLong * l }.sum
        (id, dec.image.width, dec.image.height, dec.nFrames,
          lum.map(_.toLong).sum, lum.min, lum.max, wsum)
      })
      .toDF("doc_id", "width", "height", "n_frames",
        "luma_sum", "luma_min", "luma_max", "luma_wsum")
  }

  /** Deterministic synthetic JPEG per doc id, through a REAL FOREIGN
    * encoder (the JDK's ImageIO JPEG writer — bytes this codebase never
    * produced): flat gray g = (id·37) mod 256, width 8 + id mod 17,
    * height 8 + id mod 13 (edge MCUs in BOTH dimensions, since the JDK
    * writer's 3-component MCU is 16×16), EVEN ids grayscale (one
    * component), ODD ids gray-valued RGB (three components, chroma
    * subsampled by the writer — the full YCbCr upsample/convert path),
    * quality 1.0 (unit quantization tables), and every id ≡ 2 mod 3
    * encoded PROGRESSIVE (the JDK writer's standard SOF2 scan script —
    * spectral selection, successive approximation, DC/AC refinement
    * passes; decoded pixels are identical, so the luma oracle needs no
    * progressive term, but any EOBRUN/refinement bug breaks the
    * census). Flat blocks are DC-only and survive quality-1.0 JPEG
    * bit-exactly, so the decode oracle is closed-form: luma ≡ g over
    * w·h pixels. */
  private def syntheticJpeg(id: Long): (Int, JpegCodec.Decoded) = {
    val g = ((id * 37) % 256).toInt
    val w = (8 + id % 17).toInt
    val h = (8 + id % 13).toInt
    val payload = JpegCodec.encode(w, h, gray = id % 2 == 0,
      (_, _) => (g, g, g), progressive = id % 3 == 2)
    (g, JpegCodec.decode(payload))
  }

  /** REAL-codec JPEG roundtrip stats: per doc, the synthetic JPEG's
    * decoded dimensions, OBSERVED component count (parsed from SOF0 by
    * the decoder) and luma census — the JPEG twin of [[pngRoundtrip]].
    * Any marker-walk, Huffman, dequant, IDCT, upsample or color-convert
    * bug in [[JpegCodec]] shows up as a mismatch. Map-side only. */
  def jpegRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (_, dec) = syntheticJpeg(id)
        val img = dec.image
        val lum = img.luma.map(_ & 0xff)
        (id, img.width, img.height, dec.nComponents,
          lum.map(_.toLong).sum, lum.min, lum.max)
      })
      .toDF("doc_id", "width", "height", "n_components",
        "luma_sum", "luma_min", "luma_max")
  }

  /** EXIF-ROTATED JPEG roundtrip (r17): per doc, a 16×24 grid of six
    * flat 8×8 blocks v_k = (id·37 + 40k) mod 256 (DC-exact at quality
    * 1.0 through the foreign JDK encoder), with orientation
    * 1 + id mod 8 spliced as a REAL Exif APP1 TIFF — little-endian on
    * even ids, big-endian on odd — decoded through
    * [[JpegCodec.decodeOriented]]. The oriented dimensions, the two
    * corner pixels and the (rotation-invariant) luma sum each have a
    * closed form, and together they separate all 8 orientations — any
    * APP1-walk, TIFF-endianness or rotation-mapping bug is a hash
    * mismatch. Map-side only. */
  def jpegExifRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val o = (1 + id % 8).toInt
        val raw = JpegCodec.encode(16, 24, gray = true,
          (x, y) => {
            val v = ((id * 37 + 40 * ((y / 8) * 2 + x / 8)) % 256).toInt
            (v, v, v)
          })
        val dec = JpegCodec.decodeOriented(
          JpegCodec.spliceExifOrientation(raw, o, bigEndian = id % 2 == 1))
        val img = dec.image
        val lum = img.luma.map(_ & 0xff)
        (id, o, img.width, img.height, lum.map(_.toLong).sum,
          lum.head, lum.last)
      })
      .toDF("doc_id", "orientation", "width", "height", "luma_sum",
        "tl", "br")
  }

  /** Synthetic PCM clip for doc `id`: n = 96 + id mod 64 mono samples at
    * 8 kHz, sample(i) = (id·13 + i²·3 + i·11) mod 4096 − 2048 — all
    * integer, SQL-replayable. ENCODED to real RIFF/WAVE bytes (every
    * third doc also gets a LIST junk chunk of odd size planted BEFORE
    * fmt/data, so the oracled path itself proves chunk skipping and
    * even-boundary padding) and DECODED back by the real parser. */
  private def syntheticWav(id: Long): WavCodec.Pcm = {
    val n = (96 + id % 64).toInt
    val samples = Array.tabulate(n) { i =>
      ((id * 13 + i.toLong * i * 3 + i * 11) % 4096 - 2048).toShort
    }
    val junk = if (id % 3 == 0) Some(Array.fill(((id % 5) + 1).toInt)('A'.toByte))
               else None
    // stored depth cycles 16 / 24 / 8 / float32 by id mod 4 (r18):
    // 24-bit and IEEE-float32 (s/32768 is exact binary32) roundtrip the
    // 16-bit logical samples exactly; the 8-bit cohort floor-quantizes
    // to multiples of 256 — the oracle replays the same quantization
    val bits = (id % 4) match {
      case 1 => 24; case 2 => 8; case 3 => 32; case _ => 16 }
    WavCodec.decode(WavCodec.encode(8000, 1, samples, junk, bits))
  }

  /** Activity threshold for the frame-energy census (a VAD stand-in). */
  private val WavActiveThreshold = 20000000L

  /** REAL-codec audio roundtrip: per doc, the synthetic clip's decoded
    * sample count, exact energy (Σs²), peak, zero crossings, active
    * 16-sample frames, and integer duration. The oracle recomputes all
    * of it from the sample closed form — any chunk-traversal, padding,
    * or little-endian decode bug in [[WavCodec]] shows up as a
    * mismatch. Map-side only; no shuffle beyond the scan. */
  def wavRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val pcm = syntheticWav(id)
        val f = WavCodec.features(pcm, WavActiveThreshold)
        (id, f.nSamples, f.energy, f.peak, f.zeroCrossings,
          f.activeFrames, f.durationDeciMs)
      })
      .toDF("doc_id", "n_samples", "energy", "peak", "zero_crossings",
        "active_frames", "duration_deci_ms")
  }

  /** Deterministic synthetic Adobe-family JPEG per doc id — the three
    * APP14 color families by id mod 3: inverted-CMYK (transform 0,
    * 4 components), YCCK (transform 2 — gray CMY rides the YCbCr
    * inverse exactly at zero chroma, K separate), and 3-component
    * DIRECT RGB (transform 0). Flat unit-quantized planes decode
    * bit-exactly, so each doc's single luma value is closed-form. */
  private def syntheticAdobeJpeg(id: Long): (Int, JpegCodec.Decoded) = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val a = ((id * 31) % 256).toInt
    val b = ((id * 59 + 7) % 256).toInt
    val c = ((id * 83 + 13) % 256).toInt
    val k = ((id * 41 + 99) % 256).toInt
    val s = ((id * 37) % 256).toInt
    val sk = ((id * 53 + 11) % 256).toInt
    val (stored, transform) = (id % 3) match {
      case 0 => (Array(a, b, c, k), 0)
      case 1 => (Array(s, 128, 128, sk), 2)
      case _ => (Array(a, b, c), 0)
    }
    val expect = (id % 3) match {
      case 0 =>
        val (r, g, bb) = (a * k / 255, b * k / 255, c * k / 255)
        (299 * r + 587 * g + 114 * bb) / 1000
      case 1 => s * sk / 255
      case _ => (299 * a + 587 * b + 114 * c) / 1000
    }
    (expect, JpegCodec.decode(JpegCodec.encodeAdobe(w, h, stored, transform)))
  }

  /** 12-bit extended-sequential roundtrip stats (r18): flat 12-bit
    * planes (grayscale on even ids; zero-chroma YCbCr on odd) decode
    * bit-exactly at 12-bit then narrow to the shared 8-bit luma path
    * at the standard top-8-bits scaling — luma = v >> 4, closed form. */
  def jpeg12Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + id % 7).toInt
        val stored =
          if (id % 2 == 0) Array(((id * 97 + 5) % 4096).toInt)
          else Array(((id * 61 + 31) % 4096).toInt, 2048, 2048)
        val dec = JpegCodec.decode(JpegCodec.encodeAdobe(w, h, stored,
          transform = -1, precision = 12))
        val lum = dec.image.luma.map(_ & 0xff)
        (id, dec.image.width, dec.image.height, dec.nComponents,
          lum.min, lum.max, lum.map(_.toLong).sum)
      })
      .toDF("doc_id", "width", "height", "n_comp",
        "luma_min", "luma_max", "luma_sum")
  }

  /** Lossless-JPEG (SOF3) roundtrip stats (r18): full 2-D gradients —
    * lossless streams roundtrip exactly, so the fixtures are NOT flat:
    * predictor cycles 1-7 by id, precision cycles 8/12/16, and the
    * position-weighted luma sum catches any predictor or restart
    * misplacement a flat fixture would hide. */
  def jpegLosslessRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (5 + id % 12).toInt
        val h = (5 + id % 9).toInt
        val pred = (1 + id % 7).toInt
        val p = Array(8, 12, 16)(((id / 7) % 3).toInt)
        val mod = 1 << p
        val dec = JpegCodec.decode(JpegCodec.encodeLossless(w, h, p, pred,
          (x, y) => ((id * 3 + x * 37 + y * 91) % mod).toInt))
        val lum = dec.image.luma.map(_ & 0xff)
        val wsum = lum.zipWithIndex
          .map { case (l, i) => (i + 1).toLong * l }.sum
        (id, dec.image.width, dec.image.height,
          lum.min, lum.max, lum.map(_.toLong).sum, wsum)
      })
      .toDF("doc_id", "width", "height",
        "luma_min", "luma_max", "luma_sum", "luma_wsum")
  }

  /** Adobe-family JPEG roundtrip stats (r18): dims, component count,
    * the decoded (flat) luma value and its w·h-weighted census — the
    * closed-form side of the CMYK/YCCK/direct-RGB conversion claims. */
  def jpegCmykRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (_, dec) = syntheticAdobeJpeg(id)
        val lum = dec.image.luma.map(_ & 0xff)
        (id, dec.image.width, dec.image.height, dec.nComponents,
          lum.min, lum.max, lum.map(_.toLong).sum)
      })
      .toDF("doc_id", "width", "height", "n_comp",
        "luma_min", "luma_max", "luma_sum")
  }

  /** Animated-GIF compositing census (r18): per doc, a 2-4 frame
    * animation of offset 4x3 rects over a 16-color palette — even ids
    * dispose NONE (frames accumulate; a pixel shows the LAST covering
    * frame), odd ids dispose RESTORE-BACKGROUND (each frame erases
    * itself; the final canvas shows only the last frame's rect over
    * background). The final composited canvas census is closed-form:
    * the covering frame index is min(x, y, nf-1) when >= max(x-3,
    * y-2, 0). Exercises decodeAnimation + composite end to end. */
  def gifFramesRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pal = Array.tabulate(16)(j =>
      ((37 * j) % 256, (73 * j + 19) % 256, (131 * j + 7) % 256))
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + id % 6).toInt
        val h = (6 + id % 5).toInt
        val nf = (2 + id % 3).toInt
        val disposal = if (id % 2 == 0) 0 else 2
        val frames = (0 until nf).map { k =>
          GifCodec.FrameSpec(k, k, 4, 3,
            (x, y) => ((x + y * 2 + k * 3 + id) % 16).toInt,
            disposal = disposal)
        }
        val anim = GifCodec.decodeAnimation(
          GifCodec.encodeAnimation(w, h, pal, frames))
        val last = GifCodec.composite(anim).last
        val lum = last.luma.map(_ & 0xff)
        val wsum = lum.zipWithIndex
          .map { case (l, i) => (i + 1).toLong * l }.sum
        (id, anim.frames.size, anim.width, anim.height,
          lum.map(_.toLong).sum, lum.min, lum.max, wsum)
      })
      .toDF("doc_id", "n_frames", "width", "height",
        "luma_sum", "luma_min", "luma_max", "luma_wsum")
  }

  /** TIFF roundtrip census (r18): four photometric families by id mod
    * 4 — 8-bit gray BlackIsZero, 4-bit gray WHITE-IS-ZERO (inverted +
    * x17 scaling), 8-bit RGB, 16-entry palette — cycling byte order,
    * PackBits on every 3rd id, RowsPerStrip 1-4 (multi-strip always).
    * Pixels keep integer closed forms the DuckDB oracle replays. */
  def tiffRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (6 + id % 11).toInt
        val h = (5 + id % 8).toInt
        val fam = (id % 4).toInt
        val cmap = Array.tabulate(48) { i =>
          val j = i % 16
          (i / 16 match {
            case 0 => (37 * j) % 256
            case 1 => (73 * j + 19) % 256
            case _ => (131 * j + 7) % 256
          }) << 8
        }
        val bytes = fam match {
          case 0 => TiffCodec.encode(w, h, photometric = 1, bps = 8,
            (x, y) => ((id * 7 + x * 3 + y * 5) % 256).toInt,
            bigEndian = id % 2 == 1, packBits = id % 3 == 0,
            rowsPerStrip = 1 + (id % 4).toInt)
          case 1 => TiffCodec.encode(w, h, photometric = 0, bps = 4,
            (x, y) => ((x + y + id) % 16).toInt,
            bigEndian = id % 2 == 1, packBits = id % 3 == 0,
            rowsPerStrip = 1 + (id % 4).toInt)
          case 2 => TiffCodec.encode(w, h, photometric = 2, bps = 8,
            (x, y) => ((((id * 7 + x * 3 + y * 5) % 256) << 16) |
              (((id * 11 + x * 2 + y * 7) % 256) << 8) |
              ((id * 13 + x * 5 + y * 3) % 256)).toInt,
            bigEndian = id % 2 == 1, packBits = id % 3 == 0,
            rowsPerStrip = 1 + (id % 4).toInt)
          case _ => TiffCodec.encode(w, h, photometric = 3, bps = 8,
            (x, y) => ((x + y * 3 + id) % 16).toInt,
            bigEndian = id % 2 == 1, packBits = id % 3 == 0,
            rowsPerStrip = 1 + (id % 4).toInt,
            colorMap = Array.tabulate(768)(i =>
              if (i % 256 < 16) cmap(i / 256 * 16 + i % 256) else 0))
        }
        val dec = TiffCodec.decode(bytes)
        val lum = dec.image.luma.map(_ & 0xff)
        val wsum = lum.zipWithIndex
          .map { case (l, i) => (i + 1).toLong * l }.sum
        (id, dec.image.width, dec.image.height, dec.compression,
          dec.photometric, dec.bitsPerSample,
          lum.map(_.toLong).sum, lum.min, lum.max, wsum)
      })
      .toDF("doc_id", "width", "height", "compression", "photometric",
        "bps", "luma_sum", "luma_min", "luma_max", "luma_wsum")
  }

  /** Deterministic synthetic WebP per doc id — five encode shapes by
    * id mod 5, so every VP8L decode path runs across the corpus:
    * 0 = bare literals + 6-bit color cache; 1 = predictor transform
    * (mode (id/5) mod 14 — all 14 modes across ids) over subtract-green,
    * block bits 2+(id mod 3); 2 = color-indexing palette sized
    * 2/5/17/200 by (id/5) mod 4 (1/2/4/8-bit pixel packing);
    * 3 = greedy LZ77 (blocky pixels force dist-1 and dist-w refs) +
    * 4-bit cache over subtract-green; 4 = VP8X extended container
    * (EXIF chunk the walker must skip) + predictor modes 11-13 (Select
    * / ClampAddSubtractFull / Half). Pixels keep integer closed forms
    * the DuckDB oracle replays. */
  private def syntheticWebp(id: Long): WebpCodec.Decoded = {
    val w = (4 + id % 13).toInt
    val h = (4 + id % 11).toInt
    val mode = (id % 5).toInt
    val ps = Array(2, 5, 17, 200)(((id / 5) % 4).toInt)
    def rgb(x: Int, y: Int): Int = mode match {
      case 2 =>
        val j = (x + y * 3 + id) % ps
        (0xff000000 | (((37 * j) % 256) << 16) |
          (((73 * j + 19) % 256) << 8) | ((131 * j + 7) % 256)).toInt
      case 3 =>
        val xb = x / 4; val yb = y / 2
        (0xff000000 | (((id * 7 + xb * 3 + yb * 5) % 256) << 16) |
          (((id * 11 + xb * 2 + yb * 7) % 256) << 8) |
          ((id * 13 + xb * 5 + yb * 3) % 256)).toInt
      case _ =>
        (0xff000000 | (((id * 7 + x * 3 + y * 5) % 256) << 16) |
          (((id * 11 + x * 2 + y * 7) % 256) << 8) |
          ((id * 13 + x * 5 + y * 3) % 256)).toInt
    }
    val bytes = mode match {
      case 0 => WebpCodec.encode(w, h, rgb, cacheBits = 6)
      case 1 => WebpCodec.encode(w, h, rgb, subtractGreen = true,
        predictorMode = ((id / 5) % 14).toInt,
        predictorBits = 2 + (id % 3).toInt)
      case 2 => WebpCodec.encode(w, h, rgb, palette = true)
      case 3 => WebpCodec.encode(w, h, rgb, subtractGreen = true,
        cacheBits = 4, lz77 = true)
      case _ => WebpCodec.encode(w, h, rgb,
        predictorMode = 11 + (id % 3).toInt, extended = true)
    }
    WebpCodec.decode(bytes)
  }

  /** REAL-codec WebP (VP8L lossless) roundtrip stats (r18): per doc,
    * decoded dims, container/transform facts, luma census AND the
    * position-weighted luma sum over display order — sum/min/max are
    * row-permutation-invariant, so the weighted term is what catches a
    * predictor-reconstruction or LZ77-placement bug. The oracle
    * recomputes everything from the pixel closed form. Map-side only. */
  def webpRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val dec = syntheticWebp(id)
        val lum = dec.image.luma.map(_ & 0xff)
        val wsum = lum.zipWithIndex
          .map { case (l, i) => (i + 1).toLong * l }.sum
        (id, dec.image.width, dec.image.height,
          if (dec.extended) 1 else 0, dec.nTransforms, dec.paletteSize,
          dec.cacheBits, lum.map(_.toLong).sum, lum.min, lum.max, wsum)
      })
      .toDF("doc_id", "width", "height", "is_ext", "n_tf", "pal_size",
        "cache_bits", "luma_sum", "luma_min", "luma_max", "luma_wsum")
  }

  /** Feature-extraction stage shape: binary payload → fixed-width feature
    * vector (here: byte histogram over 16 buckets — bucket = the byte's
    * high nibble). Real embeddings would replace the histogram; the
    * exchange/shuffle profile is identical.
    *
    * Counts are emitted as 16 FLAT integer columns h0..h15 (not an array):
    * integer-exact for the oracle compare, and the identical histogram is
    * SQL-expressible — bucket k's count is the number of odd-position hex
    * digits equal to k in hex(payload). */
  def byteHistogramFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Long](16)
          bytes.foreach(b => hist((b & 0xff) / 16) += 1L)
          (id, bytes.length.toLong, hist)
        }
      }
      .toDF("doc_id", "n_bytes", "hist")
    val histCols = (0 until 16).map(k => element_at(col("hist"), k + 1).as(s"h$k"))
    raw.select(col("doc_id") +: col("n_bytes") +: histCols: _*)
  }
}
