package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.lake.{Ingest, LakePaths, Readers, Tables, Writers}
import graft.operators._
import graft.streaming.{Alerts, Funnel, Sessions}
import RegistryShared._

/** Registry slice — multimodal binary columns: metadata, histograms, frames, resize, dHash near-dup.
  * Split out of SparkEntry (same conventions; see SparkEntry scaladoc). */
object MultimodalRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- multimodal (north star; codec stubbed, plumbing real)
    "q_mm_meta" -> ((s, d) => Multimodal.mediaMeta(s, d)),
    "q_mm_hist" -> ((s, d) => Multimodal.byteHistogramFeatures(s, d)),
    "q_mm_resize" -> ((s, d) => Multimodal.resizeFeatures(s, d)),
    "q_mm_frames" -> ((s, d) => Multimodal.frameSampleFeatures(s, d)),
    // 1-D dHash fingerprint — exact integer cell-mean comparisons
    "q_mm_phash" -> ((s, d) => Multimodal.dhashSignature(s, d)),
    // multimodal near-dup pairs: dHash through the SimHash chunk banding
    "q_mm_phash_pairs" -> ((s, d) => Multimodal.phashPairs(s, d)),
    // REAL codec roundtrip: synthetic 24-bpp BMPs (all 4 row-padding
    // cases) encoded then decoded by the real parser; the oracle
    // recomputes the luma census from the pixel formula — decode bugs
    // (stride, row order, BGR order, header offsets) = hash mismatch
    "q_mm_bmp_decode" -> ((s, d) => Multimodal.bmpRoundtrip(s, d)),
    // REAL-pixel 2-D dHash (6x8 grid over decoded luma) — exact
    // cross-multiplied cell comparisons, oracle replays identical bits
    "q_mm_bmp_phash" -> ((s, d) => Multimodal.bmpDhash(s, d)),
    // REAL PNG codec roundtrip: synthetic 8-bit PNGs cycling ALL FIVE
    // colorTypes (gray 0/4, RGB/RGBA 2/6, palette 3 with PLTE lookup)
    // AND all five row filters, zlib + chunk CRCs, encoded then decoded
    // by the real parser; color_type is the DECODER's parsed IHDR value
    // and the oracle recomputes the luma census per class — any
    // filter-inverse, palette or inflate bug = hash mismatch
    "q_mm_png_decode" -> ((s, d) => Multimodal.pngRoundtrip(s, d)),
    // SUB-BYTE PNGs (r17): 1/2/4-bit gray + palette, cycling filters,
    // Adam7 on half the ids — bit unpacking, ceil stride and the
    // 1-byte filter distance all closed-form oracled
    "q_mm_png_subbyte" -> ((s, d) => Multimodal.pngSubByteRoundtrip(s, d)),
    // REAL GIF decode (r18): LZW (dynamic widths, KwKwK), global AND
    // local color tables, interlace, extension traversal — the luma
    // census plus a POSITION-WEIGHTED sum (which catches deinterlace
    // bugs that permutation-invariant stats cannot), all closed-form
    "q_mm_gif_decode" -> ((s, d) => Multimodal.gifRoundtrip(s, d)),
    // TIFF baseline (r18): both byte orders, multi-strip, PackBits,
    // gray 8/4-bit (incl. WhiteIsZero inversion), RGB, palette — the
    // JDK-LZW path is spec-covered; the oracle replays the census
    "q_mm_tiff_decode" -> ((s, d) => Multimodal.tiffRoundtrip(s, d)),
    // ANIMATED GIF compositing (r18): multi-frame decode + disposal
    // rules, final-canvas census closed-form (last-covering-frame
    // arithmetic for disposal NONE, last-rect-only for RESTORE-BG)
    "q_mm_gif_frames" -> ((s, d) => Multimodal.gifFramesRoundtrip(s, d)),
    // REAL WebP VP8L decode (r18): five encode shapes by id — bare
    // literals + color cache, predictor transform (all 14 modes across
    // ids) over subtract-green, packed palettes (1/2/4/8-bit), greedy
    // LZ77 through the 2D distance map, VP8X extended container — the
    // luma census plus the position-weighted sum that catches predictor
    // or backref placement bugs, all closed-form
    "q_mm_webp_decode" -> ((s, d) => Multimodal.webpRoundtrip(s, d)),
    // Adobe APP14 families (r18): inverted-CMYK, YCCK, direct RGB —
    // flat unit-quantized 3/4-component baseline streams through the
    // REAL decode path; the conversion arithmetic is the closed form
    "q_mm_jpeg_cmyk" -> ((s, d) => Multimodal.jpegCmykRoundtrip(s, d)),
    // 12-bit extended sequential (r18): SOF1 streams at precision 12
    // through the real Huffman/IDCT path, narrowed to 8-bit luma
    "q_mm_jpeg_12bit" -> ((s, d) => Multimodal.jpeg12Roundtrip(s, d)),
    // LOSSLESS SOF3 (r18): predictor residual coding over real 2-D
    // gradients (exact roundtrip, so nothing need be flat); the
    // weighted sum pins sample placement
    "q_mm_jpeg_lossless" -> ((s, d) => Multimodal.jpegLosslessRoundtrip(s, d)),
    // REAL audio codec roundtrip: synthetic 8/16/24-bit PCM encoded to
    // RIFF/WAVE (junk LIST chunks planted on every 3rd doc) then decoded
    // by the real parser; integer-exact energy/peak/zc/VAD features —
    // chunk-traversal, padding, or le16 bugs = hash mismatch
    "q_mm_wav_decode" -> ((s, d) => Multimodal.wavRoundtrip(s, d)),
    // REAL JPEG decode of a FOREIGN encoder's bytes (the JDK ImageIO
    // writer): flat quality-1.0 fixtures round-trip DC-exactly, so the
    // luma census has a closed form; grayscale and subsampled-YCbCr
    // streams alternate by id, and every third id is PROGRESSIVE
    // (SOF2 multi-scan) — marker walk, Huffman, dequant, IDCT,
    // upsample, color-convert or progressive-scan bugs = hash mismatch
    "q_mm_jpeg_decode" -> ((s, d) => Multimodal.jpegRoundtrip(s, d)),
    // EXIF orientation (r17): a real Exif APP1 (both TIFF byte orders)
    // spliced onto foreign-encoded JPEGs; decodeOriented rotates the
    // luma grid — oriented dims, corner pixels and the invariant luma
    // sum separate all 8 orientations in closed form
    "q_mm_jpeg_exif" -> ((s, d) => Multimodal.jpegExifRoundtrip(s, d)),
  )

  /** Shared pixel-formula CTEs for the BMP oracles: doc dims + the
    * per-pixel luma closed form (exact integer Rec.601 on the planted
    * (base, base+85, base+170) mod-256 channels, top-down grid). */
  private val bmpPixelsSql: String =
    """d AS (
      |  SELECT doc_id, 4 + (doc_id % 4) AS w, 3 + (doc_id % 3) AS h
      |  FROM documents),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h, ys.y, xs.x,
      |    (d.doc_id * 7 + ys.y * d.w + xs.x) AS base
      |  FROM d,
      |    (SELECT range AS y FROM range(0, 5)) ys,
      |    (SELECT range AS x FROM range(0, 7)) xs
      |  WHERE ys.y < d.h AND xs.x < d.w),
      |lum AS (
      |  SELECT doc_id, w, h, y, x,
      |    (299 * (base % 256) + 587 * ((base + 85) % 256)
      |     + 114 * ((base + 170) % 256)) // 1000 AS luma
      |  FROM px)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // luma census straight from the pixel formula; n_bytes = 54 header +
    // 4-byte-padded stride x height — the layout the encoder must write
    // and the decoder must skip correctly
    "q_mm_bmp_decode" ->
      s"""WITH $bmpPixelsSql
         |SELECT doc_id, CAST(max(w) AS INTEGER) AS width,
         |  CAST(max(h) AS INTEGER) AS height,
         |  CAST(54 + ((max(w) * 3 + 3) // 4) * 4 * max(h) AS BIGINT)
         |    AS n_bytes,
         |  CAST(sum(luma) AS BIGINT) AS luma_sum,
         |  CAST(min(luma) AS INTEGER) AS luma_min,
         |  CAST(max(luma) AS INTEGER) AS luma_max
         |FROM lum GROUP BY doc_id""".stripMargin,
    // the 6x8-cell 2-D dHash bits replayed from the same luma grid:
    // cell (r, c) vs (r, c+1) by cross-multiplied integer sums, bit
    // r*6+c, folded to one BIGINT signature
    "q_mm_bmp_phash" ->
      s"""WITH $bmpPixelsSql,
         |cells AS (
         |  SELECT doc_id, (y * 8) // h AS r, (x * 7) // w AS c,
         |    CAST(sum(luma) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
         |  FROM lum GROUP BY 1, 2, 3),
         |bits AS (
         |  SELECT a.doc_id, a.r * 6 + a.c AS bit
         |  FROM cells a JOIN cells b
         |    ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
         |  WHERE a.c < 6 AND a.s * b.n > b.s * a.n)
         |SELECT d.doc_id,
         |  CAST(coalesce(sum(CAST(1 AS BIGINT) << bit), 0) AS BIGINT)
         |    AS phash
         |FROM d LEFT JOIN bits ON d.doc_id = bits.doc_id
         |GROUP BY d.doc_id""".stripMargin,
    // PNG luma census: colorType cycles 0/2/3/4/6 by doc_id mod 5. Luma
    // closed form per class — gray (0/4): base mod 256; palette (3):
    // Rec.601 on entry j = base mod 16 → (17j, (17j+85) mod 256,
    // (17j+170) mod 256); truecolor (2/6): Rec.601 on the planted
    // channels. color_type is compared against the DECODER'S parsed
    // IHDR value. n_bytes deliberately absent: deflate output is not
    // SQL-replayable
    "q_mm_png_decode" ->
      s"""WITH $bmpPixelsSql,
         |plum AS (
         |  SELECT doc_id, w, h,
         |    CASE
         |      WHEN doc_id % 5 IN (0, 3) THEN base % 256
         |      WHEN doc_id % 5 = 2 THEN
         |        (299 * ((base % 16) * 17)
         |         + 587 * (((base % 16) * 17 + 85) % 256)
         |         + 114 * (((base % 16) * 17 + 170) % 256)) // 1000
         |      ELSE (299 * (base % 256) + 587 * ((base + 85) % 256)
         |            + 114 * ((base + 170) % 256)) // 1000
         |    END AS luma
         |  FROM px)
         |SELECT doc_id, CAST(max(w) AS INTEGER) AS width,
         |  CAST(max(h) AS INTEGER) AS height,
         |  CAST(CASE doc_id % 5 WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3
         |       WHEN 3 THEN 4 ELSE 6 END AS INTEGER) AS color_type,
         |  CAST(sum(luma) AS BIGINT) AS luma_sum,
         |  CAST(min(luma) AS INTEGER) AS luma_min,
         |  CAST(max(luma) AS INTEGER) AS luma_max
         |FROM plum GROUP BY doc_id""".stripMargin,
    // sub-byte PNG closed form: depth 1/2/4 by id mod 3 (maxV = 2^d−1),
    // sample s = (id·3 + y·w + x) mod (maxV+1); gray (even ids) scales
    // ×255/maxV (integer-exact: 255 ≡ 0 mod maxV for d ∈ {1,2,4});
    // palette (odd ids) looks up entry s = (17s, 17s+85, 17s+170)
    // through Rec.601
    "q_mm_png_subbyte" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS bd,
        |    CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 15 END AS mv,
        |    5 + doc_id % 6 AS w, 4 + doc_id % 3 AS h
        |  FROM documents),
        |px AS (
        |  SELECT d.doc_id, d.bd, d.mv, d.w, d.h, ys.range AS y, xs.range AS x,
        |    (d.doc_id * 3 + ys.range * d.w + xs.range) % (d.mv + 1) AS s
        |  FROM d, range(0, 6) ys, range(0, 10) xs
        |  WHERE ys.range < d.h AND xs.range < d.w),
        |lum AS (
        |  SELECT doc_id, bd, w, h,
        |    CASE WHEN doc_id % 2 = 0 THEN (s * 255) // mv
        |      ELSE (299 * ((17 * s) % 256) + 587 * ((17 * s + 85) % 256)
        |            + 114 * ((17 * s + 170) % 256)) // 1000
        |    END AS luma
        |  FROM px)
        |SELECT doc_id, CAST(max(bd) AS INTEGER) AS bit_depth,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 3 END AS INTEGER)
        |    AS color_type,
        |  CAST(max(w) AS INTEGER) AS width, CAST(max(h) AS INTEGER) AS height,
        |  CAST(sum(luma) AS BIGINT) AS luma_sum,
        |  CAST(min(luma) AS INTEGER) AS luma_min,
        |  CAST(max(luma) AS INTEGER) AS luma_max
        |FROM lum GROUP BY doc_id""".stripMargin,
    // GIF luma census replayed from the pixel/palette closed form:
    // pixel i (display row-major) has index j = (id*3 + i) mod palSize,
    // palette entry j = ((37j)%256, (73j+19)%256, (131j+7)%256),
    // Rec.601 integer luma; luma_wsum weights by display position i+1
    "q_mm_gif_decode" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(5 + doc_id % 6 AS INT) AS w,
        |    CAST(4 + doc_id % 5 AS INT) AS h,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 4 WHEN 1 THEN 16
        |      ELSE 256 END AS ps
        |  FROM documents),
        |p AS (SELECT doc_id, w, h, r.range AS i,
        |    (doc_id * 3 + r.range) % ps AS j
        |  FROM d, range(0, 80) r WHERE r.range < w * h),
        |l AS (SELECT doc_id, w, h, i,
        |    (299 * ((37 * j) % 256) + 587 * ((73 * j + 19) % 256)
        |      + 114 * ((131 * j + 7) % 256)) // 1000 AS luma
        |  FROM p)
        |SELECT doc_id, max(w) AS width, max(h) AS height,
        |  1 AS n_frames,
        |  CAST(sum(luma) AS BIGINT) AS luma_sum,
        |  CAST(min(luma) AS INTEGER) AS luma_min,
        |  CAST(max(luma) AS INTEGER) AS luma_max,
        |  CAST(sum((i + 1) * luma) AS BIGINT) AS luma_wsum
        |FROM l GROUP BY doc_id""".stripMargin,
    // TIFF luma replayed per family: gray8 = the formula; gray4
    // WhiteIsZero = (15 - raw) * 17; RGB/palette Rec.601 closed forms;
    // container facts pinned by the id-cycled encode parameters
    "q_mm_tiff_decode" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(6 + doc_id % 11 AS INT) AS w,
        |    CAST(5 + doc_id % 8 AS INT) AS h,
        |    CAST(doc_id % 4 AS INT) AS fam
        |  FROM documents),
        |p AS (SELECT doc_id, w, h, fam, r.range AS i,
        |    r.range % w AS x, r.range // w AS y
        |  FROM d, range(0, 192) r WHERE r.range < w * h),
        |l AS (SELECT doc_id, w, h, fam, i,
        |    CASE fam
        |      WHEN 0 THEN (doc_id * 7 + x * 3 + y * 5) % 256
        |      WHEN 1 THEN (15 - (x + y + doc_id) % 16) * 17
        |      WHEN 2 THEN (299 * ((doc_id * 7 + x * 3 + y * 5) % 256)
        |        + 587 * ((doc_id * 11 + x * 2 + y * 7) % 256)
        |        + 114 * ((doc_id * 13 + x * 5 + y * 3) % 256)) // 1000
        |      ELSE (299 * ((37 * ((x + y * 3 + doc_id) % 16)) % 256)
        |        + 587 * ((73 * ((x + y * 3 + doc_id) % 16) + 19) % 256)
        |        + 114 * ((131 * ((x + y * 3 + doc_id) % 16) + 7) % 256))
        |        // 1000
        |    END AS luma
        |  FROM p)
        |SELECT doc_id, max(w) AS width, max(h) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 32773 ELSE 1 END AS INTEGER)
        |    AS compression,
        |  CAST(CASE max(fam) WHEN 0 THEN 1 WHEN 1 THEN 0 WHEN 2 THEN 2
        |    ELSE 3 END AS INTEGER) AS photometric,
        |  CAST(CASE WHEN max(fam) = 1 THEN 4 ELSE 8 END AS INTEGER) AS bps,
        |  CAST(sum(luma) AS BIGINT) AS luma_sum,
        |  CAST(min(luma) AS INTEGER) AS luma_min,
        |  CAST(max(luma) AS INTEGER) AS luma_max,
        |  CAST(sum((i + 1) * luma) AS BIGINT) AS luma_wsum
        |FROM l GROUP BY doc_id""".stripMargin,
    // final-canvas luma replayed from the compositing closed form: the
    // covering frame k* = least(x, y, nf-1) wins when >= greatest(x-3,
    // y-2, 0) (disposal NONE, even ids); odd ids (RESTORE-BG) show only
    // frame nf-1's rect; uncovered pixels carry background index 0
    "q_mm_gif_frames" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8 + doc_id % 6 AS INT) AS w,
        |    CAST(6 + doc_id % 5 AS INT) AS h,
        |    CAST(2 + doc_id % 3 AS INT) AS nf
        |  FROM documents),
        |p AS (SELECT doc_id, w, h, nf, r.range AS i,
        |    r.range % w AS x, r.range // w AS y
        |  FROM d, range(0, 130) r WHERE r.range < w * h),
        |k AS (SELECT doc_id, w, h, nf, i, x, y,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN CASE WHEN least(x, y, nf - 1)
        |          >= greatest(x - 3, y - 2, 0)
        |        THEN least(x, y, nf - 1) ELSE -1 END
        |      ELSE CASE WHEN x BETWEEN nf - 1 AND nf + 2
        |          AND y BETWEEN nf - 1 AND nf + 1
        |        THEN nf - 1 ELSE -1 END
        |    END AS kc
        |  FROM p),
        |l AS (SELECT doc_id, nf, w, h, i,
        |    CASE WHEN kc < 0 THEN 0
        |      ELSE ((x - kc) + (y - kc) * 2 + kc * 3 + doc_id) % 16
        |    END AS j
        |  FROM k),
        |m AS (SELECT doc_id, nf, w, h, i,
        |    (299 * ((37 * j) % 256) + 587 * ((73 * j + 19) % 256)
        |      + 114 * ((131 * j + 7) % 256)) // 1000 AS luma
        |  FROM l)
        |SELECT doc_id, max(nf) AS n_frames, max(w) AS width,
        |  max(h) AS height,
        |  CAST(sum(luma) AS BIGINT) AS luma_sum,
        |  CAST(min(luma) AS INTEGER) AS luma_min,
        |  CAST(max(luma) AS INTEGER) AS luma_max,
        |  CAST(sum((i + 1) * luma) AS BIGINT) AS luma_wsum
        |FROM m GROUP BY doc_id""".stripMargin,
    // WebP pixels replayed from the per-mode closed forms; pal_size is
    // the count of DISTINCT colors the encoder palettized — the index
    // formula spans w+3h-3 consecutive integers mod ps, so that count
    // is least(w+3h-3, ps); container/transform facts are mode-pinned
    "q_mm_webp_decode" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(4 + doc_id % 13 AS INT) AS w,
        |    CAST(4 + doc_id % 11 AS INT) AS h,
        |    CAST(doc_id % 5 AS INT) AS mode,
        |    CASE CAST((doc_id // 5) % 4 AS INT) WHEN 0 THEN 2
        |      WHEN 1 THEN 5 WHEN 2 THEN 17 ELSE 200 END AS ps
        |  FROM documents),
        |p AS (SELECT doc_id, w, h, mode, ps, r.range AS i,
        |    r.range % w AS x, r.range // w AS y
        |  FROM d, range(0, 224) r WHERE r.range < w * h),
        |c AS (SELECT doc_id, w, h, mode, ps, i,
        |    CASE mode
        |      WHEN 2 THEN (37 * ((x + y * 3 + doc_id) % ps)) % 256
        |      WHEN 3 THEN (doc_id * 7 + (x // 4) * 3 + (y // 2) * 5) % 256
        |      ELSE (doc_id * 7 + x * 3 + y * 5) % 256 END AS cr,
        |    CASE mode
        |      WHEN 2 THEN (73 * ((x + y * 3 + doc_id) % ps) + 19) % 256
        |      WHEN 3 THEN (doc_id * 11 + (x // 4) * 2 + (y // 2) * 7) % 256
        |      ELSE (doc_id * 11 + x * 2 + y * 7) % 256 END AS cg,
        |    CASE mode
        |      WHEN 2 THEN (131 * ((x + y * 3 + doc_id) % ps) + 7) % 256
        |      WHEN 3 THEN (doc_id * 13 + (x // 4) * 5 + (y // 2) * 3) % 256
        |      ELSE (doc_id * 13 + x * 5 + y * 3) % 256 END AS cb
        |  FROM p),
        |l AS (SELECT doc_id, w, h, mode, ps, i,
        |    (299 * cr + 587 * cg + 114 * cb) // 1000 AS luma
        |  FROM c)
        |SELECT doc_id, max(w) AS width, max(h) AS height,
        |  CAST(CASE WHEN max(mode) = 4 THEN 1 ELSE 0 END AS INTEGER)
        |    AS is_ext,
        |  CAST(CASE max(mode) WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 1 END
        |    AS INTEGER) AS n_tf,
        |  CAST(CASE WHEN max(mode) = 2
        |    THEN least(max(w) + 3 * max(h) - 3, max(ps)) ELSE 0 END
        |    AS INTEGER) AS pal_size,
        |  CAST(CASE max(mode) WHEN 0 THEN 6 WHEN 3 THEN 4 ELSE 0 END
        |    AS INTEGER) AS cache_bits,
        |  CAST(sum(luma) AS BIGINT) AS luma_sum,
        |  CAST(min(luma) AS INTEGER) AS luma_min,
        |  CAST(max(luma) AS INTEGER) AS luma_max,
        |  CAST(sum((i + 1) * luma) AS BIGINT) AS luma_wsum
        |FROM l GROUP BY doc_id""".stripMargin,
    // Adobe-family luma replayed from the stored-sample closed forms:
    // CMYK R = sc*sk // 255 per channel; YCCK at zero chroma returns
    // the gray CMY exactly so luma = s*sk // 255; direct RGB is Rec.601
    // straight off the samples; flat image -> sum = w*h*luma
    "q_mm_jpeg_cmyk" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS INT) AS w,
        |    CAST(8 + doc_id % 7 AS INT) AS h,
        |    CAST(doc_id % 3 AS INT) AS fam,
        |    (doc_id * 31) % 256 AS a,
        |    (doc_id * 59 + 7) % 256 AS b,
        |    (doc_id * 83 + 13) % 256 AS c,
        |    (doc_id * 41 + 99) % 256 AS k,
        |    (doc_id * 37) % 256 AS s,
        |    (doc_id * 53 + 11) % 256 AS sk
        |  FROM documents),
        |l AS (SELECT doc_id, w, h, fam,
        |    CASE fam
        |      WHEN 0 THEN (299 * ((a * k) // 255) + 587 * ((b * k) // 255)
        |        + 114 * ((c * k) // 255)) // 1000
        |      WHEN 1 THEN (s * sk) // 255
        |      ELSE (299 * a + 587 * b + 114 * c) // 1000 END AS luma
        |  FROM d)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(CASE WHEN fam = 2 THEN 3 ELSE 4 END AS INTEGER) AS n_comp,
        |  CAST(luma AS INTEGER) AS luma_min,
        |  CAST(luma AS INTEGER) AS luma_max,
        |  CAST(w * h * luma AS BIGINT) AS luma_sum
        |FROM l""".stripMargin,
    // 12-bit luma replayed from the closed form: v >> 4 on the flat
    // stored value (gray even ids, zero-chroma YCbCr odd ids)
    "q_mm_jpeg_12bit" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS INT) AS w,
        |    CAST(8 + doc_id % 7 AS INT) AS h,
        |    CASE WHEN doc_id % 2 = 0 THEN (doc_id * 97 + 5) % 4096
        |      ELSE (doc_id * 61 + 31) % 4096 END AS v
        |  FROM documents)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INTEGER)
        |    AS n_comp,
        |  CAST(v // 16 AS INTEGER) AS luma_min,
        |  CAST(v // 16 AS INTEGER) AS luma_max,
        |  CAST(w * h * (v // 16) AS BIGINT) AS luma_sum
        |FROM d""".stripMargin,
    // lossless luma replayed pixel-by-pixel: v = (id*3+x*37+y*91) mod
    // 2^p narrowed by the top-8-bits rule; p cycles 8/12/16 by id//7
    "q_mm_jpeg_lossless" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(5 + doc_id % 12 AS INT) AS w,
        |    CAST(5 + doc_id % 9 AS INT) AS h,
        |    CASE CAST((doc_id // 7) % 3 AS INT) WHEN 0 THEN 256
        |      WHEN 1 THEN 4096 ELSE 65536 END AS md
        |  FROM documents),
        |l AS (SELECT doc_id, w, h, r.range AS i,
        |    ((doc_id * 3 + (r.range % w) * 37 + (r.range // w) * 91) % md)
        |      // (md // 256) AS luma
        |  FROM d, range(0, 208) r WHERE r.range < w * h)
        |SELECT doc_id, max(w) AS width, max(h) AS height,
        |  CAST(min(luma) AS INTEGER) AS luma_min,
        |  CAST(max(luma) AS INTEGER) AS luma_max,
        |  CAST(sum(luma) AS BIGINT) AS luma_sum,
        |  CAST(sum((i + 1) * luma) AS BIGINT) AS luma_wsum
        |FROM l GROUP BY doc_id""".stripMargin,
    // WAV features replayed from the sample closed form: v(i) =
    // (id*13 + i^2*3 + i*11) mod 4096 - 2048 over n = 96 + id mod 64
    // samples; energy/zc/peak exact integers, frames of 16 by i // 16,
    // duration = n*10000 // 8000 deci-ms at 8 kHz mono. Stored depth
    // cycles by id mod 4: 24-bit (exact) / 8-bit (floor-quantized to
    // multiples of 256 — replayed below via the +2048 shift, since
    // DuckDB's // truncates toward zero) / 16-bit (exact).
    "q_mm_wav_decode" ->
      """WITH d AS (SELECT doc_id, 96 + (doc_id % 64) AS n FROM documents),
        |s0 AS (
        |  SELECT d.doc_id, d.n, r.range AS i,
        |    ((d.doc_id * 13 + r.range * r.range * 3 + r.range * 11) % 4096)
        |      - 2048 AS v0
        |  FROM d, range(0, 160) r WHERE r.range < d.n),
        |s AS (
        |  SELECT doc_id, n, i,
        |    CASE WHEN doc_id % 4 = 2
        |      THEN ((v0 + 2048) // 256) * 256 - 2048 ELSE v0 END AS v
        |  FROM s0),
        |x AS (
        |  SELECT doc_id, n, i, v,
        |    CASE WHEN i > 0 AND
        |      ((lag(v) OVER (PARTITION BY doc_id ORDER BY i) >= 0) <> (v >= 0))
        |      THEN 1 ELSE 0 END AS zc
        |  FROM s),
        |f AS (SELECT doc_id, i // 16 AS frame, sum(v * v) AS fe
        |      FROM s GROUP BY 1, 2),
        |a AS (SELECT doc_id,
        |        count(*) FILTER (WHERE fe >= 20000000) AS active_frames
        |      FROM f GROUP BY 1),
        |g AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_samples,
        |        CAST(sum(v * v) AS BIGINT) AS energy,
        |        CAST(max(abs(v)) AS INTEGER) AS peak,
        |        CAST(sum(zc) AS INTEGER) AS zero_crossings,
        |        CAST((max(n) * 10000) // 8000 AS BIGINT) AS duration_deci_ms
        |      FROM x GROUP BY 1)
        |SELECT g.doc_id, g.n_samples, g.energy, g.peak, g.zero_crossings,
        |  CAST(a.active_frames AS INTEGER) AS active_frames,
        |  g.duration_deci_ms
        |FROM g JOIN a USING (doc_id)""".stripMargin,
    "q_mm_phash" ->
      s"""WITH sigs AS ($phashCoreSql)
         |SELECT doc_id, simhash AS phash FROM sigs""".stripMargin,
    "q_mm_phash_pairs" -> bandedHammingPairsSql(phashCoreSql),

    "q_mm_hist" -> mmHistSql,
    // ASCII corpus (verified): byte == char code, so ascii(substr(..)) in
    // the oracle mirrors the codec's byte reads exactly
    "q_mm_resize" -> {
      val cols = (0 until 16).map(k =>
        s"max(CASE WHEN chunk = $k THEN v END) AS t$k").mkString(",\n         |  ")
      s"""WITH b AS (
         |  SELECT doc_id, (CAST(i - 1 AS BIGINT) * 16) // length(text) AS chunk,
         |    ascii(substr(text, i, 1)) AS code
         |  FROM documents, unnest(range(1, len(text) + 1)) AS t(i)
         |  WHERE length(text) >= 16),
         |c AS (
         |  SELECT doc_id, chunk, round(avg(code), 4) AS v
         |  FROM b GROUP BY doc_id, chunk)
         |SELECT doc_id,
         |  $cols
         |FROM c GROUP BY doc_id""".stripMargin
    },
    // frame sample: byte at 0-based position 16*i is the hex-digit pair at
    // (32*i+1, 32*i+2); count = min(ceil(n/16), 8) — mirrors
    // FakeCodec.sampleFrames(stride=16, max=8).
    "q_mm_frames" ->
      """WITH h AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_transform(range(0, CAST(least(ceil(n / 16.0), 8) AS BIGINT)),
        |      i -> (instr('0123456789ABCDEF', substring(hx, 32 * i + 1, 1)) - 1) * 16
        |         + (instr('0123456789ABCDEF', substring(hx, 32 * i + 2, 1)) - 1)) AS fb
        |  FROM h)
        |SELECT doc_id, CAST(len(fb) AS INTEGER) AS n_sampled,
        |  CAST(list_sum(fb) AS BIGINT) AS checksum
        |FROM s""".stripMargin,

    "q_mm_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'png'
        |       WHEN octet_length(encode(text)) % 3 = 1 THEN 'jpeg'
        |       ELSE 'webp' END AS format,
        |  CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) % 24 + 1 AS INTEGER) AS n_frames
        |FROM documents""".stripMargin,
    // JPEG luma census closed form: flat gray g = (id·37) mod 256 over
    // w·h pixels (quality-1.0 DC-exact roundtrip); n_components is the
    // DECODER's parsed SOF0 value — 1 on even ids, 3 on odd
    "q_mm_jpeg_decode" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 17 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 13 AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INTEGER)
        |    AS n_components,
        |  CAST(((doc_id * 37) % 256) * (8 + doc_id % 17) * (8 + doc_id % 13)
        |    AS BIGINT) AS luma_sum,
        |  CAST((doc_id * 37) % 256 AS INTEGER) AS luma_min,
        |  CAST((doc_id * 37) % 256 AS INTEGER) AS luma_max
        |FROM documents""".stripMargin,
    // EXIF closed form: m = doc_id % 8 selects orientation m+1; dims
    // swap for 5–8; block values v_k = (doc_id·37 + 40k) mod 256 — the
    // displayed top-left/bottom-right corners per the EXIF mapping:
    //   o1/o5 → (v0, v5), o2/o8 → (v1, v4), o3/o7 → (v5, v0),
    //   o4/o6 → (v4, v1) — the dims split each pair
    "q_mm_jpeg_exif" ->
      """WITH v AS (
        |  SELECT doc_id, doc_id % 8 AS m,
        |    (doc_id * 37) % 256 AS v0,
        |    (doc_id * 37 + 40) % 256 AS v1,
        |    (doc_id * 37 + 160) % 256 AS v4,
        |    (doc_id * 37 + 200) % 256 AS v5,
        |    (doc_id * 37 + 80) % 256 AS v2,
        |    (doc_id * 37 + 120) % 256 AS v3
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(m + 1 AS INTEGER) AS orientation,
        |  CAST(CASE WHEN m >= 4 THEN 24 ELSE 16 END AS INTEGER) AS width,
        |  CAST(CASE WHEN m >= 4 THEN 16 ELSE 24 END AS INTEGER) AS height,
        |  CAST(64 * (v0 + v1 + v2 + v3 + v4 + v5) AS BIGINT) AS luma_sum,
        |  CAST(CASE WHEN m IN (0, 4) THEN v0 WHEN m IN (1, 7) THEN v1
        |    WHEN m IN (3, 5) THEN v4 ELSE v5 END AS INTEGER) AS tl,
        |  CAST(CASE WHEN m IN (0, 4) THEN v5 WHEN m IN (1, 7) THEN v4
        |    WHEN m IN (3, 5) THEN v1 ELSE v0 END AS INTEGER) AS br
        |FROM v""".stripMargin,
  )
}
