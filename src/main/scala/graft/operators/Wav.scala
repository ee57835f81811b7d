package graft.operators

/** Pure-JVM WAV (RIFF/WAVE, 16-bit PCM) codec — the multimodal tier's
  * REAL audio format, the audio twin of [[BmpCodec]]: a zero-dependency
  * parser for the one mainstream audio container that needs none, so
  * the `mapPartitions` decode boundary exercises genuine chunk
  * traversal, header parsing, and little-endian sample decode instead
  * of a deterministic fake.
  *
  * Layout (public spec — the Microsoft/IBM RIFF WAVE format):
  * `RIFF <size> WAVE` followed by chunks, each `<4-byte id> <le32 size>
  * <payload>` padded to an EVEN byte boundary (the RIFF word-alignment
  * rule real encoders obey and naive parsers trip over). The `fmt `
  * chunk carries (audioFormat, channels, sampleRate, bitsPerSample…);
  * `data` carries interleaved le16 two's-complement samples. Unknown
  * chunks (`LIST`, `fact`, `cue `, …) are SKIPPED, as the spec
  * requires of readers.
  *
  * Decode FAILS LOUDLY on anything it does not understand (bad magic,
  * compressed/non-PCM audioFormat, bits ≠ 16, missing fmt/data,
  * truncated payload) — the engine-wide loud-failure discipline; a real
  * corpus routes failures to a counted quarantine, never silently
  * fakes samples. */
object WavCodec {

  /** Decoded clip: interleaved samples NORMALIZED to 16-bit + the
    * fmt-chunk facts (`bits` = the container's stored depth). */
  final case class Pcm(sampleRate: Int, channels: Int,
      samples: Array[Short], bits: Int = 16)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Parse a 16-bit PCM WAV into interleaved samples. */
  def decode(payload: Array[Byte]): Pcm = {
    require(payload.length >= 12,
      s"WAV: ${payload.length} bytes < 12-byte RIFF header")
    require(tag(payload, 0) == "RIFF", "WAV: bad magic (expected 'RIFF')")
    require(tag(payload, 8) == "WAVE", "WAV: not a WAVE form")
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, ch, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, size)
    while (off + 8 <= payload.length) {
      val id = tag(payload, off)
      val size = le32(payload, off + 4)
      require(size >= 0 && off + 8 + size <= payload.length,
        s"WAV: chunk '$id' size $size overruns payload at $off")
      id match {
        case "fmt " =>
          require(size >= 16, s"WAV: fmt chunk $size bytes < 16")
          val audioFormat = le16(payload, off + 8)
          require(audioFormat == 1 || audioFormat == 3,
            s"WAV: audioFormat $audioFormat unsupported (PCM=1, IEEE float=3)")
          fmt = Some((audioFormat, le16(payload, off + 10),
            le32(payload, off + 12), le16(payload, off + 22)))
        case "data" => data = Some((off + 8, size))
        case _      => () // LIST/fact/cue/…: skip, per spec
      }
      off += 8 + size + (size & 1) // RIFF chunks pad to even boundaries
    }
    val (format, channels, rate, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("WAV: no fmt chunk"))
    // integer PCM depths, per the spec: 8-bit is UNSIGNED
    // (offset-binary, silence = 0x80), 16/24/32-bit are SIGNED le two's
    // complement. All normalize to 16-bit: u8 → (u8−128)·256 (exact),
    // s24/s32 → top 16 bits (arithmetic shift) — the standard lossy
    // narrowing every 16-bit audio path applies. IEEE float (format 3,
    // r18) is 32-bit only: sample·32768 rounded then clipped, so floats
    // written as s/32768 (exact in binary32 for |s| < 2^15) round-trip
    // bit-exactly.
    if (format == 3)
      require(bits == 32, s"WAV: $bits-bit IEEE float unsupported (32 only)")
    else
      require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
        s"WAV: $bits-bit samples unsupported (8/16/24/32 PCM only)")
    require(channels >= 1, s"WAV: bad channel count $channels")
    val (dOff, dSize) = data.getOrElse(
      throw new IllegalArgumentException("WAV: no data chunk"))
    val bytesPer = bits / 8
    require(dSize % bytesPer == 0,
      s"WAV: data size $dSize not a multiple of $bytesPer ($bits-bit PCM)")
    val n = dSize / bytesPer
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = bits match {
        case 8 => (((payload(dOff + i) & 0xff) - 128) << 8).toShort
        case 16 => le16(payload, dOff + 2 * i).toShort
        case 24 =>
          val o = dOff + 3 * i
          val s24 = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
            (payload(o + 2) << 16) // sign byte NOT masked: sign-extends
          (s24 >> 8).toShort
        case 32 if format == 1 => (le32(payload, dOff + 4 * i) >> 16).toShort
        case _ => // IEEE float32, clipped to the 16-bit range
          val f = java.lang.Float.intBitsToFloat(le32(payload, dOff + 4 * i))
          require(!f.isNaN, s"WAV: NaN float sample at $i")
          val v = math.round(f * 32768.0f)
          (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
      }
      i += 1
    }
    Pcm(rate, channels, samples, bits)
  }

  /** Fixture/spec encoder: samples → standard PCM WAV bytes. Optionally
    * plants an unknown chunk BEFORE fmt/data so specs prove the reader
    * skips what it does not understand (with RIFF even-padding).
    * `bits` picks the stored depth — the 16-bit logical samples write
    * as `(s >> 8) + 128` unsigned at 8-bit (floor-quantized to a
    * multiple of 256 on roundtrip), `s << 8` signed le24 at 24-bit,
    * and s/32768 binary32 at 32-bit IEEE float (format code 3) — the
    * last two roundtrip exactly. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short],
      junkChunk: Option[Array[Byte]] = None, bits: Int = 16): Array[Byte] = {
    require(channels >= 1, s"encode: bad channel count $channels")
    require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
      s"encode: $bits-bit depth unsupported (8/16/24 PCM, 32 float)")
    val bytesPer = bits / 8
    val junk = junkChunk.map { j => 8 + j.length + (j.length & 1) }.getOrElse(0)
    val dataSize = samples.length * bytesPer
    // odd data size (possible at 8-bit): the RIFF even-boundary pad
    // byte counts in the form size but NOT in the chunk's size field
    val riffSize = 4 + junk + 24 + 8 + dataSize + (dataSize & 1)
    val out = new Array[Byte](8 + riffSize)
    def putTag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    putTag(0, "RIFF"); putLe32(4, riffSize); putTag(8, "WAVE")
    var off = 12
    junkChunk.foreach { j =>
      putTag(off, "LIST"); putLe32(off + 4, j.length)
      System.arraycopy(j, 0, out, off + 8, j.length)
      off += 8 + j.length + (j.length & 1)
    }
    putTag(off, "fmt "); putLe32(off + 4, 16)
    putLe16(off + 8, if (bits == 32) 3 else 1) // PCM / IEEE float
    putLe16(off + 10, channels)
    putLe32(off + 12, sampleRate)
    putLe32(off + 16, sampleRate * channels * bytesPer) // byte rate
    putLe16(off + 20, channels * bytesPer)              // block align
    putLe16(off + 22, bits)                             // bits per sample
    off += 24
    putTag(off, "data"); putLe32(off + 4, dataSize)
    off += 8
    var i = 0
    while (i < samples.length) {
      bits match {
        case 8 => out(off + i) = (((samples(i) >> 8) + 128) & 0xff).toByte
        case 16 => putLe16(off + 2 * i, samples(i) & 0xffff)
        case 24 =>
          val v = samples(i) << 8
          out(off + 3 * i) = v.toByte
          out(off + 3 * i + 1) = (v >> 8).toByte
          out(off + 3 * i + 2) = (v >> 16).toByte
        case _ =>
          val v = java.lang.Float.floatToIntBits(samples(i) / 32768.0f)
          putLe32(off + 4 * i, v)
      }
      i += 1
    }
    out
  }

  /** Integer-exact clip features — no doubles, so the DuckDB oracle
    * replays them bit-for-bit from the sample closed form:
    * (n, Σs², max|s|, sign flips with sign(0)=+, active 16-sample
    * frames by energy threshold, duration in exact ms·10). */
  final case class Features(nSamples: Int, energy: Long, peak: Int,
      zeroCrossings: Int, activeFrames: Int, durationDeciMs: Long)

  /** Frame size for the activity census (a VAD stand-in: a frame is
    * "active" when its energy clears `threshold` — real VAD swaps the
    * energy rule, the census shape is identical). */
  val FrameSamples = 16

  def features(pcm: Pcm, activeThreshold: Long): Features = {
    val s = pcm.samples
    var energy = 0L; var peak = 0; var zc = 0
    var frameEnergy = 0L; var active = 0
    var i = 0
    while (i < s.length) {
      val v = s(i).toInt
      energy += v.toLong * v
      val a = math.abs(v)
      if (a > peak) peak = a
      if (i > 0 && ((s(i - 1) >= 0) != (v >= 0))) zc += 1
      frameEnergy += v.toLong * v
      if ((i + 1) % FrameSamples == 0 || i == s.length - 1) {
        if (frameEnergy >= activeThreshold) active += 1
        frameEnergy = 0L
      }
      i += 1
    }
    // duration in tenths of a millisecond: n·10000 / (rate·channels) —
    // exact integer division both engines agree on
    val frames = s.length.toLong / pcm.channels
    Features(s.length, energy, peak, zc, active,
      frames * 10000L / pcm.sampleRate)
  }
}
