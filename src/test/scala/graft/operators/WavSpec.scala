package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** WAV codec: roundtrip fidelity, RIFF chunk traversal (unknown chunks
  * skipped, odd sizes padded to even boundaries), little-endian
  * two's-complement decode, loud failures, and the integer feature
  * extractor's hand-checked closed forms. Pure JVM — no Spark session. */
class WavSpec extends AnyFunSuite {

  private def clip(n: Int): Array[Short] =
    Array.tabulate(n)(i => ((i * 37 + 11) % 4096 - 2048).toShort)

  test("encode → decode roundtrips samples, rate and channels exactly") {
    val s = clip(100)
    val pcm = WavCodec.decode(WavCodec.encode(44100, 2, s))
    assert(pcm.sampleRate == 44100 && pcm.channels == 2)
    assert(pcm.samples.toSeq == s.toSeq)
  }

  test("negative samples survive the le16 two's-complement roundtrip") {
    val s = Array[Short](-32768, -1, 0, 1, 32767, -12345)
    assert(WavCodec.decode(WavCodec.encode(8000, 1, s)).samples.toSeq == s.toSeq)
  }

  test("unknown chunks are skipped; odd-size chunks pad to even boundaries") {
    val s = clip(33)
    for (junkLen <- Seq(1, 2, 3, 7, 8)) {
      val bytes = WavCodec.encode(8000, 1, s,
        junkChunk = Some(Array.fill(junkLen)('x'.toByte)))
      assert(WavCodec.decode(bytes).samples.toSeq == s.toSeq,
        s"junk chunk of $junkLen bytes broke traversal")
    }
  }

  test("24-bit PCM roundtrips the 16-bit logical samples exactly") {
    val s = Array[Short](-32768, -1, 0, 1, 32767, -12345) ++ clip(37)
    val pcm = WavCodec.decode(WavCodec.encode(8000, 1, s, bits = 24))
    assert(pcm.bits == 24 && pcm.samples.toSeq == s.toSeq)
    // hand-check the sign extension: sample -1 stores as 0xFFFF00 le
    // (00 FF FF) and must come back -256... no: -1<<8 = -256 stored,
    // decode >>8 = -1. Verify a raw hand-built 24-bit payload too:
    // bytes (0x00,0x00,0x80) = le s24 0x800000 = -8388608 → >>8 = -32768
    // data bytes start at 44 (RIFF 12 + fmt 24 + data header 8); an
    // odd data size appends a RIFF pad byte AFTER them
    val raw = WavCodec.encode(8000, 1, Array[Short](0), bits = 24)
    raw(44) = 0x00; raw(45) = 0x00; raw(46) = 0x80.toByte
    assert(WavCodec.decode(raw).samples.toSeq == Seq(-32768.toShort))
  }

  test("8-bit unsigned PCM floor-quantizes to multiples of 256 with 0x80 silence") {
    val s = Array[Short](-32768, -100, -1, 0, 1, 255, 256, 300, 32767)
    val pcm = WavCodec.decode(WavCodec.encode(8000, 1, s, bits = 8))
    assert(pcm.bits == 8)
    assert(pcm.samples.toSeq ==
      Seq(-32768, -256, -256, 0, 0, 0, 256, 256, 32512).map(_.toShort))
    // silence (logical 0) must store as the offset-binary midpoint 0x80
    // at data offset 44 (the final byte is the odd-size RIFF pad)
    val silent = WavCodec.encode(8000, 1, Array[Short](0), bits = 8)
    assert((silent(44) & 0xff) == 0x80)
    // and a raw 0x00 byte is full-scale negative
    val raw = silent.clone(); raw(44) = 0
    assert(WavCodec.decode(raw).samples.toSeq == Seq(-32768.toShort))
  }

  test("odd-length 8-bit and non-multiple 24-bit data sizes fail loudly") {
    // 3 samples at 8-bit = 3 bytes (odd data size is LEGAL at 8-bit —
    // the chunk pads, the size field is exact)
    val odd8 = WavCodec.encode(8000, 1, clip(3), bits = 8)
    assert(WavCodec.decode(odd8).samples.length == 3)
    // corrupt a 24-bit data size to a non-multiple of 3
    val b24 = WavCodec.encode(8000, 1, clip(4), bits = 24)
    // data chunk: last 8+12 bytes; size field at length-12-4
    val szOff = b24.length - 12 - 4
    b24(szOff) = 11 // was 12
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(b24.take(b24.length - 1)))
      .getMessage.contains("multiple"))
  }

  test("loud failures: bad magic, non-PCM, wrong bit depth, truncation, missing chunks") {
    val good = WavCodec.encode(8000, 1, clip(10))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](WavCodec.decode(badMagic))
      .getMessage.contains("magic"))
    // audioFormat=2 (ADPCM) at the fmt chunk's first payload bytes —
    // format 3 (IEEE float) became legal in r18, compressed still refuses
    val adpcm = good.clone(); adpcm(20) = 2
    assert(intercept[IllegalArgumentException](WavCodec.decode(adpcm))
      .getMessage.contains("audioFormat"))
    // format 3 with a non-32 depth refuses by name
    val float16 = good.clone(); float16(20) = 3
    assert(intercept[IllegalArgumentException](WavCodec.decode(float16))
      .getMessage.contains("32 only"))
    // a 12-bit depth (no real encoder, but structurally representable)
    val twelve = good.clone(); twelve(34) = 12
    assert(intercept[IllegalArgumentException](WavCodec.decode(twelve))
      .getMessage.contains("8/16/24"))
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(good.take(good.length - 3)))
      .getMessage.contains("overruns"))
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(("RIFF" + "\u0000" * 4 + "WAVE").getBytes("US-ASCII")))
      .getMessage.contains("fmt"))
  }

  test("features: hand-checked energy, peak, zero crossings, frames, duration") {
    // 20 samples: 16-frame [3,-3,3,...] alternating + partial [-5,-5,-5,-5]
    // (negative tail: i=15 is -3, so the frame boundary adds NO flip)
    val s = Array.tabulate(20)(i =>
      (if (i < 16) { if (i % 2 == 0) 3 else -3 } else -5).toShort)
    val pcm = WavCodec.Pcm(8000, 1, s)
    // frame 0 energy = 16*9 = 144; frame 1 (partial) = 4*25 = 100
    val f1 = WavCodec.features(pcm, activeThreshold = 120L)
    assert(f1.nSamples == 20 && f1.energy == 244L && f1.peak == 5)
    assert(f1.zeroCrossings == 15) // 15 sign flips in the alternating run
    assert(f1.activeFrames == 1)   // only the full frame clears 120
    val f2 = WavCodec.features(pcm, activeThreshold = 100L)
    assert(f2.activeFrames == 2)
    // duration: 20 samples / 8000 Hz = 2.5 ms = 25 deci-ms, exact
    assert(f1.durationDeciMs == 25L)
  }

  test("zero-crossing convention: sign(0) is positive") {
    // [-1, 0, 1]: -1→0 flips (neg→nonneg), 0→1 does not
    val f = WavCodec.features(WavCodec.Pcm(8000, 1, Array[Short](-1, 0, 1)), 1L)
    assert(f.zeroCrossings == 1)
  }

  test("stereo duration divides sample count by channel count") {
    val f = WavCodec.features(WavCodec.Pcm(8000, 2, clip(32)), 1L)
    assert(f.durationDeciMs == 16L * 10000L / 8000L)
  }

  test("IEEE float32 (format 3) roundtrips the logical samples exactly") {
    // s/32768 is exact in binary32 for |s| < 2^15, so encode→decode is
    // the identity — including the extremes
    val s = (Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue) ++
      clip(59)).toArray
    val pcm = WavCodec.decode(WavCodec.encode(8000, 1, s, bits = 32))
    assert(pcm.bits == 32)
    assert(pcm.samples.toSeq == s.toSeq)
  }

  test("float32 out-of-range and NaN samples: clip and refuse") {
    // hand-build a 2-sample float stream: +2.0 (clips to 32767) and NaN
    def stream(second: Float): Array[Byte] = {
      val base = WavCodec.encode(8000, 1, Array[Short](0, 0), bits = 32)
      val dOff = base.length - 8
      def put(off: Int, f: Float): Unit = {
        val v = java.lang.Float.floatToIntBits(f)
        base(off) = v.toByte; base(off + 1) = (v >> 8).toByte
        base(off + 2) = (v >> 16).toByte; base(off + 3) = (v >> 24).toByte
      }
      put(dOff, 2.0f); put(dOff + 4, second)
      base
    }
    val clipped = WavCodec.decode(stream(-2.0f))
    assert(clipped.samples.toSeq == Seq[Short](32767, -32768))
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(stream(Float.NaN))).getMessage.contains("NaN"))
  }

  test("32-bit integer PCM (format 1) narrows to the top 16 bits") {
    // hand-patch an s32 stream: encode float32 then flip the format
    // code back to 1 — the same 4-byte layout reads as int32
    val base = WavCodec.encode(8000, 1, Array[Short](0), bits = 32)
    val fmtOff = 12 + 8 // "fmt " chunk payload
    base(fmtOff) = 1
    val dOff = base.length - 4
    val v = 0x7a3b1234 // int32 sample -> expect 0x7a3b
    base(dOff) = v.toByte; base(dOff + 1) = (v >> 8).toByte
    base(dOff + 2) = (v >> 16).toByte; base(dOff + 3) = (v >> 24).toByte
    assert(WavCodec.decode(base).samples.toSeq == Seq[Short](0x7a3b))
  }

  test("float64 (format 3, 64-bit) refuses loudly") {
    val base = WavCodec.encode(8000, 1, Array[Short](0), bits = 32)
    base(12 + 8 + 14) = 64 // bits-per-sample field
    val e = intercept[IllegalArgumentException](WavCodec.decode(base))
    assert(e.getMessage.contains("32 only"))
  }
}
