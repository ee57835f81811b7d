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

  test("loud failures: bad magic, non-PCM, wrong bit depth, truncation, missing chunks") {
    val good = WavCodec.encode(8000, 1, clip(10))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](WavCodec.decode(badMagic))
      .getMessage.contains("magic"))
    // audioFormat=3 (IEEE float) at the fmt chunk's first payload bytes
    val float = good.clone(); float(20) = 3
    assert(intercept[IllegalArgumentException](WavCodec.decode(float))
      .getMessage.contains("audioFormat"))
    val eightBit = good.clone(); eightBit(34) = 8
    assert(intercept[IllegalArgumentException](WavCodec.decode(eightBit))
      .getMessage.contains("16 only"))
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
}
