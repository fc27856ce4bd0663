package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioHeaders, FlacCodec}

/** FLAC frame codec: lossless round-trips through every subframe type,
  * all four stereo decorrelation modes, multi-frame streams with a short
  * tail block, 8/16/24-bit depths, Rice partitions + the escape-to-raw
  * path, and the null routes (CRC corruption, truncation). The encoder is
  * the fixture factory — every decoder path is exercised by real encoder
  * output. */
class FlacCodecSpec extends AnyFunSuite {

  private def roundTrip(channels: Int, rate: Int, bits: Int,
      pcm: Array[Array[Int]], blockSize: Int): Unit = {
    val flac = FlacCodec.encode(channels, rate, bits, pcm, blockSize)
    val a = FlacCodec.decode(flac)
    assert(a != null, "decode returned null")
    assert(a.channels == channels && a.rate == rate && a.bits == bits)
    for (c <- 0 until channels)
      assert(a.pcm(c).toSeq == pcm(c).toSeq, s"channel $c differs")
  }

  test("mono 16-bit multi-frame round-trip (verbatim/fixed/lpc rotation)") {
    // 700 samples at blockSize 256 → frames of 256/256/188; the encoder
    // cycles VERBATIM → FIXED(2) → LPC(2) across (frame, channel)
    val pcm = Array(Array.tabulate(700)(i => ((i * 37 + 11) % 1601 - 800) * 20))
    roundTrip(1, 8000, 16, pcm, 256)
  }

  test("constant blocks pick the CONSTANT subframe and round-trip") {
    val flat = Array.fill(256)(-12345) ++ Array.tabulate(200)(i => i * 31 - 3000)
    val pcm = Array(flat)
    val flac = FlacCodec.encode(1, 16000, 16, pcm, 256)
    // a 256-sample constant block encodes in a handful of bytes — prove the
    // CONSTANT path was actually taken by a size ceiling (verbatim would be
    // 512+ bytes for frame 0 alone)
    assert(flac.length < 4 + 38 + 64 + 200 * 3,
      s"flac too large (${flac.length} B) — CONSTANT subframe not used")
    roundTrip(1, 16000, 16, pcm, 256)
  }

  test("stereo round-trip exercises all four channel assignments") {
    // 4 frames of 192 → frameIdx % 4 covers independent, left-side,
    // right-side, mid-side (including odd l+r, negative mids)
    val n = 192 * 4
    val l = Array.tabulate(n)(i => ((i * 53 + 7) % 1201 - 600) * 25)
    val r = Array.tabulate(n)(i => ((i * 29 + 3) % 997 - 498) * 27)
    roundTrip(2, 44100, 16, Array(l, r), 192)
  }

  test("8-bit and 24-bit depths round-trip") {
    roundTrip(1, 8000, 8, Array(Array.tabulate(300)(i => (i * 7) % 240 - 120)), 128)
    roundTrip(2, 48000, 24,
      Array(Array.tabulate(400)(i => ((i * 1021 + 5) % 2000001 - 1000000) * 4),
        Array.tabulate(400)(i => ((i * 911 + 2) % 1800001 - 900000) * 4)), 128)
  }

  test("jumpy residuals trigger the Rice escape path and still round-trip") {
    // alternating near-full-scale jumps make fixed/lpc residuals huge →
    // the k estimator exceeds 14 → escape-to-raw partitions
    val pcm = Array(Array.tabulate(512)(i =>
      if (i % 2 == 0) 30000 - (i % 7) else -30000 + (i % 5)))
    roundTrip(1, 22050, 16, pcm, 256)
  }

  test("decodeToWav output feeds the existing pcm_stats chain exactly") {
    val pcm = Array(Array.tabulate(500)(i => ((i * 37 + 11) % 1601 - 800) * 20))
    val wav = FlacCodec.decodeToWav(FlacCodec.encode(1, 8000, 16, pcm, 256))
    assert(wav != null)
    val (n, peak, sumSq, clip) = AudioHeaders.parsePcmStats(wav)
    assert(n == 500)
    assert(peak == pcm(0).map(math.abs).max)
    assert(sumSq == pcm(0).map(v => v.toLong * v).sum)
    assert(clip == 0)
  }

  test("corruption routes to null: flipped frame byte, truncated tail") {
    val pcm = Array(Array.tabulate(400)(i => ((i * 13 + 1) % 801 - 400) * 40))
    val flac = FlacCodec.encode(1, 8000, 16, pcm, 256)
    assert(FlacCodec.decode(flac) != null)
    val flipped = flac.clone()
    flipped(flac.length - 3) = (flipped(flac.length - 3) ^ 0x40).toByte
    assert(FlacCodec.decode(flipped) == null, "CRC corruption must null")
    assert(FlacCodec.decode(flac.dropRight(40)) == null, "truncation must null")
    assert(FlacCodec.decode("not flac at all".getBytes) == null)
    assert(FlacCodec.decode(null) == null)
  }
}
