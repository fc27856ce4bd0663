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

  test("MP3 bounded forward resync: leading junk is skipped, but a lone " +
      "false sync in junk is not enough to claim the stream") {
    val clean = AudioHeaders.buildMp3(9, 0, 10)
    val junk = "this prefix has no sync word in it".getBytes
    val p = AudioHeaders.parseMp3(junk ++ clean)
    assert(p != null, "resync did not find the first frame past leading junk")
    assert(p == AudioHeaders.parseMp3(clean))
    // a resync'd stream must walk >= 2 frames: one sync mid-junk is too
    // weak a magic to classify arbitrary bytes as MP3
    assert(AudioHeaders.parseMp3(junk ++ AudioHeaders.buildMp3(9, 0, 1)) == null)
    assert(AudioHeaders.parseMp3(AudioHeaders.buildMp3(9, 0, 1)) != null)
    // junk beyond the 64 KiB resync bound → null
    assert(AudioHeaders.parseMp3(new Array[Byte](70000) ++ clean) == null)
  }

  test("Opus backward scan verifies page CRC: a fake OggS after the real " +
      "EOS page cannot hijack the granule position") {
    val real = AudioHeaders.buildOpus(2, 312, 48000, 48000L, Array[Byte](7, 8, 9))
    val want = AudioHeaders.parseOpus(real)
    // trailing junk shaped like a page header (sync + version 0, nsegs 0)
    // but with a garbage granule and a CRC that cannot verify
    val fake = "OggS".getBytes ++ new Array[Byte](30)
    fake(6) = 0x77 // absurd granule low byte
    val p = AudioHeaders.parseOpus(real ++ fake)
    assert(p == want, s"fake trailing page hijacked the granule: $p vs $want")
    // same fake embedded inside the EOS payload body
    val body = "xx".getBytes ++ "OggS".getBytes ++ new Array[Byte](40)
    val embedded = AudioHeaders.buildOpus(2, 0, 48000, 960L, body)
    assert(AudioHeaders.parseOpus(embedded) == ("opus", 2, 48000, 0,
      960L * 1000000L / 48000L))
  }

  test("ADTS/AAC frame walk: exact block-count duration, ID3v2 skip, " +
      "ID3v1 trailer ends the walk cleanly") {
    val rates = Seq(96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
      16000, 12000, 11025, 8000, 7350)
    for ((srIdx, ch, n, blocks, id3, v1) <- Seq(
        (4, 2, 12, 1, 0, false), (3, 6, 5, 4, 0, true),
        (0, 1, 100, 2, 77, false), (12, 7, 1, 1, 33, true))) {
      val b = AudioHeaders.buildAdts(srIdx, ch, n, bodyBytes = 50,
        blocksPerFrame = blocks, id3Bytes = id3, id3v1 = v1)
      val p = AudioHeaders.parseAdts(b)
      assert(p != null, s"sr=$srIdx ch=$ch n=$n did not parse")
      val chOut = if (ch == 7) 8 else ch
      assert(p == ("aac", chOut, rates(srIdx), 0,
        n.toLong * blocks * 1024L * 1000000L / rates(srIdx)))
      assert(AudioHeaders.parse(b) == p)
    }
    val clean = AudioHeaders.buildAdts(4, 2, 8)
    for (n <- 0 to clean.length) AudioHeaders.parseAdts(clean.take(n))
    // ADTS and MP3 are mutually exclusive on the layer bits
    assert(AudioHeaders.parseMp3(clean) == null)
    assert(AudioHeaders.parseAdts(AudioHeaders.buildMp3(9, 0, 3)) == null)
    // channel config 0 (in-payload PCE) is rejected, not misread
    val pce = clean.clone()
    pce(2) = (pce(2) & 0xfe).toByte; pce(3) = (pce(3) & 0x3f).toByte
    assert(AudioHeaders.parseAdts(pce) == null)
    assert(AudioHeaders.parseAdts("not audio at all".getBytes) == null)
  }

  test("pcm_frames windows agree with whole-payload pcm_stats across " +
      "8/16-bit PCM and G.711, tail frames included") {
    for ((ch, rate, bits, fmt, n) <- Seq(
        (1, 8000, 8, 1, 850), (2, 16000, 16, 1, 1024),
        (1, 8000, 8, 7, 333), (1, 8000, 8, 6, 160))) {
      val body = Array.tabulate(n)(k => (k * 31 + 5).toByte)
      val b = AudioHeaders.buildWav(ch, rate, bits, body, fmtCode = fmt)
      val frames = AudioHeaders.parsePcmFrames(b, 160)
      val whole = AudioHeaders.parsePcmStats(b)
      assert(frames != null && whole != null, s"fmt=$fmt bits=$bits")
      // frame decomposition must tile the payload exactly
      assert(frames.map(_._2).sum == whole._1, "sample counts disagree")
      assert(frames.map(_._4).sum == whole._3, "energies disagree")
      assert(frames.map(_._3).max == whole._2, "peaks disagree")
      assert(frames.map(_._1) == frames.indices, "frame indices not dense")
      val full = whole._1 / 160
      assert(frames.take(full.toInt).forall(_._2 == 160L))
      if (whole._1 % 160 != 0) assert(frames.last._2 == whole._1 % 160)
    }
    assert(AudioHeaders.parsePcmFrames("not a wav".getBytes, 160) == null)
    assert(AudioHeaders.parsePcmFrames(
      AudioHeaders.buildWav(1, 8000, 8, Array[Byte](1, 2)), 0) == null)
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
