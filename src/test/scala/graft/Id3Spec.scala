package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioHeaders, Id3}

/** ID3 tag metadata: parse must invert build across both versions' frame
  * layouts (v2.4 syncsafe vs v2.3 big-endian sizes, TDRC vs TYER) and all
  * three text encodings, fall back to the ID3v1 trailer, and compose with
  * the audio frame walk on the same payload. */
class Id3Spec extends AnyFunSuite {

  test("ID3v2.3 and v2.4 round-trip across Latin-1 / UTF-16 / UTF-8") {
    // Título/Ärtist are Latin-1-representable, so all three encodings
    // must round-trip them; the en-dash album only survives Unicode encs
    for (major <- Seq(3, 4); enc <- Seq(0, 1, 3)) {
      val b = Id3.buildV2(major, enc, "Título", "Ärtist", "Al–bum", "1999",
        pad = 7)
      val p = Id3.parse(b)
      assert(p != null, s"major=$major enc=$enc did not parse")
      assert(p._1 == major && p._2 == "Título" && p._3 == "Ärtist" &&
        p._5 == "1999", s"major=$major enc=$enc got $p")
      if (enc != 0) assert(p._4 == "Al–bum", s"enc=$enc got ${p._4}")
    }
  }

  test("ID3v1 trailer fallback; v2 wins when both exist") {
    val music = AudioHeaders.buildMp3(9, 0, 3)
    val v1 = music ++ Id3.buildV1("my title", "someone", "record", "2004")
    assert(Id3.parse(v1) == ((1, "my title", "someone", "record", "2004")))
    val both = Id3.buildV2(4, 3, "v2 wins", "a", "b", "2020") ++ v1
    assert(Id3.parse(both)._2 == "v2 wins")
    // audio_header still reads the frames through/past either tag
    assert(AudioHeaders.parse(v1)._1 == "mp3")
    assert(AudioHeaders.parse(both)._1 == "mp3")
    assert(AudioHeaders.parse(v1)._5 == AudioHeaders.parse(music)._5)
  }

  test("junk, truncations, unknown encodings route to null, never throw") {
    assert(Id3.parse(null) == null)
    assert(Id3.parse("no tags at all here".getBytes) == null)
    assert(Id3.parse(Array.emptyByteArray) == null)
    val good = Id3.buildV2(4, 3, "t", "a", "al", "1984")
    for (n <- 0 to good.length) Id3.parse(good.take(n))
    // unsynchronised flag -> null (route, don't guess)
    val unsync = good.clone(); unsync(5) = 0x80.toByte
    assert(Id3.parse(unsync) == null)
    // corrupt encoding byte in the first frame -> that field null
    val badEnc = good.clone(); badEnc(10 + 10) = 9
    val p = Id3.parse(badEnc)
    assert(p != null && p._2 == null && p._3 == "a")
    val rnd = new scala.util.Random(0x1D3L)
    for (_ <- 1 to 300) {
      val b = good.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 + rnd.nextInt(255))).toByte
      Id3.parse(b)
    }
  }
}
