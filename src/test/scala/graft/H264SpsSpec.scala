package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{H264, VideoHeaders}
import graft.functions.VideoHeaders.TrackSpec

/** H.264 codec-config parsing (ITU-T H.264 §7.3.2.1.1 Exp-Golomb syntax +
  * ISO 14496-15 avcC): parseSps must invert buildSps exactly, including
  * the cropping arithmetic and emulation-prevention bytes, and the MP4
  * walk must find the avcC inside a full visual sample entry. */
class H264SpsSpec extends AnyFunSuite {

  test("SPS round-trips profile/level and coded dimensions incl. cropping") {
    for ((mbs, mapU, cr, cb, level) <- Seq(
        (8, 6, 0, 0, 30), (8, 6, 3, 2, 31), (1, 1, 0, 0, 10),
        (120, 68, 0, 4, 51), (45, 30, 1, 1, 40))) {
      val sps = H264.buildSps(level, mbs, mapU, cr, cb)
      val p = H264.parseSps(sps)
      assert(p != null, s"mbs=$mbs mapU=$mapU cr=$cr cb=$cb did not parse")
      assert(p == (66, level, 16 * mbs - 2 * cr, 16 * mapU - 2 * cb),
        s"mbs=$mbs mapU=$mapU cr=$cr cb=$cb → $p")
    }
  }

  test("emulation-prevention bytes strip and insert as exact inverses; a " +
      "grid value that genuinely produces 00 00 03 still round-trips") {
    assert(H264.stripEmulation(Array[Byte](0, 0, 3, 1)).toSeq == Seq[Byte](0, 0, 1))
    assert(H264.stripEmulation(Array[Byte](0, 0, 3, 0, 0, 3, 2)).toSeq ==
      Seq[Byte](0, 0, 0, 0, 2))
    assert(H264.insertEmulation(Array[Byte](0, 0, 1)).toSeq == Seq[Byte](0, 0, 3, 1))
    assert(H264.insertEmulation(Array[Byte](0, 0, 3)).toSeq == Seq[Byte](0, 0, 3, 3))
    val rnd = new scala.util.Random(9)
    for (_ <- 1 to 500) {
      val raw = Array.fill[Byte](rnd.nextInt(40))((rnd.nextInt(4) * rnd.nextInt(2)).toByte)
      assert(H264.stripEmulation(H264.insertEmulation(raw)).sameElements(raw))
    }
    // hunt a VALID stream that contains a real emulation byte — a large
    // poc-type-1 offset's Exp-Golomb zero run manufactures 00 00 0x —
    // then prove the full parse still inverts it
    val found = (1 << 23 to (1 << 23) + 3000).find { o =>
      val s = H264.buildSps(0, 7, 5, 0, 0, pocOffset = o)
      s.sliding(3).exists(w => w(0) == 0 && w(1) == 0 && w(2) == 3)
    }
    assert(found.isDefined, "no poc offset produced an emulation byte")
    assert(H264.parseSps(H264.buildSps(0, 7, 5, 0, 0, pocOffset = found.get)) ==
      (66, 0, 112, 80))
  }

  test("avcC extraction from a full visual sample entry; malformed → null") {
    val sps = H264.buildSps(31, 20, 15, 2, 1)
    val spec = TrackSpec(1, "vide", "avc1", 316, 238, 90000,
      Array(100, 200), 3000, 1, H264.buildAvcC(sps))
    val b = VideoHeaders.buildMp4Tracks("isom", 1000, Seq(spec), Array[Byte](1, 2))
    val m = H264.parseMp4Sps(b)
    assert(m != null)
    assert(m.profile == 66 && m.level == 31)
    assert(m.width == 16 * 20 - 4 && m.height == 16 * 15 - 2)
    assert(m.lengthSize == 4 && m.nSps == 1 && m.nPps == 1)
    // the track-stats parse is undisturbed by the fat sample entry
    val tr = VideoHeaders.parseTracks(b)
    assert(tr != null && tr.head.codec == "avc1" && tr.head.sampleCount == 2)
    // no avcC (minimal entry) → null, not a crash
    val plain = VideoHeaders.buildMp4Tracks("isom", 1000,
      Seq(spec.copy(codecConfig = Array.emptyByteArray)), Array[Byte](1))
    assert(H264.parseMp4Sps(plain) == null)
    // truncations never throw
    for (n <- 0 to b.length) H264.parseMp4Sps(b.take(n))
    // corrupt the avcC version byte → null
    val idx = b.sliding(4).indexWhere(_.sameElements("avcC".getBytes))
    assert(idx > 0)
    val bad = b.clone(); bad(idx + 4) = 9
    assert(H264.parseMp4Sps(bad) == null)
    // a record LEVEL above the SPS level is spec-legal ("equal to or
    // greater"): still parses, reporting the SPS's own level
    val over = b.clone(); over(idx + 4 + 3) = 52 // AVCLevelIndication byte
    val om = H264.parseMp4Sps(over)
    assert(om != null && om.level == 31 && om.profile == 66)
    // but a record UNDERSTATING the SPS level is rejected
    val under = b.clone(); under(idx + 4 + 3) = 10
    assert(H264.parseMp4Sps(under) == null)
  }

  test("H.265 SPS round-trips profile/tier/level and conformance-window " +
      "dimensions; hvcC walk finds it in hvc1 entries") {
    import graft.functions.H265
    for ((pw, ph, cr, cb, prof, tier, lvl) <- Seq(
        (1920, 1080, 0, 4, 1, 0, 153), (3840, 2160, 0, 0, 2, 1, 183),
        (640, 360, 2, 1, 1, 0, 93), (128, 96, 0, 0, 1, 0, 30))) {
      val sps = H265.buildSps(prof, tier, lvl, pw, ph, cr, cb)
      val p = H265.parseSps(sps)
      assert(p != null, s"$pw x $ph did not parse")
      assert(p == (prof, tier, lvl, pw - 2 * cr, ph - 2 * cb, 1),
        s"$pw x $ph cr=$cr cb=$cb → $p")
    }
    val sps = H265.buildSps(1, 0, 120, 1280, 720, 3, 2)
    val spec = TrackSpec(1, "vide", "hvc1", 1274, 716, 90000,
      Array(80, 90), 3000, 1, H265.buildHvcC(sps))
    val b = VideoHeaders.buildMp4Tracks("isom", 1000, Seq(spec), Array[Byte](2))
    val m = H265.parseMp4Sps(b)
    assert(m != null)
    assert(m.profileIdc == 1 && m.tier == 0 && m.level == 120)
    assert(m.width == 1280 - 6 && m.height == 720 - 4)
    assert(m.chromaFormat == 1 && m.lengthSize == 4 && m.nArrays == 1)
    // an avc1 payload is NOT an hvc1 payload and vice versa
    assert(H264.parseMp4Sps(b) == null)
    for (n <- 0 to b.length) H265.parseMp4Sps(b.take(n))
  }

  test("AV1 sequence-header OBU round-trips profile/level/tier/dims; av1C " +
      "walk finds it in av01 entries") {
    import graft.functions.Av1
    for ((pf, lv, tr, w, h) <- Seq(
        (0, 8, 0, 1920, 1080), (0, 12, 1, 3840, 2160), (1, 5, 0, 640, 360),
        (2, 19, 1, 7680, 4320), (0, 0, 0, 1, 1))) {
      val obu = Av1.buildSeqHeaderObu(pf, lv, tr, w, h)
      val p = Av1.parseSeqHeader(obu)
      assert(p != null, s"$w x $h did not parse")
      assert((p.profile, p.level, p.width, p.height) == (pf, lv, w, h))
      if (lv > 7) assert(p.tier == tr) // tier only coded above level 7
    }
    val obu = Av1.buildSeqHeaderObu(0, 12, 1, 1280, 720)
    val spec = TrackSpec(1, "vide", "av01", 1280, 720, 90000,
      Array(70, 80), 3000, 1, Av1.buildAv1C(obu))
    val b = VideoHeaders.buildMp4Tracks("isom", 1000, Seq(spec), Array[Byte](5))
    val m = Av1.parseMp4(b)
    assert(m != null)
    assert(m.profile == 0 && m.level == 12 && m.tier == 1)
    assert(m.width == 1280 && m.height == 720)
    assert(m.monochrome == 0 && m.subX == 1 && m.subY == 1)
    // wrong codec families reject; truncations never throw
    assert(H264.parseMp4Sps(b) == null)
    assert(graft.functions.H265.parseMp4Sps(b) == null)
    for (n <- 0 to b.length) Av1.parseMp4(b.take(n))
    // corrupt the av1C marker/version byte → null
    val idx = b.sliding(4).indexWhere(_.sameElements("av1C".getBytes))
    assert(idx > 0)
    val bad = b.clone(); bad(idx + 4) = 0x01
    assert(Av1.parseMp4(bad) == null)
  }

  test("Annex-B walk: start-code split, framing-zero trim, null routing") {
    val sps = H264.buildSps(31, 8, 5, 2, 1)
    val pps = Array[Byte](0x68, 0x42, 0x37)
    val slice = Array[Byte](0x21, 77, 88, 99)
    val sc3 = Array[Byte](0, 0, 1); val sc4 = Array[Byte](0, 0, 0, 1)
    // 4-byte code before SPS (the next NAL's leading zero belongs to
    // framing), 3-byte codes after, trailing zeros after the last NAL
    val es = sc4 ++ sps ++ sc3 ++ pps ++ sc4 ++ slice ++ Array[Byte](0, 0)
    val nals = H264.annexbNals(es)
    assert(nals != null && nals.length == 3)
    assert(nals.map(_._1).toSeq == Seq(7, 8, 1))
    assert(java.util.Arrays.equals(nals(0)._3, sps))
    assert(java.util.Arrays.equals(nals(1)._3, pps))
    assert(java.util.Arrays.equals(nals(2)._3, slice))
    assert(nals.map(_._2).toSeq == Seq(sps.length.toLong, 3L, 4L))
    // the SPS payload round-trips through the bare-NAL parse
    assert(H264.parseSps(nals(0)._3) == ((66, 31, 16 * 8 - 2 * 2, 16 * 5 - 2 * 1)))
    // null routing: no opening start code / forbidden bit / empty NAL
    assert(H264.annexbNals("no start code here".getBytes) == null)
    assert(H264.annexbNals(sc3 ++ Array[Byte](0x80.toByte, 1)) == null)
    assert(H264.annexbNals((sc3 ++ sc3 :+ 0x21.toByte).toArray) == null)
    assert(H264.annexbNals(null) == null)
    for (n <- 0 to es.length) H264.annexbNals(es.take(n))
  }
}
