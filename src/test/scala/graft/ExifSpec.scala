package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Exif, JpegCodec}

/** EXIF provenance + GPS scrub: parse must invert build in both byte
  * orders, GPS must land integer-exact in centi-arcseconds with
  * hemisphere signs, the scrubber must drop GPS while preserving
  * provenance tags and the entropy-coded image data byte-for-byte, and
  * malformed input must route to null, never throw. */
class ExifSpec extends AnyFunSuite {

  private def dms(pos: Boolean, d: Int, m: Int, sN: Int, sD: Int) =
    Exif.Dms(pos, d, m, sN, sD)

  private def sampleTiff(le: Boolean): Array[Byte] =
    Exif.buildTiff(le, orientation = 6, make = "ACME", model = "Shooter 9",
      datetime = "2024:05:17 08:30:55", iso = 400,
      lat = dms(pos = true, 52, 30, 1234, 100),
      lon = dms(pos = false, 13, 15, 987, 100))

  test("build → parse round-trips in both byte orders (bare TIFF + APP1)") {
    for (le <- Seq(true, false)) {
      val tiff = sampleTiff(le)
      val jpeg = Exif.spliceApp1(
        JpegCodec.buildJpegGray(8, 8)((_, _) => 99), Exif.app1(tiff))
      for (b <- Seq(tiff, jpeg)) {
        val p = Exif.parse(b)
        assert(p != null, s"le=$le no parse")
        assert(p.byteOrder == (if (le) "II" else "MM"))
        assert(p.orientation == 6 && p.make == "ACME" && p.model == "Shooter 9")
        assert(p.datetime == "2024:05:17 08:30:55" && p.iso == 400)
        assert(p.hasGps)
        // 52°30'12.34" N = 52*360000 + 30*6000 + 1234 csec
        assert(p.latCsec == 52L * 360000 + 30 * 6000 + 1234)
        // 13°15'9.87" W = negative
        assert(p.lonCsec == -(13L * 360000 + 15 * 6000 + 987))
      }
    }
  }

  test("absent GPS / absent Exif-IFD surface as nulls, not zeros") {
    val noGps = Exif.buildTiff(littleEndian = true, orientation = 1,
      make = "m", model = "n", datetime = "d", iso = 100, lat = null, lon = null)
    val p = Exif.parse(noGps)
    assert(p != null && !p.hasGps && p.latCsec == null && p.lonCsec == null)
    val noIso = Exif.buildTiff(littleEndian = false, orientation = 2,
      make = "m", model = "n", datetime = "d", iso = -1,
      lat = dms(pos = true, 1, 2, 300, 100), lon = dms(pos = true, 4, 5, 600, 100))
    val q = Exif.parse(noIso)
    assert(q != null && q.iso == null && q.hasGps && q.latCsec != null)
    assert(Exif.parse(JpegCodec.buildJpegGray(8, 8)((_, _) => 7)) == null)
  }

  test("scrub drops GPS, keeps provenance, never touches image data") {
    val jpeg = JpegCodec.buildJpegGray(16, 16)((x, y) => (x * 7 + y * 3) % 256)
    val before = JpegCodec.parseJpegPixels(jpeg)
    for (le <- Seq(true, false)) {
      val tagged = Exif.spliceApp1(jpeg, Exif.app1(sampleTiff(le)))
      val clean = Exif.scrubGps(tagged)
      assert(clean.length < tagged.length)
      val p = Exif.parse(clean)
      assert(p != null && !p.hasGps && p.latCsec == null && p.lonCsec == null)
      assert(p.orientation == 6 && p.make == "ACME" && p.model == "Shooter 9" &&
        p.datetime == "2024:05:17 08:30:55" && p.iso == 400)
      // pixel decode identical before/after (the APP1 swap is metadata-only)
      assert(JpegCodec.parseJpegPixels(clean) == before)
      // idempotent: a second scrub is a no-op pass-through
      assert(Exif.scrubGps(clean) eq clean)
    }
  }

  test("scrub pass-through and the TIFF route-to-null rule") {
    val plain = JpegCodec.buildJpegGray(8, 8)((_, _) => 42)
    assert(Exif.scrubGps(plain) eq plain) // no EXIF: unchanged
    val noGps = Exif.spliceApp1(plain, Exif.app1(
      Exif.buildTiff(littleEndian = true, orientation = 1, make = "m",
        model = "n", datetime = "d", iso = 100, lat = null, lon = null)))
    assert(Exif.scrubGps(noGps) eq noGps) // EXIF but no GPS: unchanged
    // bare TIFF with GPS cannot be scrubbed here -> null, never retained
    assert(Exif.scrubGps(sampleTiff(le = true)) == null)
    assert(Exif.scrubGps(sampleTiff(le = false)) == null)
    // bare TIFF without GPS passes through
    val t = Exif.buildTiff(littleEndian = true, orientation = 1, make = "m",
      model = "n", datetime = "d", iso = 100, lat = null, lon = null)
    assert(Exif.scrubGps(t) eq t)
    assert(Exif.scrubGps(null) == null)
  }

  test("truncation and mutation fuzz route to null or parse, never throw") {
    val tiff = sampleTiff(le = true)
    val jpeg = Exif.spliceApp1(
      JpegCodec.buildJpegGray(8, 8)((_, _) => 50), Exif.app1(tiff))
    for (b <- Seq(tiff, jpeg); n <- 0 to b.length) {
      Exif.parse(b.take(n)); Exif.scrubGps(b.take(n))
    }
    val rnd = new scala.util.Random(0xEF1FL)
    for (_ <- 1 to 500) {
      val b = jpeg.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 + rnd.nextInt(255))).toByte
      Exif.parse(b); Exif.scrubGps(b)
    }
    assert(Exif.parse("not an image".getBytes) == null)
    assert(Exif.parse(Array.emptyByteArray) == null)
  }
}
