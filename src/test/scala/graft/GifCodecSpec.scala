package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GifCodec, ImageHeaders}

/** GIF LZW codec: compress/decompress round-trips (width-growth alignment,
  * KwKwK, dictionary overflow + clear), full-container build→parse
  * inversion against directly-computed stats, malformed degradation. */
class GifCodecSpec extends AnyFunSuite {

  private def roundTrip(idx: Array[Int], minCode: Int): Unit = {
    val packed = GifCodec.lzwCompress(idx, minCode)
    val back = GifCodec.lzwDecompress(packed, minCode, idx.length)
    assert(back != null, s"decode failed (n=${idx.length}, min=$minCode)")
    assert(back.toSeq == idx.toSeq)
  }

  test("LZW round-trips hand-picked adversarial streams") {
    // KwKwK: "ababab..." forces code == next on the decoder
    roundTrip(Array.tabulate(50)(i => i % 2), 2)
    // constant run: maximal dictionary chain growth
    roundTrip(Array.fill(5000)(1), 2)
    // single pixel / empty-ish edges
    roundTrip(Array(0), 2)
    roundTrip(Array(3, 3), 2)
    // alphabet sweep at 8-bit codes
    roundTrip(Array.tabulate(4000)(i => i % 256), 8)
    // long enough to overflow the 4096-entry dictionary and force a CLEAR
    // (long arithmetic: i*i overflows Int past i=46340 and a negative index
    // is invalid input, not a codec case)
    roundTrip(Array.tabulate(120000)(i => ((i.toLong * i + i / 3) % 16).toInt), 4)
    // width-boundary torture: lengths straddling every power of two so the
    // final data code and EOI land on each side of a width growth
    for (n <- Seq(2, 3, 250, 251, 252, 253, 254, 255, 256, 257, 507, 508, 509,
        510, 511, 512, 513, 1018, 1019, 1020, 1021, 1022, 1023, 1024, 1025))
      roundTrip(Array.tabulate(n)(i => (i * 7) % 4), 2)
  }

  test("LZW round-trips seeded-random streams across widths and lengths") {
    val rnd = new scala.util.Random(0xC0DEC5L)
    for (_ <- 1 to 300) {
      val bits = 2 + rnd.nextInt(6) // 2..7
      val n = 1 + rnd.nextInt(3000)
      // mix of uniform noise and run-heavy streams (runs stress the dict)
      val runHeavy = rnd.nextBoolean()
      val idx = new Array[Int](n)
      var i = 0
      var cur = rnd.nextInt(1 << bits)
      while (i < n) {
        if (!runHeavy || rnd.nextInt(4) == 0) cur = rnd.nextInt(1 << bits)
        idx(i) = cur
        i += 1
      }
      roundTrip(idx, bits)
    }
  }

  test("GIF build→parse inversion matches directly-computed stats") {
    val palette = Array((10, 200, 30), (250, 5, 120), (0, 0, 0), (255, 255, 255),
      (17, 34, 51), (68, 85, 102))
    val w = 9; val h = 7
    val idx = Array.tabulate(w * h)(i => (i * 5 + 3) % palette.length)
    val gif = GifCodec.buildGif(w, h, palette, idx)
    val p = GifCodec.parseGifPixels(gif)
    assert(p != null)
    val (pw, ph, nPx, sumR, sumG, sumB, lumaSum, firstLuma) = p
    assert((pw, ph, nPx) == ((w, h, w.toLong * h)))
    val rgb = idx.map(palette)
    assert(sumR == rgb.map(_._1.toLong).sum)
    assert(sumG == rgb.map(_._2.toLong).sum)
    assert(sumB == rgb.map(_._3.toLong).sum)
    def luma(t: (Int, Int, Int)) = ((77 * t._1 + 150 * t._2 + 29 * t._3) >> 8).toLong
    assert(lumaSum == rgb.map(luma).sum)
    assert(firstLuma == luma(rgb(0)))
    // the header parser agrees on dims (it reads the screen descriptor)
    assert(ImageHeaders.parse(gif) == ("gif", w, h))
  }

  test("interlaced GIF reduces to the same stats as the plain build") {
    val palette = Array((5, 250, 90), (200, 20, 140), (60, 60, 60), (255, 0, 255))
    for ((w, h) <- Seq((3, 1), (4, 9), (7, 16))) {
      val idx = Array.tabulate(w * h)(i => (i * 7 + 2) % palette.length)
      val plain = GifCodec.parseGifPixels(GifCodec.buildGif(w, h, palette, idx))
      val inter = GifCodec.parseGifPixels(
        GifCodec.buildGifInterlaced(w, h, palette, idx))
      assert(inter != null, s"interlaced ${w}x$h did not decode")
      assert(inter == plain, s"interlaced ${w}x$h stats diverge")
    }
  }

  test("local color table (no global) decodes identically") {
    val palette = Array((12, 34, 56), (78, 90, 123), (200, 100, 50))
    val idx = Array.tabulate(5 * 4)(i => (i * 2 + 1) % palette.length)
    val viaGct = GifCodec.parseGifPixels(GifCodec.buildGif(5, 4, palette, idx))
    val viaLct = GifCodec.parseGifPixels(
      GifCodec.buildGifLocalPalette(5, 4, palette, idx))
    assert(viaLct != null && viaLct == viaGct)
  }

  test("GIF parse degrades to null on malformed/unsupported, never crashes") {
    val palette = Array((1, 2, 3), (4, 5, 6))
    val good = GifCodec.buildGif(4, 4, palette, Array.tabulate(16)(_ % 2))
    assert(GifCodec.parseGifPixels(good) != null)
    // truncated mid-LZW
    assert(GifCodec.parseGifPixels(good.take(good.length - 5)) == null)
    // interlace flag flipped on a non-reordered stream still decodes — the
    // stats contract is row-order independent, so the flag is benign
    val inter = good.clone()
    val descFlags = 13 + 3 * 2 + 9 // screen(13) + GCT(2 entries) + descriptor+9
    inter(descFlags) = (inter(descFlags) | 0x40).toByte
    assert(GifCodec.parseGifPixels(inter) ==
      GifCodec.parseGifPixels(good))
    // corrupt LZW bits: must return null, not throw (flip a data byte)
    val corrupt = good.clone()
    corrupt(good.length - 4) = (corrupt(good.length - 4) ^ 0x7f).toByte
    GifCodec.parseGifPixels(corrupt) // any result is fine; no exception
    // header-only GIF from the header-fixture builder (no image data)
    assert(GifCodec.parseGifPixels(ImageHeaders.buildGif(5, 5, "xx".getBytes)) == null)
    // hostile dims in the descriptor
    val huge = good.clone()
    huge(descFlags - 4) = 0xff.toByte; huge(descFlags - 3) = 0x7f.toByte // w
    huge(descFlags - 2) = 0xff.toByte; huge(descFlags - 1) = 0x7f.toByte // h
    assert(GifCodec.parseGifPixels(huge) == null)
  }

  test("GIF and BMP built from the same pixel matrix reduce to the same stats") {
    val palette = Array((9, 8, 7), (100, 150, 200), (33, 66, 99), (210, 180, 5))
    val w = 5; val h = 6
    val idx = Array.tabulate(w * h)(i => (i * 3 + 1) % palette.length)
    def px(x: Int, y: Int): (Int, Int, Int) = palette(idx(y * w + x))
    val fromGif = GifCodec.parseGifPixels(GifCodec.buildGif(w, h, palette, idx))
    val fromBmp = ImageHeaders.parseBmpPixels(
      ImageHeaders.buildBmp24(w, h, topDown = false)(px))
    assert(fromGif == fromBmp)
  }
}
