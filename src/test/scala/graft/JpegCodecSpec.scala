package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JpegCodec

/** Baseline JPEG codec: exact round-trip for block-constant images (the
  * hash-gate contract), bounded error for arbitrary content, grayscale and
  * 4:4:4 color, malformed degradation. */
class JpegCodecSpec extends AnyFunSuite {

  test("zigzag table is the T.81 scan order (spot anchors + permutation)") {
    val z = JpegCodec.Zigzag
    assert(z.toSeq.sorted == (0 until 64))
    assert(z(0) == 0 && z(1) == 1 && z(2) == 8 && z(3) == 16 && z(4) == 9)
    assert(z(5) == 2 && z(63) == 63 && z(62) == 62)
    // T.81 figure A.6 mid-table anchors
    assert(z(35) == 56 && z(39) == 36 && z(20) == 40 && z(10) == 32)
  }

  test("block-constant grayscale round-trips EXACTLY at any block grid") {
    for ((w, h) <- Seq((8, 8), (16, 8), (24, 16), (32, 32))) {
      def gray(x: Int, y: Int): Int = (37 + 41 * (x / 8) + 97 * (y / 8)) % 256
      val jpeg = JpegCodec.buildJpegGray(w, h)(gray)
      val d = JpegCodec.decodeJpeg(jpeg)
      assert(d != null, s"decode failed at ${w}x$h")
      val (dw, dh, ch, px) = d
      assert((dw, dh, ch) == ((w, h, 1)))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == gray(x, y), s"pixel ($x,$y) at ${w}x$h")
    }
  }

  test("arbitrary grayscale decodes within quantization error bounds") {
    val w = 24; val h = 16
    def gray(x: Int, y: Int): Int = (x * 11 + y * 7 + (x * y) % 31) % 256
    // acQ=4: per-coefficient error <= 2; worst-case block error stays small
    val jpeg = JpegCodec.buildJpegGray(w, h, acQ = 4)(gray)
    val d = JpegCodec.decodeJpeg(jpeg)
    assert(d != null)
    val (_, _, _, px) = d
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr, math.abs(px(y * w + x) - gray(x, y)))
    assert(maxErr <= 16, s"max error $maxErr too large for acQ=4")
  }

  test("4:4:4 color: flat color blocks decode within YCbCr rounding error") {
    val w = 16; val h = 16
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      val bx = x / 8; val by = y / 8
      ((50 + 90 * bx + 30 * by) % 256, (200 - 60 * bx + 10 * by + 256) % 256,
        (120 + 40 * bx + 70 * by) % 256)
    }
    val jpeg = JpegCodec.buildJpegRgb(w, h)(rgb)
    val d = JpegCodec.decodeJpeg(jpeg)
    assert(d != null)
    val (dw, dh, ch, px) = d
    assert((dw, dh, ch) == ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      val p = y * w + x
      assert(math.abs(px(3 * p) - r) <= 2, s"R at ($x,$y)")
      assert(math.abs(px(3 * p + 1) - g) <= 2, s"G at ($x,$y)")
      assert(math.abs(px(3 * p + 2) - b) <= 2, s"B at ($x,$y)")
    }
  }

  test("non-multiple-of-8 dims decode (edge-replicated padding clipped)") {
    val w = 13; val h = 10
    def gray(x: Int, y: Int): Int = (30 + 5 * (x / 8) + 11 * (y / 8)) % 256
    val d = JpegCodec.decodeJpeg(JpegCodec.buildJpegGray(w, h)(gray))
    assert(d != null)
    val (dw, dh, _, px) = d
    assert((dw, dh) == ((w, h)))
    // block-constant content still exact: padding replicates the same value
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) == gray(x, y))
  }

  test("4:2:0: MCU-constant gray-valued RGB round-trips EXACTLY") {
    // per-16x16-macroblock constant v with r=g=b=v: Y=v exactly, Cb=Cr=128
    // exactly (coefficients sum to 0/1), chroma averaging over a constant
    // macroblock is the identity — so the whole subsampled path is DC-only
    // and integer-exact end to end
    val w = 32; val h = 16
    def v(x: Int, y: Int): Int = (25 + 70 * (x / 16) + 110 * (y / 16)) % 256
    val jpeg = JpegCodec.buildJpegRgb420(w, h)((x, y) => (v(x, y), v(x, y), v(x, y)))
    val d = JpegCodec.decodeJpeg(jpeg)
    assert(d != null)
    val (dw, dh, ch, px) = d
    assert((dw, dh, ch) == ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(px(3 * (y * w + x) + c) == v(x, y), s"($x,$y) ch$c")
  }

  test("4:2:0: arbitrary color decodes within subsampling+quantization bounds") {
    val w = 24; val h = 24
    // clamped (not wrapping) gradients: a % 256 wrap is a 256-step cliff
    // that chroma averaging legitimately smears
    def rgb(x: Int, y: Int): (Int, Int, Int) =
      (math.min(255, x * 10 + 40), math.min(255, y * 9 + 80),
        math.min(255, (x + y) * 5 + 120))
    val d = JpegCodec.decodeJpeg(JpegCodec.buildJpegRgb420(w, h, acQ = 4)(rgb))
    assert(d != null)
    val (_, _, _, px) = d
    // smooth gradients: chroma subsampling error is bounded by the local
    // chroma slope (~±10 per channel here), luma by quantization (~±4)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      val p = y * w + x
      worst = math.max(worst, math.abs(px(3 * p) - r))
      worst = math.max(worst, math.abs(px(3 * p + 1) - g))
      worst = math.max(worst, math.abs(px(3 * p + 2) - b))
    }
    assert(worst <= 24, s"worst channel error $worst")
  }

  test("4:2:2: MCU-constant gray-valued RGB round-trips EXACTLY") {
    // 4:2:2 MCU covers 16x8; constant 16x8 tiles keep every plane DC-only
    val w = 32; val h = 24
    def v(x: Int, y: Int): Int = (40 + 55 * (x / 16) + 85 * (y / 8)) % 256
    val d = JpegCodec.decodeJpeg(
      JpegCodec.buildJpegRgb422(w, h)((x, y) => (v(x, y), v(x, y), v(x, y))))
    assert(d != null)
    val (dw, dh, ch, px) = d
    assert((dw, dh, ch) == ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(px(3 * (y * w + x) + c) == v(x, y), s"($x,$y) ch$c")
  }

  test("restart markers (DRI + RSTn): decode resyncs and resets DC " +
      "predictors, block-constant stays exact") {
    val w = 40; val h = 24 // 15 MCUs → several RST markers at interval 2
    def gray(x: Int, y: Int): Int = (90 + 31 * (x / 8) + 17 * (y / 8)) % 256
    for (ri <- Seq(1, 2, 7)) {
      val jpeg = JpegCodec.buildJpegGray(w, h, restartInterval = ri)(gray)
      val d = JpegCodec.decodeJpeg(jpeg)
      assert(d != null, s"restartInterval=$ri did not decode")
      val (_, _, _, px) = d
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == gray(x, y), s"($x,$y) at interval $ri")
      // the stream genuinely contains restart markers
      assert((0 until jpeg.length - 1).exists(i =>
        (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) >= 0xd0 &&
          (jpeg(i + 1) & 0xff) <= 0xd7))
    }
  }

  test("malformed/unsupported payloads return null, never throw") {
    val good = JpegCodec.buildJpegGray(16, 16)((x, y) => (x * y) % 256)
    assert(JpegCodec.decodeJpeg(good) != null)
    // truncated mid-entropy-data
    assert(JpegCodec.decodeJpeg(good.take(good.length - 10)) == null)
    // progressive frame marker (SOF2) instead of SOF0
    val prog = good.clone()
    val sof = {
      var i = 2
      var at = -1
      while (at < 0) {
        if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) at = i
        else i += 1
      }
      at
    }
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decodeJpeg(prog) == null)
    // not a JPEG at all
    assert(JpegCodec.decodeJpeg("definitely not a jpeg".getBytes) == null)
    assert(JpegCodec.decodeJpeg(Array[Byte]()) == null)
    // corrupt entropy bytes: null or a decoded result, but never an exception
    val corrupt = good.clone()
    corrupt(good.length - 12) = (corrupt(good.length - 12) ^ 0x55).toByte
    JpegCodec.decodeJpeg(corrupt)
  }

  test("truncated segment declared lengths return null, never index past the tail") {
    // regression: a segment whose declared length passes the buffer-bounds
    // check but is shorter than the marker's fixed fields must not read
    // past the array when the segment ends at the buffer tail
    def bytes(vs: Int*): Array[Byte] = vs.map(_.toByte).toArray
    // SOF0 with len=2 (no payload at all), buffer ends right after
    assert(JpegCodec.decodeJpeg(bytes(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x02)) == null)
    // SOF0 with len=7 — one byte short of the 6 fixed header bytes
    assert(JpegCodec.decodeJpeg(
      bytes(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x07, 8, 0, 1, 0, 1)) == null)
    // SOS with len=2 (missing the component-count byte)
    assert(JpegCodec.decodeJpeg(bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02)) == null)
    // DRI with len=2 and len=3 (interval needs 2 bytes)
    assert(JpegCodec.decodeJpeg(bytes(0xff, 0xd8, 0xff, 0xdd, 0x00, 0x02)) == null)
    assert(JpegCodec.decodeJpeg(bytes(0xff, 0xd8, 0xff, 0xdd, 0x00, 0x03, 0x00)) == null)
    // DQT/DHT with len=2: empty table lists are structurally fine but the
    // stream then ends with no SOS — null either way, never a throw
    assert(JpegCodec.decodeJpeg(bytes(0xff, 0xd8, 0xff, 0xdb, 0x00, 0x02)) == null)
    assert(JpegCodec.decodeJpeg(bytes(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x02)) == null)
  }

  test("progressive gray: block-constant images round-trip EXACTLY " +
      "(DC-only, successive approximation split across scans)") {
    for ((w, h) <- Seq((8, 8), (16, 8), (24, 16), (17, 9))) {
      def gray(x: Int, y: Int): Int = (37 + 83 * (x / 8) + 129 * (y / 8)) % 256
      val d = JpegCodec.decodeJpeg(JpegCodec.buildJpegProgressiveGray(w, h)(gray))
      assert(d != null, s"progressive ${w}x$h did not decode")
      val (dw, dh, ch, px) = d
      assert((dw, dh, ch) == (w, h, 1))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == gray(x, y), s"($x,$y) in ${w}x$h")
    }
  }

  test("progressive decode equals baseline decode on arbitrary images: " +
      "the scan pipeline reconstructs the same coefficients exactly") {
    val rnd = new scala.util.Random(41)
    for ((w, h) <- Seq((16, 16), (23, 11), (40, 32))) {
      val img = Array.fill(h, w)(rnd.nextInt(256))
      def gray(x: Int, y: Int): Int = img(y)(x)
      val base = JpegCodec.decodeJpeg(JpegCodec.buildJpegGray(w, h)(gray))
      val prog = JpegCodec.decodeJpeg(JpegCodec.buildJpegProgressiveGray(w, h)(gray))
      assert(base != null && prog != null)
      assert(prog._1 == base._1 && prog._2 == base._2 && prog._3 == base._3)
      assert(prog._4.sameElements(base._4),
        s"progressive ${w}x$h diverges from baseline")
    }
    // color: interleaved DC scan + per-component AC bands vs baseline 4:4:4
    def rgb(x: Int, y: Int): (Int, Int, Int) =
      ((x * 13 + y * 7) % 256, (x * 5 + y * 29 + 60) % 256, (x * 31 + y * 3 + 200) % 256)
    val baseC = JpegCodec.decodeJpeg(JpegCodec.buildJpegRgb(17, 14)(rgb))
    val progC = JpegCodec.decodeJpeg(JpegCodec.buildJpegProgressiveRgb(17, 14)(rgb))
    assert(baseC != null && progC != null)
    assert(progC._4.sameElements(baseC._4), "progressive color diverges")
    // and the stats contract agrees end to end
    assert(JpegCodec.parseJpegPixels(JpegCodec.buildJpegProgressiveRgb(17, 14)(rgb)) ==
      JpegCodec.parseJpegPixels(JpegCodec.buildJpegRgb(17, 14)(rgb)))
  }

  test("progressive malformed payloads return null, never throw") {
    val good = JpegCodec.buildJpegProgressiveGray(16, 16)((x, y) => (x * y) % 256)
    assert(JpegCodec.decodeJpeg(good) != null)
    // every truncation decodes or nulls, never throws (no EOI → null)
    for (n <- 0 to good.length - 1)
      JpegCodec.decodeJpeg(good.take(n))
    assert(JpegCodec.decodeJpeg(good.take(good.length - 1)) == null)
    // arithmetic/lossless frame types still reject
    val sof = {
      var i = 2; var at = -1
      while (at < 0) {
        if ((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc2) at = i
        else i += 1
      }
      at
    }
    val arith = good.clone(); arith(sof + 1) = 0xc9.toByte
    assert(JpegCodec.decodeJpeg(arith) == null)
  }

  test("stats contract agrees with BMP on the same block-constant pixels") {
    import graft.functions.ImageHeaders
    val w = 16; val h = 8
    def gray(x: Int, y: Int): Int = (64 + 100 * (x / 8)) % 256
    val fromJpeg = JpegCodec.parseJpegPixels(JpegCodec.buildJpegGray(w, h)(gray))
    val fromBmp = ImageHeaders.parseBmpPixels(
      ImageHeaders.buildBmp24(w, h, topDown = false)((x, y) =>
        (gray(x, y), gray(x, y), gray(x, y))))
    assert(fromJpeg == fromBmp)
  }
}
