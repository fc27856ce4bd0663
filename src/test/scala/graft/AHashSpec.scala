package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AHash, ImageHeaders, JpegCodec}

/** Perceptual aHash: container-independent on decoded luma, invariant
  * under uniform brightness shift, Hamming-proportional under cell
  * flips, and null-routing on undecodable payloads. */
class AHashSpec extends AnyFunSuite {

  private def cellGray(on: Int => Boolean)(x: Int, y: Int): Int = {
    val k = (y / 8) * 8 + (x / 8)
    if (on(k)) 200 else 60
  }

  private val basePattern: Int => Boolean = k => (k * 7 + 3) % 5 < 2

  test("JPEG and BMP of the same picture hash identically") {
    val g = cellGray(basePattern) _
    val jpeg = JpegCodec.buildJpegGray(64, 64)(g)
    val bmpUp = ImageHeaders.buildBmp24(64, 64, topDown = false) {
      (x, y) => val v = g(x, y); (v, v, v) }
    val bmpDown = ImageHeaders.buildBmp24(64, 64, topDown = true) {
      (x, y) => val v = g(x, y); (v, v, v) }
    val hj = AHash.ahash(jpeg)
    assert(hj != null)
    assert(hj == AHash.ahash(bmpUp) && hj == AHash.ahash(bmpDown))
    // the bit at cell k is exactly the pattern bit (cells are 60/200)
    for (k <- 0 until 64)
      assert(((hj >> k) & 1L) == (if (basePattern(k)) 1L else 0L))
  }

  test("uniform brightness shift leaves the hash unchanged") {
    val g = cellGray(basePattern) _
    val h0 = AHash.ahash(JpegCodec.buildJpegGray(64, 64)(g))
    for (shift <- Seq(-40, -8, 8, 40)) {
      val hs = AHash.ahash(JpegCodec.buildJpegGray(64, 64) {
        (x, y) => g(x, y) + shift })
      assert(h0 == hs, s"shift=$shift changed the hash")
    }
  }

  test("k cell flips move the hash by exactly k bits") {
    val h0 = AHash.ahash(JpegCodec.buildJpegGray(64, 64)(cellGray(basePattern)))
    for (flips <- 1 to 4) {
      val hk = AHash.ahash(JpegCodec.buildJpegGray(64, 64)(
        cellGray(k => basePattern(k) ^ (k < flips))))
      assert(java.lang.Long.bitCount(h0 ^ hk) == flips)
    }
  }

  test("non-8-aligned dims use box cells (still deterministic, exact)") {
    // 24x16: cells are 3x2 pixel boxes; a flat image hashes to 0
    val flat = AHash.ahash(JpegCodec.buildJpegGray(24, 16)((_, _) => 128))
    assert(flat == 0L)
    // left half bright / right half dark -> exactly the 4 left columns set
    val half = AHash.ahash(JpegCodec.buildJpegGray(24, 16) {
      (x, _) => if (x < 12) 200 else 60 })
    assert(half != null)
    for (k <- 0 until 64)
      assert(((half >> k) & 1L) == (if (k % 8 < 4) 1L else 0L), s"k=$k")
  }

  test("undecodable payloads route to null, never throw") {
    assert(AHash.ahash(null) == null)
    assert(AHash.ahash(Array.emptyByteArray) == null)
    assert(AHash.ahash("definitely not an image".getBytes) == null)
    // tiny images below the 8x8 grid route to null
    assert(AHash.ahash(JpegCodec.buildJpegGray(8, 8)((_, _) => 1)) != null)
    val good = JpegCodec.buildJpegGray(16, 16)((x, y) => (x * y) % 256)
    for (n <- 0 to good.length) AHash.ahash(good.take(n))
    val rnd = new scala.util.Random(0xA4A5L)
    for (_ <- 1 to 200) {
      val b = good.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 + rnd.nextInt(255))).toByte
      AHash.ahash(b)
    }
  }
}
