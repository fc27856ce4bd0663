package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ranged7z.StreamFilters

/** The streaming BCJ-x86 inverse against the whole-buffer kernel: for
  * any input and ANY chunking, pushing the bytes through
  * [[StreamFilters.X86]] must produce exactly what
  * `Xz.x86Convert(decode)` produces on the whole buffer — the mask
  * carry, the anchor carry, and the 4-byte lookahead across feed
  * boundaries are precisely where a port drifts. Delta gets the same
  * treatment (ring-state carry vs the in-place kernel). */
class X86StreamSpec extends AnyFunSuite {

  /** Branch-dense pseudo-code: lots of E8/E9 opcodes, operand bytes
    * spanning the ms-byte (00/FF) triggers, plus random filler — then
    * ENCODED by the kernel so the decode direction sees realistic
    * converted displacements. */
  private def encodedCorpus(seed: Int, n: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val raw = new Array[Byte](n)
    rnd.nextBytes(raw)
    var i = 0
    while (i < n - 8) {
      rnd.nextInt(7) match {
        case 0 => raw(i) = 0xE8.toByte
        case 1 => raw(i) = 0xE9.toByte
        case 2 => raw(i + 4) = 0x00
        case 3 => raw(i + 4) = 0xFF.toByte
        case _ =>
      }
      i += 1 + rnd.nextInt(6)
    }
    graft.functions.Xz.x86Convert(raw, 0, encoding = true)
    raw
  }

  private def streamDecode(data: Array[Byte], seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val st = new StreamFilters.X86
    val out = new java.io.ByteArrayOutputStream()
    val sink = (b: Array[Byte], off: Int, len: Int) => out.write(b, off, len)
    var i = 0
    while (i < data.length) {
      val n = math.min(1 + rnd.nextInt(97), data.length - i)
      st.feed(java.util.Arrays.copyOfRange(data, i, i + n), 0, n, sink)
      i += n
    }
    st.flush(sink)
    out.toByteArray
  }

  test("streaming x86 inverse == whole-buffer kernel over random " +
      "chunkings (1..97-byte feeds), branch-dense inputs") {
    for (seed <- 1 to 8) {
      val enc = encodedCorpus(seed, 40000 + seed * 777)
      val want = enc.clone()
      graft.functions.Xz.x86Convert(want, 0, encoding = false)
      for (chunkSeed <- 1 to 4) {
        val got = streamDecode(enc, seed * 100 + chunkSeed)
        assert(got.length == want.length)
        assert(java.util.Arrays.equals(got, want),
          s"seed=$seed chunkSeed=$chunkSeed diverged at " +
            got.zip(want).indexWhere(t => t._1 != t._2))
      }
    }
  }

  test("streaming delta inverse == whole-buffer kernel over random " +
      "chunkings and distances") {
    val rnd = new scala.util.Random(11)
    for (dist <- Seq(1, 2, 3, 4, 8, 255)) {
      val raw = new Array[Byte](20000)
      rnd.nextBytes(raw)
      val enc = raw.clone()
      graft.functions.Xz.deltaEncode(enc, dist)
      val st = new StreamFilters.Delta(dist)
      val out = new java.io.ByteArrayOutputStream()
      val sink = (b: Array[Byte], off: Int, len: Int) =>
        out.write(b, off, len)
      var i = 0
      while (i < enc.length) {
        val n = math.min(1 + rnd.nextInt(61), enc.length - i)
        st.feed(java.util.Arrays.copyOfRange(enc, i, i + n), 0, n, sink)
        i += n
      }
      st.flush(sink)
      assert(java.util.Arrays.equals(out.toByteArray, raw), s"dist=$dist")
    }
  }
}
