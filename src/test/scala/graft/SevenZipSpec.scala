package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SevenZip

/** The 7z container walk by build-then-parse inversion (no 7z tool
  * exists in this environment — the x162 ZIP posture): the writer
  * round-robins every supported coder (Copy / LZMA2-literal / raw
  * LZMA) across members, raw and LZMA2-ENCODED headers both parse,
  * and the two-level quarantine holds — container breaks null whole,
  * member-level breaks dead-letter just the member. */
class SevenZipSpec extends AnyFunSuite {

  private val files = Seq(
    ("docs/a.txt", ("alpha content " * 20).getBytes("UTF-8")),
    ("docs/b.txt", ("bravo content " * 30).getBytes("UTF-8")),
    ("c.bin", Array.tabulate[Byte](256)(_.toByte)),
    ("d.txt", "short".getBytes("UTF-8")),
    ("empty.txt", Array.empty[Byte]))

  test("roundtrip across all three coders, raw header") {
    val arc = SevenZip.build(files)
    val es = SevenZip.entries(arc)
    assert(es != null && es.size == files.size)
    es.zip(files).foreach { case (e, (n, d)) =>
      assert(e.name == n)
      assert(e.crcOk, s"${e.name} lost its CRC")
      assert(java.util.Arrays.equals(e.payload, d), s"${e.name} payload")
    }
  }

  test("LZMA2-encoded header parses identically") {
    val arc = SevenZip.build(files, encodedHeader = true)
    val es = SevenZip.entries(arc)
    assert(es != null && es.map(_.name) == files.map(_._1))
    es.zip(files).foreach { case (e, (_, d)) =>
      assert(e.crcOk && java.util.Arrays.equals(e.payload, d))
    }
  }

  test("container-level breaks null whole") {
    val arc = SevenZip.build(files)
    assert(SevenZip.entries(arc.dropRight(3)) == null, "torn next header")
    val magic = arc.clone(); magic(1) = 'x'.toByte
    assert(SevenZip.entries(magic) == null, "bad magic")
    val shc = arc.clone(); shc(9) = (shc(9) ^ 0x10).toByte
    assert(SevenZip.entries(shc) == null, "start-header CRC")
    assert(SevenZip.entries("not 7z".getBytes) == null)
  }

  test("member-level payload flip dead-letters just that member") {
    val arc = SevenZip.build(files)
    // flip a byte inside the FIRST pack stream (Copy coder for file 0:
    // packed region starts at byte 32)
    val flip = arc.clone()
    flip(40) = (flip(40) ^ 0x55).toByte
    val es = SevenZip.entries(flip)
    assert(es != null, "container must survive a payload flip")
    assert(!es.head.crcOk && es.head.payload == null,
      "flipped member must dead-letter")
    assert(es(1).crcOk, "other members must keep serving")
    assert(java.util.Arrays.equals(es(1).payload, files(1)._2))
  }

  test("empty member round-trips as empty, not as dead letter") {
    val es = SevenZip.entries(SevenZip.build(files))
    val e = es.find(_.name == "empty.txt").get
    // the empty member rides the substream path in this writer (no
    // kEmptyStream bit emitted) — a zero-length payload with a valid
    // CRC is the contract either way
    assert(e.crcOk && e.payload.length == 0)
  }

  test("filter-chained folders decode: delta and BCJ x86 (both ids) behind LZMA2") {
    // 艾 (0xE8 lead byte) / 退 (0xE9) make the branch converter
    // genuinely rewrite displacements inside valid UTF-8 — the XzSpec
    // trick, so a no-op BCJ stage cannot pass this test
    val body = ("call graph 艾退 jump table 艾 " * 40).getBytes("UTF-8")
    val nums = Array.tabulate[Byte](512)(i => (i * 7).toByte)
    val cf = Seq(
      ("a.bin", body), ("b.bin", nums), ("c.bin", body),
      ("d.txt", "plain member, no chain".getBytes("UTF-8")))
    val chains: Int => Option[(Long, Array[Byte])] = {
      case 0 => Some((0x04L, Array.empty[Byte]))       // BCJ x86, new id
      case 1 => Some((0x03L, Array[Byte](1)))          // delta, distance 2
      case 2 => Some((0x03030103L, Array.empty[Byte])) // BCJ x86, legacy id
      case _ => None
    }
    for (enc <- Seq(false, true)) {
      val es = SevenZip.entries(
        SevenZip.build(cf, encodedHeader = enc, chainFor = chains))
      assert(es != null && es.size == cf.size, s"encodedHeader=$enc")
      es.zip(cf).foreach { case (e, (n, d)) =>
        assert(e.crcOk, s"$n lost its CRC (encodedHeader=$enc)")
        assert(java.util.Arrays.equals(e.payload, d), s"$n payload")
      }
    }
  }

  test("exotic filter chains route as dead letters, never die") {
    // ARM (0x07) and SPARC (0x09) branch filters exist in the wild but
    // aren't decoded here: their members must stay VISIBLE with
    // crc_ok = false while plain members keep serving
    val cf = Seq(
      ("arm.bin", "arm-filtered payload".getBytes("UTF-8")),
      ("ok.txt", "fine".getBytes("UTF-8")),
      ("sparc.bin", "sparc-filtered".getBytes("UTF-8")))
    val chains: Int => Option[(Long, Array[Byte])] = {
      case 0 => Some((0x07L, Array.empty[Byte]))
      case 2 => Some((0x09L, Array.empty[Byte]))
      case _ => None
    }
    val es = SevenZip.entries(SevenZip.build(cf, chainFor = chains))
    assert(es != null && es.map(_.name) == cf.map(_._1))
    assert(!es(0).crcOk && es(0).payload == null, "ARM chain must route")
    assert(es(1).crcOk &&
      java.util.Arrays.equals(es(1).payload, cf(1)._2))
    assert(!es(2).crcOk && es(2).payload == null, "SPARC chain must route")
  }

  test("REAL_UINT64 writer: a member past the old 3-byte cap round-trips") {
    // any pack/unpack size >= 0x200000 used to spill into the
    // extra-byte flags and silently corrupt the header; 3 MiB through
    // the Copy coder exercises the 4-byte form on both numbers
    val big = new Array[Byte](3 * 1024 * 1024)
    new java.util.Random(7).nextBytes(big)
    val es = SevenZip.entries(SevenZip.build(Seq(("big.bin", big))))
    assert(es != null && es.size == 1 && es.head.crcOk)
    assert(java.util.Arrays.equals(es.head.payload, big))
  }

  test("kEmptyStream layout: empty files by bit vector, no folder") {
    // the layout real 7z tools emit — empty files carry NO substream,
    // only a bit in FilesInfo; non-empty files must keep mapping to
    // their folders in order around the gaps
    for (enc <- Seq(false, true)) {
      val es = SevenZip.entries(
        SevenZip.build(files, encodedHeader = enc, emptyStreamBits = true))
      assert(es != null && es.map(_.name) == files.map(_._1))
      es.zip(files).foreach { case (e, (n, d)) =>
        assert(e.crcOk, s"$n lost its CRC (encodedHeader=$enc)")
        assert(java.util.Arrays.equals(e.payload, d), s"$n payload")
      }
    }
  }
}
