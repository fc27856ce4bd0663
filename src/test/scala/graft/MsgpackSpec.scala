package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Msgpack._
import graft.core.{ChunkCodec, FileChunk}

/** Byte-level msgpack layout checks (the golden-fixture semantics of
  * FIXTURES.md §1.1: same type flags msgpack-python emits with
  * use_bin_type=True) plus roundtrip properties (seeded random — the
  * offline cache has no scalatest/scalacheck bridge artifact).
  */
class MsgpackSpec extends AnyFunSuite {

  test("scalar encodings match the msgpack spec byte-for-byte") {
    assert(pack(MpInt(5)).toSeq == Seq(0x05).map(_.toByte))
    assert(pack(MpInt(127)).toSeq == Seq(0x7f).map(_.toByte))
    assert(pack(MpInt(128)).toSeq == Seq(0xcc, 0x80).map(_.toByte))
    assert(pack(MpInt(65535)).toSeq == Seq(0xcd, 0xff, 0xff).map(_.toByte))
    assert(pack(MpInt(65536)).toSeq == Seq(0xce, 0x00, 0x01, 0x00, 0x00).map(_.toByte))
    assert(pack(MpInt(-1)).toSeq == Seq(0xff).map(_.toByte))
    assert(pack(MpInt(-32)).toSeq == Seq(0xe0).map(_.toByte))
    assert(pack(MpInt(-33)).toSeq == Seq(0xd0, 0xdf).map(_.toByte))
    assert(pack(MpNil).toSeq == Seq(0xc0).map(_.toByte))
    // float64: 1.5 = 0x3FF8000000000000
    assert(pack(MpFloat(1.5)).toSeq ==
      Seq(0xcb, 0x3f, 0xf8, 0, 0, 0, 0, 0, 0).map(_.toByte))
    // fixstr
    assert(pack(MpStr("abc")).toSeq == (Seq(0xa3).map(_.toByte) ++ "abc".getBytes))
    // str8 (32..255 bytes)
    val s40 = "x" * 40
    assert(pack(MpStr(s40)).take(2).toSeq == Seq(0xd9, 40).map(_.toByte))
    // bin8/bin16
    assert(pack(MpBin(Array.fill[Byte](3)(1))).take(2).toSeq == Seq(0xc4, 3).map(_.toByte))
    assert(pack(MpBin(Array.fill[Byte](300)(1))).take(3).toSeq ==
      Seq(0xc5, 0x01, 0x2c).map(_.toByte))
    // fixarray of 10 (the chunk layout) starts with 0x9a
    assert(pack(MpArray(Seq.fill(10)(MpNil))).head == 0x9a.toByte)
    assert(pack(MpArray(Seq.fill(9)(MpNil))).head == 0x99.toByte)
  }

  test("roundtrip: random nested values survive pack→unpack") {
    val rnd = new scala.util.Random(42)
    def scalar(): Value = rnd.nextInt(5) match {
      case 0 => MpInt(rnd.nextLong())
      case 1 => MpStr(rnd.alphanumeric.take(rnd.nextInt(300)).mkString)
      case 2 => val b = new Array[Byte](rnd.nextInt(400)); rnd.nextBytes(b); MpBin(b)
      case 3 => MpFloat(rnd.nextDouble() * 1e6 - 5e5)
      case 4 => MpNil
    }
    def same(a: Value, b: Value): Boolean = (a, b) match {
      case (MpBin(x), MpBin(y)) => x.toSeq == y.toSeq
      case (MpArray(xs), MpArray(ys)) =>
        xs.length == ys.length && xs.zip(ys).forall { case (x, y) => same(x, y) }
      case (x, y) => x == y
    }
    (1 to 500).foreach { _ =>
      val v = if (rnd.nextBoolean()) scalar()
              else MpArray(Seq.fill(rnd.nextInt(12))(scalar()))
      assert(same(v, unpack(pack(v))), s"roundtrip failed for $v")
    }
  }

  private def mkChunk(data: Array[Byte], mtime: Option[Double]): FileChunk =
    FileChunk("f.bin", ChunkCodec.sha512(data), ChunkCodec.sha512(data), 0L, 1, 1,
      "sub/dir", "", data, mtime)

  test("chunk codec: 10-element layout, mtime<=0 → None, hash verified") {
    val data = "payload".getBytes
    val c = mkChunk(data, Some(1234.5))
    val wire = ChunkCodec.pack(c)
    assert(wire.head == 0x9a.toByte) // fixarray(10)
    val back = ChunkCodec.unpack(wire)
    assert(back.filename == "f.bin" && back.subdirStr == "sub/dir")
    assert(back.data.toSeq == data.toSeq && back.fileMtime.contains(1234.5))
    // mtime None packs as 0.0 → unpacks as None (serialization.py:235-237)
    val c0 = mkChunk(data, None)
    assert(ChunkCodec.unpack(ChunkCodec.pack(c0)).fileMtime.isEmpty)
  }

  test("chunk codec: 9-element legacy form accepted, mtime None") {
    val data = "legacy".getBytes
    val nine = MpArray(Seq(
      MpStr("f.bin"), MpBin(ChunkCodec.sha512(data)), MpBin(ChunkCodec.sha512(data)),
      MpInt(0), MpInt(1), MpInt(1), MpStr(""), MpStr(""), MpBin(data)))
    val back = ChunkCodec.unpack(pack(nine))
    assert(back.fileMtime.isEmpty && back.data.toSeq == data.toSeq)
  }

  test("chunk codec: corrupted payload raises") {
    val data = "payload".getBytes
    val tampered = data.clone(); tampered(0) = (tampered(0) ^ 0x01).toByte
    val wire = pack(MpArray(Seq(
      MpStr("f.bin"), MpBin(ChunkCodec.sha512(data)), MpBin(ChunkCodec.sha512(data)),
      MpInt(0), MpInt(1), MpInt(1), MpStr(""), MpStr(""), MpBin(tampered), MpFloat(0.0))))
    assertThrows[ChunkCodec.ChunkSerializationError](ChunkCodec.unpack(wire))
  }

  test("chunk codec: null in → null out") {
    assert(ChunkCodec.unpack(null) == null)
  }
}
