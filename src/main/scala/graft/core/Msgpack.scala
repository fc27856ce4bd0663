package graft.core

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal msgpack codec — just the subset the chunk wire format needs
  * (arrays, str, bin, int, float64, nil), encoded exactly as msgpack-python
  * with `use_bin_type=True` does (smallest-form ints, str vs bin families;
  * reference openmsistream kafka_wrapper/serialization.py:183-199).
  * Hand-rolled because the build is offline-only; the format itself is the
  * public msgpack spec.
  */
object Msgpack {

  sealed trait Value
  final case class MpStr(s: String) extends Value
  final case class MpBin(b: Array[Byte]) extends Value
  final case class MpInt(i: Long) extends Value
  final case class MpFloat(d: Double) extends Value
  case object MpNil extends Value
  final case class MpArray(items: Seq[Value]) extends Value

  def pack(v: Value): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(out, v)
    out.toByteArray
  }

  private def write(out: ByteArrayOutputStream, v: Value): Unit = v match {
    case MpNil => out.write(0xc0)
    case MpInt(i) =>
      if (i >= 0) {
        if (i < 0x80) out.write(i.toInt)
        else if (i <= 0xff) { out.write(0xcc); out.write(i.toInt) }
        else if (i <= 0xffff) { out.write(0xcd); writeBE(out, i, 2) }
        else if (i <= 0xffffffffL) { out.write(0xce); writeBE(out, i, 4) }
        else { out.write(0xcf); writeBE(out, i, 8) }
      } else {
        if (i >= -32) out.write((0xe0 | (i & 0x1f)).toInt)
        else if (i >= Byte.MinValue) { out.write(0xd0); out.write(i.toInt & 0xff) }
        else if (i >= Short.MinValue) { out.write(0xd1); writeBE(out, i, 2) }
        else if (i >= Int.MinValue) { out.write(0xd2); writeBE(out, i, 4) }
        else { out.write(0xd3); writeBE(out, i, 8) }
      }
    case MpFloat(d) =>
      out.write(0xcb); writeBE(out, java.lang.Double.doubleToLongBits(d), 8)
    case MpStr(s) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length < 32) out.write(0xa0 | b.length)
      else if (b.length <= 0xff) { out.write(0xd9); out.write(b.length) }
      else if (b.length <= 0xffff) { out.write(0xda); writeBE(out, b.length.toLong, 2) }
      else { out.write(0xdb); writeBE(out, b.length.toLong, 4) }
      out.write(b, 0, b.length)
    case MpBin(b) =>
      if (b.length <= 0xff) { out.write(0xc4); out.write(b.length) }
      else if (b.length <= 0xffff) { out.write(0xc5); writeBE(out, b.length.toLong, 2) }
      else { out.write(0xc6); writeBE(out, b.length.toLong, 4) }
      out.write(b, 0, b.length)
    case MpArray(items) =>
      if (items.length < 16) out.write(0x90 | items.length)
      else if (items.length <= 0xffff) { out.write(0xdc); writeBE(out, items.length.toLong, 2) }
      else { out.write(0xdd); writeBE(out, items.length.toLong, 4) }
      items.foreach(write(out, _))
  }

  private def writeBE(out: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var shift = (n - 1) * 8
    while (shift >= 0) { out.write(((v >> shift) & 0xff).toInt); shift -= 8 }
  }

  def unpack(bytes: Array[Byte]): Value = {
    val buf = ByteBuffer.wrap(bytes)
    val v = read(buf)
    v
  }

  private def read(buf: ByteBuffer): Value = {
    val b = buf.get() & 0xff
    b match {
      case x if x < 0x80 => MpInt(x.toLong)
      case x if x >= 0xe0 => MpInt((x - 0x100).toLong)
      case x if (x & 0xf0) == 0x90 => MpArray((0 until (x & 0x0f)).map(_ => read(buf)))
      case x if (x & 0xe0) == 0xa0 => MpStr(readStr(buf, x & 0x1f))
      case 0xc0 => MpNil
      case 0xc4 => MpBin(readBytes(buf, buf.get() & 0xff))
      case 0xc5 => MpBin(readBytes(buf, buf.getShort() & 0xffff))
      case 0xc6 => MpBin(readBytes(buf, buf.getInt()))
      case 0xca => MpFloat(buf.getFloat().toDouble)
      case 0xcb => MpFloat(buf.getDouble())
      case 0xcc => MpInt((buf.get() & 0xff).toLong)
      case 0xcd => MpInt((buf.getShort() & 0xffff).toLong)
      case 0xce => MpInt(buf.getInt().toLong & 0xffffffffL)
      case 0xcf => MpInt(buf.getLong()) // uint64 > Long.Max unsupported (not produced here)
      case 0xd0 => MpInt(buf.get().toLong)
      case 0xd1 => MpInt(buf.getShort().toLong)
      case 0xd2 => MpInt(buf.getInt().toLong)
      case 0xd3 => MpInt(buf.getLong())
      case 0xd9 => MpStr(readStr(buf, buf.get() & 0xff))
      case 0xda => MpStr(readStr(buf, buf.getShort() & 0xffff))
      case 0xdb => MpStr(readStr(buf, buf.getInt()))
      case 0xdc => MpArray((0 until (buf.getShort() & 0xffff)).map(_ => read(buf)))
      case 0xdd => MpArray((0 until buf.getInt()).map(_ => read(buf)))
      case other => throw new IllegalArgumentException(
        f"unsupported msgpack type byte 0x$other%02x at ${buf.position() - 1}")
    }
  }

  private def readBytes(buf: ByteBuffer, n: Int): Array[Byte] = {
    val arr = new Array[Byte](n); buf.get(arr); arr
  }
  private def readStr(buf: ByteBuffer, n: Int): String =
    new String(readBytes(buf, n), StandardCharsets.UTF_8)
}
