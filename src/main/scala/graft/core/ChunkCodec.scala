package graft.core

import java.security.MessageDigest

import Msgpack._

/** Chunk ⇄ wire-bytes codec (C1/C2): a 10-element msgpack array
  * `[filename, file_hash, chunk_hash, chunk_offset_write, chunk_i,
  * n_total_chunks, subdir_str, filename_append, data, file_mtime]`,
  * 9-element legacy form without mtime accepted on decode
  * (reference serialization.py:183-276; FIXTURES.md §1.1).
  */
object ChunkCodec {

  final class ChunkSerializationError(msg: String) extends RuntimeException(msg)

  def sha512(data: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-512").digest(data)

  /** Shared hex-digest helper (single home for the format — sinks and apps
    * reuse it rather than re-implementing the %02x fold). */
  def digestHex(algorithm: String, data: Array[Byte]): String =
    MessageDigest.getInstance(algorithm).digest(data).map("%02x".format(_)).mkString

  /** Serialize; verifies the payload hash first (the reference lazily
    * re-reads + verifies at serialize time, data_file_chunk.py:226-270). */
  def pack(c: FileChunk): Array[Byte] = {
    if (!java.util.Arrays.equals(sha512(c.data), c.chunkHash))
      throw new ChunkSerializationError(s"chunk hash mismatch packing ${c.msgKey}")
    Msgpack.pack(MpArray(Seq(
      MpStr(c.filename), MpBin(c.fileHash), MpBin(c.chunkHash),
      MpInt(c.chunkOffsetWrite), MpInt(c.chunkI.toLong), MpInt(c.nTotalChunks.toLong),
      MpStr(c.subdirStr), MpStr(c.filenameAppend), MpBin(c.data),
      c.fileMtime.map(MpFloat).getOrElse(MpFloat(0.0)))))
  }

  /** Deserialize + verify. `mtime <= 0 ⇒ None` (serialization.py:235-237);
    * re-verifies `sha512(data) == chunk_hash` and raises on mismatch
    * (serialization.py:244-253). Null input → null out (serialization.py:211-213). */
  def unpack(bytes: Array[Byte]): FileChunk = {
    if (bytes == null) return null
    val items = Msgpack.unpack(bytes) match {
      case MpArray(xs) if xs.length == 9 || xs.length == 10 => xs
      case MpArray(xs) =>
        throw new ChunkSerializationError(s"chunk array has ${xs.length} elements, want 9|10")
      case _ => throw new ChunkSerializationError("not a msgpack array")
    }
    def str(i: Int): String = items(i) match {
      case MpStr(s) => s
      case MpBin(b) => new String(b, java.nio.charset.StandardCharsets.UTF_8)
      case other => throw new ChunkSerializationError(s"element $i: want str, got $other")
    }
    def bin(i: Int): Array[Byte] = items(i) match {
      case MpBin(b) => b
      case other => throw new ChunkSerializationError(s"element $i: want bin, got $other")
    }
    def int(i: Int): Long = items(i) match {
      case MpInt(v) => v
      case other => throw new ChunkSerializationError(s"element $i: want int, got $other")
    }
    val mtime: Option[Double] =
      if (items.length == 9) None
      else items(9) match {
        case MpFloat(d) if d > 0 => Some(d)
        case MpInt(v) if v > 0 => Some(v.toDouble)
        case _ => None
      }
    val c = FileChunk(str(0), bin(1), bin(2), int(3), int(4).toInt, int(5).toInt,
      str(6), str(7), bin(8), mtime)
    if (!java.util.Arrays.equals(sha512(c.data), c.chunkHash))
      throw new ChunkSerializationError(s"chunk hash mismatch unpacking ${c.msgKey}")
    c
  }
}
