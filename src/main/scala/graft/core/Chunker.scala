package graft.core

import java.security.MessageDigest

/** The file chunker (T1/T2): split content into fixed-size chunks with
  * per-chunk sha512 and a whole-content sha512, optionally restricted to
  * byte ranges whose kept bytes compact into contiguous write offsets
  * (reference upload_data_file.py:230-304 semantics; not a translation).
  */
object Chunker {

  val DefaultChunkSize: Int = 524288

  def isPowerOfTwo(n: Int): Boolean = n > 0 && (n & (n - 1)) == 0

  /** Chunk `content`. `selectBytes` as in the reference: optional
    * `(start, stop)` half-open ranges; they are sorted, must not overlap, and
    * only those bytes are chunked — `chunkOffsetWrite` compacts the kept
    * ranges so reconstruction is their concatenation. The file hash covers
    * exactly the chunked bytes, in walk order.
    */
  def chunk(
      filename: String,
      subdirStr: String,
      content: Array[Byte],
      chunkSize: Int = DefaultChunkSize,
      selectBytes: Seq[(Long, Long)] = Nil,
      fileMtime: Option[Double] = None,
      filenameAppend: String = ""): Seq[FileChunk] = {
    require(isPowerOfTwo(chunkSize), s"chunk size $chunkSize is not a power of two")
    val ranges: Seq[(Long, Long)] =
      if (selectBytes.isEmpty) Seq((0L, content.length.toLong))
      else {
        val sorted = selectBytes.sortBy(_._1)
        sorted.foreach { case (a, b) =>
          require(a >= 0 && b <= content.length && a < b, s"bad byte range ($a,$b)")
        }
        sorted.sliding(2).foreach {
          case Seq((_, b1), (a2, _)) => require(b1 <= a2, "overlapping byte ranges")
          case _ =>
        }
        sorted
      }
    val fileDigest = MessageDigest.getInstance("SHA-512")
    // First pass: chunk plan (offsets/sizes/hashes), rolling file hash.
    case class Plan(readOff: Long, writeOff: Long, size: Int)
    val plans = Seq.newBuilder[Plan]
    var writeOff = 0L
    ranges.foreach { case (start, stop) =>
      var off = start
      while (off < stop) {
        val size = math.min(chunkSize.toLong, stop - off).toInt
        fileDigest.update(content, off.toInt, size)
        plans += Plan(off, writeOff, size)
        off += size
        writeOff += size
      }
    }
    val fileHash = fileDigest.digest()
    val all = plans.result()
    all.zipWithIndex.map { case (p, i) =>
      val data = java.util.Arrays.copyOfRange(content, p.readOff.toInt, p.readOff.toInt + p.size)
      FileChunk(
        filename = filename,
        fileHash = fileHash,
        chunkHash = ChunkCodec.sha512(data),
        chunkOffsetWrite = p.writeOff,
        chunkI = i + 1,
        nTotalChunks = all.length,
        subdirStr = subdirStr,
        filenameAppend = filenameAppend,
        data = data,
        fileMtime = fileMtime)
    }
  }
}
