package graft.sources

import java.io.{BufferedInputStream, EOFException, IOException, InputStream}

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Range access to multi-frame `.zst`/`.warc.zst` files that never
  * materializes a file — the zstd member of the ranged-reader trio
  * ([[RangedBz2]], [[Ranged7z]]), lifting the column path's 2 GB
  * binary bound for crawl monoliths. zstd frames carry NO compressed
  * size in their frame header (RFC 8878 — the size lives in per-BLOCK
  * headers), so the extent scan is a streaming BLOCK-HEADER walk:
  * 3 bytes per block read, payloads skipped, O(1) memory, no
  * decompression — the seek-table role real `.warc.zst` tooling fills
  * with external indexes, derived here from the format itself.
  *
  * Extent semantics mirror [[graft.functions.Zstandard.frameExtents]]
  * so the two readers cannot drift: skippable frames are walked over
  * and not emitted (except the LEADING one, probed separately as the
  * IIPC dictionary slot), and a torn tail becomes one final extent
  * that will fail its decode and quarantine downstream — intact
  * leading frames keep serving. */
object RangedZstd {

  /** What the header walk learned: the leading skippable extent (the
    * IIPC dictionary slot; dictLen < 0 when absent) and each DATA
    * frame's (offset, length). A torn tail is the last extent. */
  final case class Extents(dictOff: Long, dictLen: Long,
      frames: Seq[(Long, Long)])

  private final class Walker(in: InputStream) {
    var pos = 0L
    def u8(): Int = {
      val c = in.read()
      if (c < 0) throw new EOFException()
      pos += 1
      c
    }
    def le32(): Long = {
      (u8().toLong) | (u8().toLong << 8) | (u8().toLong << 16) |
        (u8().toLong << 24)
    }
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val s = in.skip(left)
        if (s <= 0) {
          if (in.read() < 0) throw new EOFException()
          pos += 1
          left -= 1
        } else { pos += s; left -= s }
      }
    }
    /** -1 at EOF, else the next byte (peeked via a 1-byte pushback). */
    private var pushed = -1
    def peek(): Int = {
      if (pushed < 0) pushed = in.read()
      pushed
    }
    def popPushed(): Int = {
      val c = pushed
      pushed = -1
      pos += 1
      c
    }
  }

  private val DataMagic = 0xFD2FB528L

  /** Extents of `path`, or null when the file does not start with a
    * zstd frame at all (not-zstd: the caller routes one quarantine
    * row). Streaming, O(1) memory; a malformed frame mid-file ends the
    * walk with a torn-tail extent, mirroring `frameExtents`. */
  def scanExtents(conf: Configuration, path: String): Extents =
    try {
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val size = fs.getFileStatus(p).getLen
      val raw = fs.open(p)
      try {
        val w = new Walker(new BufferedInputStream(raw, 1 << 16))
        var dictOff = -1L
        var dictLen = -1L
        val frames = ArrayBuffer[(Long, Long)]()
        var torn = false
        var first = true
        var atEof = false
        while (!torn && !atEof) {
          if (w.peek() < 0) atEof = true
          else {
            val off = w.pos
            try {
              val b0 = w.popPushed()
              val magic = b0.toLong | (w.u8().toLong << 8) |
                (w.u8().toLong << 16) | (w.u8().toLong << 24)
              if (magic == DataMagic) {
                walkDataFrame(w)
                frames += ((off, w.pos - off))
              } else if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) {
                val n = w.le32()
                w.skip(n)
                if (first) { dictOff = off; dictLen = w.pos - off }
              } else throw new IOException("bad magic")
              first = false
            } catch {
              case _: IOException =>
                // not-zstd AT OFFSET 0 is the column path's null
                // admission; anything later is a torn/unwalkable tail —
                // one failing extent, intact leading frames keep serving
                if (off == 0L) return null
                frames += ((off, size - off))
                torn = true
            }
          }
        }
        if (frames.isEmpty && dictLen < 0) null
        else Extents(dictOff, dictLen, frames.toSeq)
      } finally raw.close()
    } catch { case NonFatal(_) => null }

  /** One data frame past its magic: frame header, then 3-byte block
    * headers with payloads skipped, then the optional checksum.
    * RFC 8878 §3.1.1. */
  private def walkDataFrame(w: Walker): Unit = {
    val fhd = w.u8()
    if ((fhd & 0x08) != 0) throw new IOException("reserved FHD bit")
    val singleSeg = (fhd & 0x20) != 0
    if (!singleSeg) w.u8() // window descriptor
    (fhd & 0x03) match { // dictionary id field
      case 0 =>
      case 1 => w.skip(1)
      case 2 => w.skip(2)
      case 3 => w.skip(4)
    }
    (fhd >>> 6) match { // frame content size field
      case 0 => if (singleSeg) w.skip(1)
      case 1 => w.skip(2)
      case 2 => w.skip(4)
      case 3 => w.skip(8)
    }
    var last = false
    while (!last) {
      val h = w.u8() | (w.u8() << 8) | (w.u8() << 16)
      last = (h & 1) != 0
      val btype = (h >>> 1) & 3
      val bsize = h >>> 3
      btype match {
        case 0 | 2 => w.skip(bsize.toLong) // raw / compressed
        case 1 => w.skip(1) // RLE: one byte repeated
        case _ => throw new IOException("reserved block type")
      }
    }
    if ((fhd & 0x04) != 0) w.skip(4) // content checksum
  }
}
