package graft.sources

import java.io.{IOException, InputStream}

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.functions.{SevenZip, Xz}

/** Range access to `.7z` members that never materializes a member —
  * the 7z twin of [[RangedBz2]], for the ONE famous artifact the
  * bounded column reader cannot serve: the stackoverflow.com data dump,
  * whose monolithic `Posts.xml` member is tens of GB (reference layout:
  * archive.org Stack Exchange dumps, one `.7z` per site, one XML table
  * per member). Three layers, all executor-side over Hadoop FS:
  *
  *  - [[scanMembers]] preads ONLY the container header (32-byte start
  *    header + next header + the header folder's pack bytes when
  *    encoded — [[SevenZip.scanLayout]]) → per-member coder chain,
  *    absolute pack extent and (offset, length) within the folder;
  *  - [[planSlices]] turns a member into decode SLICES: LZMA2 members
  *    large enough to matter get a chunk-HEADER walk (no
  *    decompression — [[Xz.lzma2SplitScan]]) whose dict+props reset
  *    points are independent decode starts (multi-threaded 7z encoders
  *    emit them; single-threaded streams stay one sequential slice —
  *    LZMA2's window-carrying design is sequential by construction, the
  *    honest bound at 100 TB is per-FILE parallelism plus whatever
  *    resets the encoder left); raw-LZMA1 members (pre-2015 7-Zip's
  *    default — one range-coded stream, never splittable) are one
  *    sequential slice through the same ring; Copy members tile
  *    anywhere;
  *  - [[rows]] streams one slice: an O(dict-window) ring decode
  *    ([[Xz.Lzma2StreamReader]]) feeding a byte-level quote-aware
  *    `<row …/>` scanner that holds only the CURRENT row — a 50 GB
  *    member passes through a ~64 MiB window and a per-row buffer.
  *
  * Ownership across slices uses the Hadoop text-split convention: a
  * slice emits exactly the rows whose `<row` START falls inside its
  * scan window, decoding PAST the window end to close its last open
  * row (never past the member). A row start cannot be missed
  * mid-stream: XML requires `<` escaped inside attribute values, so a
  * literal `<row ` only ever occurs at a real row boundary.
  *
  * Routing contract (route, don't drop — the streaming variant of
  * [[graft.streaming.Pipelines.sedumpPosts]]'s member quarantine,
  * localized the way the bzip2 extents localize damage):
  *  - broken container → one (member = null, ok = false) row;
  *  - unstreamable member (exotic coder or filter — BCJ2's 4-stream
  *    graph, non-x86 branch converters; delta and BCJ-x86 chains DO
  *    stream, as one whole-folder slice through [[StreamFilters]] —
  *    declared dictionary past the 256 MiB window bound, empty or
  *    unmatched member) → one (member, ok = false) row;
  *  - a decode break mid-slice, a torn/oversized/malformed row
  *    candidate, or a folder-CRC mismatch after a whole-folder pass →
  *    a dead-letter (member, ok = false) row, with every complete row
  *    already emitted kept — unlike the bounded path, which quarantines
  *    the whole member, the ranged path localizes the damage (it cannot
  *    retract rows it already streamed). Folder CRC is verified
  *    incrementally when one slice covers the whole folder; a SPLIT
  *    decode trades the folder-global CRC for parallelism (LZMA2
  *    carries no per-chunk checksum), which is the same trade every
  *    splittable-ingest system makes. */
object Ranged7z {

  /** Declared-dictionary admission bound for the streaming window: a
    * stream declaring more than this routes instead of allocating
    * (real dumps declare ≤ 64 MiB; 7z's own max usable preset is
    * 1.5 GiB, far past sane executor heap for 32 concurrent tasks). */
  val MaxWindowBytes: Int = 1 << 28

  /** A single row tag larger than this is treated as torn (dead
    * letter): the largest real Stack Exchange post bodies are ~1 MiB
    * escaped; 8 MiB is an order of magnitude of slack while keeping a
    * hostile unterminated quote from buffering a whole member. */
  val MaxRowBytes: Int = 8 << 20

  private val KindLzma2 = 0
  private val KindCopy = 1
  private val KindDead = 2
  private val KindLzma1 = 3

  /** One independently-decodable piece of one member — the unit of
    * parallelism the ranged reader hands Spark. Plain fields only (it
    * rides a Dataset). */
  final case class Slice(
      path: String, member: String, kind: Int,
      packOff: Long, packLen: Long, props: Array[Byte],
      sliceUnpack: Long, scanFrom: Long, scanUntil: Long,
      memberEnd: Long, expect: Long,
      crc: Int, checkCrc: Boolean,
      filters: Array[Byte] = Array.empty[Byte])

  /** The routed marker slice: one (member, ok = false) row. A null
    * `member` marks a broken CONTAINER. */
  def deadSlice(path: String, member: String): Slice =
    Slice(path, member, KindDead, -1L, -1L, Array.empty[Byte],
      0L, 0L, 0L, 0L, 0L, 0, checkCrc = false)

  /** STREAMING inverse filters for the chained folders real-world 7z
    * wears (delta or BCJ-x86 in front of the payload coder — the
    * `-mf=…` layout): the bounded path decodes them whole via the
    * in-place kernels ([[graft.functions.Xz.deltaDecode]] /
    * `x86Convert`); the ranged path pushes the decoder's output
    * through these stages chunk-by-chunk, so a multi-GB chained
    * member streams in the same O(dict-window) heap. Both transforms
    * are size-preserving, so filtered positions == decoder positions
    * and the row scanner's ownership arithmetic is unchanged — but
    * their STATE spans the whole folder output, which is why a
    * chained member is always ONE slice decoded from folder start
    * (reset-point splitting would need the filter state at the reset,
    * i.e. the very bytes a split exists to avoid decoding). */
  private[graft] object StreamFilters {
    /** Push-style stage: transform more input, hand output downstream
      * (possibly fewer bytes — BCJ holds back a 4-byte lookahead). */
    sealed trait Stage {
      def feed(b: Array[Byte], off: Int, len: Int,
          out: (Array[Byte], Int, Int) => Unit): Unit
      def flush(out: (Array[Byte], Int, Int) => Unit): Unit
    }

    /** Delta decode (7z id 0x03): out[i] = in[i] + out[i-dist], state =
      * the last `dist` output bytes in a ring. Transforms IN PLACE —
      * every producer hands fresh or consumed-immediately buffers. */
    final class Delta(dist: Int) extends Stage {
      private val hist = new Array[Byte](dist)
      private var p = 0
      def feed(b: Array[Byte], off: Int, len: Int,
          out: (Array[Byte], Int, Int) => Unit): Unit = {
        var i = off
        val end = off + len
        while (i < end) {
          val v = (b(i) + hist(p)).toByte
          b(i) = v
          hist(p) = v
          p += 1
          if (p == dist) p = 0
          i += 1
        }
        out(b, off, len)
      }
      def flush(out: (Array[Byte], Int, Int) => Unit): Unit = ()
    }

    /** BCJ x86 inverse (7z ids 0x04 / legacy 0x03030103): the Bra86
      * branch-converter ported to a continuation — identical mask and
      * position logic to the whole-buffer kernel
      * ([[graft.functions.Xz.x86Convert]], decode direction), with the
      * anchor position and 3-bit mask carried across feeds and a
      * ≤ 4-byte lookahead held back (the last 4 bytes of a buffer are
      * never converted, exactly as the whole-buffer form leaves them).
      * X86StreamSpec pins equivalence against the whole-buffer kernel
      * over random chunkings. */
    final class X86 extends Stage {
      private var buf = new Array[Byte](1 << 16)
      private var have = 0
      private var base = 0L // absolute stream position of buf(0)
      private var anchorAbs = 0L // the kernel's `pos`, absolute
      private var mask = 0
      private def ms(b: Int): Boolean = b == 0x00 || b == 0xFF

      def feed(b: Array[Byte], off: Int, len: Int,
          out: (Array[Byte], Int, Int) => Unit): Unit = {
        if (have + len > buf.length) {
          var cap = buf.length
          while (cap < have + len) cap *= 2
          buf = java.util.Arrays.copyOf(buf, cap)
        }
        System.arraycopy(b, off, buf, have, len)
        have += len
        val n = process()
        if (n > 0) {
          out(buf, 0, n)
          System.arraycopy(buf, n, buf, 0, have - n)
          have -= n
          base += n
        }
      }

      def flush(out: (Array[Byte], Int, Int) => Unit): Unit = {
        // the tail (≤ 4 lookahead bytes plus any already-converted
        // operand bytes past the last scan) is final as-is
        if (have > 0) {
          out(buf, 0, have)
          base += have
          have = 0
        }
      }

      /** One pass of the Bra86 loop over the buffered bytes; returns
        * how many leading bytes are final (no later conversion can
        * touch a byte more than 4 positions behind the scan end). */
      private def process(): Int = {
        val size = have - 4
        if (size <= 0) return 0
        var scan = math.max(0L, anchorAbs - base).toInt
        var done = false
        while (!done) {
          var p = scan
          while (p < size && (buf(p) & 0xFE) != 0xE8) p += 1
          if (p >= size) done = true
          else {
            val d = (base + p) - anchorAbs
            anchorAbs = base + p
            var skip = false
            if (d > 2) mask = 0
            else {
              mask >>>= d.toInt
              if (mask != 0 && (mask > 4 || mask == 3 ||
                  ms(buf(p + (mask >>> 1) + 1) & 0xFF))) {
                mask = (mask >>> 1) | 4
                anchorAbs += 1
                skip = true
              }
            }
            if (!skip) {
              if (ms(buf(p + 4) & 0xFF)) {
                var v = ((buf(p + 4) & 0xFF) << 24) |
                  ((buf(p + 3) & 0xFF) << 16) |
                  ((buf(p + 2) & 0xFF) << 8) | (buf(p + 1) & 0xFF)
                // instruction addresses are uint32 on the wire: the
                // absolute position truncates mod 2^32, as the kernel's
                // Int arithmetic does
                val cur = (anchorAbs + 5).toInt
                anchorAbs += 5
                v -= cur
                if (mask != 0) {
                  val sh = (mask & 6) << 2
                  if (ms((v >>> sh) & 0xFF)) {
                    v ^= ((0x100 << sh) - 1)
                    v -= cur
                  }
                  mask = 0
                }
                buf(p + 1) = v.toByte
                buf(p + 2) = (v >>> 8).toByte
                buf(p + 3) = (v >>> 16).toByte
                buf(p + 4) = (0 - ((v >>> 24) & 1)).toByte
              } else {
                mask = (mask >>> 1) | 4
                anchorAbs += 1
              }
            }
            scan = math.max(0L, anchorAbs - base).toInt
          }
        }
        size
      }
    }

    /** The folder's filter stages in application order, parsed from a
      * slice's compact blob ([id, propsLen, props…]*); null = none. */
    final class Chain(stages: Array[Stage]) {
      def feed(b: Array[Byte], off: Int, len: Int,
          out: (Array[Byte], Int, Int) => Unit): Unit =
        push(0, b, off, len, out)
      private def push(i: Int, b: Array[Byte], off: Int, len: Int,
          out: (Array[Byte], Int, Int) => Unit): Unit =
        if (i == stages.length) out(b, off, len)
        else stages(i).feed(b, off, len,
          (b2, o2, l2) => push(i + 1, b2, o2, l2, out))
      def flush(out: (Array[Byte], Int, Int) => Unit): Unit = {
        var i = 0
        while (i < stages.length) {
          stages(i).flush((b2, o2, l2) => push(i + 1, b2, o2, l2, out))
          i += 1
        }
      }
    }

    /** Blob encoding of a supported filter tail; null when any stage
      * is not a streamable inverse (non-x86 branch converters, BCJ
      * start-offset props, BCJ2). */
    def encode(tail: Seq[graft.functions.SevenZip.RangedCoder]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      tail.foreach { c =>
        c.id match {
          case 0x03 if c.props != null && c.props.length == 1 =>
            out.write(0x03); out.write(1); out.write(c.props(0) & 0xFF)
          case 0x04 | 0x03030103
              if c.props == null || c.props.isEmpty =>
            out.write(0x04); out.write(0)
          case _ => return null
        }
      }
      out.toByteArray
    }

    def parse(blob: Array[Byte]): Chain = {
      if (blob == null || blob.isEmpty) return null
      val stages = scala.collection.mutable.ArrayBuffer[Stage]()
      var i = 0
      while (i < blob.length) {
        val id = blob(i) & 0xFF
        val n = blob(i + 1) & 0xFF
        id match {
          case 0x03 => stages += new Delta((blob(i + 2) & 0xFF) + 1)
          case 0x04 => stages += new X86
          case _ => throw new IllegalStateException(s"filter $id")
        }
        i += 2 + n
      }
      new Chain(stages.toArray)
    }
  }

  /** Header-only member scan; null when the container is unreadable or
    * broken (the caller routes that as a null-member row). */
  def scanMembers(conf: Configuration, path: String): Seq[SevenZip.RangedMember] =
    try {
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val len = fs.getFileStatus(p).getLen
      val in = fs.open(p)
      try {
        SevenZip.scanLayout((off, n) => {
          val b = new Array[Byte](n)
          in.readFully(off, b, 0, n)
          b
        }, len)
      } finally in.close()
    } catch { case NonFatal(_) => null }

  /** Decode slices for one member. `lzma2SplitMin` gates the extra
    * chunk-walk IO pass: below it a member is one slice regardless of
    * resets (the walk costs a full pack read — only worth it when the
    * member is big enough that parallel decode pays it back). */
  def planSlices(conf: Configuration, path: String, m: SevenZip.RangedMember,
      lzma2SplitMin: Long = 64L << 20,
      copyTile: Long = 256L << 20): Seq[Slice] = {
    val mStart = m.offsetInFolder
    val mEnd = mStart + m.length
    if (m.folder < 0 || m.length <= 0 || m.coders.isEmpty)
      return Seq(deadSlice(path, m.name))
    val coder = m.coders.head
    if (m.coders.size > 1) {
      // filter-chained folder (delta / BCJ-x86 behind the payload
      // coder): the filter STATE spans the whole folder output, so a
      // chained member is one slice decoded from folder start — no
      // reset splitting, no Copy tiling
      val filters = StreamFilters.encode(m.coders.tail)
      if (filters == null) return Seq(deadSlice(path, m.name))
      val whole = mStart == 0 && mEnd == m.folderUnpack && m.crc.isDefined
      return coder.id match {
        case 0x00 =>
          Seq(Slice(path, m.name, KindCopy,
            m.packOff, m.packLen, Array.empty[Byte],
            0L, mStart, mEnd, mEnd, m.folderUnpack,
            m.crc.getOrElse(0), checkCrc = whole, filters = filters))
        case 0x21 =>
          val window = Xz.lzma2DictSize(coder.props)
          if (window < 0 ||
            math.min(window, m.folderUnpack) > MaxWindowBytes)
            Seq(deadSlice(path, m.name))
          else Seq(Slice(path, m.name, KindLzma2,
            m.packOff, m.packLen, coder.props,
            0L, mStart, mEnd, mEnd, m.folderUnpack,
            m.crc.getOrElse(0), checkCrc = whole, filters = filters))
        case 0x030101 =>
          val window = Xz.lzma1DictSize(coder.props)
          if (window < 0 ||
            math.min(window, m.folderUnpack) > MaxWindowBytes)
            Seq(deadSlice(path, m.name))
          else Seq(Slice(path, m.name, KindLzma1,
            m.packOff, m.packLen, coder.props,
            0L, mStart, mEnd, mEnd, m.folderUnpack,
            m.crc.getOrElse(0), checkCrc = whole, filters = filters))
        case _ => Seq(deadSlice(path, m.name))
      }
    }
    coder.id match {
      case 0x00 => // Copy: output bytes ARE the pack bytes — tile freely
        val tiles = ArrayBuffer[Slice]()
        var at = mStart
        while (at < mEnd) {
          val until = math.min(at + copyTile, mEnd)
          tiles += Slice(path, m.name, KindCopy,
            m.packOff, m.packLen, Array.empty[Byte],
            at, at, until, mEnd, m.folderUnpack,
            m.crc.getOrElse(0),
            checkCrc = m.crc.isDefined && mStart == 0 &&
              mEnd == m.folderUnpack && at == mStart && until == mEnd)
          at = until
        }
        tiles.toSeq
      case 0x21 => // LZMA2
        // the working window is min(declared dict, folder output) — a
        // huge declared dictionary over a small folder still streams
        val window = Xz.lzma2DictSize(coder.props)
        if (window < 0 || math.min(window, m.folderUnpack) > MaxWindowBytes)
          return Seq(deadSlice(path, m.name))
        val resets: Seq[(Long, Long)] =
          if (m.packLen < lzma2SplitMin) Seq((0L, 0L))
          else try {
            val p = new Path(path)
            val in = p.getFileSystem(conf).open(p)
            try {
              in.seek(m.packOff)
              val (rs, _, _) =
                Xz.lzma2SplitScan(new BoundedIn(in, m.packLen))
              ((0L, 0L) +: rs).distinct.sortBy(_._1)
            } finally in.close()
          } catch { case _: IOException =>
            return Seq(deadSlice(path, m.name))
          }
        // pair consecutive resets into scan windows clipped to the member
        val out = ArrayBuffer[Slice]()
        var i = 0
        while (i < resets.size) {
          val (rp, ru) = resets(i)
          val nextU =
            if (i + 1 < resets.size) resets(i + 1)._2 else m.folderUnpack
          val from = math.max(ru, mStart)
          val until = math.min(nextU, mEnd)
          if (from < until) {
            val whole = resets.size == 1 && mStart == 0 &&
              mEnd == m.folderUnpack
            out += Slice(path, m.name, KindLzma2,
              m.packOff + rp, m.packLen - rp, coder.props,
              ru, from, until, mEnd, m.folderUnpack - ru,
              m.crc.getOrElse(0), checkCrc = whole && m.crc.isDefined)
          }
          i += 1
        }
        if (out.isEmpty) Seq(deadSlice(path, m.name)) else out.toSeq
      case 0x030101 => // raw LZMA1: pre-2015 7-Zip's default coder —
        // ONE range-coded stream, no chunk framing, no reset points,
        // so the member is a single sequential decode (per-FILE
        // parallelism, the same honest bound as no-reset LZMA2) —
        // through the same O(dict-window) ring as LZMA2
        val window = Xz.lzma1DictSize(coder.props)
        if (window < 0 || math.min(window, m.folderUnpack) > MaxWindowBytes)
          Seq(deadSlice(path, m.name))
        else Seq(Slice(path, m.name, KindLzma1,
          m.packOff, m.packLen, coder.props,
          0L, mStart, mEnd, mEnd, m.folderUnpack,
          m.crc.getOrElse(0),
          checkCrc = m.crc.isDefined && mStart == 0 &&
            mEnd == m.folderUnpack))
      case _ => // filter chains, exotics (BCJ2, PPMd): route
        Seq(deadSlice(path, m.name))
    }
  }

  /** Reads at most `limit` bytes off the underlying (already-seeked)
    * stream — the pack-extent envelope for the chunk walks. */
  private final class BoundedIn(in: org.apache.hadoop.fs.FSDataInputStream,
      limit: Long) extends InputStream {
    private var left = limit
    override def read(): Int =
      if (left <= 0) -1
      else { val c = in.read(); if (c >= 0) left -= 1; c }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (left <= 0) return -1
      val n = in.read(b, off, math.min(len.toLong, left).toInt)
      if (n > 0) left -= n
      n
    }
    override def skip(n: Long): Long = {
      val s = in.skip(math.min(n, left))
      if (s > 0) left -= s
      s
    }
  }

  /** Stream one slice's rows LAZILY: (rowXml, ok) pairs, rowXml null
    * on a dead letter. The iterator decodes on demand — in flight it
    * holds the ring window, one packed chunk and the rows of at most
    * one decoded chunk; never the member. */
  def rows(conf: Configuration, slice: Slice,
      maxRowBytes: Int = MaxRowBytes): Iterator[(String, Boolean)] =
    if (slice.kind == KindDead) Iterator((null, false))
    else new RowIterator(conf, slice, maxRowBytes)

  private final class RowIterator(conf: Configuration, slice: Slice,
      maxRowBytes: Int) extends Iterator[(String, Boolean)] {
    private val sc = new RowScanner(slice.scanFrom, slice.scanUntil,
      maxRowBytes)
    private var in: org.apache.hadoop.fs.FSDataInputStream = _
    private var rd: Xz.StreamDecoder = _
    private var filt = StreamFilters.parse(slice.filters)
    private var buf = if (slice.kind == KindCopy) new Array[Byte](1 << 16)
      else null
    private var abs = slice.sliceUnpack
    private var fabs = slice.sliceUnpack // FILTERED-stream position
    private var crc = Xz.crc32Init
    private var inputDone = false

    // a Spark limit/take may abandon the iterator mid-stream: close
    // with the task, not with GC
    locally {
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => finish())
    }

    try {
      val p = new Path(slice.path)
      in = p.getFileSystem(conf).open(p)
      if (slice.kind == KindCopy) in.seek(slice.packOff + slice.sliceUnpack)
      else {
        in.seek(slice.packOff)
        // ring = min(declared dict, this decode's total output): a
        // back-reference can never reach past either, and real dumps
        // declare 32-64 MiB dictionaries over members of every size —
        // zeroing 32 MiB per tiny member would dwarf the decode
        val bounded = new BoundedIn(in, slice.packLen)
        rd =
          if (slice.kind == KindLzma1)
            new Xz.Lzma1StreamReader(bounded, slice.props,
              math.min(Xz.lzma1DictSize(slice.props), slice.expect).toInt,
              slice.expect)
          else new Xz.Lzma2StreamReader(bounded,
            math.min(Xz.lzma2DictSize(slice.props), slice.expect).toInt,
            slice.expect)
      }
    } catch { case NonFatal(_) => fail() }

    private def fail(): Unit = {
      sc.deadLetter()
      finish()
    }

    private def finish(): Unit = {
      inputDone = true
      if (in != null) {
        try in.close() catch { case NonFatal(_) => }
        in = null
      }
      // the task-completion listener (and Spark's iterator plumbing)
      // keeps THIS object reachable until task end — a task draining
      // thousands of slices must not retain thousands of ring windows
      rd = null
      buf = null
      filt = null
      sc.shrink()
    }

    /** Filtered bytes arriving in stream order: CRC them (the folder
      * digest is over the FINAL, unfiltered-member bytes), clip to the
      * member extent, and hand them to the scanner at their filtered
      * position — size-preserving filters keep filtered == decoder
      * coordinates, just delayed by the BCJ lookahead. */
    private val emitFiltered: (Array[Byte], Int, Int) => Unit =
      (b, off, len) => {
        if (slice.checkCrc) crc = Xz.crc32Update(crc, b, off, off + len)
        val lo = math.max(fabs, slice.scanFrom)
        val hi = math.min(fabs + len, slice.memberEnd)
        if (lo < hi)
          sc.feed(b, off + (lo - fabs).toInt, (hi - lo).toInt, lo)
        fabs += len
      }

    /** The filtered-slice pump: raw bytes (Copy read or decoder chunk)
      * push through the filter chain; stop at source end (flush, then
      * the usual end-of-slice checks) or once the scan window closed
      * on a slice with no folder-CRC pass to drain. */
    private def pumpFiltered(): Unit = {
      if (slice.kind == KindCopy) {
        if (abs >= slice.memberEnd) { finishFiltered(); return }
        val want = math.min(buf.length.toLong, slice.memberEnd - abs).toInt
        val n = in.read(buf, 0, want)
        if (n <= 0) { fail(); return } // short file: route
        abs += n
        filt.feed(buf, 0, n, emitFiltered)
        if (abs >= slice.memberEnd) { finishFiltered(); return }
      } else {
        val chunk = rd.nextChunk()
        if (chunk == null) { finishFiltered(); return }
        abs += chunk.length
        filt.feed(chunk, 0, chunk.length, emitFiltered)
      }
      if (!slice.checkCrc && fabs >= slice.scanUntil && !sc.open)
        endOfSlice()
    }

    private def finishFiltered(): Unit = {
      filt.flush(emitFiltered)
      endOfSlice()
    }

    /** Decode one more block and feed the scanner; sets inputDone when
      * the slice is exhausted (running the end-of-slice checks once). */
    private def pump(): Unit =
      try {
        if (filt != null) {
          pumpFiltered()
        } else if (slice.kind == KindCopy) {
          if (abs >= slice.memberEnd) { endOfSlice(); return }
          val want = math.min(buf.length.toLong, slice.memberEnd - abs).toInt
          val n = in.read(buf, 0, want)
          if (n <= 0) { fail(); return } // short file: route
          if (slice.checkCrc) crc = Xz.crc32Update(crc, buf, 0, n)
          sc.feed(buf, 0, n, abs)
          abs += n
          if (abs >= slice.memberEnd ||
            (abs >= slice.scanUntil && !sc.open)) endOfSlice()
        } else {
          val chunk = rd.nextChunk()
          if (chunk == null) { endOfSlice(); return }
          if (slice.checkCrc)
            crc = Xz.crc32Update(crc, chunk, 0, chunk.length)
          // feed only bytes inside the member; never scan a sibling
          val lo = math.max(abs, slice.scanFrom)
          val hi = math.min(abs + chunk.length, slice.memberEnd)
          if (lo < hi)
            sc.feed(chunk, (lo - abs).toInt, (hi - lo).toInt, lo)
          abs += chunk.length
          if (abs >= slice.memberEnd ||
            (abs >= slice.scanUntil && !sc.open)) {
            // this slice's rows are all closed; a whole-folder CRC
            // pass keeps draining to the stream terminator first
            if (!slice.checkCrc || rd.finished) endOfSlice()
          }
        }
      } catch { case NonFatal(_) => fail() } // truncation/corruption

    private def endOfSlice(): Unit = {
      if (sc.open) sc.closeTorn() // owned candidate open at member end
      if (slice.checkCrc) {
        val clean =
          if (slice.kind == KindCopy) abs == slice.memberEnd
          else rd.finished && rd.unpacked == slice.expect
        if (!clean || Xz.crc32Done(crc) != slice.crc) sc.deadLetter()
      }
      finish()
    }

    def hasNext: Boolean = {
      while (sc.pendingEmpty && !inputDone) pump()
      !sc.pendingEmpty
    }
    def next(): (String, Boolean) =
      if (hasNext) sc.poll() else Iterator.empty.next()
  }

  /** Byte-level quote-aware `<row …/>` scanner — the streaming twin of
    * the column path's `RowRe` regex: outside quotes a `>` closes the
    * tag (well-formed only when preceded by `/`), inside quotes `>`
    * and newlines are data (XML escapes `<` and `&` in attribute
    * values but not `>` — the .NET-writer convention real dumps wear).
    * Both quote styles count: XML permits `Id='1'`, and a `'`-quoted
    * span shields `>` exactly like a `"`-quoted one.
    * Only candidates whose `<row` START lies in [scanFrom, scanUntil)
    * are owned by this slice; an owned candidate that closes malformed,
    * overruns `maxRowBytes`, or is still open at member end becomes a
    * dead letter. Memory: the current row's bytes, nothing else. */
  private final class RowScanner(scanFrom: Long, scanUntil: Long,
      maxRowBytes: Int) {
    private val out = new java.util.ArrayDeque[(String, Boolean)]()
    private val Prefix = "<row".getBytes("US-ASCII")
    private var prefixLen = 0 // matched bytes of "<row" while OUTSIDE
    private var prefixAbs = -1L // absolute position of that match's '<'
    private var collecting = false
    private var owned = false
    private var inQuote = false
    private var quoteCh: Byte = 0
    private var prev: Byte = 0
    // plain growable buffer: this is a per-byte hot path over the whole
    // member (a BAOS would take a monitor per byte)
    private var rowBuf = new Array[Byte](1 << 12)
    private var rowLen = 0
    private def rowPut(b: Byte): Unit = {
      if (rowLen == rowBuf.length)
        rowBuf = java.util.Arrays.copyOf(rowBuf, rowBuf.length * 2)
      rowBuf(rowLen) = b
      rowLen += 1
    }

    /** True while stopping would lose a row this slice could own: an
      * owned candidate mid-collection, OR a pending "<row" prefix whose
      * '<' lies inside the scan window — a row starting 1-4 bytes
      * before `scanUntil` resolves only after the boundary, and the
      * next slice does not own it (its start is before that slice's
      * `scanFrom`), so the owner must keep decoding until the prefix
      * either opens (then closes) or dissolves. */
    def open: Boolean = (collecting && owned) ||
      (prefixLen > 0 && prefixAbs >= scanFrom && prefixAbs < scanUntil)

    def feed(b: Array[Byte], off: Int, len: Int, absStart: Long): Unit = {
      var i = off
      val end = off + len
      while (i < end) {
        val c = b(i)
        if (!collecting) {
          if (prefixLen < 4) {
            if (c == Prefix(prefixLen)) {
              if (prefixLen == 0) prefixAbs = absStart + (i - off)
              prefixLen += 1
            } else resetPrefix(c, absStart + (i - off))
          } else {
            // have "<row"; a whitespace byte opens a candidate
            if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
              owned = prefixAbs >= scanFrom && prefixAbs < scanUntil
              collecting = true
              inQuote = false
              rowLen = 0
              rowPut('<'); rowPut('r'); rowPut('o'); rowPut('w')
              rowPut(c)
              prev = c
            } else resetPrefix(c, absStart + (i - off))
          }
          if (collecting) prefixLen = 0
        } else {
          rowPut(c)
          // either quote style opens a span (XML permits Id='1'); only
          // the SAME character closes it — the other is data inside
          if (!inQuote && (c == '"' || c == '\'')) { inQuote = true; quoteCh = c }
          else if (inQuote && c == quoteCh) inQuote = false
          else if (c == '>' && !inQuote) {
            if (prev == '/') {
              if (owned)
                out.add((new String(rowBuf, 0, rowLen, "UTF-8"), true))
            } else if (owned) out.add((null, false)) // malformed tag
            collecting = false
            rowLen = 0
          }
          prev = c
          if (collecting && rowLen > maxRowBytes) {
            if (owned) out.add((null, false)) // torn/hostile: bound heap
            collecting = false
            rowLen = 0
          }
        }
        i += 1
      }
    }

    private def resetPrefix(c: Byte, abs: Long): Unit =
      if (c == '<') { prefixLen = 1; prefixAbs = abs }
      else prefixLen = 0

    /** The member ended with a candidate still open (a pending prefix
      * that never opened is trailing junk, not a torn row — the
      * bounded matcher would not have counted it either). */
    def closeTorn(): Unit = {
      if (collecting && owned) out.add((null, false))
      collecting = false
      prefixLen = 0
      rowLen = 0
    }

    def deadLetter(): Unit = out.add((null, false))

    /** Drop the row buffer once the slice is done decoding (pending
      * results stay drainable) — see RowIterator.finish. */
    def shrink(): Unit = rowBuf = new Array[Byte](16)

    def pendingEmpty: Boolean = out.isEmpty
    def poll(): (String, Boolean) = out.poll()
  }
}
