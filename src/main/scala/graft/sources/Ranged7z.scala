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
  *  - unstreamable member (exotic/filter-chained coder, declared
  *    dictionary past the 256 MiB window bound, empty or
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
      crc: Int, checkCrc: Boolean)

  /** The routed marker slice: one (member, ok = false) row. A null
    * `member` marks a broken CONTAINER. */
  def deadSlice(path: String, member: String): Slice =
    Slice(path, member, KindDead, -1L, -1L, Array.empty[Byte],
      0L, 0L, 0L, 0L, 0L, 0, checkCrc = false)

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
    if (m.folder < 0 || m.length <= 0 || m.coders.size != 1)
      return Seq(deadSlice(path, m.name))
    val coder = m.coders.head
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
    private var buf = if (slice.kind == KindCopy) new Array[Byte](1 << 16)
      else null
    private var abs = if (slice.kind == KindCopy) slice.scanFrom
      else slice.sliceUnpack
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
      if (slice.kind == KindCopy) in.seek(slice.packOff + slice.scanFrom)
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
      sc.shrink()
    }

    /** Decode one more block and feed the scanner; sets inputDone when
      * the slice is exhausted (running the end-of-slice checks once). */
    private def pump(): Unit =
      try {
        if (slice.kind == KindCopy) {
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
