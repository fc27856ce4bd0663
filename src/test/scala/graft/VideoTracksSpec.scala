package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VideoHeaders
import graft.functions.VideoHeaders.TrackSpec

/** ISO-BMFF sample-table parsing (ISO 14496-12 §8): parseTracks must invert
  * buildMp4Tracks exactly — per track, per sample — and reject structural
  * lies without throwing (the triage dead-letter posture). */
class VideoTracksSpec extends AnyFunSuite {

  private def vid(n: Int, delta: Int = 200): TrackSpec =
    TrackSpec(1, "vide", "avc1", 640, 360, 90000,
      Array.tabulate(n)(k => 1000 + 37 * k), delta, 3)
  private def aud(n: Int): TrackSpec =
    TrackSpec(2, "soun", "mp4a", 0, 0, 44100,
      Array.tabulate(n)(k => 200 + k), 1024, 2)

  test("two-track container round-trips every sample-table fact") {
    val b = VideoHeaders.buildMp4Tracks("isom", 1000, Seq(vid(25), aud(40)),
      Array.fill[Byte](128)(7))
    val tracks = VideoHeaders.parseTracks(b)
    assert(tracks != null && tracks.length == 2)
    val v = tracks.head
    assert(v.trackId == 1 && v.handler == "vide" && v.codec == "avc1")
    assert(v.width == 640 && v.height == 360 && v.timescale == 90000)
    assert(v.sampleCount == 25)
    assert(v.totalBytes == (0 until 25).map(k => 1000L + 37 * k).sum)
    assert(v.durationUs == 25L * 200 * 1000000L / 90000)
    assert(v.chunkCount == 3)
    val a = tracks(1)
    assert(a.trackId == 2 && a.handler == "soun" && a.codec == "mp4a")
    assert(a.width == 0 && a.height == 0)
    assert(a.sampleCount == 40 && a.totalBytes == (0 until 40).map(200L + _).sum)
    assert(a.durationUs == 40L * 1024 * 1000000L / 44100)
    assert(a.chunkCount == 2)
    // the mvhd-only parse still works on the same container
    assert(VideoHeaders.parseMp4(b) != null)
  }

  test("single-track and empty-sample-list edge shapes") {
    val one = VideoHeaders.parseTracks(
      VideoHeaders.buildMp4Tracks("mp42", 600, Seq(vid(1)), Array[Byte](1)))
    assert(one.length == 1 && one.head.sampleCount == 1)
    val zero = VideoHeaders.parseTracks(
      VideoHeaders.buildMp4Tracks("mp42", 600,
        Seq(TrackSpec(9, "vide", "hvc1", 16, 16, 600, Array.empty, 100, 1)),
        Array.emptyByteArray))
    assert(zero.length == 1 && zero.head.sampleCount == 0 &&
      zero.head.totalBytes == 0 && zero.head.durationUs == 0)
    assert(zero.head.codec == "hvc1" && zero.head.trackId == 9)
  }

  test("a container with no trak parses as an empty track list, not null") {
    // the x104 builder emits ftyp + moov(mvhd) + mdat — valid BMFF, 0 tracks
    val headerOnly = VideoHeaders.buildMp4("isom", 1000, 500, Array[Byte](1, 2))
    val tracks = VideoHeaders.parseTracks(headerOnly)
    assert(tracks != null && tracks.isEmpty)
  }

  test("structural lies reject as null, never throw") {
    val good = VideoHeaders.buildMp4Tracks("isom", 1000, Seq(vid(10), aud(5)),
      Array.fill[Byte](32)(1))
    assert(VideoHeaders.parseTracks(good) != null)
    // every truncation parses or nulls, never throws
    for (n <- 0 to good.length)
      VideoHeaders.parseTracks(good.take(n))
    // an stsz whose declared sample count overruns its box → null
    val lying = good.clone()
    val at = indexOfTag(lying, "stsz")
    assert(at > 0)
    // sample_count field sits 8 bytes into the stsz payload (after
    // version/flags + fixed sample_size)
    val cntOff = at + 8 + 8
    lying(cntOff) = 0x7f.toByte // declare ~2G samples
    assert(VideoHeaders.parseTracks(lying) == null)
    // stts totals contradicting stsz → null
    val contradict = good.clone()
    val sttsAt = indexOfTag(contradict, "stts")
    assert(sttsAt > 0)
    // first entry's sample count is 8 bytes into the stts payload
    contradict(sttsAt + 8 + 8 + 3) = 99.toByte
    assert(VideoHeaders.parseTracks(contradict) == null)
    // non-BMFF payloads
    assert(VideoHeaders.parseTracks("not a video at all......".getBytes) == null)
    assert(VideoHeaders.parseTracks(Array.emptyByteArray) == null)
  }

  test("parseSamples resolves exact byte ranges through the chunk walk, " +
      "including tail chunks with fewer samples") {
    val sizes = Array(10, 20, 15, 30, 25, 12, 18) // 7 samples, 3 chunks → 3,3,1
    val data = Array.tabulate(sizes.length)(s =>
      Array.tabulate(sizes(s))(i => ((s * 31 + i) % 256).toByte))
    val spec = TrackSpec(5, "vide", "avc1", 64, 48, 90000, sizes, 100, 3)
    val b = VideoHeaders.buildMp4TracksWithData("isom", 1000, Seq(spec), Seq(data))
    val refs = VideoHeaders.parseSamples(b)
    assert(refs != null && refs.length == sizes.length)
    refs.foreach { r =>
      assert(r.trackId == 5)
      assert(r.size == sizes(r.sampleIdx))
      val got = b.slice(r.offset.toInt, r.offset.toInt + r.size)
      assert(got.sameElements(data(r.sampleIdx)),
        s"sample ${r.sampleIdx} bytes diverge at offset ${r.offset}")
    }
    // samples within a chunk are contiguous; chunks need not be
    assert(refs(1).offset == refs(0).offset + refs(0).size)
    // two tracks interleave cleanly
    val sizes2 = Array(8, 8, 8)
    val data2 = Array.tabulate(3)(s => Array.fill(8)((s + 100).toByte))
    val b2 = VideoHeaders.buildMp4TracksWithData("isom", 1000,
      Seq(spec, TrackSpec(6, "soun", "mp4a", 0, 0, 44100, sizes2, 1024, 2)),
      Seq(data, data2))
    val refs2 = VideoHeaders.parseSamples(b2)
    assert(refs2 != null && refs2.length == sizes.length + 3)
    refs2.filter(_.trackId == 6).foreach { r =>
      assert(b2.slice(r.offset.toInt, r.offset.toInt + r.size)
        .sameElements(data2(r.sampleIdx)))
    }
    // the stats parse agrees on the same real-layout container
    val tr = VideoHeaders.parseTracks(b2)
    assert(tr.map(_.sampleCount) == Seq(7L, 3L))
  }

  test("parseSamples rejects out-of-file offsets and oversized counts as " +
      "null, never throws") {
    val sizes = Array(10, 10)
    val data = Array.tabulate(2)(s => Array.fill(10)(s.toByte))
    val spec = TrackSpec(1, "vide", "avc1", 16, 16, 600, sizes, 100, 1)
    val good = VideoHeaders.buildMp4TracksWithData("isom", 1000, Seq(spec), Seq(data))
    assert(VideoHeaders.parseSamples(good) != null)
    for (n <- 0 to good.length) VideoHeaders.parseSamples(good.take(n))
    // the fake-offset builder points chunks at arbitrary in-file positions:
    // still parses (ranges are in-file), but slicing yields header bytes —
    // callers get ranges, not validity of content
    val fake = VideoHeaders.buildMp4Tracks("isom", 1000, Seq(spec), Array[Byte](1))
    val r = VideoHeaders.parseSamples(fake)
    assert(r == null || r.forall(x => x.offset + x.size <= fake.length))
    // truncate the mdat so real offsets run off the file → null
    assert(VideoHeaders.parseSamples(good.dropRight(5)) == null)
  }

  /** byte offset of the 4cc's enclosing box (points at the size field). */
  private def indexOfTag(b: Array[Byte], tag: String): Int = {
    val t = tag.getBytes
    var i = 4
    while (i + 4 <= b.length) {
      if (b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3))
        return i - 4
      i += 1
    }
    -1
  }
}
