package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mkv
import graft.functions.Mkv.MkvTrackSpec

/** Matroska/WebM EBML walk: parse must invert build exactly — varint
  * boundaries, uint/float element bodies, TimestampScale arithmetic — and
  * reject junk as null (triage posture, same contract as the ISO-BMFF
  * track walk). */
class MkvSpec extends AnyFunSuite {

  test("two-track WebM round-trips: type/codec/dims/audio params/duration") {
    for ((scale, ticks) <- Seq((1000000L, 1L), (1000000L, 89999L),
        (2000000L, 42L), (500000L, 123456L))) {
      val b = Mkv.buildMkv("webm", scale, ticks, Seq(
        MkvTrackSpec(1, "video", "V_VP9", width = 1920, height = 1080),
        MkvTrackSpec(2, "audio", "A_OPUS", channels = 2, rate = 48000)))
      val ts = Mkv.parseTracks(b)
      assert(ts != null && ts.length == 2, s"scale=$scale ticks=$ticks")
      val durUs = ticks * scale / 1000
      assert(ts(0) == Mkv.MkvTrack(1, "video", "V_VP9", 1920, 1080, 0, 0, durUs))
      assert(ts(1) == Mkv.MkvTrack(2, "audio", "A_OPUS", 0, 0, 2, 48000, durUs))
      assert(Mkv.parseDocType(b) == "webm")
    }
  }

  test("varint width boundaries: dims/ids needing 1..3 byte uints and " +
      "sizes crossing the 127/16383 element-size edges") {
    // width 127/128 and 16383/16384 force size-encoding length changes in
    // the enclosing elements; track numbers up to 3 bytes exercise uintB
    for (w <- Seq(1, 127, 128, 255, 256, 16383, 16384, 65535, 65536);
         num <- Seq(1, 200, 70000)) {
      val b = Mkv.buildMkv("matroska", 1000000L, 10L, Seq(
        MkvTrackSpec(num, "video", "V_AV1", width = w, height = w + 1)))
      val ts = Mkv.parseTracks(b)
      assert(ts != null && ts.length == 1, s"w=$w num=$num")
      assert(ts.head.trackId == num && ts.head.width == w &&
        ts.head.height == w + 1)
    }
  }

  test("streamed shape: an unknown-size Segment parses to the end of the " +
      "buffer with identical track facts") {
    val full = Mkv.buildMkv("webm", 1000000L, 5L,
      Seq(MkvTrackSpec(1, "audio", "A_VORBIS", channels = 1, rate = 44100)))
    val ts = Mkv.parseTracks(full)
    assert(ts.head.durationUs == 5000L) // 5 ticks x 1 ms scale
    // unknown-size Segment (streamed shape): rewrite the segment size to
    // the 1-byte unknown pattern 0xFF and re-parse — body runs to end
    val segAt = full.indexOfSlice(Seq(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte))
    assert(segAt > 0)
    val szLen = Integer.numberOfLeadingZeros(full(segAt + 4) & 0xff) - 23
    val streamed = full.take(segAt + 4) ++ Array(0xff.toByte) ++
      full.drop(segAt + 4 + szLen)
    val ts2 = Mkv.parseTracks(streamed)
    assert(ts2 != null && ts2.head == ts.head,
      "unknown-size Segment did not parse to the same tracks")
  }

  test("Cluster/SimpleBlock walk: absolute timestamps and byte-exact " +
      "frame ranges; laced blocks and junk route to null") {
    import graft.functions.Mkv.MkvClusterSpec
    val f0 = "frame-zero-bytes".getBytes
    val f1 = Array.tabulate[Byte](40)(_.toByte)
    val f2 = "third".getBytes
    val b = Mkv.buildMkvBlocks("matroska", 1000000L, 120L,
      Seq(MkvTrackSpec(1, "video", "V_MJPEG", width = 64, height = 48)),
      Seq(MkvClusterSpec(0L, Seq((1, 0, f0), (1, 40, f1))),
        MkvClusterSpec(1000L, Seq((1, -25, f2)))))
    val blocks = Mkv.parseBlocks(b)
    assert(blocks != null && blocks.length == 3)
    assert(blocks.map(_.tsTicks) == Seq(0L, 40L, 975L)) // 1000 + (-25)
    assert(blocks.map(_.trackId) == Seq(1, 1, 1))
    // byte-exact slices
    for ((blk, want) <- blocks.zip(Seq(f0, f1, f2)))
      assert(b.slice(blk.offset.toInt, blk.offset.toInt + blk.size)
        .sameElements(want), s"slice mismatch at ts=${blk.tsTicks}")
    // the track walk still works on the same payload
    assert(Mkv.parseTracks(b).head.codec == "V_MJPEG")
    // subtitle tracks (type 17, no typed child) round-trip too
    val sub = Mkv.buildMkvBlocks("webm", 1000000L, 10L, Seq(
      MkvTrackSpec(1, "video", "V_VP9", width = 64, height = 48),
      MkvTrackSpec(2, "subtitle", "S_TEXT/UTF8")),
      Seq(MkvClusterSpec(0L, Seq((2, 0, "héllo".getBytes("UTF-8"))))))
    val st = Mkv.parseTracks(sub)
    assert(st.map(t => (t.trackId, t.kind, t.codec)) ==
      Seq((1, "video", "V_VP9"), (2, "subtitle", "S_TEXT/UTF8")))
    val cueBlk = Mkv.parseBlocks(sub).head
    assert(new String(sub.slice(cueBlk.offset.toInt,
      cueBlk.offset.toInt + cueBlk.size), "UTF-8") == "héllo")
    // a laced block (lacing bits set) nulls the whole parse
    val laced = b.clone()
    val at = laced.indexOfSlice(f0) - 1 // flags byte precedes the frame
    laced(at) = (laced(at) | 0x02).toByte
    assert(Mkv.parseBlocks(laced) == null)
    // no clusters -> null; junk -> null; truncations never throw
    assert(Mkv.parseBlocks(Mkv.buildMkv("webm", 1000000L, 5L,
      Seq(MkvTrackSpec(1, "audio", "A_OPUS", channels = 1, rate = 48000)))) == null)
    assert(Mkv.parseBlocks("not ebml".getBytes) == null)
    for (n <- 0 to b.length) Mkv.parseBlocks(b.take(n))
  }

  test("junk, truncations and mutations: null or parse, never a crash") {
    assert(Mkv.parseTracks(null) == null)
    assert(Mkv.parseTracks("not matroska at all".getBytes) == null)
    assert(Mkv.parseTracks(Array.emptyByteArray) == null)
    // an MP4 is not EBML
    val mp4 = graft.functions.VideoHeaders.buildMp4("isom", 1000, 500, Array[Byte](1))
    assert(Mkv.parseTracks(mp4) == null)
    val good = Mkv.buildMkv("webm", 1000000L, 777L, Seq(
      MkvTrackSpec(1, "video", "V_VP8", width = 640, height = 360),
      MkvTrackSpec(2, "audio", "A_OPUS", channels = 2, rate = 48000)))
    for (n <- 0 to good.length) Mkv.parseTracks(good.take(n))
    val rnd = new scala.util.Random(0xEB31L)
    for (_ <- 1 to 500) {
      val b = good.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 + rnd.nextInt(255))).toByte
      Mkv.parseTracks(b) // must not throw
    }
  }
}
