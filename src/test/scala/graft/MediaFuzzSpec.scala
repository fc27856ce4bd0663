package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioHeaders, GifCodec, ImageHeaders, JpegCodec, VideoHeaders}

/** Systematic crash-resistance fuzz over every media parser: random bytes,
  * truncations of valid payloads at every prefix length, and byte-flip
  * mutations of valid payloads. The contract under test is the dead-letter
  * posture — ANY input must parse or return null; an exception in a watched
  * directory would poison the triage stream (this is the failure class the
  * round-5 review items were made of). */
class MediaFuzzSpec extends AnyFunSuite {

  private def parsers: Seq[(String, Array[Byte] => Any)] = Seq(
    ("image_header", b => ImageHeaders.parse(b)),
    ("bmp_pixels", b => ImageHeaders.parseBmpPixels(b)),
    ("png_pixels", b => ImageHeaders.parsePngPixels(b)),
    ("gif_pixels", b => GifCodec.parseGifPixels(b)),
    ("jpeg_pixels", b => JpegCodec.parseJpegPixels(b)),
    ("wav_header", b => AudioHeaders.parseWav(b)),
    ("flac_header", b => AudioHeaders.parseFlac(b)),
    ("mp3_header", b => AudioHeaders.parseMp3(b)),
    ("adts_header", b => AudioHeaders.parseAdts(b)),
    ("opus_header", b => AudioHeaders.parseOpus(b)),
    ("audio_dispatch", b => AudioHeaders.parse(b)),
    ("pcm_stats", b => AudioHeaders.parsePcmStats(b)),
    ("pcm_frames", b => AudioHeaders.parsePcmFrames(b, 160)),
    ("video_header", b => VideoHeaders.parseMp4(b)),
    ("video_tracks", b => VideoHeaders.parseTracks(b)),
    ("video_samples", b => VideoHeaders.parseSamples(b)),
    ("h264_meta", b => graft.functions.H264.parseMp4Sps(b)),
    ("hevc_meta", b => graft.functions.H265.parseMp4Sps(b)),
    ("av1_meta", b => graft.functions.Av1.parseMp4(b)),
    ("mkv_tracks", b => graft.functions.Mkv.parseTracks(b)),
    ("mkv_blocks", b => graft.functions.Mkv.parseBlocks(b)),
    ("id3_tags", b => graft.functions.Id3.parse(b)),
    ("warc_records", b => graft.functions.Warc.parse(b)),
    ("warc_index", b => graft.functions.Warc.index(b)),
    ("pdf_meta", b => graft.functions.Pdfs.pdfMeta(b)),
    ("pdf_text", b => graft.functions.Pdfs.pdfText(b)),
    ("pdf_revisions", b => graft.functions.Pdfs.pdfRevisions(b)),
    ("flac_decode", b => graft.functions.FlacCodec.decode(b)),
    ("zip_entries", b => graft.functions.Archives.zipEntries(b)),
    ("tar_entries", b => graft.functions.Archives.tarEntries(b)),
    ("odt_text", b => graft.functions.Odts.odtText(b)),
    ("ods_text", b => graft.functions.Odts.odsText(b)),
    ("odp_slides", b => graft.functions.Odts.odpSlides(b)),
    ("epub_chapters", b => graft.functions.Epubs.epubChapters(b)),
    ("rtf_text", b => graft.functions.Rtfs.rtfText(b)),
    ("eml_parse", b => graft.functions.Emls.emlParse(b)),
    ("bunzip", b => graft.functions.Bzip2.decode(b)),
    ("bz2_extents", b => graft.functions.Bzip2.streamOffsets(b)),
    ("zstd_decode", b => graft.functions.Zstandard.decode(b)),
    ("zstd_extents", b => graft.functions.Zstandard.frameExtents(b)),
    ("zstd_dict", b => graft.functions.Zstandard.leadingDictionary(b)),
    ("zstd_decode_dict", b => graft.functions.Zstandard.decodeWithDict(
      b, MediaFuzzSpec.FuzzDict)),
    ("sevenz_entries", b => graft.functions.SevenZip.entries(b)),
    ("xz_decode", b => graft.functions.Xz.decode(b)),
    ("wikitext_plain", b => graft.functions.Wikitext.plain(
      new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))))

  private def validPayloads: Seq[Array[Byte]] = Seq(
    ImageHeaders.buildBmp24(5, 4, topDown = false)((x, y) => (x, y, x + y)),
    ImageHeaders.buildPngRgb(5, 4, _ % 5)((x, y) => (x * 9, y * 7, 3)),
    ImageHeaders.buildWebpVp8x(320, 200),
    ImageHeaders.buildWebpVp8(320, 200),
    ImageHeaders.buildWebpVp8l(320, 200),
    ImageHeaders.buildTiff(320, 200, bigEndian = true),
    GifCodec.buildGif(5, 4, Array((1, 2, 3), (4, 5, 6)),
      Array.tabulate(20)(_ % 2)),
    JpegCodec.buildJpegGray(16, 8)((x, y) => (x * y) % 256),
    JpegCodec.buildJpegProgressiveGray(16, 8)((x, y) => (x * 7 + y * 3) % 256),
    AudioHeaders.buildWav(1, 8000, 16, Array.tabulate(64)(_.toByte)),
    VideoHeaders.buildMp4("isom", 1000, 5000, Array[Byte](1, 2, 3)),
    VideoHeaders.buildMp4Tracks("isom", 1000, Seq(
      VideoHeaders.TrackSpec(1, "vide", "avc1", 320, 240, 90000,
        Array.tabulate(7)(k => 500 + k), 3000, 2),
      VideoHeaders.TrackSpec(2, "soun", "mp4a", 0, 0, 48000,
        Array.tabulate(11)(k => 100 + k), 1024, 3)),
      Array[Byte](9, 8, 7)),
    VideoHeaders.buildMp4TracksWithData("isom", 1000, Seq(
      VideoHeaders.TrackSpec(1, "vide", "avc1", 64, 48, 90000,
        Array(10, 20, 15), 100, 2)),
      Seq(Array.tabulate(3)(s => Array.fill(Seq(10, 20, 15)(s))(s.toByte)))),
    VideoHeaders.buildMp4Tracks("isom", 1000, Seq(
      VideoHeaders.TrackSpec(1, "vide", "avc1", 156, 78, 90000,
        Array(40, 50), 3000, 1,
        graft.functions.H264.buildAvcC(
          graft.functions.H264.buildSps(31, 10, 5, 2, 1)))),
      Array[Byte](4, 5, 6)),
    VideoHeaders.buildMp4Tracks("isom", 1000, Seq(
      VideoHeaders.TrackSpec(1, "vide", "hvc1", 636, 356, 90000,
        Array(30, 40), 3000, 1,
        graft.functions.H265.buildHvcC(
          graft.functions.H265.buildSps(1, 0, 120, 640, 360, 2, 2)))),
      Array[Byte](8, 9)),
    VideoHeaders.buildMp4Tracks("isom", 1000, Seq(
      VideoHeaders.TrackSpec(1, "vide", "av01", 640, 360, 90000,
        Array(25, 35), 3000, 1,
        graft.functions.Av1.buildAv1C(
          graft.functions.Av1.buildSeqHeaderObu(0, 8, 0, 640, 360)))),
      Array[Byte](1)),
    AudioHeaders.buildWav(2, 44100, 8, Array.tabulate(33)(i => (i * 3).toByte)),
    AudioHeaders.buildFlac(2, 44100, 16, 44100L, Array.tabulate(40)(_.toByte)),
    AudioHeaders.buildMp3(9, 0, 4, mono = false, id3Bytes = 48),
    AudioHeaders.buildAdts(4, 2, 3, bodyBytes = 40, blocksPerFrame = 2,
      id3Bytes = 24, id3v1 = true),
    AudioHeaders.buildOpus(2, 312, 48000, 96000L, Array[Byte](5, 6, 7)),
    graft.functions.Mkv.buildMkv("webm", 1000000L, 4242L, Seq(
      graft.functions.Mkv.MkvTrackSpec(1, "video", "V_VP9",
        width = 640, height = 360),
      graft.functions.Mkv.MkvTrackSpec(2, "audio", "A_OPUS",
        channels = 2, rate = 48000))),
    graft.functions.Mkv.buildMkvBlocks("matroska", 1000000L, 80L, Seq(
      graft.functions.Mkv.MkvTrackSpec(1, "video", "V_MJPEG",
        width = 16, height = 8)),
      Seq(graft.functions.Mkv.MkvClusterSpec(0L, Seq(
        (1, 0, Array.tabulate[Byte](24)(_.toByte)),
        (1, 40, "second-frame".getBytes))))),
    graft.functions.Warc.build(Seq(
      ("warcinfo", null, "2024-05-01T00:00:00Z", "software: fuzz".getBytes),
      ("response", "http://f.example/a", "2024-05-01T00:00:01Z",
        "<html>fuzz body</html>".getBytes))),
    graft.functions.Warc.buildGz(Seq(
      ("response", "http://f.example/b", "2024-05-01T00:00:02Z",
        "gz fuzz body".getBytes),
      ("request", "http://f.example/b", "2024-05-01T00:00:02Z",
        "GET /b".getBytes))),
    graft.functions.Pdfs.buildPdf(3, 17),
    graft.functions.FlacCodec.encode(2, 8000, 16,
      Array(Array.tabulate(300)(i => ((i * 37 + 11) % 1601 - 800) * 20),
        Array.tabulate(300)(i => ((i * 29 + 3) % 997 - 498) * 27)), 128),
    graft.functions.Pdfs.buildPdfWithText(
      Seq("fuzz page (with) \\parens\nand a newline", "p2 body"), flate = false),
    graft.functions.Pdfs.buildPdfWithText(
      Seq("deflated fuzz body " * 4), flate = true),
    graft.functions.Pdfs.buildPdfModern(
      Seq("modern layout fuzz body", "second page"), flate = true),
    graft.functions.Pdfs.appendPdfUpdate(
      graft.functions.Pdfs.buildPdfWithText(Seq("base rev"), flate = false),
      0, "updated rev", flate = true),
    graft.functions.Pdfs.buildPdfWithEncodedText(
      "winansi fuzz", "cmap body", flate = true),
    graft.functions.Pdfs.buildPdfEncrypted(
      Seq("rc4 fuzz page", "second"), flate = true, "rc4-128"),
    graft.functions.Pdfs.buildPdfEncrypted(
      Seq("aes fuzz page"), flate = false, "aes-128", literalOU = true),
    graft.functions.Pdfs.buildPdfEncrypted(
      Seq("aes256 fuzz page"), flate = true, "aes-256"),
    graft.functions.Archives.buildZip64(Seq(
      ("z64/a.txt", "zip64 fuzz payload".getBytes, true),
      ("z64/b.bin", Array.tabulate[Byte](700)(i => (i % 83).toByte), false))),
    ImageHeaders.buildAvif(320, 180,
      graft.functions.Av1.buildAv1C(
        graft.functions.Av1.buildSeqHeaderObu(0, 8, 0, 320, 180)),
      Array.tabulate(9)(_.toByte)),
    graft.functions.Archives.buildZip(Seq(
      ("[Content_Types].xml", "<Types/>".getBytes, true),
      ("word/document.xml",
        "<w:document><w:body><w:p><w:r><w:t>fuzz</w:t></w:r></w:p></w:body></w:document>".getBytes,
        true))),
    { // TAR with the full long-name battery: GNU 'L', PAX 'x'
      // (path + size records), and an ordinary member — the byte-level
      // parsing surface x234 added (mutations here found the PAX
      // negative-record-length crash)
      val longName = "fuzz/" + ("n" * 24 + "/") * 5 + "tail.bin"
      def paxRecord(kv: String): String = {
        var len = kv.length + 3
        while (s"$len $kv\n".length != len) len = s"$len $kv\n".length
        s"$len $kv\n"
      }
      graft.functions.Archives.buildTar(Seq(
        ("././@LongLink", "L", (longName + " ").getBytes),
        (longName.take(100), "0", "gnu-long payload".getBytes),
        ("pax-hdr", "x", (paxRecord("path=fuzz/pax-renamed.txt") +
          paxRecord("size=9")).getBytes),
        ("stub", "0", "123456789".getBytes),
        ("plain.txt", "0", Array.tabulate[Byte](600)(i => (i % 71).toByte))))
    },
    graft.functions.Odts.buildOdt(Seq("a  b\tc", "d & <e>\nf")),
    graft.functions.Odts.buildOds(Seq(Seq("a  b", "c\td"), Seq("e & f"))),
    graft.functions.Odts.buildOdp(Seq(Seq("t1", "b1"), Seq("t2"))),
    graft.functions.Epubs.buildEpub(Seq(
      ("ch1.xhtml", "hello & <t>\nworld"), ("ch2.xhtml", "tail"))),
    graft.functions.Rtfs.buildRtf(
      "fuzz {x} \\ café — 中\tcol\npar"),
    graft.functions.Emls.buildEml("Sujet café", "a@b.c",
      "Mon, 1 Jan 2024 00:00:00 +0000", "ligne café — une\ntwo",
      encoding = "quoted-printable", htmlAlt = true),
    graft.functions.Bzip2.encode(
      ("bz2 corpus stand-in " * 40 + "rrrr" * 30).getBytes),
    graft.functions.Zstandard.encode(
      ("zstd corpus stand-in " * 40).getBytes),
    graft.functions.Xz.encode(
      ("xz corpus stand-in " * 40).getBytes, literalLzma = true),
    graft.functions.Xz.encode(
      ("xz corpus stand-in " * 40).getBytes, literalLzma = false),
    graft.functions.Xz.encode(
      ("xz delta stand-in " * 30).getBytes, literalLzma = true,
      prefilter = Some((0x03, Array[Byte](2)))),
    graft.functions.SevenZip.build(Seq(
      ("a.bin", ("7z chain 艾退 " * 10).getBytes("UTF-8")),
      ("b.bin", "delta member 0123456789".getBytes("UTF-8"))),
      chainFor = i =>
        if (i == 0) Some((0x04L, Array.empty[Byte]))
        else Some((0x03L, Array[Byte](0)))))

  test("every parser survives pure random bytes") {
    val rnd = new scala.util.Random(0xFADEDBEEFL)
    for (_ <- 1 to 500; (name, p) <- parsers) {
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      try p(b)
      catch { case e: Throwable => fail(s"$name threw on random bytes: $e") }
    }
  }

  test("every parser survives every truncation of every valid payload") {
    for (payload <- validPayloads; n <- 0 to payload.length;
         (name, p) <- parsers) {
      try p(payload.take(n))
      catch { case e: Throwable =>
        fail(s"$name threw on ${payload.length}-byte payload truncated to $n: $e")
      }
    }
  }

  test("tiny declared-segment-length payloads never throw in any parser") {
    // the class of bug fuzz missed in r6: a declared segment length that
    // passes the buffer-bounds check but undershoots the marker's fixed
    // fields, with the buffer ending exactly at the segment tail
    def bytes(vs: Int*): Array[Byte] = vs.map(_.toByte).toArray
    val crafted = Seq(
      bytes(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x02), // SOF0 len=2 at tail
      bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02), // SOS len=2
      bytes(0xff, 0xd8, 0xff, 0xdd, 0x00, 0x02), // DRI len=2
      bytes(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x07, 8, 0, 1, 0, 1), // SOF0 short by 1
      bytes(0xff, 0xd8, 0xff, 0xdb, 0x00, 0x02), // DQT empty
      bytes(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x02)) // DHT empty
    for (b <- crafted; (name, p) <- parsers) {
      try p(b)
      catch { case e: Throwable =>
        fail(s"$name threw on crafted ${b.length}-byte segment payload: $e")
      }
    }
  }

  test("every parser survives single-byte mutations of valid payloads") {
    val rnd = new scala.util.Random(0x5EEDL)
    for (payload <- validPayloads; _ <- 1 to 200; (name, p) <- parsers) {
      val b = payload.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 + rnd.nextInt(255))).toByte
      try p(b)
      catch { case e: Throwable =>
        fail(s"$name threw on mutation at byte $at of ${b.length}: $e")
      }
    }
  }
}

object MediaFuzzSpec {
  /** A small real dictionary so the dict-decode fuzz arm exercises the
    * dictionary-referencing path, not just the null guard. */
  lazy val FuzzDict: Array[Byte] = graft.functions.Zstandard.trainDictionary(
    (0 until 300).map(i =>
      s"fuzz dictionary sample boilerplate | body $i".getBytes("UTF-8")),
    1 << 10)
}
