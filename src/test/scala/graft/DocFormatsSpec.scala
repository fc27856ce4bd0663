package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Archives, Emls, Epubs, Odts, Rtfs}

/** Behavioral pins for the three round-11 document extractors — ODT
  * (ODF 1.3), EPUB (OCF/EPUB 3.3), RTF (1.9.1) — beyond what the
  * hash-gated x241-x243 queries assert: builder/parser inversion on
  * hostile content, the skip rules (footnotes, destinations, decoys),
  * and the quarantine arms. */
class DocFormatsSpec extends AnyFunSuite {

  // ---- ODT ----

  test("odt round-trips element-encoded whitespace and entities") {
    val ps = Seq(
      "Heading <1> & done",
      "c1\tc2  wide 7\nnote & fin",
      "   lead and trail   ",
      "five     spaces")
    val got = Odts.odtText(Odts.buildOdt(ps))
    assert(got == ps.mkString("\n"))
  }

  test("odt footnote and annotation subtrees are not body text") {
    val t = Odts.odtText(Odts.buildOdt(Seq("visible")))
    assert(t == "visible")
    assert(!t.contains("not body text"))
  }

  test("odt rejects wrong mimetype, missing content.xml, torn zip") {
    val good = Odts.buildOdt(Seq("x"))
    assert(Odts.odtText(good.dropRight(12)) == null)
    // same zip machinery, spreadsheet mimetype
    val wrongMime = Archives.buildZip(Seq(
      ("mimetype",
        "application/vnd.oasis.opendocument.spreadsheet".getBytes, false),
      ("content.xml",
        "<office:text><text:p>x</text:p></office:text>".getBytes, true)))
    assert(Odts.odtText(wrongMime) == null)
    val noContent = Archives.buildZip(Seq(
      ("mimetype",
        "application/vnd.oasis.opendocument.text".getBytes, false)))
    assert(Odts.odtText(noContent) == null)
  }

  test("odt empty paragraphs keep their newline positions") {
    assert(Odts.odtText(Odts.buildOdt(Seq("a", "", "b"))) == "a\n\nb")
  }

  test("ods round-trips cells (tabs between, rows by newline, ws elements)") {
    val rows = Seq(
      Seq("a0 <&> 7", "b0  wide", "c0\tof 7"),
      Seq("single"))
    val got = Odts.odsText(Odts.buildOds(rows))
    assert(got == "a0 <&> 7\tb0  wide\tc0\tof 7\nsingle")
  }

  test("ods self-closing empty cells and rows keep their boundaries") {
    // LibreOffice writes `<table:table-cell/>` padding; a greedy
    // attribute match would merge the empty cell with its neighbor and
    // shift every following column left
    val xml = "<office:spreadsheet><table:table>" +
      "<table:table-row><table:table-cell/>" +
      "<table:table-cell><text:p>B</text:p></table:table-cell>" +
      "</table:table-row>" +
      "<table:table-row table:number-rows-repeated=\"2\"/>" +
      "<table:table-row><table:table-cell><text:p>C</text:p>" +
      "</table:table-cell></table:table-row>" +
      "</table:table></office:spreadsheet>"
    val content = ("<?xml version=\"1.0\"?><office:document-content>" +
      "<office:body>" + xml + "</office:body></office:document-content>")
      .getBytes("UTF-8")
    val zip = Archives.buildZip(Seq(
      ("mimetype",
        "application/vnd.oasis.opendocument.spreadsheet".getBytes, false),
      ("content.xml", content, true)))
    assert(Odts.odsText(zip) == "\tB\n\nC")
    // and an empty self-closing paragraph keeps its newline in ODT
    assert(Odts.odtText(Odts.buildOdt(Seq("a", "", "b"))) == "a\n\nb")
  }

  test("ods rejects an ODT mimetype; torn zip quarantines") {
    assert(Odts.odsText(Odts.buildOdt(Seq("not a sheet"))) == null)
    assert(Odts.odsText(Odts.buildOds(Seq(Seq("x"))).dropRight(12)) == null)
    // and the sibling direction: odt_text refuses a spreadsheet
    assert(Odts.odtText(Odts.buildOds(Seq(Seq("x")))) == null)
  }

  test("odp extracts per-page text, dropping presenter notes") {
    val got = Odts.odpSlides(Odts.buildOdp(Seq(
      Seq("title 1", "body 1 & x"), Seq("title 2"))))
    assert(got.toSeq == Seq("title 1\nbody 1 & x", "title 2"))
    assert(!got.exists(_.contains("not slide text")))
    assert(Odts.odpSlides(Odts.buildOdp(Seq(Seq("x"))).dropRight(12)) == null)
  }

  // ---- EPUB ----

  test("epub extracts chapters in spine order, skipping the decoy") {
    val book = Epubs.buildEpub(Seq(
      ("ch1.xhtml", "Chapter 1\nbody & <t>"),
      ("ch2.xhtml", "Chapter 2")))
    val cs = Epubs.epubChapters(book)
    assert(cs.map(_._1).toSeq == Seq("ch1.xhtml", "ch2.xhtml"))
    assert(cs(0)._2 == "Chapter 1\nbody & <t>")
    assert(cs(1)._2 == "Chapter 2")
    assert(!cs.exists(c => c._2 != null && c._2.contains("decoy")))
    assert(!cs.exists(c => c._2 != null && c._2.contains("head is not")))
  }

  test("epub missing spine member keeps its row with null text") {
    val book = Epubs.buildEpub(
      Seq(("ch1.xhtml", "one"), ("ch2.xhtml", "two")),
      omit = Set("ch1.xhtml"))
    val cs = Epubs.epubChapters(book)
    assert(cs.length == 2)
    assert(cs(0)._1 == "ch1.xhtml" && cs(0)._2 == null)
    assert(cs(1)._2 == "two")
  }

  test("epub quarantines wrong mimetype and torn containers") {
    val book = Epubs.buildEpub(Seq(("c.xhtml", "x")))
    assert(Epubs.epubChapters(book.dropRight(12)) == null)
    assert(Epubs.epubChapters(
      Epubs.buildEpub(Seq(("c.xhtml", "x")), mime = "application/zip"))
      == null)
  }

  test("epub hrefs resolve against the package directory, folding dots") {
    // hand-build: opf in OEBPS/, chapter href ../text/c.xhtml
    val container = """<container><rootfiles><rootfile
      | full-path="OEBPS/content.opf"/></rootfiles></container>"""
      .stripMargin.replace("\n", "")
    val opf = """<package><manifest>
      |<item id="c" href="../text/c.xhtml"/></manifest>
      |<spine><itemref idref="c"/></spine></package>"""
      .stripMargin.replace("\n", "")
    val book = Archives.buildZip(Seq(
      ("mimetype", "application/epub+zip".getBytes, false),
      ("META-INF/container.xml", container.getBytes, true),
      ("OEBPS/content.opf", opf.getBytes, true),
      ("text/c.xhtml", "<body><p>found</p></body>".getBytes, true)))
    val cs = Epubs.epubChapters(book)
    assert(cs.length == 1 && cs(0)._2 == "found")
  }

  test("xhtml strip: entities decode after tags strip, blanks collapse") {
    assert(Epubs.xhtmlText(
      "<body>  <p>a &amp;lt; b</p>\n\n<p>c<br/>d</p></body>")
      == "a &lt; b\nc\nd")
    assert(Epubs.decodeEntities("&#x41;&#66;&amp;&bogus;") == "AB&&bogus;")
  }

  // ---- RTF ----

  test("rtf round-trips braces, backslash, cp1252, unicode, whitespace") {
    val texts = Seq(
      "Doc 5 {set} \\ done\ncafé — naïve\tend 5",
      "plain ascii",
      "C1 range:  ok", // must take the \\uN path
      "CJK 中文 and emoji-free tail",
      "€ bullet • quote ’")
    for (t <- texts)
      assert(Rtfs.rtfText(Rtfs.buildRtf(t)) == t, s"round trip of: $t")
  }

  test("rtf skips font table, color table, info, starred destinations") {
    val t = Rtfs.rtfText(Rtfs.buildRtf("body only"))
    assert(t == "body only")
    assert(!t.contains("Helvetica") && !t.contains("graft") &&
      !t.contains("not body text"))
  }

  test("rtf \\uc fallback count is group state") {
    // uc2 inside a group: \u followed by TWO fallback chars eaten there,
    // while the outer group's uc1 eats one
    val rtf = ("{\\rtf1\\ansi\\uc1 a{\\uc2\\u8364 XXb}\\u8364 Yc}")
      .getBytes("ISO-8859-1")
    assert(Rtfs.rtfText(rtf) == "a€b€c")
  }

  test("rtf \\bin skips raw bytes even when they contain braces") {
    val rtf = ("{\\rtf1 a\\bin5 " + "}}{{\\" + "b}").getBytes("ISO-8859-1")
    assert(Rtfs.rtfText(rtf) == "ab")
  }

  // ---- EML ----

  test("eml round-trips each transfer encoding, decodes RFC 2047 subject") {
    for (enc <- Seq("7bit", "quoted-printable", "base64")) {
      val r = Emls.emlParse(Emls.buildEml(
        "Sujet café", "a@b.c", "Mon, 1 Jan 2024 00:00:00 +0000",
        "ligne café — une\nline two", encoding = enc))
      assert(r != null, enc)
      assert(r._1 == "Sujet café", enc)
      assert(r._2 == "a@b.c" && r._3 == "Mon, 1 Jan 2024 00:00:00 +0000")
      assert(r._4 == "ligne café — une\nline two", enc)
    }
  }

  test("eml multipart/alternative: text/plain beats the html decoy") {
    val r = Emls.emlParse(Emls.buildEml(
      "s", "a@b.c", "d", "the plain body",
      encoding = "base64", htmlAlt = true))
    assert(r._4 == "the plain body")
  }

  test("eml html-only message strips tags through the xhtml chain") {
    val raw = ("Subject: h\r\nFrom: a@b.c\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n\r\n" +
      "<html><body><p>only &amp; html</p></body></html>\r\n")
      .getBytes("ISO-8859-1")
    assert(Emls.emlParse(raw)._4 == "only & html")
  }

  test("eml folded headers unfold; encoded-word gaps drop whitespace") {
    val raw = ("Subject: =?UTF-8?B?Y2Fmw6k=?=\r\n =?UTF-8?Q?_noir?=\r\n" +
      "From: x@y.z\r\n\r\nbody\r\n").getBytes("ISO-8859-1")
    val r = Emls.emlParse(raw)
    // unfolding inserts the space the continuation line carried; the
    // whitespace BETWEEN the two encoded words is then dropped and the
    // Q-form underscore supplies the real one
    assert(r._1 == "café noir")
    assert(r._4 == "body")
  }

  test("eml plain beats a nested multipart's html even when html nests first") {
    // multipart/mixed: [multipart/related(html only), text/plain] — the
    // plain SIBLING must win over the html resolved inside the nested part
    val bnd = "outer42"
    val inner = "inner42"
    val raw = ("Subject: s\r\nFrom: a@b.c\r\n" +
      s"""Content-Type: multipart/mixed; boundary="$bnd"\r\n\r\n""" +
      s"--$bnd\r\n" +
      s"""Content-Type: multipart/related; boundary="$inner"\r\n\r\n""" +
      s"--$inner\r\n" +
      "Content-Type: text/html\r\n\r\n<p>html wins?</p>\r\n" +
      s"--$inner--\r\n" +
      s"--$bnd\r\n" +
      "Content-Type: text/plain\r\n\r\nplain wins\r\n" +
      s"--$bnd--\r\n").getBytes("ISO-8859-1")
    assert(Emls.emlParse(raw)._4 == "plain wins")
  }

  test("eml header-less part keeps its body; empty plain loses to html") {
    // RFC 2046 §5.1: a part may start with the blank line (defaults to
    // text/plain); its content is body, not garbage
    val bnd = "b7"
    val headerless = ("Subject: s\r\nFrom: a@b.c\r\n" +
      s"""Content-Type: multipart/mixed; boundary="$bnd"\r\n\r\n""" +
      s"--$bnd\r\n\r\nbare body line\r\n" +
      s"--$bnd--\r\n").getBytes("ISO-8859-1")
    assert(Emls.emlParse(headerless)._4 == "bare body line")
    // the empty-plain-stub + html pattern mailers emit: html must win
    val emptyPlain = ("Subject: s\r\nFrom: a@b.c\r\n" +
      s"""Content-Type: multipart/alternative; boundary="$bnd"\r\n\r\n""" +
      s"--$bnd\r\nContent-Type: text/plain\r\n\r\n\r\n" +
      s"--$bnd\r\nContent-Type: text/html\r\n\r\n<p>rich body</p>\r\n" +
      s"--$bnd--\r\n").getBytes("ISO-8859-1")
    assert(Emls.emlParse(emptyPlain)._4 == "rich body")
  }

  test("eml boundaries only match whole delimiter lines") {
    val bnd = "bx"
    // '--bx' mid-line and a LONGER sibling '--bxtra' at line start must
    // not split the part (RFC 2046 §5.1.1 delimiter anchoring)
    val raw = ("Subject: s\r\nFrom: a@b.c\r\n" +
      s"""Content-Type: multipart/mixed; boundary="$bnd"\r\n\r\n""" +
      s"--$bnd\r\nContent-Type: text/plain\r\n\r\n" +
      "see --bx mid-line\r\n--bxtra\r\nstill one part\r\n" +
      s"--$bnd--\r\n").getBytes("ISO-8859-1")
    assert(Emls.emlParse(raw)._4 ==
      "see --bx mid-line\n--bxtra\nstill one part")
  }

  test("eml quarantines headerless payloads, survives truncation") {
    assert(Emls.emlParse("no colon lines here\njust text".getBytes) == null)
    assert(Emls.emlParse(Array[Byte]()) == null)
    val full = Emls.buildEml("s café", "a@b.c", "d", "t\nu",
      encoding = "base64", htmlAlt = true)
    for (k <- 0 until full.length) Emls.emlParse(full.take(k))
  }

  // ---- tar.gz ----

  test("tar walker gunzips by magic; corrupt deflate quarantines whole") {
    val tar = Archives.buildTar(Seq(
      ("a.txt", "0", "alpha".getBytes), ("b.txt", "0", "beta".getBytes)))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(tar); gz.close()
    val bytes = bos.toByteArray
    val es = Archives.tarEntries(bytes)
    assert(es != null && es.length == 2)
    assert(new String(es(0)._4) == "alpha" && new String(es(1)._4) == "beta")
    val bad = bytes.clone()
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x55).toByte
    assert(Archives.tarEntries(bad) == null)
  }

  test("rtf quarantines non-RTF payloads, survives truncation anywhere") {
    assert(Rtfs.rtfText("GARBAGE{\\rtf1 x}".getBytes) == null)
    assert(Rtfs.rtfText(Array[Byte]()) == null)
    val full = Rtfs.buildRtf("truncate me — café\tend")
    for (k <- 0 until full.length)
      Rtfs.rtfText(full.take(k)) // must not throw
  }
}
