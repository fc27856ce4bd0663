package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pdfs

/** PDF 1.5+ container support: cross-reference STREAMS (/Type /XRef,
  * /W widths, /Index, FlateDecode + PNG Predictor 12) and OBJECT streams
  * (/Type /ObjStm) holding the Catalog/Pages/Page dicts — the layout of
  * essentially every real PDF written since Acrobat 6. The modern
  * builder wraps the SAME content streams as the classic one, so
  * extraction parity is the strongest possible container-layer check. */
class PdfModernSpec extends AnyFunSuite {

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  private val pages = Seq(
    "the quick brown fox jumps over the lazy dog and keeps going for a while",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow")

  test("modern layout extracts identically to the classic layout") {
    for (flate <- Seq(false, true)) {
      val classic = Pdfs.pdfText(Pdfs.buildPdfWithText(pages, flate))
      val modern = Pdfs.pdfText(Pdfs.buildPdfModern(pages, flate))
      assert(classic != null && modern != null, s"flate=$flate")
      assert(modern.toSeq == classic.toSeq, s"flate=$flate")
    }
  }

  test("pdf_meta reads version/size/pages through the xref stream") {
    val m = Pdfs.pdfMeta(Pdfs.buildPdfModern(pages, flate = true))
    assert(m != null)
    assert(m._1 == "1.5")
    assert(m._3 == 3, s"page count: $m")
  }

  test("the predictor is load-bearing: un-predicted rows cannot resolve") {
    // sanity: the xref stream really is predictor-encoded — byte-flip
    // inside its compressed data and the whole doc must null-route
    val pdf = Pdfs.buildPdfModern(pages, flate = false)
    val s = new String(pdf, Ascii)
    val at = s.indexOf("/Type /XRef")
    assert(at > 0)
    val streamAt = s.indexOf("stream\n", at) + 7
    val broken = pdf.clone()
    broken(streamAt + 5) = (broken(streamAt + 5) ^ 0x7f).toByte
    val r = Pdfs.pdfText(broken)
    // either the inflate breaks or the decoded table goes inconsistent;
    // both must route to null, never throw or emit wrong text
    assert(r == null || r.toSeq != Pdfs.pdfText(pdf).toSeq)
  }

  test("truncated tail routes to null (startxref gone)") {
    val pdf = Pdfs.buildPdfModern(pages, flate = true)
    assert(Pdfs.pdfText(pdf.dropRight(30)) == null)
    assert(Pdfs.pdfMeta(pdf.dropRight(30)) == null)
  }

  test("a type-2 /Contents reference null-routes (streams can't nest)") {
    // point a page's /Contents at an object that lives inside the ObjStm
    // (the Catalog) — contentStream must fail to resolve it, not misread
    val pdf = Pdfs.buildPdfModern(Seq("abc"), flate = false)
    val s = new String(pdf, Ascii)
    // page object: k=1 -> content obj 1, catalog obj 3; /Contents 1 0 R
    val swapped = s.replace("/Contents 1 0 R", "/Contents 3 0 R")
    assert(swapped != s)
    assert(Pdfs.pdfText(swapped.getBytes(Ascii)) == null)
  }

  test("incremental update: newest body wins, /Prev chain serves the rest") {
    for (flate <- Seq(false, true)) {
      val base = Pdfs.buildPdfWithText(pages, flate)
      val updated = Pdfs.appendPdfUpdate(base, 1,
        "completely different middle page content", flate)
      val got = Pdfs.pdfText(updated)
      // ground truth: a pristine classic build with the page replaced
      val expect = Pdfs.pdfText(Pdfs.buildPdfWithText(
        pages.updated(1, "completely different middle page content"), flate))
      assert(got != null && got.toSeq == expect.toSeq, s"flate=$flate")
    }
  }

  test("two chained updates: the second one rules") {
    val base = Pdfs.buildPdfWithText(pages, flate = false)
    val u1 = Pdfs.appendPdfUpdate(base, 0, "first rewrite", flate = false)
    val u2 = Pdfs.appendPdfUpdate(u1, 0, "second rewrite", flate = true)
    val got = Pdfs.pdfText(u2)
    val expect = Pdfs.pdfText(Pdfs.buildPdfWithText(
      pages.updated(0, "second rewrite"), flate = false))
    assert(got != null && got.toSeq == expect.toSeq)
    // and pdf_meta still resolves through the chain
    assert(Pdfs.pdfMeta(u2) != null)
  }

  test("a /Prev cycle is a structural break, not a spin") {
    val base = Pdfs.buildPdfWithText(Seq("x"), flate = false)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    def w(s: String): Unit = out.write(s.getBytes(Ascii))
    val xrefAt = out.size()
    w("xref\n4 1\n")
    w(f"${10}%010d 00000 n \n")
    w(s"trailer\n<< /Size 6 /Root 1 0 R /Prev $xrefAt >>\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    assert(Pdfs.pdfText(out.toByteArray) == null)
    assert(Pdfs.pdfMeta(out.toByteArray) == null)
  }

  test("a newer revision's FREE entry shadows the older body") {
    // an incremental update that DELETES page 1's content object: serving
    // the pre-deletion body is the classic redaction failure — the merged
    // xref must treat the freed slot as unresolvable (doc null-routes),
    // never fall through to the stale offset
    val base = Pdfs.buildPdfWithText(Seq("secret content", "page two"),
      flate = false)
    assert(Pdfs.pdfText(base)(0).contains("secret content"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    def w(s: String): Unit = out.write(s.getBytes(Ascii))
    val s = new String(base, Ascii)
    val prevOff = s.substring(s.lastIndexOf("startxref"))
      .split("\\s+")(1).toLong
    val xrefAt = out.size()
    w("xref\n5 1\n") // object 5 = page 1's content stream (k=2 layout)
    w("0000000000 65535 f \n")
    w(s"trailer\n<< /Size 7 /Root 1 0 R /Prev $prevOff >>\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    val redacted = out.toByteArray
    assert(Pdfs.pdfRevisions(redacted) == 2)
    assert(Pdfs.pdfText(redacted) == null,
      "deleted object's stale body was served")
  }

  test("pdfRevisions counts the /Prev chain in both layouts") {
    val base = Pdfs.buildPdfWithText(pages, flate = false)
    assert(Pdfs.pdfRevisions(base) == 1)
    val u1 = Pdfs.appendPdfUpdate(base, 0, "r1", flate = false)
    assert(Pdfs.pdfRevisions(u1) == 2)
    val u2 = Pdfs.appendPdfUpdate(u1, 1, "r2", flate = true)
    assert(Pdfs.pdfRevisions(u2) == 3)
    assert(Pdfs.pdfRevisions(Pdfs.buildPdfModern(pages, flate = true)) == 1)
    assert(Pdfs.pdfRevisions("not a pdf at all".getBytes(Ascii)) == -1)
  }

  test("modern fixtures survive the fuzz battery shapes") {
    val pdf = Pdfs.buildPdfModern(pages.take(1), flate = true)
    // truncation sweep: every prefix must null-route or extract, never throw
    var l = 0
    while (l < pdf.length) {
      Pdfs.pdfText(java.util.Arrays.copyOf(pdf, l))
      Pdfs.pdfMeta(java.util.Arrays.copyOf(pdf, l))
      l += 13
    }
    // single-byte mutation sweep
    var i = 0
    while (i < pdf.length) {
      val m = pdf.clone(); m(i) = (m(i) ^ 0x55).toByte
      Pdfs.pdfText(m)
      i += 37
    }
    succeed
  }
}
