package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pdfs

/** Font-encoded PDF text extraction: WinAnsi high bytes, ToUnicode CMap
  * code shifting (bfrange), one-to-many bfchar ligatures, 2-byte CMap
  * codes, and the null routes for broken/empty CMaps. */
class PdfEncodingSpec extends AnyFunSuite {

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  test("WinAnsi + ToUnicode round-trip, raw and FlateDecode") {
    for (flate <- Seq(false, true)) {
      val pdf = Pdfs.buildPdfWithEncodedText("hello world", "abc xyz", flate)
      val pages = Pdfs.pdfText(pdf)
      assert(pages != null && pages.length == 1, s"flate=$flate")
      assert(pages(0) == "«hello world»\nabc xyzqq", s"flate=$flate")
    }
  }

  test("the CMap is load-bearing: raw code bytes are not the text") {
    // line2 'abc' is stored as bytes 01 02 03 — if the extractor ignored
    // the CMap, the page could never contain the letters
    val pdf = Pdfs.buildPdfWithEncodedText("x", "abc", flate = false)
    val s = new String(pdf, Ascii)
    assert(!s.contains("abc"), "fixture stores plaintext; encoding not exercised")
    assert(Pdfs.pdfText(pdf)(0).endsWith("\nabcqq"))
  }

  test("the letter m survives (raw 0x0D would EOL-normalize to 0x0A)") {
    val pdf = Pdfs.buildPdfWithEncodedText("m", "jam m j", flate = false)
    assert(Pdfs.pdfText(pdf)(0) == "«m»\njam m jqq")
  }

  test("a truncated ToUnicode CMap stream routes the doc to null") {
    val pdf = Pdfs.buildPdfWithEncodedText("hello", "abc", flate = false)
    val s = new String(pdf, Ascii)
    // empty the CMap's bf sections: a font PROMISING a mapping we cannot
    // honor must route, not silently emit wrong glyphs
    val broken = s
      .replace("1 beginbfrange\n<01> <1a> <0061>\nendbfrange\n", "")
      .replace("2 beginbfchar\n<1b> <0020>\n<1c> <00710071>\nendbfchar\n", "")
    assert(broken != s)
    // keep offsets valid: pad the CMap object back to its original length
    // is unnecessary — the xref points at object STARTS, and the CMap
    // stream is the last object before the xref, so earlier offsets hold;
    // its own /Length is now stale, making the stream read garbage or the
    // parse find no mappings — either way: null
    assert(Pdfs.pdfText(broken.getBytes(Ascii)) == null)
  }

  test("parseCMap: 2-byte codes, bfrange increments, unmapped -> U+FFFD") {
    val cmap = ("begincmap\n" +
      "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n" +
      "1 beginbfrange\n<0041> <0043> <0058>\nendbfrange\n" +
      "1 beginbfchar\n<2603> <00680069>\nendbfchar\n" +
      "endcmap").getBytes(Ascii)
    val dec = Pdfs.parseCMap(cmap)
    assert(dec != null)
    // codes 0x0041..0x0043 -> X, Y, Z; 0x2603 -> "hi"; 0x0001 unmapped
    val bytes = Array[Byte](0x00, 0x41, 0x00, 0x43, 0x26, 0x03, 0x00, 0x01)
    assert(dec(bytes) == "XZhi�")
  }

  test("parseCMap: bfrange array form, and it cannot bleed into triples") {
    val cmap = ("begincmap\n" +
      "2 beginbfrange\n" +
      "<01> <03> [<0041> <00420042> <0043>]\n" + // array: A, BB, C
      "<10> <12> <0061>\n" +                     // increment: a, b, c
      "endbfrange\nendcmap").getBytes(Ascii)
    val dec = Pdfs.parseCMap(cmap)
    assert(dec != null)
    assert(dec(Array[Byte](0x01, 0x02, 0x03)) == "ABBC")
    assert(dec(Array[Byte](0x10, 0x11, 0x12)) == "abc")
    // the array's bracket contents (0x41..) must NOT have become codes
    assert(dec(Array[Byte](0x41)) == "�")
  }

  /** One page, one font with `/Encoding /MacRomanEncoding`, text bytes
    * containing the MacRoman-specific 0xA5 (→ U+2022 BULLET). */
  private def macRomanPdf(): Array[Byte] = {
    val content = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = content.write(s.getBytes(Ascii))
    w("BT\n/F1 12 Tf\n72 720 Td\n(a")
    content.write(0xa5)
    w("b) Tj\nET\n")
    val stream = content.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def o(s: String): Unit = out.write(s.getBytes(Ascii))
    val offsets = new Array[Long](6)
    o("%PDF-1.7\n")
    offsets(1) = out.size()
    o("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size()
    o("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offsets(3) = out.size()
    o("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    offsets(4) = out.size()
    o(s"4 0 obj\n<< /Length ${stream.length} >>\nstream\n")
    out.write(stream)
    o("\nendstream\nendobj\n")
    offsets(5) = out.size()
    o("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Times " +
      "/Encoding /MacRomanEncoding >>\nendobj\n")
    val xrefAt = out.size()
    o("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(j => o(f"${offsets(j)}%010d 00000 n \n"))
    o("trailer\n<< /Size 6 /Root 1 0 R >>\n")
    o(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  test("MacRomanEncoding maps its high bytes (0xA5 -> bullet)") {
    val pages = Pdfs.pdfText(macRomanPdf())
    assert(pages != null && pages(0) == "a•b")
  }

  test("pages without font resources keep the UTF-8 identity default") {
    val pdf = Pdfs.buildPdfWithText(Seq("plain page text here"), flate = false)
    val pages = Pdfs.pdfText(pdf)
    assert(pages != null && pages(0).contains("plain page text here"))
  }
}
