package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FlacCodec, Pdfs}

/** The round-10 robustness fixes, pinned: the never-throws contract of
  * pdf_meta/pdf_text against overlong integer tokens (a >18-digit run
  * after startxref, /Size, /Contents, or inside /Kids used to escape as
  * NumberFormatException from nullSafeEval, killing the whole query and
  * the pdfTextStream standing query), the indirect `/Length N 0 R` form
  * (misread as N bytes before — silently truncated text), and the FLAC
  * STREAMINFO memory bomb (a 50-byte forgery claiming 100M samples used
  * to allocate the full PCM buffers before reading a single frame). */
class AdversarialInputSpec extends AnyFunSuite {

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  // ------------------------------------------------------------- PDF

  test("overlong integer after startxref null-routes, never throws") {
    val b = ("%PDF-1.7\n" + "x" * 64 +
      "\nstartxref\n99999999999999999999999\n%%EOF\n").getBytes(Ascii)
    assert(Pdfs.pdfMeta(b) == null)
    assert(Pdfs.pdfText(b) == null)
  }

  test("overlong /Size and xref counts null-route") {
    // a structurally positioned xref whose header count is a 14-digit run
    val pre = "%PDF-1.7\npad pad pad pad pad pad pad pad\n"
    val xref = "xref\n0 99999999999999\n"
    val body = pre + xref
    val b = (body + s"trailer\n<< /Size 99999999999999999999 /Root 1 0 R >>\n" +
      s"startxref\n${pre.length}\n%%EOF\n").getBytes(Ascii)
    assert(Pdfs.pdfMeta(b) == null)
    assert(Pdfs.pdfText(b) == null)
  }

  test("overlong object number inside /Kids null-routes") {
    val base = Pdfs.buildPdfWithText(Seq("kids corruption probe"), flate = false)
    val s = new String(base, Ascii)
    // 12-digit object number: .toInt used to throw from the kids regex
    val corrupted = s.replace("/Kids [3 0 R]", "/Kids [123456789012 0 R]")
    assert(corrupted != s, "fixture shape changed; update the probe")
    assert(Pdfs.pdfText(corrupted.getBytes(Ascii)) == null)
  }

  /** Catalog(1) → Pages(2) → Page(3) → Contents(4) whose /Length is the
    * INDIRECT reference `5 0 R` resolving to integer object 5 — the form
    * most real-world writers emit (stream size unknown at dict time). */
  private def pdfIndirectLength(lengthObj: String): Array[Byte] = {
    val content = "BT /F1 12 Tf 72 720 Td (Indirect) Tj ET\n".getBytes(Ascii)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(Ascii))
    val offsets = new Array[Int](6)
    w("%PDF-1.7\n")
    offsets(1) = out.size
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offsets(3) = out.size
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R >>\nendobj\n")
    offsets(4) = out.size
    w(s"4 0 obj\n<< /Length $lengthObj >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    offsets(5) = out.size
    w(s"5 0 obj\n${content.length}\nendobj\n")
    val xrefAt = out.size
    w("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(j => w(f"${offsets(j)}%010d 00000 n \n"))
    w("trailer\n<< /Size 6 /Root 1 0 R >>\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  test("indirect /Length resolves through the xref to the right size") {
    val pages = Pdfs.pdfText(pdfIndirectLength("5 0 R"))
    assert(pages != null && pages.toSeq == Seq("Indirect"))
  }

  test("dangling indirect /Length null-routes instead of misreading") {
    // object 99 is outside the xref: resolving fails -> whole doc routes
    // to null (the pre-fix parser read `/Length 99` = 99 bytes silently)
    assert(Pdfs.pdfText(pdfIndirectLength("99 0 R")) == null)
  }

  test("direct /Length still parses (regression guard)") {
    val b = Pdfs.buildPdfWithText(Seq("direct length page"), flate = true)
    val pages = Pdfs.pdfText(b)
    assert(pages != null && pages(0).contains("direct length page"))
  }

  // ------------------------------------------------------------ FLAC

  test("forged STREAMINFO total-samples is not trusted for allocation") {
    val pcm = Array(Array.tabulate(512)(i => (i % 97) - 48))
    val flac = FlacCodec.encode(1, 8000, 16, pcm, 256)
    // STREAMINFO total-samples: low nibble of byte 21, then bytes 22..25
    // (fLaC magic 4 + block header 4 + offset 13 into the block body).
    // Claim 100,000,000 samples = 0x05F5E100 — inside the absolute cap,
    // so only the incremental-growth bound stands between this forgery
    // and a 400 MB upfront allocation.
    val forged = flac.clone()
    forged(21) = (forged(21) & 0xf0).toByte
    forged(22) = 0x05.toByte
    forged(23) = 0xf5.toByte
    forged(24) = 0xe1.toByte
    forged(25) = 0x00.toByte
    val t0 = System.nanoTime()
    assert(FlacCodec.decode(forged) == null)
    // dies at the missing frame after ~512 real samples; generous bound
    // only to catch an accidental return to eager full-size allocation
    assert((System.nanoTime() - t0) < 5e9)
  }

  test("honest FLAC still decodes bit-exactly after the growth rework") {
    // multi-frame (3 frames of 256/256/188) exercises the grow path
    val pcm = Array(Array.tabulate(700)(i => ((i * 31) % 211) - 105))
    val flac = FlacCodec.encode(1, 16000, 16, pcm, 256)
    val a = FlacCodec.decode(flac)
    assert(a != null && a.pcm(0).toSeq == pcm(0).toSeq)
    assert(a.pcm(0).length == 700) // exactly total-samples, no zero tail
  }
}
