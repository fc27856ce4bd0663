package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PdfCrypto, Pdfs}

/** The standard security handler (ISO 32000 §7.6.3) over all three
  * real-world schemes — RC4-40 (V1/R2), RC4-128 (V2/R3), AES-128-CBC
  * (V4/R4 /AESV2): an owner-restricted document with an EMPTY user
  * password must extract exactly like its plaintext twin (every reader
  * opens these silently — crawl corpora are full of them), while a
  * real user password, a tampered /U, or an unsupported V must
  * QUARANTINE (null) — never misdecrypt, never throw. */
class PdfEncryptedSpec extends AnyFunSuite {

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  private val pages = Seq(
    "the quick brown fox jumps over the lazy dog and keeps going on",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow")

  private val modes = Seq("rc4-40", "rc4-128", "aes-128", "aes-256")

  test("each scheme extracts identically to the plaintext twin") {
    for (mode <- modes; flate <- Seq(false, true)) {
      val plain = Pdfs.pdfText(Pdfs.buildPdfWithText(pages, flate))
      val enc = Pdfs.pdfText(Pdfs.buildPdfEncrypted(pages, flate, mode))
      assert(plain != null, s"$mode flate=$flate plain")
      assert(enc != null, s"$mode flate=$flate: openable doc quarantined")
      assert(enc.toSeq == plain.toSeq, s"$mode flate=$flate")
    }
  }

  test("literal-string /O /U (the form real writers emit) parse byte-exactly") {
    for (mode <- modes) {
      val enc = Pdfs.pdfText(
        Pdfs.buildPdfEncrypted(pages, flate = true, mode, literalOU = true))
      val plain = Pdfs.pdfText(Pdfs.buildPdfWithText(pages, flate = true))
      assert(enc != null && enc.toSeq == plain.toSeq, mode)
    }
  }

  test("pdf_meta and pdf_revisions read encrypted documents") {
    for (mode <- modes) {
      val m = Pdfs.pdfMeta(Pdfs.buildPdfEncrypted(pages, flate = false, mode))
      assert(m != null && m._3 == 3, s"$mode: $m")
      assert(Pdfs.pdfRevisions(
        Pdfs.buildPdfEncrypted(pages, flate = false, mode)) == 1, mode)
    }
  }

  test("/EncryptMetadata false (R4) derives with the 0xFFFFFFFF suffix") {
    // the unencrypted-XMP form common in the wild: Algorithm 2 appends
    // 0xFFFFFFFF to the MD5 input (§7.6.3.3 step f) — skipping it derives
    // the wrong key and mis-quarantines an openable document
    val enc = Pdfs.pdfText(Pdfs.buildPdfEncrypted(pages, flate = true,
      "aes-128", encryptMetadata = false))
    val plain = Pdfs.pdfText(Pdfs.buildPdfWithText(pages, flate = true))
    assert(enc != null, "EncryptMetadata=false doc quarantined")
    assert(enc.toSeq == plain.toSeq)
    // and R2/R3 ignore the flag entirely (it is an R4 input)
    val r3 = Pdfs.pdfText(Pdfs.buildPdfEncrypted(pages, flate = false,
      "rc4-128", encryptMetadata = false))
    assert(r3 != null && r3.toSeq == Pdfs.pdfText(
      Pdfs.buildPdfWithText(pages, flate = false)).toSeq)
  }

  test("a real user password quarantines the whole document") {
    for (mode <- modes) {
      val b = Pdfs.buildPdfEncrypted(pages, flate = false, mode,
        userPwd = "secret")
      assert(Pdfs.pdfText(b) == null, s"$mode: password-protected extracted")
      assert(Pdfs.pdfMeta(b) == null, s"$mode: password-protected meta")
    }
  }

  test("a tampered /U fails validation and quarantines") {
    val b = Pdfs.buildPdfEncrypted(pages, flate = false, "rc4-128")
    val s = new String(b, Ascii)
    val uAt = s.indexOf("/U <")
    assert(uAt > 0)
    val bad = b.clone()
    // flip a hex digit inside the /U value
    bad(uAt + 5) = (if (b(uAt + 5) == '0') '1' else '0').toByte
    assert(Pdfs.pdfText(bad) == null)
  }

  test("a tampered V5 /U hash fails Algorithm-11 validation and quarantines") {
    val b = Pdfs.buildPdfEncrypted(pages, flate = false, "aes-256")
    val s = new String(b, Ascii)
    val uAt = s.indexOf("/U <")
    assert(uAt > 0)
    val bad = b.clone()
    bad(uAt + 5) = (if (b(uAt + 5) == '0') '1' else '0').toByte
    assert(Pdfs.pdfText(bad) == null)
    // and a truncated /UE cannot unwrap a key
    val ueAt = s.indexOf("/UE <")
    assert(ueAt > 0)
    val short = b.clone()
    short(ueAt + 6) = 'z' // not hex: the string value routes to null
    assert(Pdfs.pdfText(short) == null)
  }

  test("an unsupported /V routes to quarantine, not misdecryption") {
    val b = Pdfs.buildPdfEncrypted(pages, flate = false, "rc4-128")
    val s = new String(b, Ascii)
    val vAt = s.indexOf("/V 2")
    assert(vAt > 0)
    val v5 = b.clone()
    v5(vAt + 3) = '5' // same byte length: offsets stay valid
    assert(Pdfs.pdfText(v5) == null)
    assert(Pdfs.pdfMeta(v5) == null)
  }

  test("crypto primitives round-trip and reject malformed ciphertext") {
    val key = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
    val data = Array.tabulate[Byte](137)(i => (i * 31 + 5).toByte)
    assert(PdfCrypto.rc4(key, PdfCrypto.rc4(key, data)).toSeq == data.toSeq)
    val iv = Array.tabulate[Byte](16)(i => (i * 13).toByte)
    val ct = PdfCrypto.aesEncrypt(key, iv, data)
    assert(PdfCrypto.aesDecrypt(key, ct).toSeq == data.toSeq)
    assert(PdfCrypto.aesDecrypt(key, ct.take(17)) == null) // not block-aligned
    assert(PdfCrypto.aesDecrypt(key, ct.take(16)) == null) // IV only
    val garbled = ct.clone()
    garbled(ct.length - 1) = (garbled(ct.length - 1) ^ 0x55).toByte
    // bad PKCS#5 padding must null-route, not throw
    PdfCrypto.aesDecrypt(key, garbled)
  }

  test("truncation and byte-flip fuzz never throws on encrypted fixtures") {
    val seeds = modes.map(m => Pdfs.buildPdfEncrypted(pages, flate = true, m))
    for (b <- seeds) {
      for (n <- 0 to b.length by 7) Pdfs.pdfText(b.take(n))
      val rnd = new scala.util.Random(0xE2C4L)
      for (_ <- 1 to 150) {
        val x = b.clone()
        val at = rnd.nextInt(x.length)
        x(at) = (x(at) ^ (1 + rnd.nextInt(255))).toByte
        Pdfs.pdfText(x)
        Pdfs.pdfMeta(x)
      }
    }
  }
}
