package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pdfs

/** Content-stream operator replay, pinned on spec-legal shapes the
  * fixture builders never emit — the exact forms the round-9 self-review
  * flagged (a non-TJ array operand leaking into later text) plus hex
  * strings, the star and Tm line moves, the apostrophe/quote
  * show-with-newline operators, inline dicts, and comments. */
class PdfTextOpsSpec extends AnyFunSuite {

  private def ops(s: String): String =
    Pdfs.extractTextForTest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("a non-TJ array operand is consumed, not left to swallow text") {
    // the pre-fix bug: `[2 4] 0 d` left the array live, so (Hello) was
    // captured into it and Tj showed nothing
    assert(ops("[2 4] 0 d BT /F1 12 Tf 72 720 Td (Hello) Tj ET") == "Hello")
    // and positioning still works afterwards (operands not diverted)
    assert(ops("[1] 0 d BT (a) Tj 0 -14 TD (b) Tj ET") == "a\nb")
  }

  test("hex strings, ' and \" operators, T* and Tm line moves") {
    assert(ops("BT <48656C6C6F> Tj ET") == "Hello")
    assert(ops("BT (one) Tj (two) ' ET") == "one\ntwo")
    assert(ops("BT (one) Tj 2 3 (two) \" ET") == "one\ntwo")
    assert(ops("BT (a) Tj T* (b) Tj ET") == "a\nb")
    assert(ops("BT 1 0 0 1 72 720 Tm (a) Tj 1 0 0 1 72 700 Tm (b) Tj ET")
      == "a\nb")
    // same-y Tm does not break the line
    assert(ops("BT 1 0 0 1 72 720 Tm (a) Tj 1 0 0 1 144 720 Tm (b) Tj ET")
      == "ab")
  }

  test("TJ kern threshold, inline dictionaries, comments, odd hex") {
    assert(ops("BT [(a) -600 (b)] TJ ET") == "a b")
    assert(ops("BT [(a) -100 (b)] TJ ET") == "ab")
    assert(ops("BT /P << /MCID 0 >> BDC (x) Tj EMC ET") == "x")
    assert(ops("BT % a comment (not text)\n(y) Tj ET") == "y")
    assert(ops("BT <484> Tj ET") == "H@") // odd final digit pads with 0
  }

  test("zero-ty Td stays on the same line; escapes decode") {
    assert(ops("BT (a) Tj 10 0 Td (b) Tj ET") == "ab")
    assert(ops("BT (par\\(en\\) and \\\\slash \\012nl) Tj ET")
      == "par(en) and \\slash \nnl")
  }
}
