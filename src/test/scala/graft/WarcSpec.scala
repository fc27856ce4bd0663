package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Warc

/** WARC framing: build→parse round-trips plain and member-gzipped
  * streams identically, declared-length framing is authoritative (one
  * corrupt length poisons the parse), and malformed input routes to
  * null, never throws. */
class WarcSpec extends AnyFunSuite {

  private val recs = Seq(
    ("warcinfo", null: String, "2024-05-01T00:00:00Z", "software: test".getBytes),
    ("request", "http://a.example/x", "2024-05-01T00:00:01Z",
      "GET /x HTTP/1.1".getBytes),
    ("response", "http://a.example/x", "2024-05-01T00:00:01Z",
      "<html>hi\r\n\r\nthere</html>".getBytes)) // CRLFs INSIDE a payload

  test("plain and member-gzipped archives parse identically") {
    val plain = Warc.parse(Warc.build(recs))
    val gz = Warc.parse(Warc.buildGz(recs))
    assert(plain != null && gz != null && plain.length == 3)
    for ((a, b) <- plain.zip(gz)) {
      assert(a._1 == b._1 && a._2 == b._2 && a._3 == b._3 && a._4 == b._4)
      assert(java.util.Arrays.equals(a._5, b._5))
    }
    assert(plain.map(_._1).toSeq == Seq("warcinfo", "request", "response"))
    assert(plain(0)._2 == null && plain(1)._2 == "http://a.example/x")
    // the payload with embedded CRLF CRLF comes back byte-exact: framing
    // is by declared length, not by scanning for separators
    assert(java.util.Arrays.equals(plain(2)._5, recs(2)._4))
  }

  test("unknown headers are tolerated; missing length poisons the parse") {
    val ok = new String(Warc.build(recs.take(1)))
      .replace("WARC-Record-ID", "X-Custom-Header")
    assert(Warc.parse(ok.getBytes) != null)
    val noLen = new String(Warc.build(recs.take(1)))
      .replace("Content-Length", "Content-Hidden")
    assert(Warc.parse(noLen.getBytes) == null)
    val badLen = new String(Warc.build(recs.take(1)))
      .replace("Content-Length: 14", "Content-Length: 9999")
    assert(Warc.parse(badLen.getBytes) == null) // overruns the buffer
  }

  test("CDX index: every extent slices back out and re-parses alone") {
    def md5(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"$x%02x").mkString
    for (archive <- Seq(Warc.build(recs), Warc.buildGz(recs))) {
      val idx = Warc.index(archive)
      assert(idx != null && idx.length == 3)
      assert(idx.map(_._1).toSeq == Seq("warcinfo", "request", "response"))
      // extents tile the archive: start at 0, end at the last byte
      assert(idx.head._4 == 0L)
      assert(idx.sliding(2).forall { case Array(a, b) => a._4 + a._5 == b._4 })
      assert(idx.last._4 + idx.last._5 == archive.length.toLong)
      for (((_, _, _, off, len, dig), k) <- idx.zipWithIndex) {
        val slice = java.util.Arrays.copyOfRange(
          archive, off.toInt, (off + len).toInt)
        val re = Warc.parse(slice)
        assert(re != null && re.length == 1, s"record $k")
        assert(md5(re(0)._5) == dig, s"record $k digest")
        assert(java.util.Arrays.equals(re(0)._5, recs(k)._4))
      }
    }
  }

  test("CDX index honesty: truncated members and junk route to null") {
    val gz = Warc.buildGz(recs)
    assert(Warc.index(gz.dropRight(1)) == null) // trailer cut
    assert(Warc.index(gz.take(12)) == null)     // mid-header
    val junkTail = gz ++ Array[Byte](0x1f, 0x00) // second "member" junk
    assert(Warc.index(junkTail) == null)
    assert(Warc.index(null) == null)
    assert(Warc.index("WARC/1.0\nnope".getBytes) == null)
    val plain = Warc.build(recs)
    for (n <- 0 to plain.length) Warc.index(plain.take(n))
    for (n <- 0 to gz.length) Warc.index(gz.take(n))
  }

  test("malformed input routes to null, never throws") {
    assert(Warc.parse(null) == null)
    assert(Warc.parse(Array.emptyByteArray) == null)
    assert(Warc.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes) == null)
    // bare-LF line endings are not WARC framing
    assert(Warc.parse("WARC/1.0\nWARC-Type: x\nContent-Length: 0\n\n".getBytes) == null)
    val good = Warc.build(recs)
    for (n <- 0 to good.length) Warc.parse(good.take(n))
    val gz = Warc.buildGz(recs)
    for (n <- 0 to gz.length) Warc.parse(gz.take(n))
    val rnd = new scala.util.Random(0x3a5cL)
    for (_ <- 1 to 300) {
      val b = good.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 + rnd.nextInt(255))).toByte
      Warc.parse(b)
      val g = gz.clone()
      val at2 = rnd.nextInt(g.length)
      g(at2) = (g(at2) ^ (1 + rnd.nextInt(255))).toByte
      Warc.parse(g)
    }
  }
}
