package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Archives

/** ZIP/TAR archive walks: central-directory-driven ZIP parse with CRC
  * verification and payload withholding on mismatch; checksum-verified
  * ustar walk with directory entries and 512-block rounding; fuzz never
  * throws. */
class ArchiveSpec extends AnyFunSuite {

  private val zipEntries = Seq(
    ("a.txt", "stored payload".getBytes, false),
    ("dir/b.bin", Array.tabulate[Byte](5000)(i => (i % 251).toByte), true),
    ("empty", Array.emptyByteArray, false))

  test("ZIP build → parse round-trips store and deflate entries") {
    val es = Archives.zipEntries(Archives.buildZip(zipEntries))
    assert(es != null && es.length == 3)
    assert(es.map(_._1).toSeq == Seq("a.txt", "dir/b.bin", "empty"))
    assert(es.map(_._2).toSeq == Seq(0, 8, 0))
    assert(es.forall(_._4), "all CRCs verify")
    for ((e, src) <- es.zip(zipEntries))
      assert(java.util.Arrays.equals(e._5, src._2))
    assert(es(1)._3 == 5000L)
  }

  test("ZIP64 layout parses identically to classic") {
    val classic = Archives.zipEntries(Archives.buildZip(zipEntries))
    val z64 = Archives.zipEntries(Archives.buildZip64(zipEntries))
    assert(z64 != null && z64.length == classic.length)
    for ((a, b) <- z64.zip(classic)) {
      assert(a._1 == b._1 && a._2 == b._2 && a._3 == b._3 && a._4 == b._4)
      assert(java.util.Arrays.equals(a._5, b._5))
    }
  }

  test("ZIP64 sentinel EOCD without its locator routes to null") {
    val zip = Archives.buildZip64(zipEntries)
    // surgically break the locator signature: the sentinel EOCD then has
    // nowhere to defer to — a structural break, not a guess
    var i = zip.length - 22 - 20
    assert((zip(i) & 0xff) == 0x50 && (zip(i + 2) & 0xff) == 0x06)
    val broken = zip.clone()
    broken(i + 2) = 0x7f.toByte
    assert(Archives.zipEntries(broken) == null)
  }

  test("ZIP64 truncation/mutation fuzz never throws") {
    val zip = Archives.buildZip64(zipEntries)
    var l = 0
    while (l < zip.length) {
      Archives.zipEntries(java.util.Arrays.copyOf(zip, l)); l += 7
    }
    var i = 0
    while (i < zip.length) {
      val m = zip.clone(); m(i) = (m(i) ^ 0x55).toByte
      Archives.zipEntries(m); i += 11
    }
    succeed
  }

  test("corrupted ZIP data keeps accounting, withholds the payload") {
    val zip = Archives.buildZip(zipEntries)
    // a.txt's data starts at 30 + len("a.txt") = 35
    val bad = zip.clone(); bad(35) = (bad(35) ^ 1).toByte
    val es = Archives.zipEntries(bad)
    assert(es != null && es.length == 3)
    assert(!es(0)._4 && es(0)._5 == null) // never wrong bytes downstream
    assert(es(1)._4 && es(2)._4) // other entries unaffected
    // no EOCD at all -> null
    assert(Archives.zipEntries("PK but not really a zip".getBytes) == null)
    assert(Archives.zipEntries(null) == null)
  }

  test("TAR build → parse round-trips files, dirs, and block rounding") {
    val tar = Archives.buildTar(Seq(
      ("d/", "5", Array.emptyByteArray),
      ("d/one.txt", "0", "exactly512".getBytes ++ new Array[Byte](502)),
      ("d/two.txt", "0", "x".getBytes)))
    val es = Archives.tarEntries(tar)
    assert(es != null && es.length == 3)
    assert(es.map(_._1).toSeq == Seq("d/", "d/one.txt", "d/two.txt"))
    assert(es.map(_._2).toSeq == Seq("5", "0", "0"))
    assert(es.map(_._3).toSeq == Seq(0L, 512L, 1L))
    assert(new String(es(2)._4) == "x")
  }

  test("GNU longname, PAX path/size, and the ustar prefix all resolve") {
    val longName = "deep/" + ("d" * 30 + "/") * 4 + "leaf-very-long-name.txt"
    assert(longName.length > 100)
    val data = "long payload".getBytes

    // GNU 'L': a meta entry carrying the NEXT entry's full name
    val gnu = Archives.buildTar(Seq(
      ("././@LongLink", "L", (longName + "\u0000").getBytes),
      (longName.take(100), "0", data)))
    val ge = Archives.tarEntries(gnu)
    assert(ge != null && ge.length == 1)
    assert(ge(0)._1 == longName && java.util.Arrays.equals(ge(0)._4, data))

    // PAX 'x': "<len> key=value\n" records; path overrides, size carries
    def paxRecord(kv: String): String = {
      var len = kv.length + 3 // "<len> " + kv + "\n"
      while (s"$len $kv\n".length != len) len = s"$len $kv\n".length
      s"$len $kv\n"
    }
    val paxBody = (paxRecord(s"path=$longName") +
      paxRecord("size=" + data.length) +
      paxRecord("mtime=1700000000.5")).getBytes
    val pax = Archives.buildTar(Seq(
      ("pax-header", "x", paxBody),
      ("stub", "0", data)))
    val pe = Archives.tarEntries(pax)
    assert(pe != null && pe.length == 1)
    assert(pe(0)._1 == longName && pe(0)._3 == data.length.toLong)

    // POSIX ustar prefix: 155 bytes at offset 345 prepend to the name
    val base = Archives.buildTar(Seq(("leaf.txt", "0", data)))
    val prefixed = base.clone()
    val pfx = "some/deep/prefix".getBytes
    System.arraycopy(pfx, 0, prefixed, 345, pfx.length)
    // recompute the header checksum the way buildTar writes it
    java.util.Arrays.fill(prefixed, 148, 156, 0x20.toByte)
    var sum = 0L
    for (j <- 0 until 512) sum += prefixed(j) & 0xff
    val cs = java.lang.Long.toOctalString(sum)
    val pad = "0" * (6 - cs.length) + cs
    System.arraycopy(pad.getBytes, 0, prefixed, 148, 6)
    prefixed(154) = 0; prefixed(155) = ' '
    val xe = Archives.tarEntries(prefixed)
    assert(xe != null && xe.length == 1)
    assert(xe(0)._1 == "some/deep/prefix/leaf.txt")
  }

  test("PAX record lengths are BYTE counts; non-ASCII paths stay aligned") {
    // record lengths count UTF-8 bytes — applying them to a decoded
    // string misaligns every record after a non-ASCII path
    val uniPath = "données/déjà-vu.txt"
    def paxRecordBytes(kv: String): Array[Byte] = {
      val kvB = kv.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var len = kvB.length + 3
      while (s"$len ".getBytes.length + kvB.length + 1 != len)
        len = s"$len ".getBytes.length + kvB.length + 1
      (s"$len ".getBytes.toSeq ++ kvB.toSeq :+ '\n'.toByte).toArray
    }
    val data = "payload".getBytes
    val body = paxRecordBytes(s"path=$uniPath") ++
      paxRecordBytes("size=" + data.length) ++
      paxRecordBytes("atime=1700000000")
    val tar = Archives.buildTar(Seq(
      ("pax", "x", body), ("stub", "0", data)))
    val es = Archives.tarEntries(tar)
    assert(es != null && es.length == 1)
    assert(es(0)._1 == uniPath && es(0)._3 == data.length.toLong)
  }

  test("a PAX size record governs the payload slice, and a forged one nulls") {
    def paxRecord(kv: String): String = {
      var len = kv.length + 3
      while (s"$len $kv\n".length != len) len = s"$len $kv\n".length
      s"$len $kv\n"
    }
    // pax size smaller than the header field: the EMITTED payload honors
    // it (POSIX: the extended record is authoritative)
    val blob = Array.tabulate[Byte](512)(i => (i % 97).toByte)
    val tar = Archives.buildTar(Seq(
      ("pax", "x", paxRecord("size=12").getBytes),
      ("stub", "0", blob)))
    val es = Archives.tarEntries(tar)
    assert(es != null && es.length == 1)
    assert(es(0)._3 == 12L && es(0)._4.length == 12)
    assert(java.util.Arrays.equals(es(0)._4, blob.take(12)))
    // a forged astronomical size hits the same 2^28 cap as header sizes
    val forged = Archives.buildTar(Seq(
      ("pax", "x", paxRecord("size=999999999999999").getBytes),
      ("stub", "0", "x".getBytes)))
    assert(Archives.tarEntries(forged) == null)
  }

  test("a PAX record whose length <= its digit prefix routes to null") {
    // '1 x': recLen=1 but the length token + space already spans 2 bytes,
    // so the record body length would be NEGATIVE — this exact payload
    // threw StringIndexOutOfBoundsException before the guard
    for (body <- Seq("1 x", "2 x", "3 a=b", "1 ", "2  ")) {
      val tar = Archives.buildTar(Seq(
        ("pax", "x", body.getBytes), ("stub", "0", "d".getBytes)))
      assert(Archives.tarEntries(tar) == null, s"body '$body'")
    }
  }

  test("a bad TAR header checksum routes the whole parse to null") {
    val tar = Archives.buildTar(Seq(("f", "0", "hello".getBytes)))
    val bad = tar.clone(); bad(0) = 'g' // name change breaks the checksum
    assert(Archives.tarEntries(bad) == null)
    assert(Archives.tarEntries(new Array[Byte](1024)) == null) // only zeros
    assert(Archives.tarEntries(null) == null)
  }

  test("truncation and mutation fuzz never throw") {
    val zip = Archives.buildZip(zipEntries)
    val tar = Archives.buildTar(Seq(("a", "0", "abc".getBytes),
      ("b", "0", new Array[Byte](700))))
    for (n <- 0 to zip.length) Archives.zipEntries(zip.take(n))
    for (n <- 0 to tar.length) Archives.tarEntries(tar.take(n))
    val rnd = new scala.util.Random(0xA2C11L)
    for (_ <- 1 to 300) {
      val z = zip.clone()
      z(rnd.nextInt(z.length)) = rnd.nextInt(256).toByte
      Archives.zipEntries(z)
      val t = tar.clone()
      t(rnd.nextInt(t.length)) = rnd.nextInt(256).toByte
      Archives.tarEntries(t)
    }
  }
}
