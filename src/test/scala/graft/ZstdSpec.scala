package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Zstandard

/** Zstandard decode against the REAL world: two-way interop with the
  * system `zstd` binary (their bytes decode here; our bytes decode
  * there), multi-frame concatenations decoding whole, and the
  * quarantine arms (truncation, checksum flip, not-zstd, inflate
  * bound). The binding is the zstd-jni Spark bundles — the spec's job
  * is pinning OUR decode contract around it. */
class ZstdSpec extends AnyFunSuite {

  private def sysZstd: Option[String] =
    Seq("/root/miniconda/bin/zstd", "/usr/bin/zstd", "/usr/local/bin/zstd")
      .find(p => new java.io.File(p).canExecute)

  test("roundtrip through our encode/decode") {
    val data = ("the quick brown fox, " * 100).getBytes("UTF-8")
    val enc = Zstandard.encode(data)
    assert(java.util.Arrays.equals(Zstandard.decode(enc), data))
  }

  test("system zstd output decodes here (both levels)") {
    sysZstd match {
      case None => cancel("no system zstd binary")
      case Some(z) =>
        for (lvl <- Seq("-1", "-19")) {
          val dir = Files.createTempDirectory("zstd_in").toFile
          val raw = new java.io.File(dir, "in.txt")
          val data = ("interop payload line\n" * 500).getBytes("UTF-8")
          Files.write(raw.toPath, data)
          val rc = new ProcessBuilder(z, lvl, "-q", raw.getAbsolutePath)
            .start().waitFor()
          assert(rc == 0)
          val enc = Files.readAllBytes(
            new java.io.File(dir, "in.txt.zst").toPath)
          assert(java.util.Arrays.equals(Zstandard.decode(enc), data),
            s"system zstd $lvl bytes did not decode")
        }
    }
  }

  test("our encode decodes under system zstd") {
    sysZstd match {
      case None => cancel("no system zstd binary")
      case Some(z) =>
        val dir = Files.createTempDirectory("zstd_out").toFile
        val data = ("round the other way\n" * 300).getBytes("UTF-8")
        val f = new java.io.File(dir, "out.zst")
        Files.write(f.toPath, Zstandard.encode(data))
        val rc = new ProcessBuilder(z, "-d", "-q", f.getAbsolutePath)
          .start().waitFor()
        assert(rc == 0, "system zstd rejected our frame")
        assert(java.util.Arrays.equals(
          Files.readAllBytes(new java.io.File(dir, "out").toPath), data))
    }
  }

  test("multi-frame concatenation decodes whole") {
    val a = "first frame ".getBytes
    val b = "second frame".getBytes
    val cat = Zstandard.encode(a) ++ Zstandard.encode(b)
    assert(new String(Zstandard.decode(cat)) == "first frame second frame")
  }

  test("a skippable frame between data frames is skipped (RFC 8878 §3.1.2)") {
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, // magic 0x184D2A50 LE
      4, 0, 0, 0, // 4 content bytes
      9, 9, 9, 9)
    val cat = Zstandard.encode("before ".getBytes) ++ skip ++
      Zstandard.encode("after".getBytes)
    assert(new String(Zstandard.decode(cat)) == "before after")
    // a LEADING skippable frame is admitted too — the `.warc.zst`
    // dictionary convention puts one at offset 0, and zstd's own
    // streaming decoder walks over it (admission matches frameExtents)
    val leading = skip ++ Zstandard.encode("payload".getBytes)
    assert(new String(Zstandard.decode(leading)) == "payload")
    // a payload that is ONLY skippable frames is a valid, EMPTY member
    assert(Zstandard.decode(skip).length == 0)
    // junk after the magic nibble still null-routes
    assert(Zstandard.decode(Array[Byte](0x50, 0x2A, 0x4D, 0x19, 0)) == null)
  }

  test("frame extents: sequential walk, skippables dropped, torn tail surfaces") {
    val f1 = Zstandard.encode("frame one".getBytes)
    val f2 = Zstandard.encode("frame two".getBytes)
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, 4, 0, 0, 0, 9, 9, 9, 9)
    val cat = f1 ++ skip ++ f2
    val exts = Zstandard.frameExtents(cat)
    assert(exts.toSeq == Seq(
      (0L, f1.length.toLong),
      ((f1.length + skip.length).toLong, f2.length.toLong)))
    // each extent decodes independently
    for (((off, len), want) <- exts.zip(Seq("frame one", "frame two")))
      assert(new String(Zstandard.decode(
        java.util.Arrays.copyOfRange(cat, off.toInt, (off + len).toInt)))
        == want)
    // torn tail: leading frames stay walkable, the tail is one
    // failing extent
    val torn = Zstandard.frameExtents(cat.dropRight(4))
    assert(torn.length == 2 && torn(0) == (0L, f1.length.toLong))
    assert(Zstandard.decode(java.util.Arrays.copyOfRange(
      cat.dropRight(4), torn(1)._1.toInt,
      (torn(1)._1 + torn(1)._2).toInt)) == null)
    assert(Zstandard.frameExtents("not zstd".getBytes) == null)
  }

  test("quarantine arms: truncation, flip, not-zstd") {
    val data = ("payload to protect " * 50).getBytes
    val enc = Zstandard.encode(data)
    assert(Zstandard.decode(enc.dropRight(5)) == null, "truncation")
    val flip = enc.clone()
    flip(flip.length / 2) = (flip(flip.length / 2) ^ 0x41).toByte
    assert(Zstandard.decode(flip) == null, "checksum flip")
    assert(Zstandard.decode("not zstd at all".getBytes) == null)
    assert(Zstandard.decode(Array[Byte]()) == null)
  }
}
