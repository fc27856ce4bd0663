package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Xz

/** The from-scratch XZ/LZMA decoder against the real world: system
  * `xz` output at several presets must decode here byte-identically
  * (that covers MATCH/rep decoding, which the subset encoder never
  * emits), our subset frames must decode under the system `xz`, and
  * the quarantine arms (truncation, payload flip caught by the block
  * check, header flip caught by the header CRC, not-xz) must
  * null-route — the Bzip2Spec posture, one format over. */
class XzSpec extends AnyFunSuite {

  private def sysXz: Option[String] =
    Seq("/root/miniconda/bin/xz", "/usr/bin/xz", "/usr/local/bin/xz")
      .find(p => new java.io.File(p).canExecute)

  // repetitive enough that xz emits real matches and reps
  private def corpus: Array[Byte] =
    (1 to 400).map(i => s"line $i of the corpus, the corpus of line $i\n")
      .mkString.getBytes("UTF-8")

  test("roundtrip: literal-LZMA subset encoder") {
    val data = corpus
    val enc = Xz.encode(data, literalLzma = true, chunkSize = 1 << 12)
    assert(java.util.Arrays.equals(Xz.decode(enc), data))
  }

  test("roundtrip: uncompressed-chunk subset encoder") {
    val data = corpus
    val enc = Xz.encode(data, literalLzma = false, chunkSize = 1 << 12)
    assert(java.util.Arrays.equals(Xz.decode(enc), data))
  }

  test("empty input roundtrips") {
    assert(Xz.decode(Xz.encode(Array[Byte]())).length == 0)
  }

  test("greedy-match subset encoder roundtrips (real matches + matched literals)") {
    // highly repetitive → long matches; the tail salt → matched-literal
    // paths right after matches
    val data = ((1 to 60).map(i => s"repeat segment $i tail" + (i % 3))
      .mkString + ("abcd" * 200)).getBytes("UTF-8")
    val enc = Xz.encode(data, chunkSize = 1 << 12, greedyMatch = true)
    assert(java.util.Arrays.equals(Xz.decode(enc), data))
    // matches must actually compress: far below the literal-only form
    val lit = Xz.encode(data, literalLzma = true, chunkSize = 1 << 12)
    assert(enc.length < lit.length / 2,
      s"greedy encoder did not emit matches (${enc.length} vs ${lit.length})")
  }

  test("system xz decodes our greedy-match frames") {
    sysXz match {
      case None => cancel("no system xz binary")
      case Some(xz) =>
        val data = corpus ++ corpus // cross-copy repeats
        val dir = Files.createTempDirectory("xz_match").toFile
        val f = new java.io.File(dir, "m.xz")
        Files.write(f.toPath, Xz.encode(data, greedyMatch = true))
        val rc = new ProcessBuilder(xz, "-d", "-q", f.getAbsolutePath)
          .start().waitFor()
        assert(rc == 0, "system xz rejected our match frame")
        assert(java.util.Arrays.equals(
          Files.readAllBytes(new java.io.File(dir, "m").toPath), data))
    }
  }

  test("system xz output decodes here (presets 0, 6, 9e; checks crc32/crc64/sha256)") {
    sysXz match {
      case None => cancel("no system xz binary")
      case Some(xz) =>
        val arms = Seq(
          Seq("-0", "--check=crc32"),
          Seq("-6", "--check=crc64"),
          Seq("-9e", "--check=sha256"))
        for (args <- arms) {
          val dir = Files.createTempDirectory("xz_in").toFile
          val raw = new java.io.File(dir, "in.txt")
          Files.write(raw.toPath, corpus)
          val cmd = Seq(xz, "-q", "-k") ++ args :+ raw.getAbsolutePath
          val rc = new ProcessBuilder(cmd: _*).start().waitFor()
          assert(rc == 0, s"system xz failed for $args")
          val enc = Files.readAllBytes(
            new java.io.File(dir, "in.txt.xz").toPath)
          assert(java.util.Arrays.equals(Xz.decode(enc), corpus),
            s"system xz $args bytes did not decode")
        }
    }
  }

  test("raw LZMA1 streams through Lzma1StreamReader with a ring " +
      "smaller than the output; truncation throws, never silence") {
    // ~640 KiB through a 128 KiB ring: drain + wraparound mechanics
    val data = (1 to 16000)
      .map(i => s"line $i of the long corpus body $i\n")
      .mkString.getBytes("UTF-8")
    assert(data.length > (1 << 17) * 3)
    val (propsByte, packed) = Xz.lzmaRawEncodeLiterals(data)
    def props(dict: Int) = Array[Byte](propsByte.toByte,
      (dict & 0xFF).toByte, ((dict >> 8) & 0xFF).toByte,
      ((dict >> 16) & 0xFF).toByte, ((dict >> 24) & 0xFF).toByte)
    def decodeAll(bytes: Array[Byte]): Array[Byte] = {
      val rd = new Xz.Lzma1StreamReader(
        new java.io.ByteArrayInputStream(bytes), props(1 << 16),
        1 << 16, data.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      var c = rd.nextChunk()
      while (c != null) { out.write(c, 0, c.length); c = rd.nextChunk() }
      assert(rd.finished && rd.unpacked == data.length.toLong)
      out.toByteArray
    }
    assert(java.util.Arrays.equals(decodeAll(packed), data))
    intercept[java.io.IOException] {
      decodeAll(packed.dropRight(packed.length / 2))
    }
  }

  test("system xz --format=lzma output streams through " +
      "Lzma1StreamReader (real matches, dict window smaller than output)") {
    sysXz match {
      case None => cancel("no system xz binary")
      case Some(xz) =>
        // ~1 MiB repetitive text; preset 0 declares a 256 KiB dict →
        // the ring wraps and real match/rep paths run at distance
        val data = (1 to 12000)
          .map(i => s"row $i of the corpus, the corpus of row ${i % 97}\n")
          .mkString.getBytes("UTF-8")
        val dir = Files.createTempDirectory("lzma1_sys").toFile
        val raw = new java.io.File(dir, "in.txt")
        Files.write(raw.toPath, data)
        val rc = new ProcessBuilder(xz, "-q", "-k", "--format=lzma", "-0",
          raw.getAbsolutePath).start().waitFor()
        assert(rc == 0, "system xz --format=lzma failed")
        val enc = Files.readAllBytes(
          new java.io.File(dir, "in.txt.lzma").toPath)
        // .lzma header: 5 props bytes + LE64 uncompressed size
        val props = java.util.Arrays.copyOf(enc, 5)
        var declared = 0L
        (0 until 8).foreach(i => declared |= (enc(5 + i) & 0xFFL) << (8 * i))
        // xz writes the .lzma size field as -1 (unknown) and relies on
        // the end marker; 7z headers always carry the size, so decode
        // to the known length — the marker is simply never consumed
        assert(declared == -1L || declared == data.length.toLong,
          s"declared $declared")
        val size = data.length.toLong
        val dict = Xz.lzma1DictSize(props)
        assert(dict < data.length, "preset 0 dict must be < output")
        val rd = new Xz.Lzma1StreamReader(
          new java.io.ByteArrayInputStream(enc, 13, enc.length - 13),
          props, math.min(dict, size).toInt, size)
        val out = new java.io.ByteArrayOutputStream()
        var c = rd.nextChunk()
        while (c != null) { out.write(c, 0, c.length); c = rd.nextChunk() }
        assert(rd.finished)
        assert(java.util.Arrays.equals(out.toByteArray, data),
          "system-encoded LZMA1 did not stream-decode byte-identically")
    }
  }

  test("our subset frames decode under system xz") {
    sysXz match {
      case None => cancel("no system xz binary")
      case Some(xz) =>
        for (lit <- Seq(true, false)) {
          val dir = Files.createTempDirectory("xz_out").toFile
          val f = new java.io.File(dir, s"out_$lit.xz")
          Files.write(f.toPath, Xz.encode(corpus, literalLzma = lit))
          val rc = new ProcessBuilder(xz, "-d", "-q", f.getAbsolutePath)
            .start().waitFor()
          assert(rc == 0, s"system xz rejected our frame (literal=$lit)")
          assert(java.util.Arrays.equals(
            Files.readAllBytes(
              new java.io.File(dir, s"out_$lit").toPath), corpus))
        }
    }
  }

  test("system xz multi-block files decode (index with several records)") {
    sysXz match {
      case None => cancel("no system xz binary")
      case Some(xz) =>
        val dir = Files.createTempDirectory("xz_blocks").toFile
        val raw = new java.io.File(dir, "in.txt")
        Files.write(raw.toPath, corpus)
        val rc = new ProcessBuilder(xz, "-q", "-k", "--block-size=4KiB",
          raw.getAbsolutePath).start().waitFor()
        assert(rc == 0)
        val enc = Files.readAllBytes(
          new java.io.File(dir, "in.txt.xz").toPath)
        assert(java.util.Arrays.equals(Xz.decode(enc), corpus),
          "multi-block xz did not decode")
    }
  }

  test("concatenated streams decode whole (with stream padding)") {
    val a = Xz.encode("first part ".getBytes)
    val b = Xz.encode("second part".getBytes)
    val pad = new Array[Byte](4)
    assert(new String(Xz.decode(a ++ b)) == "first part second part")
    assert(new String(Xz.decode(a ++ pad ++ b)) == "first part second part")
  }

  // E8/E9-rich bytes so the BCJ branch converter genuinely rewrites
  // displacements (pure ASCII never triggers it)
  private def codeish: Array[Byte] = {
    val rnd = new scala.util.Random(0xB4A)
    Array.tabulate[Byte](4096) { i =>
      if (i % 11 == 0) 0xE8.toByte
      else if (i % 13 == 0) 0xE9.toByte
      else if (i % 7 == 0) 0x00
      else rnd.nextInt(256).toByte
    }
  }

  test("delta and x86 prefilter chains roundtrip through our encoder") {
    for ((pf, payload) <- Seq(
        ((0x03, Array[Byte](3)), corpus), // delta dist=4
        ((0x04, Array.empty[Byte]), codeish))) {
      val enc = Xz.encode(payload, literalLzma = true, prefilter = Some(pf))
      assert(java.util.Arrays.equals(Xz.decode(enc), payload),
        s"prefilter ${pf._1} roundtrip")
    }
  }

  test("system xz --delta / --x86 chains decode here; ours decode there") {
    sysXz match {
      case None => cancel("no system xz binary")
      case Some(xz) =>
        val arms = Seq(
          ("--delta=dist=4", corpus),
          ("--x86", codeish))
        for ((flt, payload) <- arms) {
          val dir = Files.createTempDirectory("xz_flt").toFile
          val raw = new java.io.File(dir, "in.bin")
          Files.write(raw.toPath, payload)
          val rc = new ProcessBuilder(xz, "-q", "-k", flt,
            "--lzma2=preset=4", raw.getAbsolutePath).start().waitFor()
          assert(rc == 0, s"system xz failed for $flt")
          val enc = Files.readAllBytes(
            new java.io.File(dir, "in.bin.xz").toPath)
          assert(java.util.Arrays.equals(Xz.decode(enc), payload),
            s"system xz $flt bytes did not decode")
        }
        // and the reverse direction for both of our prefiltered frames
        for ((pf, payload, tag) <- Seq(
            ((0x03, Array[Byte](3)), corpus, "delta"),
            ((0x04, Array.empty[Byte]), codeish, "x86"))) {
          val dir = Files.createTempDirectory("xz_flt_out").toFile
          val f = new java.io.File(dir, s"$tag.xz")
          Files.write(f.toPath,
            Xz.encode(payload, literalLzma = true, prefilter = Some(pf)))
          val rc = new ProcessBuilder(xz, "-d", "-q", f.getAbsolutePath)
            .start().waitFor()
          assert(rc == 0, s"system xz rejected our $tag frame")
          assert(java.util.Arrays.equals(
            Files.readAllBytes(new java.io.File(dir, tag).toPath), payload))
        }
    }
  }

  test("multi-block delta chains respect the GLOBAL 256 MiB bound, not per block") {
    sysXz match {
      case None => cancel("no system xz binary")
      case Some(xz) =>
        // 3 delta-filtered blocks of 96 MiB each: every BLOCK is inside
        // the bound, the FILE inflates to 288 MiB. The prefiltered path
        // decodes each block into a fresh buffer, so a per-block-only
        // check would admit the lot — the bound must be global across
        // blocks, same as the plain-LZMA2 path.
        val dir = Files.createTempDirectory("xz_bound").toFile
        val raw = new java.io.File(dir, "in.bin")
        val zeros = new Array[Byte](96 * 1024 * 1024)
        val os = new java.io.FileOutputStream(raw)
        try { var i = 0; while (i < 3) { os.write(zeros); i += 1 } }
        finally os.close()
        val rc = new ProcessBuilder(xz, "-q", "-k", "--delta=dist=1",
          "--lzma2=preset=0", "--block-size=100663296",
          raw.getAbsolutePath).start().waitFor()
        assert(rc == 0, "system xz failed to build the multi-block file")
        val enc = Files.readAllBytes(new java.io.File(dir, "in.bin.xz").toPath)
        assert(Xz.decode(enc) == null,
          "a 288 MiB multi-block delta file must null-route at the row bound")
        raw.delete()
        new java.io.File(dir, "in.bin.xz").delete()
    }
  }

  test("quarantine arms: truncation, payload flip, header flip, not-xz") {
    val enc = Xz.encode(corpus)
    assert(Xz.decode(enc.dropRight(7)) == null, "truncation")
    val flip = enc.clone()
    flip(40) = (flip(40) ^ 0x55).toByte // inside LZMA2 payload → check fails
    assert(Xz.decode(flip) == null, "payload flip")
    val hdr = enc.clone()
    hdr(7) = (hdr(7) ^ 0x01).toByte // stream flags → header CRC fails
    assert(Xz.decode(hdr) == null, "header flip")
    assert(Xz.decode("certainly not xz".getBytes) == null)
    assert(Xz.decode(Array[Byte]()) == null)
  }
}
