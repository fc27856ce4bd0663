package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.core.Assembly.Code

/** Chunker (T1/T2) and the assembly generation policy (G1/G2) — the eight
  * reference scenarios (test_download_data_file.py:166-513 semantics,
  * FIXTURES.md §1.2) plus seeded permutation/duplication identity properties.
  */
class ChunkerAssemblySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); rnd.nextBytes(b); b }

  private def chunksOf(content: Array[Byte], size: Int, mtime: Option[Double] = Some(100.0)) =
    Chunker.chunk("f.bin", "sub", content, size, Nil, mtime)

  /** Run chunks through the state machine in order; return final state+codes. */
  private def drive(cs: Seq[FileChunk]): (Option[Assembly.State], Seq[Int]) =
    cs.foldLeft((Option.empty[Assembly.State], Seq.empty[Int])) {
      case ((st, codes), c) =>
        val (next, code) = Assembly.step(st, c)
        (Some(next), codes :+ code)
    }

  private def completed(st: Option[Assembly.State]): Option[CompletedFile] =
    Assembly.finish("sub/f.bin", "f.bin", st.get)._2

  test("chunker: plan covers content exactly, hashes verify, power-of-two enforced") {
    val content = bytes(1000)
    val cs = chunksOf(content, 256)
    assert(cs.length == 4 && cs.map(_.chunkI) == Seq(1, 2, 3, 4))
    assert(cs.map(_.data.length) == Seq(256, 256, 256, 232))
    assert(cs.map(_.chunkOffsetWrite) == Seq(0L, 256L, 512L, 768L))
    cs.foreach(c => assert(c.chunkHash.toSeq == ChunkCodec.sha512(c.data).toSeq))
    assert(cs.head.fileHash.toSeq == ChunkCodec.sha512(content).toSeq)
    assert(cs.forall(_.nTotalChunks == 4))
    assertThrows[IllegalArgumentException](chunksOf(content, 100))
  }

  test("chunker: select_bytes compacts write offsets; file hash covers kept bytes") {
    val content = bytes(1024)
    val ranges = Seq((512L, 700L), (0L, 100L)) // unsorted on purpose
    val cs = Chunker.chunk("f.bin", "", content, 128, ranges, None)
    // sorted walk: [0,100) then [512,700) → sizes 100, 128, 60
    assert(cs.map(_.data.length) == Seq(100, 128, 60))
    assert(cs.map(_.chunkOffsetWrite) == Seq(0L, 100L, 228L))
    val kept = content.slice(0, 100) ++ content.slice(512, 700)
    assert(cs.head.fileHash.toSeq == ChunkCodec.sha512(kept).toSeq)
    assertThrows[IllegalArgumentException](
      Chunker.chunk("f", "", content, 128, Seq((0L, 200L), (100L, 300L)), None))
  }

  test("scenario 1: plain roundtrip — shuffled chunks complete and verify") {
    val content = bytes(5000)
    val cs = rnd.shuffle(chunksOf(content, 512))
    val (st, codes) = drive(cs)
    assert(codes.last == Code.InProgress) // completion is checked by finish()
    val Some(f) = completed(st)
    assert(f.data.toSeq == content.toSeq && f.nChunks == 10)
  }

  test("scenario 2: duplicate offsets of same generation are dropped (code 10)") {
    val content = bytes(1500)
    val cs = chunksOf(content, 512)
    val (st, codes) = drive(cs ++ cs)
    assert(codes.takeRight(3).forall(_ == Code.Duplicate))
    assert(completed(st).get.data.toSeq == content.toSeq)
  }

  test("scenario 3: higher n_total resets to new generation (code 11)") {
    val g1 = chunksOf(bytes(1000), 512)           // 2 chunks
    val big = bytes(2500)
    val g2 = chunksOf(big, 512)                   // 5 chunks
    val (st, codes) = drive(g1 ++ g2)
    assert(codes(g1.length) == Code.NewGeneration)
    assert(completed(st).get.data.toSeq == big.toSeq)
  }

  test("scenario 4: lower n_total is stale and dropped (code 10)") {
    val big = bytes(2500)
    val g2 = chunksOf(big, 512)
    val g1 = chunksOf(bytes(1000), 512)
    val (st, codes) = drive(g2 ++ g1)
    assert(codes.drop(g2.length).forall(_ == Code.Duplicate))
    assert(completed(st).get.data.toSeq == big.toSeq)
  }

  test("scenario 5: equal n, newer mtime adopts; older mtime dropped") {
    val a = bytes(1000); val b = bytes(1000)
    val ga = chunksOf(a, 512, Some(100.0))
    val gb = chunksOf(b, 512, Some(200.0))
    // newer arrives second → adopt
    val (st1, codes1) = drive(ga ++ gb)
    assert(codes1(ga.length) == Code.NewGeneration)
    assert(completed(st1).get.data.toSeq == b.toSeq)
    // newer arrives first → older dropped
    val (st2, codes2) = drive(gb ++ ga)
    assert(codes2.drop(gb.length).forall(_ == Code.Duplicate))
    assert(completed(st2).get.data.toSeq == b.toSeq)
  }

  test("scenario 6: equal n → deterministic winner regardless of arrival order") {
    val a = bytes(1000); val b = bytes(1000)
    // present mtime beats missing (total order: None < Some)
    val ga = chunksOf(a, 512, None)
    val gb = chunksOf(b, 512, Some(200.0))
    for (stream <- Seq(ga ++ gb, gb ++ ga)) {
      val (st, _) = drive(stream)
      assert(completed(st).get.data.toSeq == b.toSeq)
    }
    // both missing → unsigned-lex file_hash tiebreak, same winner either way
    val gb2 = chunksOf(b, 512, None)
    val lexWinner =
      if (java.util.Arrays.compareUnsigned(
        ga.head.fileHash, gb2.head.fileHash) > 0) a else b
    for (stream <- Seq(ga ++ gb2, gb2 ++ ga)) {
      val (st, _) = drive(stream)
      assert(completed(st).get.data.toSeq == lexWinner.toSeq)
    }
  }

  test("scenario 7: same hash, different n_total is corruption") {
    val cs = chunksOf(bytes(1000), 512)
    val corrupted = cs(1).copy(nTotalChunks = 3)
    assertThrows[Assembly.AssemblyCorruption](drive(Seq(cs(0), corrupted)))
  }

  test("scenario 8: whole-file hash mismatch yields code -1") {
    val cs = chunksOf(bytes(1000), 512)
    // swap payloads between the two chunks but keep chunk metadata: each chunk
    // still self-verifies at codec level is bypassed here; assembled content
    // differs from file_hash → -1
    val tampered = Seq(
      cs(0).copy(data = cs(0).data.map(b => (b ^ 1).toByte)),
      cs(1))
    val (st, _) = drive(tampered)
    val (code, out) = Assembly.finish("sub/f.bin", "f.bin", st.get)
    assert(code == Code.HashMismatch && out.isEmpty)
  }

  test("property: chunk→shuffle→duplicate→interleave-generations→assemble == newest content") {
    (1 to 40).foreach { i =>
      val size = 1 + rnd.nextInt(6000)
      val chunkSize = Seq(64, 128, 256, 512)(rnd.nextInt(4))
      val oldContent = bytes(size)
      val newContent = bytes(1 + rnd.nextInt(6000))
      val gOld = chunksOf(oldContent, chunkSize, Some(100.0))
      val gNew = chunksOf(newContent, chunkSize, Some(200.0))
      val stream = rnd.shuffle(gOld ++ gNew ++ gNew.take(1 + rnd.nextInt(gNew.length)))
      val (st, _) = drive(stream)
      val expected =
        if (gNew.length > gOld.length) newContent
        else if (gNew.length < gOld.length) oldContent
        else newContent // equal n → newer mtime generation wins under any order
      // the winning generation's chunks all appear, so it must complete
      val Some(f) = completed(st)
      assert(f.data.toSeq == expected.toSeq, s"iteration $i")
    }
  }

  test("merge: order-independent partial states agree with sequential drive") {
    (1 to 25).foreach { _ =>
      val content = bytes(1 + rnd.nextInt(4000))
      val stale = bytes(1 + rnd.nextInt(4000))
      val all = rnd.shuffle(
        chunksOf(content, 128, Some(300.0)) ++ chunksOf(stale, 128, Some(50.0)))
      val parts = all.grouped(1 + rnd.nextInt(5)).toSeq
      val partials = parts.map(p => drive(p)._1.get)
      val merged = partials.reduce(Assembly.merge)
      val winner =
        if (chunksOf(content, 128).length >= chunksOf(stale, 128).length) content else stale
      val got = Assembly.finish("sub/f.bin", "f.bin", merged)
      if (got._1 == Code.Complete) assert(got._2.get.data.toSeq == winner.toSeq)
    }
  }
}
