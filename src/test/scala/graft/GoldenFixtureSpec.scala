package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.ChunkCodec

/** Wire-format compatibility against the reference's own golden serialized
  * chunks (FIXTURES.md §1.1; reference test_serialization.py:121-144):
  * decode each pre-serialized message (which re-verifies
  * sha512(data)==chunk_hash) and re-encode it byte-for-byte. The fixtures
  * are read from the read-only reference checkout and the test is skipped
  * when that path is absent (e.g. packaged builds).
  */
class GoldenFixtureSpec extends AnyFunSuite {

  private val dir = Paths.get("/root/reference/test/data")
  private val names = Seq(0, 1, 2, 380)
    .map(i => s"1a0ceb89-b5f0-45dc-9c12-63d3020e2217_test_chunk_$i.bin")

  test("golden chunks decode, hash-verify, and re-encode byte-identically") {
    assume(Files.exists(dir.resolve(names.head)), "reference fixtures not present")
    names.foreach { n =>
      val golden = Files.readAllBytes(dir.resolve(n))
      val chunk = ChunkCodec.unpack(golden) // throws if chunk_hash mismatches
      assert(chunk.filename.nonEmpty && chunk.nTotalChunks == 381)
      val reencoded = ChunkCodec.pack(chunk)
      assert(reencoded.toSeq == golden.toSeq, s"$n re-encoding differs")
    }
    // and the four chunks agree on file identity
    val chunks = names.map(n => ChunkCodec.unpack(Files.readAllBytes(dir.resolve(n))))
    assert(chunks.map(_.fileHash.toSeq).distinct.size == 1)
    assert(chunks.map(_.chunkI) == Seq(1, 2, 3, 381))
  }
}
