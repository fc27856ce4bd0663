package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.batch.{AssembledFile, ChunkRow}
import graft.core.{Assembly, Chunker}
import graft.streaming.{DiskModeAssembly, RestSink}

/** Disk-mode (manifest) assembly and the Girder-shaped REST sink, driven
  * against a real local HTTP server. */
class DiskModeRestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("disk-mode assembly writes files on disk, keeps only offsets in state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rootDir = Files.createTempDirectory("graft_diskmode")
    val rnd = new scala.util.Random(31)
    val big = new Array[Byte](5000); rnd.nextBytes(big)
    val stale = new Array[Byte](4000); rnd.nextBytes(stale)
    val other = new Array[Byte](1000); rnd.nextBytes(other)
    val gNew = Chunker.chunk("big.bin", "d", big, 512, Nil, Some(200.0)).map(ChunkRow(_))
    val gOld = Chunker.chunk("big.bin", "d", stale, 512, Nil, Some(50.0)).map(ChunkRow(_))
    val gOther = Chunker.chunk("o.bin", "", other, 512, Nil, None).map(ChunkRow(_))

    val input = MemoryStream[ChunkRow]
    val q = DiskModeAssembly.assemble(input.toDS(), rootDir.toString, timeoutMs = 0)
      .writeStream.format("memory").queryName("manifests").outputMode("append").start()
    try {
      input.addData(gOld ++ gNew.take(4) ++ gOther.take(1)) // stale gen first
      q.processAllAvailable()
      input.addData(gNew.drop(4) ++ gNew.take(2) ++ gOther.drop(1)) // rest + dups
      q.processAllAvailable()
      val ms = spark.table("manifests")
        .selectExpr("rel_filepath", "code", "size", "hash_ok").collect()
        .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getBoolean(3))).toMap
      assert(ms.keySet == Set("d/big.bin", "o.bin"))
      assert(ms("d/big.bin") == ((Assembly.Code.Complete, 5000L, true)))
      assert(ms("o.bin") == ((Assembly.Code.Complete, 1000L, true)))
      assert(Files.readAllBytes(rootDir.resolve("d/big.bin")).toSeq == big.toSeq)
      assert(Files.readAllBytes(rootDir.resolve("o.bin")).toSeq == other.toSeq)
    } finally q.stop()
  }

  test("disk-mode quarantines hash-mismatched files off the destination path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rootDir = Files.createTempDirectory("graft_diskmode_bad")
    val rnd = new scala.util.Random(61)
    val content = new Array[Byte](1000); rnd.nextBytes(content)
    val cs = Chunker.chunk("bad.bin", "", content, 256, Nil, Some(1.0)).map(ChunkRow(_))
    // corrupt one chunk's payload but keep its chunk_hash consistent so the
    // codec layer passes and only the whole-file verification fails
    val tampered = cs.updated(1, {
      val t = cs(1).data.map(b => (b ^ 1).toByte)
      cs(1).copy(data = t, chunk_hash = graft.core.ChunkCodec.sha512(t))
    })
    val input = MemoryStream[ChunkRow]
    val q = DiskModeAssembly.assemble(input.toDS(), rootDir.toString, timeoutMs = 0)
      .writeStream.format("memory").queryName("badman").outputMode("append").start()
    try {
      input.addData(tampered)
      q.processAllAvailable()
      val m = spark.table("badman").selectExpr("code", "hash_ok").collect().head
      assert(m.getInt(0) == Assembly.Code.HashMismatch && !m.getBoolean(1))
      assert(!Files.exists(rootDir.resolve("bad.bin")), "corrupt file left at destination")
      assert(Files.exists(rootDir.resolve("_quarantine_files/bad.bin")))
    } finally q.stop()
  }

  test("PositionedChunkWriter reconstructs files from positioned chunk writes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = Files.createTempDirectory("graft_poswriter")
    val rnd = new scala.util.Random(71)
    val contents = (0 until 3).map { i =>
      val c = new Array[Byte](300 + rnd.nextInt(2000)); rnd.nextBytes(c)
      (s"sub$i/p$i.bin", c)
    }
    val chunks = contents.flatMap { case (rel, c) =>
      val Array(sub, name) = rel.split("/")
      scala.util.Random.shuffle(Chunker.chunk(name, sub, c, 256, Nil, None).map(ChunkRow(_)))
    }
    val input = MemoryStream[ChunkRow]
    val q = input.toDS().writeStream
      .foreach(new graft.streaming.PositionedChunkWriter(outDir.toString))
      .outputMode("append").start()
    try {
      input.addData(chunks)
      q.processAllAvailable()
      contents.foreach { case (rel, c) =>
        assert(Files.readAllBytes(outDir.resolve(rel)).toSeq == c.toSeq, s"$rel differs")
      }
    } finally q.stop()
  }

  test("multimodal feature/frame-sample stages: shapes, determinism, coverage") {
    import spark.implicits._
    val rnd = new scala.util.Random(51)
    val payloads = (0L until 5L).map { i =>
      val b = new Array[Byte](200 + rnd.nextInt(2000)); rnd.nextBytes(b); (i, "video", b)
    }
    val media = spark.createDataset(payloads).toDF("media_id", "kind", "media")
    val feats = graft.multimodal.Multimodal.featureStage(media, dim = 16)
      .as[(Long, Array[Float])].collect().toMap
    assert(feats.size == 5)
    feats.values.foreach { v =>
      assert(v.length == 16)
      assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5) // L2-normalized
    }
    // determinism
    val again = graft.multimodal.Multimodal.featureStage(media, dim = 16)
      .as[(Long, Array[Float])].collect().toMap
    assert(feats.keys.forall(k => feats(k).toSeq == again(k).toSeq))
    // resize: bounded output, deterministic, identity under budget
    val resized = graft.multimodal.Multimodal.resizeStage(media, targetBytes = 256)
      .select("media_id", "media").as[(Long, Array[Byte])].collect().toMap
    payloads.foreach { case (id, _, payload) =>
      assert(resized(id).length == math.min(payload.length, 256))
      if (payload.length <= 256) assert(resized(id).toSeq == payload.toSeq)
      else assert(resized(id).head == payload.head) // stride starts at byte 0
    }
    val resizedAgain = graft.multimodal.Multimodal.resizeStage(media, targetBytes = 256)
      .select("media_id", "media").as[(Long, Array[Byte])].collect().toMap
    assert(resized.keys.forall(k => resized(k).toSeq == resizedAgain(k).toSeq))
    val frames = graft.multimodal.Multimodal.frameSample(media, n = 4, frameBytes = 128)
      .as[(Long, Int, Array[Byte])].collect()
    payloads.foreach { case (id, _, payload) =>
      val mine = frames.filter(_._1 == id).sortBy(_._2)
      assert(mine.nonEmpty && mine.length <= 4)
      mine.foreach { case (_, _, f) =>
        assert(f.length <= 128 && f.nonEmpty)
        // each frame is a verbatim slice of the payload
        assert(payload.containsSlice(f))
      }
    }
  }

  test("REST sink uploads, creates folders, checksum-skips, retries 5xx") {
    import spark.implicits._
    val srv = new FakeRestServer
    try {
      val rnd = new scala.util.Random(41)
      val mk = (rel: String) => {
        val c = new Array[Byte](300 + rnd.nextInt(500)); rnd.nextBytes(c)
        AssembledFile(rel, rel.split('/').last, Assembly.Code.Complete, 1,
          c.length.toLong, graft.core.ChunkCodec.sha512(c), None, c)
      }
      val files = Seq(mk("a/b/f1.bin"), mk("f2.bin"))
      val ds = spark.createDataset(files)
      srv.failuresRemaining = 2 // first two calls get 503 -> retried
      val r1 = RestSink.upload(ds, srv.base, maxAttempts = 5, backoffMs = 1)
        .collect().map(r => r.rel_filepath -> r.action).toMap
      assert(r1 == Map("a/b/f1.bin" -> "uploaded", "f2.bin" -> "uploaded"))
      assert(srv.folders.contains("a/b"))
      assert(srv.uploads.get() == 2)
      // replay: same content -> checksum skip, no re-upload
      val r2 = RestSink.upload(ds, srv.base).collect().map(_.action).toSet
      assert(r2 == Set("skipped"))
      assert(srv.uploads.get() == 2)
      // changed content under same path -> re-upload (replace semantics)
      val changed = files.head.copy(data = files.head.data.map(b => (b ^ 1).toByte))
      val r3 = RestSink.upload(spark.createDataset(Seq(changed)), srv.base)
        .collect().head
      assert(r3.action == "uploaded" && srv.uploads.get() == 3)
    } finally srv.stop()
  }
}
