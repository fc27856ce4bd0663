package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.app.{GirderTransferApp, UploadFileApp}
import graft.batch.ChunkRow
import graft.core.{ChunkCodec, Chunker}

/** The two round-10 console entries, driven end-to-end:
  * [[UploadFileApp]] (the reference's `UploadDataFile` single-file
  * upload) proves byte identity through the download path, and
  * [[GirderTransferApp]] (the reference's `GirderUploadStreamProcessor`)
  * consumes a chunk topic and lands every completed file on a live local
  * REST server with a registry row per file. */
class GirderUploadAppSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("UploadFileApp: one file -> topic -> download path, byte-identical") {
    import spark.implicits._
    val base = Files.createTempDirectory("upload_file_app")
    val rnd = new scala.util.Random(97)
    val content = new Array[Byte](3000); rnd.nextBytes(content)
    val src = base.resolve("payload.bin")
    Files.write(src, content)
    val topicDir = base.resolve("topic").toString
    UploadFileApp.run(spark, src.toString, topicDir, chunkSize = 512)

    // the DownloadDirectoryApp consume path over the produced topic
    val outDir = base.resolve("out").toString
    val wire = spark.readStream
      .schema("key STRING, value BINARY")
      .parquet(topicDir)
    val decoded = graft.batch.ChunkPipeline.decodeOrDeadLetter(wire)
    assert(decoded.isStreaming)
    val good = decoded.filter(_.error == null).map(_.chunk.get)
    val q = graft.streaming.AssemblyStream.assemble(good, timeoutMs = 0)
      .writeStream
      .foreach(new graft.streaming.CompletedFileWriter(outDir))
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = Files.readAllBytes(java.nio.file.Paths.get(outDir, "payload.bin"))
    assert(got.toSeq == content.toSeq, "downloaded bytes differ from source")
  }

  test("UploadFileApp --select-bytes uploads only the compacted ranges") {
    import spark.implicits._
    val base = Files.createTempDirectory("upload_file_sel")
    val content = (0 until 1000).map(_.toByte).toArray
    val src = base.resolve("sel.bin")
    Files.write(src, content)
    val topicDir = base.resolve("topic").toString
    UploadFileApp.run(spark, src.toString, topicDir, chunkSize = 256,
      selectBytes = Seq((0L, 100L), (500L, 700L)))
    val wire = spark.read.parquet(topicDir)
      .selectExpr("key", "value").as[(String, Array[Byte])]
    val chunks = wire.collect().map { case (_, v) =>
      graft.core.ChunkCodec.unpack(v)
    }
    val assembled = new Array[Byte](300)
    chunks.foreach { c =>
      System.arraycopy(c.data, 0, assembled, c.chunkOffsetWrite.toInt, c.data.length)
    }
    assert(assembled.toSeq ==
      (content.slice(0, 100) ++ content.slice(500, 700)).toSeq)
  }

  test("GirderTransferApp: topic -> assemble -> REST server + registry") {
    import spark.implicits._
    val srv = new FakeRestServer
    try {
      val base = Files.createTempDirectory("girder_app")
      val topicDir = base.resolve("topic").toString
      val registryDir = base.resolve("registry").toString
      val rnd = new scala.util.Random(43)
      val files = Seq("a/f1.bin", "f2.bin").map { rel =>
        val c = new Array[Byte](700 + rnd.nextInt(800)); rnd.nextBytes(c)
        (rel, c)
      }
      val chunks = files.flatMap { case (rel, c) =>
        val (sub, name) = rel.lastIndexOf('/') match {
          case -1 => ("", rel)
          case i => (rel.substring(0, i), rel.substring(i + 1))
        }
        Chunker.chunk(name, sub, c, 256, Nil, Some(1.0)).map(ChunkRow(_))
      }
      graft.batch.ChunkPipeline.encode(spark.createDataset(chunks))
        .write.parquet(topicDir)

      GirderTransferApp.run(spark, topicDir, srv.base, registryDir)

      files.foreach { case (rel, c) =>
        val item = srv.items.get(rel)
        assert(item != null, s"$rel never reached the server")
        assert(item._2.toSeq == c.toSeq, s"$rel bytes differ on the server")
        assert(item._1 == ChunkCodec.digestHex("SHA-256", c))
      }
      assert(srv.folders.contains("a"))
      val reg = spark.read.parquet(registryDir)
        .selectExpr("rel_filepath", "action").as[(String, String)]
        .collect().toMap
      assert(reg == Map("a/f1.bin" -> "uploaded", "f2.bin" -> "uploaded"))
    } finally srv.stop()
  }
}
