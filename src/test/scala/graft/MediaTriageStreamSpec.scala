package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioHeaders, ImageHeaders, VideoHeaders}
import graft.streaming.Pipelines

/** End-to-end media triage over the streaming file source: a directory of
  * mixed binary payloads classified per micro-batch by the native header
  * expressions; unknown payloads are routed, not dropped.
  */
class MediaTriageStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("mixed-directory ingest triages by container and keeps unknowns") {
    val dir = Files.createTempDirectory("media_triage").toFile
    val body = "payload-bytes".getBytes
    Files.write(new java.io.File(dir, "a.png").toPath,
      ImageHeaders.buildPng(640, 360, body))
    Files.write(new java.io.File(dir, "b.jpg").toPath,
      ImageHeaders.buildJpeg(1920, 1080, body))
    Files.write(new java.io.File(dir, "c.wav").toPath,
      AudioHeaders.buildWav(2, 16000, 16, new Array[Byte](64000))) // 1 s stereo
    Files.write(new java.io.File(dir, "d.mp4").toPath,
      VideoHeaders.buildMp4("isom", 1000, 2500, body)) // 2.5 s
    Files.write(new java.io.File(dir, "e.txt").toPath,
      "just some text that is no container".getBytes)

    val q = Pipelines.mediaTriageStream(spark, dir.getAbsolutePath)
      .writeStream.format("memory").queryName("triage")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val rows = spark.table("triage").collect().map { r =>
      val name = r.getString(0).split('/').last
      name -> (r.getString(2), if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) null else r.getInt(4),
        if (r.isNullAt(7)) -1L else r.getLong(7))
    }.toMap
    assert(rows.keySet == Set("a.png", "b.jpg", "c.wav", "d.mp4", "e.txt"))
    assert(rows("a.png") == (("image", "png", 640, -1L)))
    assert(rows("b.jpg") == (("image", "jpeg", 1920, -1L)))
    assert(rows("c.wav") == (("audio", "wav", null, 1000000L)))
    assert(rows("d.mp4") == (("video", "isom", null, 2500000L)))
    assert(rows("e.txt") == (("unknown", null, null, -1L)))
  }
}
