package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bzip2
import graft.streaming.Pipelines

/** Wikipedia-dump ingest under the streaming file source: `.xml.bz2`
  * dumps dropped into a watched directory explode to per-page rows
  * through the SAME `wikidumpPages` projection as a batch read — the
  * spec's assertions are stream ≡ batch on mixed drops, multi-stream
  * dumps decoding whole, and the quarantine posture (a torn stream is
  * ONE dead-letter row, never partial pages). */
class WikidumpStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dump(pages: Seq[(String, String)]): Array[Byte] = {
    val xml = "<mediawiki><siteinfo><sitename>t</sitename></siteinfo>" +
      pages.map { case (t, b) =>
        s"<page><title>$t</title><ns>0</ns><revision>" +
          s"<text bytes=\"0\">$b</text></revision></page>"
      }.mkString + "</mediawiki>"
    Bzip2.encode(xml.getBytes("UTF-8"))
  }

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("path", "page", "title", "text", "ok").collect()
      .map(r => Seq(
        r.getString(0).split('/').last, r.getInt(1).toString,
        Option(r.getString(2)).getOrElse("-"),
        Option(r.getString(3)).getOrElse("-"),
        r.getBoolean(4).toString).mkString("|"))
      .toSet

  test("stream pages == batch; multistream decodes whole; torn quarantines") {
    val dir = Files.createTempDirectory("wikidump").toFile
    Files.write(new java.io.File(dir, "a.xml.bz2").toPath,
      dump(Seq(("Alpha", "body one\nline two"), ("Beta", "body two"))))
    // a MULTISTREAM dump: one XML document split MID-PAGE across two
    // cat'd bz2 streams — the page is only reconstructable if the
    // decoder concatenates streams before extraction
    val full = "<mediawiki><page><title>Gamma</title>" +
      "<revision><text bytes=\"0\">split body</text></revision></page>" +
      "</mediawiki>"
    val (h1, h2) = full.splitAt(full.length / 2)
    Files.write(new java.io.File(dir, "b.xml.bz2").toPath,
      Bzip2.encode(h1.getBytes) ++ Bzip2.encode(h2.getBytes))
    Files.write(new java.io.File(dir, "c.xml.bz2").toPath,
      dump(Seq(("Torn", "gone"))).dropRight(6))

    val q = Pipelines.wikidumpStream(spark, dir.getAbsolutePath)
      .writeStream.format("memory").queryName("wikidump")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = rowSet(spark.table("wikidump"))

    val batch = rowSet(Pipelines.wikidumpPages(spark.read
      .format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(dir.getAbsolutePath)))
    assert(streamed == batch, "stream and batch projections drifted")

    assert(streamed.contains("a.xml.bz2|1|Alpha|body one\nline two|true"))
    assert(streamed.contains("a.xml.bz2|2|Beta|body two|true"))
    // the page split across two bz2 streams only exists if the decoder
    // concatenates streams before extraction
    assert(streamed.contains("b.xml.bz2|1|Gamma|split body|true"))
    assert(streamed.count(_.startsWith("c.xml.bz2|")) == 1)
    assert(streamed.contains("c.xml.bz2|-1|-|-|false"))
  }
}
