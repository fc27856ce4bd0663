package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SevenZip
import graft.streaming.Pipelines

/** The ranged 7z member reader vs the bounded column path: the two
  * ingest modes must agree row-for-row on healthy dumps (LZMA2 and
  * Copy coders, multi-chunk members, rows straddling slice
  * boundaries), and the ranged mode must ROUTE everything it cannot
  * stream — broken containers, unstreamable coders, flipped pack
  * bytes, unterminated quotes — as dead-letter rows, never silence. */
class Ranged7zSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
    .replace(">", "&gt;").replace("\"", "&quot;")

  /** n posts with bodies long enough that rows straddle the 32 KiB
    * LZMA2 fixture chunks (and therefore slice boundaries). */
  private def postsXml(n: Int, bodyLen: Int = 900): String = {
    val sb = new StringBuilder("""<?xml version="1.0"?><posts>""")
    (1 to n).foreach { i =>
      val body = s"<p>Post $i " + ("x" * bodyLen) + " &amp; tail.</p>"
      sb.append(s"""<row Id="$i" PostTypeId="${1 + i % 2}" """)
      sb.append(s"""Body="${esc(body)}" />""")
    }
    sb.append("</posts>").toString
  }

  private def writeArc(dir: String, name: String, bytes: Array[Byte]): String = {
    val p = java.nio.file.Paths.get(dir, name)
    Files.write(p, bytes)
    p.toString
  }

  private def rangedRows(paths: Seq[String], splitMin: Long = Long.MaxValue) = {
    import spark.implicits._
    Pipelines.sedumpRowsRanged(paths.toDF("path"), "(?i)\\.xml$",
      lzma2SplitMin = splitMin)
  }

  private def postSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1 else r.getInt(3),
      Option(r.getString(4)).orNull,
      r.getBoolean(5))).toSet

  test("ranged and bounded ingest agree row-for-row (LZMA2 + Copy, " +
      "multi-chunk, encoded + raw headers)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("r7z_parity").toString
    val xml = postsXml(200) // ~190 KiB → 6 LZMA2 chunks
    val arcs = Seq(
      ("lzma2.7z", SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        coderFor = _ => 1)),
      ("lzma2eh.7z", SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        encodedHeader = true, coderFor = _ => 1)),
      ("copy.7z", SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        coderFor = _ => 0)),
      // raw LZMA1 (pre-2015 7-Zip default): one sequential slice
      ("lzma1.7z", SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        coderFor = _ => 2)))
    val paths = arcs.map { case (n, b) => writeArc(tmp, n, b) }
    val ranged = Pipelines.sedumpPostsRanged(paths.toDF("path"))
    val bounded = Pipelines.sedumpPosts(
      arcs.zip(paths).map { case ((_, b), p) => (p, b) }.toDF("path", "content"))
    val got = postSet(ranged)
    val want = postSet(bounded)
    assert(got == want, s"diff: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
    assert(ranged.where(col("ok")).count() == 800) // 200 posts × 4 archives
    assert(ranged.count() == 800) // and nothing routed
  }

  test("split decode at LZMA2 dict resets: same rows, no duplicates, " +
      "rows straddling slice boundaries owned exactly once") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("r7z_split").toString
    val xml = postsXml(300) // ~280 KiB → 9 chunks, each a reset point
    val arc = SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
      coderFor = _ => 1)
    val p = writeArc(tmp, "big.7z", arc)
    // splitMin = 0 forces the chunk walk → one slice per 32 KiB chunk
    val split = rangedRows(Seq(p), splitMin = 0L)
      .where(col("r").isNotNull).select("r").as[String].collect()
    val whole = rangedRows(Seq(p))
      .where(col("r").isNotNull).select("r").as[String].collect()
    assert(whole.length == 300)
    assert(split.sorted.toSeq == whole.sorted.toSeq)
    // and the split genuinely happened: more than one slice planned
    import graft.sources.{Ranged7z, SerializableHadoopConf}
    val conf = spark.sparkContext.hadoopConfiguration
    val ms = Ranged7z.scanMembers(conf, p)
    val slices = Ranged7z.planSlices(conf, p, ms.head, lzma2SplitMin = 0L)
    assert(slices.size > 4, s"only ${slices.size} slices")
  }

  test("delta and BCJ-x86 filter chains decode ranged == bounded; a " +
      "split is refused (filter state spans the folder) but the single " +
      "slice streams") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("r7z_chain").toString
    val xml = postsXml(200)
    val arcs = Seq(
      ("delta.7z", SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        chainFor = _ => Some((0x03L, Array[Byte](0))))), // dist 1
      ("delta4.7z", SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        chainFor = _ => Some((0x03L, Array[Byte](3))))), // dist 4
      ("bcj.7z", SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        chainFor = _ => Some((0x04L, Array.empty[Byte])))),
      ("bcjlegacy.7z", SevenZip.build(
        Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        encodedHeader = true,
        chainFor = _ => Some((0x03030103L, Array.empty[Byte])))))
    val paths = arcs.map { case (n, b) => writeArc(tmp, n, b) }
    val ranged = Pipelines.sedumpPostsRanged(paths.toDF("path"))
    val bounded = Pipelines.sedumpPosts(
      arcs.zip(paths).map { case ((_, b), p) => (p, b) }
        .toDF("path", "content"))
    val got = postSet(ranged)
    val want = postSet(bounded)
    assert(got == want,
      s"diff: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
    assert(ranged.where(col("ok")).count() == 800)
    assert(ranged.count() == 800)
    // chained members are one slice even when the chunk walk is forced
    import graft.sources.Ranged7z
    val conf = spark.sparkContext.hadoopConfiguration
    paths.foreach { p =>
      val slices = Ranged7z.planSlices(conf, p,
        Ranged7z.scanMembers(conf, p).head, lzma2SplitMin = 0L)
      assert(slices.size == 1, s"$p: ${slices.size} slices")
    }
    // whole-folder single slice → the folder CRC is verified THROUGH
    // the filters (digest is over final member bytes)
    assert(ranged.where(col("crc_checked")).count() == 800)
  }

  test("routing: truncated container, unstreamable coder, flipped pack " +
      "byte, empty member — dead letters, never silence") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("r7z_route").toString
    val xml = postsXml(5)
    val good = SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
      coderFor = _ => 1)
    // torn container: header unreachable
    val torn = writeArc(tmp, "torn.7z", good.dropRight(6))
    // exotic branch-converter chain (non-x86 arch): unstreamable, routes
    val chained = writeArc(tmp, "chain.7z",
      SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        chainFor = _ => Some((0x05L, Array.empty[Byte]))))
    // truncated raw-LZMA1 pack bytes: the stream decodes but the pack
    // runs dry before the declared size — dead letter, never silence
    val lzma1good = SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
      coderFor = _ => 2)
    val rawLzma = writeArc(tmp, "rawtrunc.7z", {
      val b = lzma1good.clone()
      // flip a mid-pack byte: range coding breaks or the CRC catches it
      b(40) = (b(40) ^ 0x55).toByte
      b
    })
    // flipped first pack byte: LZMA2 framing breaks (or the folder CRC
    // catches a structurally-lucky decode) — dead letter either way
    val flippedBytes = good.clone()
    flippedBytes(32) = (flippedBytes(32) ^ 0x55).toByte
    val flipped = writeArc(tmp, "flip.7z", flippedBytes)
    // empty member quarantines (parity with the bounded path)
    val empty = writeArc(tmp, "empty.7z",
      SevenZip.build(Seq(("Posts.xml", Array.empty[Byte]))))

    val got = rangedRows(Seq(torn, rawLzma, chained, flipped, empty))
      .select("path", "member", "r").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull,
        r.isNullAt(2)))
    // torn: container-level row with null member
    assert(got.count(t => t._1 == torn && t._2 == null && t._3) == 1)
    // the rest: member-named dead letters, zero ok rows anywhere
    Seq(rawLzma, chained, empty).foreach { p =>
      assert(got.count(t => t._1 == p && t._2 == "Posts.xml" && t._3) == 1,
        s"expected one routed row for $p: ${got.filter(_._1 == p).toSeq}")
    }
    assert(got.exists(t => t._1 == flipped && t._3))
    assert(got.forall(_._3), s"no ok rows expected: ${got.toSeq}")
  }

  test("hostile rows through the ranged scanner: raw > and raw newline " +
      "kept; unterminated quote dead-letters locally, siblings survive") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("r7z_hostile").toString
    val good =
      "<?xml version=\"1.0\"?><posts>" +
        "<row Id=\"21\" PostTypeId=\"1\" Body=\"a &gt; b > c\nd\" />" +
        "<row Id=\"22\" PostTypeId=\"2\" Body=\"plain\" />" +
        "</posts>"
    val torn =
      "<?xml version=\"1.0\"?><posts>" +
        "<row Id=\"31\" PostTypeId=\"1\" Body=\"oops />" +
        "<row Id=\"32\" PostTypeId=\"2\" Body=\"fine\" />" +
        "</posts>"
    val pg = writeArc(tmp, "good.7z",
      SevenZip.build(Seq(("Posts.xml", good.getBytes("UTF-8"))),
        coderFor = _ => 1))
    val pt = writeArc(tmp, "torn.7z",
      SevenZip.build(Seq(("Posts.xml", torn.getBytes("UTF-8"))),
        coderFor = _ => 1))
    val got = postSet(Pipelines.sedumpPostsRanged(Seq(pg, pt).toDF("path"))
      .where(col("path") === pg))
    assert(got == Set(
      (21L, 1, "a > b > c d", true),
      (22L, 2, "plain", true)), s"got $got")
    // the torn member: the quote swallows everything to EOF — the open
    // candidate dead-letters; the ranged mode localizes (vs the bounded
    // mode's whole-member quarantine) but never silently drops
    val tornRows = postSet(Pipelines.sedumpPostsRanged(Seq(pt).toDF("path")))
    assert(tornRows.exists(!_._4), s"got $tornRows")
    assert(!tornRows.exists(t => t._4 && t._1 == 31L))
  }

  test("a <row whose '<' lies 1-4 bytes before a slice boundary is " +
      "owned and emitted by the slice it starts in (no lost rows, no dupes)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("r7z_edge").toString
    // the fixture encoder resets dict+props every 32 KiB chunk, so with
    // splitMin = 0 the slice boundary sits at exactly 32768; pin row 2's
    // '<' at boundary − k for k = 0..5 (k = 1..4 is the pending-prefix
    // hazard: '<', '<r', '<ro', '<row' unresolved at the stop check)
    val prefix = """<?xml version="1.0"?><posts>"""
    val r1a = """<row Id="1" PostTypeId="1" Body=""""
    val r1b = "\" />"
    val row2 = """<row Id="2" PostTypeId="2" Body="tail" />"""
    (0 to 5).foreach { k =>
      val padLen = (32768 - k) - prefix.length - r1a.length - r1b.length
      val xml = prefix + r1a + ("x" * padLen) + r1b + row2 + "</posts>"
      assert(xml.indexOf(row2) == 32768 - k)
      val p = writeArc(tmp, s"edge$k.7z",
        SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
          coderFor = _ => 1))
      import graft.sources.Ranged7z
      val conf = spark.sparkContext.hadoopConfiguration
      val slices = Ranged7z.planSlices(conf, p,
        Ranged7z.scanMembers(conf, p).head, lzma2SplitMin = 0L)
      assert(slices.size > 1, s"k=$k: only ${slices.size} slices")
      val split = rangedRows(Seq(p), splitMin = 0L)
        .select("r").collect().map(r => Option(r.getString(0)).orNull)
      assert(split.count(_ == null) == 0, s"k=$k: dead letters in $split")
      assert(split.count(_ != null) == 2, s"k=$k: got ${split.length} rows")
      assert(split.exists(r => r != null && r.contains("Id=\"2\"")),
        s"k=$k: boundary row lost")
    }
  }

  test("crc_checked: a single-slice whole-folder pass verifies the " +
      "folder CRC (true); a split decode trades it for parallelism " +
      "(false); routed rows are false") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("r7z_crc").toString
    val xml = postsXml(300) // ~280 KiB → 9 reset chunks
    val p = writeArc(tmp, "crc.7z",
      SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        coderFor = _ => 1))
    val pc = writeArc(tmp, "crccopy.7z",
      SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
        coderFor = _ => 0))
    val whole = rangedRows(Seq(p, pc))
      .select("crc_checked").as[Boolean].collect()
    assert(whole.nonEmpty && whole.forall(identity), "whole-folder ⇒ true")
    val split = rangedRows(Seq(p), splitMin = 0L)
      .select("crc_checked").as[Boolean].collect()
    assert(split.nonEmpty && !split.exists(identity), "split ⇒ false")
    val torn = writeArc(tmp, "torn.7z",
      SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8")))).dropRight(6))
    val routed = rangedRows(Seq(torn))
      .select("crc_checked").as[Boolean].collect()
    assert(routed.toSeq == Seq(false), "routed ⇒ false")
  }

  test("single-quoted attributes: XML permits Id='1' — the ranged " +
      "scanner and the bounded matcher both parse them, and a " +
      "'-quoted span shields raw > exactly like a \"-quoted one") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("r7z_squote").toString
    val xml = "<?xml version=\"1.0\"?><posts>" +
      "<row Id='41' PostTypeId='1' Body='a &gt; b > c\nd' />" +
      "<row Id=\"42\" PostTypeId='2' Body=\"it's fine\" />" +
      "<row Id='43' PostTypeId=\"1\" Body='say \"hi\" now' />" +
      "</posts>"
    val arc = SevenZip.build(Seq(("Posts.xml", xml.getBytes("UTF-8"))),
      coderFor = _ => 1)
    val p = writeArc(tmp, "squote.7z", arc)
    val want = Set(
      (41L, 1, "a > b > c d", true),
      (42L, 2, "it's fine", true),
      (43L, 1, "say \"hi\" now", true))
    val ranged = postSet(Pipelines.sedumpPostsRanged(Seq(p).toDF("path")))
    val bounded = postSet(Pipelines.sedumpPosts(
      Seq((p, arc)).toDF("path", "content")))
    assert(ranged == want, s"ranged $ranged")
    assert(bounded == want, s"bounded $bounded")
  }

  test("solid archive: member offsets slice the folder output correctly") {
    import spark.implicits._
    // one folder per member is what build emits; simulate the offset
    // logic instead through a 3-member archive where only the middle
    // member matches the name filter
    val tmp = Files.createTempDirectory("r7z_multi").toString
    val xml = postsXml(7)
    val arc = SevenZip.build(Seq(
      ("license.txt", ("not a table " * 100).getBytes("UTF-8")),
      ("Posts.xml", xml.getBytes("UTF-8")),
      ("readme.md", "# hi".getBytes("UTF-8"))),
      coderFor = _ => 1)
    val p = writeArc(tmp, "multi.7z", arc)
    val got = postSet(Pipelines.sedumpPostsRanged(Seq(p).toDF("path")))
    assert(got.count(_._4) == 7, s"got $got")
  }
}
