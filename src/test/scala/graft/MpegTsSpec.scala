package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MpegTs

/** MPEG-TS walk: PAT→PMT chain resolves stream types only through
  * CRC-verified sections, per-PID accounting is exact, desynced trains
  * route to null, and fuzz never throws. */
class MpegTsSpec extends AnyFunSuite {

  private def sampleTs(ccGap: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(MpegTs.patPacket(progNum = 7, pmtPid = 48))
    out.write(MpegTs.pmtPacket(pmtPid = 48, progNum = 7,
      streams = Seq((0x1b, 0x100), (0x0f, 0x101))))
    for (j <- 0 until 6) {
      val cc = if (ccGap && j >= 3) j + 2 else j
      out.write(MpegTs.packet(0x100, pusi = j % 4 == 0, cc & 15,
        Array.tabulate(24)(k => (j * 31 + k).toByte)))
    }
    for (j <- 0 until 3)
      out.write(MpegTs.packet(0x101, pusi = j == 0, j,
        Array.tabulate(8)(k => (j * 17 + k).toByte)))
    out.toByteArray
  }

  test("PAT→PMT chain + per-PID accounting round-trips the builder") {
    val rows = MpegTs.parse(sampleTs())
    assert(rows != null)
    assert(rows.map(_._1).toSeq == Seq(0, 48, 0x100, 0x101)) // ascending
    val byPid = rows.map(r => r._1 -> r).toMap
    assert(byPid(0)._2 == null && byPid(48)._2 == null)
    assert(byPid(0x100)._2 == 0x1b && byPid(0x101)._2 == 0x0f)
    assert(byPid(0x100)._3 == 6 && byPid(0x100)._4 == 2) // pusi at 0 and 4
    assert(byPid(0x101)._3 == 3 && byPid(0x101)._4 == 1)
    assert(rows.forall(_._5 == 0)) // no continuity errors
  }

  test("continuity gaps are counted once per jump, per PID") {
    val rows = MpegTs.parse(sampleTs(ccGap = true))
    val byPid = rows.map(r => r._1 -> r).toMap
    assert(byPid(0x100)._5 == 1) // one jump at packet 3, then consistent
    assert(byPid(0x101)._5 == 0)
  }

  test("a corrupted PSI CRC drops the mapping, never the accounting") {
    val ts = sampleTs()
    // flip a bit inside the PMT body (second packet)
    val bad = ts.clone()
    bad(188 + 20) = (bad(188 + 20) ^ 1).toByte
    val rows = MpegTs.parse(bad)
    assert(rows != null)
    val byPid = rows.map(r => r._1 -> r).toMap
    assert(byPid(0x100)._2 == null && byPid(0x101)._2 == null) // no guess
    assert(byPid(0x100)._3 == 6) // packets still counted
  }

  test("broken sync or partial packets route the whole parse to null") {
    val ts = sampleTs()
    val desync = ts.clone(); desync(188 * 2) = 0x46
    assert(MpegTs.parse(desync) == null)
    assert(MpegTs.parse(ts.take(188 * 2 + 7)) == null) // partial trailing
    assert(MpegTs.parse(ts.take(100)) == null)
    assert(MpegTs.parse(Array.emptyByteArray) == null)
    assert(MpegTs.parse(null) == null)
  }

  test("PES demux reassembles multi-packet units byte-exactly with PTS") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(MpegTs.patPacket(progNum = 1, pmtPid = 32))
    out.write(MpegTs.pmtPacket(pmtPid = 32, progNum = 1,
      streams = Seq((0x1b, 0x100))))
    val unit0 = Array.tabulate(400)(k => (k % 251).toByte) // spans 3 packets
    val unit1 = "short unit".getBytes
    var cc = 0
    for ((pl, pts) <- Seq((unit0, 90000L), (unit1, 93003L))) {
      val (pk, cc2) = MpegTs.pesPackets(0x100, cc, MpegTs.pesBytes(0xe0, pts, pl))
      out.write(pk); cc = cc2
    }
    val rows = MpegTs.parsePes(out.toByteArray)
    assert(rows != null && rows.length == 1) // PSI PIDs never activate
    val (pid, units, first, last, es) = rows(0)
    assert(pid == 0x100 && units == 2 && first == 90000L && last == 93003L)
    assert(java.util.Arrays.equals(es, unit0 ++ unit1)) // no stuffing leaked
    // the raw train parses cleanly too (CC continuity across units holds)
    val stats = MpegTs.parse(out.toByteArray)
    assert(stats.find(_._1 == 0x100).get._5 == 0)
  }

  test("PTS encode/decode round-trips across the 33-bit range") {
    for (pts <- Seq(0L, 1L, 90000L, (1L << 32) + 12345L, (1L << 33) - 1)) {
      val (pk, _) = MpegTs.pesPackets(0x40, 0, MpegTs.pesBytes(0xe0, pts, "x".getBytes))
      val rows = MpegTs.parsePes(pk)
      assert(rows(0)._3 == pts, s"pts=$pts")
    }
  }

  test("mutation fuzz never throws") {
    val ts = sampleTs()
    val rnd = new scala.util.Random(0x7511L)
    for (_ <- 1 to 500) {
      val b = ts.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 + rnd.nextInt(255))).toByte
      MpegTs.parse(b)
      MpegTs.parsePes(b)
    }
  }
}
