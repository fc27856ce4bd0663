package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.batch.ChunkRow
import graft.core.{Assembly, Chunker}
import graft.streaming.DiskModeAssemblyTws

/** Disk-mode reassembly on transformWithState: the canonical scenario
  * (out-of-order chunks, duplicates, a stale generation, microbatch
  * splits) must land byte-identical files with verified manifests — the
  * same contract DiskModeRestSpec pins for the fMGWS operator, through the
  * SHARED foldDisk — and the per-key timer must quarantine a stalled
  * partial off the destination path. RocksDB-only, like all TWS. */
class DiskModeTwsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withRocksDb[T](body: => T): T = {
    val k = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(k)
    spark.conf.set(k,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  test("tws disk mode: canonical scenario lands byte-identical files; " +
      "stale generation superseded; tombstone absorbs late dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val outDir = Files.createTempDirectory("tws_disk").toString
      val rnd = new scala.util.Random(17)
      val contentA = new Array[Byte](1200); rnd.nextBytes(contentA)
      val contentB = new Array[Byte](700); rnd.nextBytes(contentB)
      val stale = new Array[Byte](600); rnd.nextBytes(stale)
      val a = Chunker.chunk("a.bin", "d", contentA, 256, Nil, Some(100.0)).map(ChunkRow(_))
      val b = Chunker.chunk("b.bin", "d", contentB, 256, Nil, Some(100.0)).map(ChunkRow(_))
      val st = Chunker.chunk("a.bin", "d", stale, 256, Nil, Some(50.0)).map(ChunkRow(_))

      val input = MemoryStream[ChunkRow]
      val q = DiskModeAssemblyTws.assemble(input.toDS(), outDir, timeoutMs = 0)
        .writeStream.format("memory").queryName("tws_disk_manifests")
        .outputMode("append").start()
      try {
        input.addData(a.drop(2).reverse ++ st ++ b.take(2) ++ a.take(1))
        q.processAllAvailable()
        input.addData(a.take(2) ++ b.drop(2) ++ a.take(1))
        q.processAllAvailable()
        val m = spark.table("tws_disk_manifests")
          .selectExpr("rel_filepath", "code", "size", "hash_ok").collect()
          .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getBoolean(3)))
          .toMap
        assert(m.keySet == Set("d/a.bin", "d/b.bin"))
        assert(m("d/a.bin") == ((Assembly.Code.Complete, 1200L, true)))
        assert(m("d/b.bin") == ((Assembly.Code.Complete, 700L, true)))
        val gotA = Files.readAllBytes(Paths.get(outDir, "d", "a.bin"))
        assert(java.util.Arrays.equals(gotA, contentA)) // newest generation won
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(outDir, "d", "b.bin")), contentB))
        // late duplicate after completion: tombstone drops it, file untouched
        input.addData(a.take(1))
        q.processAllAvailable()
        assert(spark.table("tws_disk_manifests").count() == 2)
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(outDir, "d", "a.bin")), contentA))
        // unsafe path dead-letters as a manifest row, never a write
        input.addData(Chunker.chunk("evil.bin", "../escape", Array[Byte](1, 2),
          256, Nil, None).map(ChunkRow(_)))
        q.processAllAvailable()
        val evil = spark.table("tws_disk_manifests")
          .where($"code" === Assembly.Code.UnsafePath).collect()
        assert(evil.length == 1)
      } finally q.stop()
    }
  }

  test("tws disk mode: eviction timer quarantines a stalled partial off " +
      "the destination path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val outDir = Files.createTempDirectory("tws_disk_evict").toString
      val content = new Array[Byte](900)
      new scala.util.Random(7).nextBytes(content)
      val chunks = Chunker.chunk("stall.bin", "d", content, 256, Nil, None).map(ChunkRow(_))
      val tiny = Chunker.chunk("tiny.bin", "d", Array[Byte](1, 2, 3), 256, Nil, None)
        .map(ChunkRow(_))
      val input = MemoryStream[ChunkRow]
      val q = DiskModeAssemblyTws.assemble(input.toDS(), outDir, timeoutMs = 1)
        .writeStream.format("memory").queryName("tws_disk_evict")
        .outputMode("append").start()
      try {
        input.addData(chunks.dropRight(1) ++ tiny)
        def sink(): Map[String, Int] = spark.table("tws_disk_evict")
          .selectExpr("rel_filepath", "code").collect()
          .map(r => r.getString(0) -> r.getInt(1)).toMap
        val deadline = System.currentTimeMillis() + 120000
        var rows = sink()
        while (System.currentTimeMillis() < deadline &&
            !(rows.contains("d/stall.bin") && rows.contains("d/tiny.bin"))) {
          Thread.sleep(200)
          rows = sink()
        }
        assert(rows.get("d/tiny.bin").contains(Assembly.Code.Complete))
        assert(rows.get("d/stall.bin").contains(Assembly.Code.InProgress))
        // the partial moved aside — a consumer can't mistake it for done
        assert(!Files.exists(Paths.get(outDir, "d", "stall.bin")))
        assert(Files.exists(Paths.get(outDir, "_quarantine_files", "d", "stall.bin")))
      } finally q.stop()
    }
  }
}
