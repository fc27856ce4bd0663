package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.batch.ChunkRow
import graft.core.{Assembly, Chunker}
import graft.streaming.AssemblyStreamTws

/** transformWithState reassembly: the same scenario StreamingAssemblySpec
  * drives through flatMapGroupsWithState (out-of-order chunks, duplicates,
  * a stale generation, chunks split across microbatches) must produce the
  * same completed files, and the per-key eviction timer must quarantine a
  * stalled partial. Requires the RocksDB state store — Spark rejects
  * transformWithState on the default HDFS-backed provider.
  */
class AssemblyTwsSpec extends AnyFunSuite {

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

  test("tws assembly matches the fMGWS operator on the canonical scenario") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val rnd = new scala.util.Random(3)
      val contentA = new Array[Byte](1200); rnd.nextBytes(contentA)
      val contentB = new Array[Byte](700); rnd.nextBytes(contentB)
      val stale = new Array[Byte](600); rnd.nextBytes(stale)
      val a = Chunker.chunk("a.bin", "d", contentA, 256, Nil, Some(100.0)).map(ChunkRow(_))
      val b = Chunker.chunk("b.bin", "d", contentB, 256, Nil, Some(100.0)).map(ChunkRow(_))
      val st = Chunker.chunk("a.bin", "d", stale, 256, Nil, Some(50.0)).map(ChunkRow(_))

      val input = MemoryStream[ChunkRow]
      val q = AssemblyStreamTws.assemble(input.toDS(), timeoutMs = 0)
        .writeStream.format("memory").queryName("assembled_tws")
        .outputMode("append").start()
      try {
        input.addData(a.take(3) ++ a.take(1) ++ st ++ b.take(2))
        q.processAllAvailable()
        assert(spark.table("assembled_tws").count() == 0) // nothing complete yet
        input.addData(a.drop(3) ++ b.drop(2))
        q.processAllAvailable()
        val rows = spark.table("assembled_tws")
          .selectExpr("rel_filepath", "code", "size", "data").collect()
          .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getAs[Array[Byte]](3)))
          .toMap
        assert(rows.keySet == Set("d/a.bin", "d/b.bin"))
        assert(rows("d/a.bin")._1 == Assembly.Code.Complete)
        assert(rows("d/a.bin")._3.toSeq == contentA.toSeq) // newest generation won
        assert(rows("d/b.bin")._3.toSeq == contentB.toSeq)

        // late duplicate of a completed generation: tombstone drops it silently
        input.addData(a.take(1))
        q.processAllAvailable()
        assert(spark.table("assembled_tws").count() == 2)
      } finally q.stop()
    }
  }

  test("eviction timer quarantines a stalled partial file") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val content = new Array[Byte](900)
      new scala.util.Random(7).nextBytes(content)
      val chunks = Chunker.chunk("stall.bin", "d", content, 256, Nil, None).map(ChunkRow(_))
      val other = Chunker.chunk("tiny.bin", "d", Array[Byte](1, 2, 3), 256, Nil, None)
        .map(ChunkRow(_))

      val input = MemoryStream[ChunkRow]
      val q = AssemblyStreamTws.assemble(input.toDS(), timeoutMs = 1)
        .writeStream.format("memory").queryName("assembled_tws_evict")
        .outputMode("append").start()
      try {
        // NOTE: no processAllAvailable here — in TimeMode.ProcessingTime the
        // engine constructs microbatches continuously to evaluate timers, so
        // the no-new-data condition processAllAvailable waits on never
        // holds. Poll the sink instead; the continuous batches also mean the
        // expired timer fires without needing a data-bearing batch.
        input.addData(chunks.dropRight(1)) // partial: last chunk never arrives
        input.addData(other)
        def sink(): Map[String, Int] = spark.table("assembled_tws_evict")
          .selectExpr("rel_filepath", "code").collect()
          .map(r => r.getString(0) -> r.getInt(1)).toMap
        val deadline = System.currentTimeMillis() + 120000
        var rows = sink()
        while (System.currentTimeMillis() < deadline &&
            !(rows.contains("d/stall.bin") && rows.contains("d/tiny.bin"))) {
          Thread.sleep(200)
          rows = sink()
        }
        assert(rows.get("d/stall.bin").contains(Assembly.Code.InProgress),
          s"stalled partial not quarantined: $rows")
        assert(rows.get("d/tiny.bin").contains(Assembly.Code.Complete))
      } finally q.stop()
    }
  }

  test("partial state survives a restart from checkpoint (AsmBufTws roundtrip)") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    import graft.batch.ChunkPipeline
    import graft.streaming.CompletedFileWriter
    import spark.implicits._
    withRocksDb {
      val rnd = new scala.util.Random(11)
      val content = new Array[Byte](1100); rnd.nextBytes(content)
      val chunks = Chunker.chunk("r.bin", "d", content, 256, Nil, Some(9.0)).map(ChunkRow(_))
      val topic = Files.createTempDirectory("graft_tws_topic")
      val out = Files.createTempDirectory("graft_tws_out")
      val ckpt = Files.createTempDirectory("graft_tws_ckpt")

      def runOnce(): Unit = {
        val wire = spark.readStream.schema("key STRING, value BINARY")
          .parquet(topic.toString)
        val decoded = wire.select("value").as[Array[Byte]]
          .map(b => ChunkRow(graft.core.ChunkCodec.unpack(b)))
        val q = AssemblyStreamTws.assemble(decoded, timeoutMs = 0)
          .writeStream
          .foreach(new CompletedFileWriter(out.toString))
          .outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }

      // run 1: only the first chunks arrive — buffered state checkpoints
      ChunkPipeline.encode(spark.createDataset(chunks.take(2)))
        .write.mode("append").parquet(topic.toString)
      runOnce()
      assert(!Files.exists(out.resolve("d").resolve("r.bin")), "completed too early")
      // run 2: the rest arrive — the restored AsmBufTws state must finish it
      ChunkPipeline.encode(spark.createDataset(chunks.drop(2)))
        .write.mode("append").parquet(topic.toString)
      runOnce()
      val written = Files.readAllBytes(out.resolve("d").resolve("r.bin"))
      assert(written.toSeq == content.toSeq, "bytes differ after resume")
    }
  }

  test("state SCHEMA EVOLUTION: a V1 checkpoint resumes under the V2 processor") {
    // the transformWithState selling point (SPARK-46815): restart an
    // assembly stream from a prior checkpoint after ADDING a state field
    // (AsmBufTws -> AsmBufTwsV2 + firstSeenMs). Requires the Avro state
    // encoding — the default unsaferow encoding pins the byte layout and
    // rejects any schema change.
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    import graft.batch.ChunkPipeline
    import graft.streaming.CompletedFileWriter
    import spark.implicits._
    withRocksDb {
      val k = "spark.sql.streaming.stateStore.encodingFormat"
      val prior = spark.conf.getOption(k)
      spark.conf.set(k, "avro")
      try {
        val rnd = new scala.util.Random(13)
        val content = new Array[Byte](1100); rnd.nextBytes(content)
        val chunks = Chunker.chunk("e.bin", "d", content, 256, Nil, Some(9.0)).map(ChunkRow(_))
        val topic = Files.createTempDirectory("graft_evo_topic")
        val out = Files.createTempDirectory("graft_evo_out")
        val ckpt = Files.createTempDirectory("graft_evo_ckpt")

        def runOnce(v2: Boolean): Unit = {
          val wire = spark.readStream.schema("key STRING, value BINARY")
            .parquet(topic.toString)
          val decoded = wire.select("value").as[Array[Byte]]
            .map(b => ChunkRow(graft.core.ChunkCodec.unpack(b)))
          val assembled =
            if (v2) AssemblyStreamTws.assembleV2(decoded, timeoutMs = 0)
            else AssemblyStreamTws.assemble(decoded, timeoutMs = 0)
          val q = assembled.writeStream
            .foreach(new CompletedFileWriter(out.toString))
            .outputMode("append")
            .option("checkpointLocation", ckpt.toString)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }

        // run 1 (V1 schema): partial file buffers into the checkpoint
        ChunkPipeline.encode(spark.createDataset(chunks.take(2)))
          .write.mode("append").parquet(topic.toString)
        runOnce(v2 = false)
        assert(!Files.exists(out.resolve("d").resolve("e.bin")), "completed too early")
        // run 2 (V2 schema, + firstSeenMs): the V1 state rows must decode
        // with the new field defaulted and the restored buffer finish the file
        ChunkPipeline.encode(spark.createDataset(chunks.drop(2)))
          .write.mode("append").parquet(topic.toString)
        runOnce(v2 = true)
        val written = Files.readAllBytes(out.resolve("d").resolve("e.bin"))
        assert(written.toSeq == content.toSeq, "bytes differ after schema evolution")
      } finally prior match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      }
    }
  }
}
