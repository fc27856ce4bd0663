package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{IdempotentParquetSink, Pipelines}

/** Stream-static enrichment (Pipelines.enrichStream): broadcast dim join
  * enriches across micro-batches without repartitioning the stream, and
  * left-outer keeps unmatched rows. Idempotent sink
  * (IdempotentParquetSink): a replayed micro-batch (same batchId)
  * overwrites its own batch_id partition instead of duplicating rows.
  */
class EnrichIdempotentSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("enrichStream: broadcast dim enriches each batch; left_outer null-pads") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("en", "English"), ("de", "German")).toDF("lang", "lang_name")
    val in = MemoryStream[(Long, String)]
    val stream = in.toDS().toDF("doc_id", "lang")
    val enriched = Pipelines.enrichStream(stream, dim, Seq("lang"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, "en"), (2L, "xx")))
      q.processAllAvailable()
      in.addData(Seq((3L, "de")))
      q.processAllAvailable()
      val got = spark.table("enriched").collect()
        .map(r => (r.getLong(1), Option(r.getString(2)))).sortBy(_._1)
      assert(got.toSeq === Seq(
        (1L, Some("English")), (2L, None), (3L, Some("German"))))
    } finally q.stop()
  }

  test("enrichStream plan broadcasts the dim — the stream side does not shuffle") {
    import spark.implicits._
    // enrichStream is source-agnostic; assert the join strategy on a batch
    // frame with broadcasting-by-size disabled, so only the explicit hint
    // can produce a BroadcastHashJoin.
    val dim = Seq(("en", "English")).toDF("lang", "lang_name")
    val facts = spark.range(1000).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("xx"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val physical = Pipelines.enrichStream(facts, dim, Seq("lang"))
        .queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastHashJoin"),
        s"expected broadcast join, got:\n$physical")
      assert(!physical.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IdempotentParquetSink: replaying a batchId overwrites, not appends") {
    import spark.implicits._
    val dir = Files.createTempDirectory("idem_sink").toString
    val write = IdempotentParquetSink.writeBatch(dir) _
    write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    write(Seq((3L, "c")).toDF("id", "v"), 1L)
    // replay of batch 1 (failure before checkpoint commit): same id, same rows
    write(Seq((3L, "c")).toDF("id", "v"), 1L)
    // partition-dir column values infer as INT on read; normalize
    val got = spark.read.parquet(dir)
      .select(col("id"), col("v"), col("batch_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L)))
  }

  test("enrichPerBatch re-reads the dim every micro-batch (upserts visible)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimDir = Files.createTempDirectory("dim_refresh").toString
    val outDir = Files.createTempDirectory("dim_out").toString
    val ckpt = Files.createTempDirectory("dim_ckpt").toString
    Seq(("en", "English")).toDF("lang", "lang_name")
      .write.mode("overwrite").parquet(dimDir)
    val in = MemoryStream[(Long, String)]
    val q = in.toDS().toDF("doc_id", "lang").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Pipelines.enrichPerBatch(dimDir, Seq("lang"))(
        graft.streaming.IdempotentParquetSink.writeBatch(outDir)))
      .start()
    try {
      in.addData(Seq((1L, "en"), (2L, "de")))
      q.processAllAvailable()
      // dim upsert between batches: 'de' becomes resolvable
      Seq(("en", "English"), ("de", "German")).toDF("lang", "lang_name")
        .write.mode("overwrite").parquet(dimDir)
      in.addData(Seq((3L, "de")))
      q.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .select("doc_id", "lang_name").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
      assert(got.toSeq === Seq(
        (1L, Some("English")), (2L, None), (3L, Some("German"))))
    } finally q.stop()
  }

  test("IdempotentParquetSink end-to-end under foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("idem_e2e").toString
    val ckpt = Files.createTempDirectory("idem_ckpt").toString
    val in = MemoryStream[Long]
    val q = in.toDS().toDF("id").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(IdempotentParquetSink.writeBatch(dir) _)
      .start()
    try {
      in.addData(Seq(1L, 2L)); q.processAllAvailable()
      in.addData(Seq(3L)); q.processAllAvailable()
      val got = spark.read.parquet(dir).select("id").as[Long].collect().sorted
      assert(got.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
