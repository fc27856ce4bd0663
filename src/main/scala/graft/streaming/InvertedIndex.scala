package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental inverted-index maintenance — the daily-batch world's answer
  * to x112's one-shot build: new documents' postings land as per-batch
  * SEGMENTS (the Lucene segment model re-expressed on parquet), reads
  * merge segments on the fly, and a compaction pass folds segments into
  * one. Reference anchor: the same arrive→process→registry loop the
  * reference runs for files (openmsistream
  * data_file_io/actor/data_file_stream_processor.py:1-120), here
  * maintaining a SEARCH artifact instead of a transfer registry.
  *
  * Scale shape: each micro-batch shuffles only ITS OWN postings (one row
  * per (term, batch) after a map-side (doc, term)→tf collapse) — the
  * stored corpus index is never rewritten on arrival. Reads are one
  * hash-agg over segments; compaction is one read + one write, folding
  * O(batches) segment rows per term back to one. Exactly-once: segments
  * land via [[IdempotentParquetSink]]'s dynamic partition overwrite, so a
  * replayed micro-batch REPLACES its own segment instead of double
  * counting. The ingest model assumes each doc_id arrives in exactly one
  * batch (re-uploads are a dedup gate's job — x166 — not the index's).
  */
object InvertedIndex {

  private def tokens(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z]+"), t => t =!= "")

  /** One batch of documents `(doc_id, text)` → its index segment: per
    * term, the batch-local document frequency, total term frequency, and
    * doc-ordered posting array. The (doc, term) → tf collapse happens
    * map-side (hash agg) before the term exchange, so the shuffle carries
    * one row per posting — x112's exchange, scoped to the batch. */
  def segment(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"),
        sort_array(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))

  /** foreachBatch hook: segment the micro-batch and land it replay-safe. */
  def appendBatch(indexDir: String)(batch: DataFrame, batchId: Long): Unit =
    IdempotentParquetSink.writeBatch(indexDir)(segment(batch), batchId)

  /** Maintain the index from a streaming `(doc_id, text)` source. */
  def maintain(docs: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch(appendBatch(indexDir) _)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Fold segment rows to one row per term (array-typed postings —
    * doc-ordered because each doc lives in exactly one segment). */
  def merge(segments: DataFrame): DataFrame =
    segments.groupBy("tok")
      .agg(sum("df").as("df"), sum("total_tf").as("total_tf"),
        sort_array(flatten(collect_list(col("postings")))).as("postings"))

  /** The merged, serving-shaped index (x112's exact schema: `doc:tf`
    * posting strings) from whatever segments currently exist. */
  def read(spark: SparkSession, indexDir: String): DataFrame =
    serving(merge(spark.read.parquet(indexDir).drop("batch_id")))

  /** Array postings → the gate-stable `doc:tf` string serialization. */
  def serving(index: DataFrame): DataFrame =
    index.select(col("tok"), col("df"), col("total_tf"),
      array_join(transform(col("postings"),
        p => concat(p.getField("doc_id").cast("string"), lit(":"),
          p.getField("tf").cast("string"))), ",").as("postings"))

  /** Posting-level compaction: fold EVERY segment into one merged segment
    * under `batch_id=-1` (the id the engine never emits — same contract
    * as [[graft.batch.Compaction.compactBatchPartitioned]], which
    * consolidates FILES; this also consolidates ROWS, restoring one row
    * per term). Safe only between runs of the owning query. Returns
    * (segmentRowsBefore, segmentRowsAfter). */
  def compact(spark: SparkSession, indexDir: String): (Long, Long) = {
    val path = new Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a fresh/empty index (no segments landed yet) compacts to nothing —
    // same contract as VectorIndex.compact, not an AnalysisException
    if (!fs.exists(path) || !fs.listStatus(path).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch_id=")))
      return (0L, 0L)
    val before = spark.read.parquet(indexDir).count()
    val tmp = new Path(path, "_compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    merge(spark.read.parquet(indexDir).drop("batch_id"))
      .withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").parquet(tmp.toString)
    val parts = fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    parts.foreach { p =>
      if (!fs.delete(p.getPath, true))
        throw new java.io.IOException(
          s"InvertedIndex.compact: failed to delete '${p.getPath}'; " +
            s"compacted copy intact at '$tmp'")
    }
    val dest = new Path(path, "batch_id=-1")
    if (!fs.rename(new Path(tmp, "batch_id=-1"), dest))
      throw new java.io.IOException(
        s"InvertedIndex.compact: rename into '$dest' failed; ORIGINALS WERE " +
          s"DELETED — the data survives under '$tmp', restore manually")
    fs.delete(tmp, true)
    (before, spark.read.parquet(indexDir).count())
  }
}
