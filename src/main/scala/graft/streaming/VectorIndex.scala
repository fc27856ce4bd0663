package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.VectorFunctions

/** Incremental IVF (vector) index maintenance — [[InvertedIndex]]'s twin
  * for the similarity-search modality: new embeddings are assigned to
  * their nearest coarse centroid AT ARRIVAL (the native
  * [[graft.functions.NearestCentroid]] fold — a zero-shuffle in-row
  * argmin over the kilobyte centroid model) and land as per-batch
  * segments via [[IdempotentParquetSink]]; a search probes the merged
  * lists. The centroid model is FIXED between retrains (the production
  * IVF posture: Lloyd's — x63 — trains it offline; reassignments happen
  * at retrain, not at ingest), so arrival cost is one scan of the new
  * batch and the stored corpus is never rewritten or re-clustered.
  *
  * Search shape at 100 TB: the probe list prunes to nprobe inverted
  * lists; segments are partitioned `batch_id/cid` on disk so the probe
  * filter is DIRECTORY pruning, the exact-rerank scan touches only the
  * probed lists, and the top-k is one TakeOrdered. Replay safety is the
  * sink's: a re-delivered micro-batch replaces its own segment. */
object VectorIndex {

  /** Assign one batch `(vec_id, embedding)` to the coarse model →
    * segment rows `(cid, vec_id, embedding)`. Assignment arithmetic is
    * the x04/x110s one (double accumulation in index order, ties to the
    * smallest centroid id), so index-served search can hash-match the
    * ad-hoc IVF oracle. */
  def segment(vectors: DataFrame, cids: Array[Long],
      centroids: Array[Array[Float]]): DataFrame =
    vectors.select(
      VectorFunctions.nearestCentroid(col("embedding"), cids, centroids)
        .as("cid"),
      col("vec_id"), col("embedding"))

  /** foreachBatch hook: assign + land replay-safe, `batch_id/cid`
    * partitioned (probe filters prune directories). */
  def appendBatch(indexDir: String, cids: Array[Long],
      centroids: Array[Array[Float]])(batch: DataFrame, batchId: Long): Unit =
    segment(batch, cids, centroids)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "cid")
      .parquet(indexDir)

  /** Maintain the index from a streaming `(vec_id, embedding)` source. */
  def maintain(vectors: DataFrame, indexDir: String, checkpoint: String,
      cids: Array[Long], centroids: Array[Array[Float]]): StreamingQuery =
    vectors.writeStream
      .foreachBatch(appendBatch(indexDir, cids, centroids) _)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The merged index: `(cid, vec_id, embedding)` over all segments. */
  def read(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(indexDir).select("cid", "vec_id", "embedding")

  /** IVF search over an index frame: prune to the probed inverted lists,
    * exact cosine against `query`, top-k (ties to the smaller vec_id).
    * `probes` is the query's nprobe nearest centroids — computed on the
    * kilobyte model, not the corpus. */
  def search(index: DataFrame, query: Array[Float], probes: Seq[Long],
      k: Int): DataFrame = {
    val qv: Column = typedlit(query)
    def dot(a: Column, b: Column): Column = VectorFunctions.vecDot(a, b)
    def norm(a: Column): Column = VectorFunctions.vecNorm(a)
    index
      .where(col("cid").isin(probes: _*))
      .withColumn("sim",
        round(dot(col("embedding"), qv) / (norm(col("embedding")) * norm(qv)), 6))
      .select("vec_id", "sim")
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Segment compaction: fold every per-batch partition into one
    * `batch_id=-1` partition (the id the engine never emits — the
    * [[graft.batch.Compaction.compactBatchPartitioned]] contract),
    * PRESERVING the `cid` sub-partitioning so probe filters keep their
    * directory pruning. Vectors don't merge (unlike postings), so this is
    * purely the small-files pass: O(batches·cids) directories fold to
    * O(cids). Safe only between runs of the owning query. Returns
    * (batchPartitionsBefore, batchPartitionsAfter). */
  def compact(spark: SparkSession, indexDir: String): (Int, Int) = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    val before = parts.length
    if (before == 0) return (0, 0)
    val tmp = new org.apache.hadoop.fs.Path(path, "_compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.read.parquet(indexDir)
      .select("cid", "vec_id", "embedding")
      .withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id", "cid").parquet(tmp.toString)
    parts.foreach { p =>
      if (!fs.delete(p.getPath, true))
        throw new java.io.IOException(
          s"VectorIndex.compact: failed to delete '${p.getPath}'; " +
            s"compacted copy intact at '$tmp'")
    }
    val dest = new org.apache.hadoop.fs.Path(path, "batch_id=-1")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp, "batch_id=-1"), dest))
      throw new java.io.IOException(
        s"VectorIndex.compact: rename into '$dest' failed; ORIGINALS WERE " +
          s"DELETED — the data survives under '$tmp', restore manually")
    fs.delete(tmp, true)
    val after = fs.listStatus(path)
      .count(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    (before, after)
  }

  /** The query's probe list: nearest `nprobe` centroids by the same
    * argmin arithmetic, computed model-side (no data touched). */
  def probeList(query: Array[Float], cids: Array[Long],
      centroids: Array[Array[Float]], nprobe: Int): Seq[Long] =
    cids.zip(centroids).map { case (cid, cv) =>
      var s = 0.0
      var i = 0
      val m = math.min(query.length, cv.length)
      while (i < m) {
        val d = query(i).toDouble - cv(i).toDouble
        s += d * d
        i += 1
      }
      (s, cid)
    }.sortBy(identity).take(nprobe).map(_._2).toSeq
}
