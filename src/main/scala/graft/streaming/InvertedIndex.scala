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
  * Scale shape: each micro-batch shuffles only ITS OWN postings (rows
  * keyed (term, chunk) after a map-side (doc, term)→tf collapse) — the
  * stored corpus index is never rewritten on arrival. NO stored row's
  * posting array exceeds [[ChunkSize]] entries: a stopword term that
  * appears in every document materializes ceil(df/cap) bounded rows, not
  * one O(corpus) array cell (which would be a task OOM and a one-task
  * straggler at compaction/serving). Chunk ranks come from a
  * per-(term, doc_id-range) `row_number` window — a sort-based exchange
  * that SPILLS on skew instead of allocating, which is exactly the trade
  * the cap exists to make. SCHEMA NOTE: chunk_id is INT64 (range-major)
  * since the range pre-split landed; an index directory holding segments
  * from the earlier INT32-chunk_id build cannot be mixed-read — compact
  * it with the old build first, or rebuild (this library has no released
  * on-disk format yet; the note exists so an upgrade mid-experiment
  * fails understood, not mysterious). Reads are one hash-agg over
  * segments; compaction is one read + one re-chunk + one write.
  * Exactly-once: segments land via
  * [[IdempotentParquetSink]]'s dynamic partition overwrite, so a
  * replayed micro-batch REPLACES its own segment instead of double
  * counting. The ingest model assumes each doc_id arrives in exactly one
  * batch (re-uploads are a dedup gate's job — x166 — not the index's).
  */
object InvertedIndex {

  /** Max postings stored in one row (segment and compacted form alike). */
  val ChunkSize = 4096

  private def tokens(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z]+"), t => t =!= "")

  /** Width of the doc_id pre-split ranges under the chunk window: ranks
    * are computed per (term, doc_id-range) rather than per term, so no
    * single window partition ever holds more than RangeWidth rows — a
    * stopword term at 50B docs would overflow row_number's 32-bit rank
    * (and make one sort partition own the whole term) without it. */
  val RangeWidth: Long = 1L << 30

  /** (doc_id, tok, tf) rows → chunk rows `(tok, chunk_id, df, total_tf,
    * postings[≤cap])`, doc-ordered within and across chunks: chunk_id is
    * range-major ((range << 30) | rank-chunk — a range holds ≤ 2^30 docs
    * so its rank-chunks fit 30 bits at any cap ≥ 1), so ascending
    * chunk_id IS ascending doc_id. df/total_tf are chunk-local; per-term
    * values are their sums (each doc appears in exactly one chunk). Edge
    * chunks at range boundaries may run short of `cap` — the cap is a
    * MAXIMUM (the OOM/straggler bound), not a packing guarantee. */
  private def chunkRows(tf: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("tok", "range").orderBy("doc_id")
    // integer shift, not `/` (which is DoubleType division and loses
    // precision above 2^53 — a boundary doc would land in the wrong range)
    tf.withColumn("range", shiftright(col("doc_id"), 30))
      .withColumn("chunk_id",
        shiftleft(col("range"), 30)
          .bitwiseOR(((row_number().over(w) - 1) / cap).cast("long")))
      .groupBy("tok", "chunk_id")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"),
        sort_array(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))
  }

  /** One batch of documents `(doc_id, text)` → its index segment: per
    * (term, chunk), the chunk-local document frequency, total term
    * frequency, and doc-ordered posting array capped at `cap` entries.
    * The (doc, term) → tf collapse happens map-side (hash agg) before
    * the term exchange, so the shuffle carries one row per posting —
    * x112's exchange, scoped to the batch. */
  def segment(docs: DataFrame): DataFrame = segment(docs, ChunkSize)

  def segment(docs: DataFrame, cap: Int): DataFrame =
    chunkRows(
      docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")),
      cap)

  /** Directory of the doc-stats segments: `<indexDir>/_stats` — the
    * underscore prefix makes it invisible to `spark.read.parquet(indexDir)`
    * (Spark's FileIndex skips `_`/`.` paths), so posting readers never see
    * stats rows and the two segment families ride one index directory. */
  def statsDir(indexDir: String): String =
    new Path(indexDir, "_stats").toString

  /** One batch of documents → its doc-stats segment `(doc_id, dl)`:
    * per-doc token count (Σtf). Maintained INCREMENTALLY alongside the
    * posting segments so BM25 serving never rescans the posting store for
    * document lengths — at corpus scale that rescan costs a full index
    * scan + corpus-width shuffle per query (the round-10 scale flag);
    * the stats segment is O(#docs in the batch) rows written once at
    * arrival, exactly like the reference consolidates derived registry
    * state with the primary on rotation (producer_file_registry.py:80-138). */
  def statsSegment(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id").agg(count(lit(1)).as("dl"))

  /** Read a `batch_id=N`-partitioned segment directory by its explicit
    * children (with the directory as basePath, so the partition column
    * survives). Needed for `_stats`: handing Spark the underscore
    * directory itself trips the hidden-path filter's "all paths were
    * ignored" warning on every read, while explicit non-hidden children
    * read silently — the same dodge VectorIndex.loadModel uses for
    * `_model/gen=N`. */
  private def readSegmentDir(spark: SparkSession, dir: String): DataFrame = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.toString)
    spark.read.option("basePath", dir).parquet(parts.toIndexedSeq: _*)
  }

  /** Per-doc length table `(doc_id, dl)` merged over stats segments (each
    * doc arrives in exactly one batch, so the union IS the table).
    * Requires at least one stats segment — gate with [[hasStats]]. */
  def docStats(spark: SparkSession, indexDir: String): DataFrame =
    readSegmentDir(spark, statsDir(indexDir)).drop("batch_id")

  /** Whether this index directory carries the doc-stats segment family
    * (indexes written before it existed do not). */
  def hasStats(spark: SparkSession, indexDir: String): Boolean = {
    val p = new Path(statsDir(indexDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch_id="))
  }

  /** foreachBatch hook: segment the micro-batch and land it replay-safe —
    * posting chunks under `indexDir/batch_id=N`, doc-length stats under
    * `indexDir/_stats/batch_id=N`. Both ride [[IdempotentParquetSink]]'s
    * dynamic partition overwrite, so a replayed batch replaces BOTH of its
    * segments and the two families can never drift apart. The shared
    * (doc, term) → tf collapse is computed once and cached for the two
    * writes (a micro-batch, not the corpus). */
  def appendBatch(indexDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val tf = batch
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .persist()
    try {
      IdempotentParquetSink.writeBatch(indexDir)(chunkRows(tf, ChunkSize), batchId)
      IdempotentParquetSink.writeBatch(statsDir(indexDir))(
        tf.groupBy("doc_id").agg(sum("tf").as("dl")), batchId)
    } finally tf.unpersist()
  }

  /** Maintain the index from a streaming `(doc_id, text)` source. */
  def maintain(docs: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch(appendBatch(indexDir) _)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Fold segment chunk rows to ONE row per term (array-typed postings —
    * doc-ordered because each doc lives in exactly one segment chunk).
    * This is the SERVING reconstruct for the gate-pinned x112 schema
    * (full `doc:tf` string per term); it re-materializes the per-term
    * array, so use it for term-sliced or small-vocabulary reads. Scale
    * consumers that walk whole posting lists (BM25 — x226) explode the
    * chunk rows directly via [[postings]] and never build this shape. */
  def merge(segments: DataFrame): DataFrame =
    segments.groupBy("tok")
      .agg(sum("df").as("df"), sum("total_tf").as("total_tf"),
        sort_array(flatten(collect_list(col("postings")))).as("postings"))

  /** Posting-level flat view `(tok, doc_id, tf)` of segment chunk rows —
    * the scale-safe consumption shape: no per-term array is ever built,
    * each chunk row explodes independently. */
  def postings(segments: DataFrame): DataFrame =
    segments
      .select(col("tok"), explode(col("postings")).as("p"))
      .select(col("tok"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))

  /** Per-term stats without materializing any posting array: df and
    * total_tf summed over chunk rows. */
  def termStats(segments: DataFrame): DataFrame =
    segments.groupBy("tok")
      .agg(sum("df").as("df"), sum("total_tf").as("total_tf"))

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

  /** BM25 top-k per query term over segment chunk rows — the serving-side
    * retrieval path (the arithmetic x88/x226 pin against the ad-hoc
    * oracle): idf ln(1+(N-df+0.5)/(df+0.5)), k1=1.2, b=0.75, ties to the
    * smaller doc_id, scores rounded to 4 decimals. Consumes the chunked
    * shapes only — no per-term posting array is ever materialized; the
    * doc-length precompute is the one corpus-width exchange, df/N/avgdl
    * broadcast as scalars, and the top-k window sees only docs containing
    * a query term. */
  def bm25From(segments: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val post = postings(segments)
    scoreBm25(post, post.groupBy("doc_id").agg(sum("tf").as("dl")), terms, k)
  }

  /** The shared BM25 scoring tail: `post` is the flat (tok, doc_id, tf)
    * view, `dl` the per-doc length table (however it was obtained). */
  private def scoreBm25(post: DataFrame, dl: DataFrame, terms: Seq[String],
      k: Int): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    // df for the QUERY TERMS ONLY, derived from the already-filtered hits
    // (one posting row per (term, doc), so a per-term count == df), as a
    // window over the query-term slice — joining vocabulary-wide stats
    // onto the full posting set before the term filter was a measured 2×
    // regression at sf0.1, and a separate groupBy would re-evaluate the
    // whole segment pipeline a third time
    val hits = post.filter(col("tok").isin(terms: _*))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("tok")))
    val scored = hits
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("tok").as("term"), col("doc_id"),
        (log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf").cast("double") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
          .as("score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("term")
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .select(col("term"), col("doc_id"), round(col("score"), 4).as("score"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= k).drop("rn")
  }

  /** BM25 served from the STORED index. When the directory carries the
    * doc-stats segment family (anything [[appendBatch]] maintained), the
    * serving plan touches only QUERY-TERM posting chunks: the `tok IN`
    * filter lands on the chunk rows BEFORE any explode, so it pushes down
    * to the parquet scan (row-group stats skip non-matching chunks), and
    * doc lengths / N / avgdl come from the O(#docs) stats segment instead
    * of a full posting-store rescan — the round-10 serving-scale fix. A
    * pre-stats index directory falls back to deriving lengths from the
    * postings (correct, but a corpus-width scan per query). */
  def bm25(spark: SparkSession, indexDir: String, terms: Seq[String],
      k: Int): DataFrame = {
    val segments = spark.read.parquet(indexDir).drop("batch_id")
    if (hasStats(spark, indexDir))
      scoreBm25(postings(segments.filter(col("tok").isin(terms: _*))),
        docStats(spark, indexDir), terms, k)
    else bm25From(segments, terms, k)
  }

  /** Posting-level compaction: fold EVERY segment into one merged segment
    * under `batch_id=-1` (the id the engine never emits — same contract
    * as [[graft.batch.Compaction.compactBatchPartitioned]], which
    * consolidates FILES; this also consolidates ROWS, restoring at most
    * ceil(df/cap) chunk rows per term — NOT one unbounded row: a stopword
    * posting list is re-chunked at [[ChunkSize]], never re-materialized
    * as a single array cell). Safe only between runs of the owning query.
    * Returns (segmentRowsBefore, segmentRowsAfter); `counted = false`
    * skips the row-count scans (report instrumentation — extra segment
    * scans per compaction) and returns (-1, -1). */
  def compact(spark: SparkSession, indexDir: String): (Long, Long) =
    compact(spark, indexDir, ChunkSize)

  def compact(spark: SparkSession, indexDir: String,
      cap: Int, counted: Boolean = true): (Long, Long) = {
    // stats first: if the posting fold later fails mid-way, a re-run still
    // sees a consistent (if partially folded) pair — each family's fold is
    // independently idempotent and serving reads either layout. The stats
    // fold never counts: no caller reads stats row counts.
    foldSegments(spark, statsDir(indexDir), identity, counted = false)
    foldSegments(spark, indexDir,
      df => chunkRows(postings(df), cap), counted)
  }

  /** Fold every `batch_id=N` partition of one segment directory into a
    * single `batch_id=-1` partition via tmp-write → delete → rename (the
    * same consolidate-between-runs contract as
    * [[graft.batch.Compaction.compactBatchPartitioned]]). `rewrite` maps
    * the merged rows to their compacted form (posting re-chunk for the
    * index family, identity for doc-stats). Returns (rowsBefore,
    * rowsAfter); a directory with no segments folds to (0, 0). */
  private def foldSegments(spark: SparkSession, dir: String,
      rewrite: DataFrame => DataFrame, counted: Boolean = true): (Long, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a fresh/empty index (no segments landed yet) compacts to nothing —
    // same contract as VectorIndex.compact, not an AnalysisException
    if (!fs.exists(path) || !fs.listStatus(path).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch_id=")))
      return (0L, 0L)
    val before = if (counted) readSegmentDir(spark, dir).count() else -1L
    val tmp = new Path(path, "_compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    rewrite(readSegmentDir(spark, dir).drop("batch_id"))
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
    (before, if (counted) readSegmentDir(spark, dir).count() else -1L)
  }
}
