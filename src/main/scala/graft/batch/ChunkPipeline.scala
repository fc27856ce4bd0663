package graft.batch

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.core._

/** Spark-facing chunk row: snake_case fields so the Dataset schema IS the
  * canonical wire schema (SURVEY.md §1.3) with no renames. */
final case class ChunkRow(
    filename: String,
    file_hash: Array[Byte],
    chunk_hash: Array[Byte],
    chunk_offset_write: Long,
    chunk_i: Int,
    n_total_chunks: Int,
    subdir_str: String,
    filename_append: String,
    data: Array[Byte],
    file_mtime: Option[Double]) {
  def toChunk: FileChunk = FileChunk(filename, file_hash, chunk_hash,
    chunk_offset_write, chunk_i, n_total_chunks, subdir_str, filename_append,
    data, file_mtime)
}

object ChunkRow {
  def apply(c: FileChunk): ChunkRow = ChunkRow(c.filename, c.fileHash,
    c.chunkHash, c.chunkOffsetWrite, c.chunkI, c.nTotalChunks, c.subdirStr,
    c.filenameAppend, c.data, c.fileMtime)
}

/** Assembler aggregation buffer — Assembly.State plus the group's path.
  * `completed` is the streaming tombstone: after a file is emitted, the
  * generation identity stays in state so late duplicates of the same
  * generation drop instead of re-opening (and, in disk mode, clobbering)
  * the finished file; a genuinely newer generation still adopts. Batch
  * aggregation never sets it (completion is evaluated once, in finish). */
final case class AsmBuf(
    relFilepath: String,
    filename: String,
    fileHash: Array[Byte],
    nTotal: Int,
    mtime: Option[Double],
    buffered: Map[Long, Array[Byte]],
    completed: Boolean)

/** Assembler output row. `code` follows the reference
  * (3 complete+verified, 2 incomplete, -1 hash mismatch). */
final case class AssembledFile(
    rel_filepath: String,
    filename: String,
    code: Int,
    n_chunks: Int,
    size: Long,
    file_hash: Array[Byte],
    file_mtime: Option[Double],
    data: Array[Byte])

/** Batch chunk dataflow: chunker (T1) as a flatMap generator, codec (C1/C2)
  * as functions over the wire column, reassembly+generation policy (G1/G2) as
  * a typed [[Aggregator]] with map-side partial merge (duplicate and stale
  * chunks collapse before the shuffle — at 100 TB the shuffle carries each
  * surviving payload exactly once).
  */
object ChunkPipeline {

  /** Typed merge-able reassembly aggregator over [[Assembly]]'s pure policy. */
  val assembler: Aggregator[ChunkRow, AsmBuf, AssembledFile] =
    new Aggregator[ChunkRow, AsmBuf, AssembledFile] {
      import org.apache.spark.sql.{Encoder, Encoders}
      def zero: AsmBuf = AsmBuf(null, null, null, 0, None, Map.empty, completed = false)
      private def state(b: AsmBuf): Option[Assembly.State] =
        if (b.relFilepath == null) None
        else Some(Assembly.State(b.fileHash, b.nTotal, b.mtime, b.buffered))
      private def buf(rel: String, name: String, s: Assembly.State): AsmBuf =
        AsmBuf(rel, name, s.fileHash, s.nTotal, s.mtime, s.buffered, completed = false)
      def reduce(b: AsmBuf, r: ChunkRow): AsmBuf = {
        val c = r.toChunk
        val (next, _) = Assembly.step(state(b), c)
        buf(c.relFilepath, c.filename, next)
      }
      def merge(a: AsmBuf, b: AsmBuf): AsmBuf =
        if (a.relFilepath == null) b
        else if (b.relFilepath == null) a
        else buf(a.relFilepath, a.filename, Assembly.merge(state(a).get, state(b).get))
      def finish(b: AsmBuf): AssembledFile = {
        if (b.relFilepath == null) return AssembledFile(null, null, Assembly.Code.InProgress, 0, 0L, null, None, null)
        val (code, fileOpt) = Assembly.finish(b.relFilepath, b.filename, state(b).get)
        fileOpt match {
          case Some(f) => AssembledFile(f.relFilepath, f.filename, code, f.nChunks,
            f.size, f.fileHash, f.fileMtime, f.data)
          case None => AssembledFile(b.relFilepath, b.filename, code,
            b.buffered.size, b.buffered.valuesIterator.map(_.length.toLong).sum,
            b.fileHash, b.mtime, null)
        }
      }
      def bufferEncoder: Encoder[AsmBuf] = Encoders.product[AsmBuf]
      def outputEncoder: Encoder[AssembledFile] = Encoders.product[AssembledFile]
    }

  /** Chunk a `(filename, subdir, content, mtime)` dataset. */
  def chunkFiles(
      files: Dataset[(String, String, Array[Byte], Option[Double])],
      chunkSize: Int): Dataset[ChunkRow] = {
    import files.sparkSession.implicits._
    files.flatMap { case (name, subdir, content, mtime) =>
      Chunker.chunk(name, subdir, content, chunkSize, Nil, mtime).map(ChunkRow(_))
    }
  }

  /** Wire-encode chunks to `(key, value)` rows for a Kafka-shaped sink. */
  def encode(chunks: Dataset[ChunkRow]): DataFrame = {
    import chunks.sparkSession.implicits._
    chunks.map(r => (r.toChunk.msgKey, ChunkCodec.pack(r.toChunk))).toDF("key", "value")
  }

  /** Decode wire `value` bytes back to chunks (hash-verifying). */
  def decode(wire: DataFrame): Dataset[ChunkRow] = {
    import wire.sparkSession.implicits._
    wire.select("value").as[Array[Byte]].map(b => ChunkRow(ChunkCodec.unpack(b)))
  }

  /** Decode outcome row for dead-letter routing. */
  final case class DecodeResult(
      chunk: Option[ChunkRow], key: String, value: Array[Byte], error: String)

  /** Decode with dead-letter routing (the C4 shape: the reference dumps
    * undecryptable/corrupt messages to ENCRYPTED_MESSAGES/ instead of
    * failing, data_file_download_directory.py:108-136). Callers split with
    * `.filter(_.error == null)` / `.filter(_.error != null)`. */
  def decodeOrDeadLetter(wire: DataFrame): Dataset[DecodeResult] = {
    import wire.sparkSession.implicits._
    wire.selectExpr("CAST(key AS STRING) AS key", "value")
      .as[(String, Array[Byte])]
      .map { case (k, v) =>
        try DecodeResult(Some(ChunkRow(ChunkCodec.unpack(v))), k, v, null)
        catch {
          case e: Exception =>
            // some JDK exceptions (e.g. BufferUnderflow) carry a null message
            DecodeResult(None, k, v,
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
        }
      }
  }

  /** Reassemble chunks into verified files. */
  def assemble(chunks: Dataset[ChunkRow]): Dataset[AssembledFile] = {
    import chunks.sparkSession.implicits._
    chunks.groupByKey(_.toChunk.relFilepath)
      .agg(assembler.toColumn.name("assembled"))
      .map(_._2)
  }
}
