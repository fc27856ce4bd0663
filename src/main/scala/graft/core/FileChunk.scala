package graft.core

import org.apache.spark.sql.types._

/** One chunk of one file — the unit that flows through every topic.
  * Mirrors the reference record type (openmsistream
  * data_file_io/entity/data_file_chunk.py:133-166); see SURVEY.md §1.2.
  *
  * @param chunkOffsetWrite byte offset in the reconstructed file (differs from
  *                         the read offset when byte-range selection compacts
  *                         kept ranges)
  * @param chunkI 1-based chunk index
  * @param fileMtime source-file modification time (epoch seconds); None maps
  *                  to 0.0/nil on the wire
  */
final case class FileChunk(
    filename: String,
    fileHash: Array[Byte],
    chunkHash: Array[Byte],
    chunkOffsetWrite: Long,
    chunkI: Int,
    nTotalChunks: Int,
    subdirStr: String,
    filenameAppend: String,
    data: Array[Byte],
    fileMtime: Option[Double]) {

  /** `subdir/filename` — the grouping key for reassembly. */
  def relFilepath: String =
    if (subdirStr == null || subdirStr.isEmpty) filename else s"$subdirStr/$filename"

  /** Message key `{subdir_with_/→_}_{filename}_chunk_{i}_of_{n}` (reference
    * data_file_chunk.py:101-107, data_file_io/utilities.py:59-64). */
  def msgKey: String = {
    val prefix =
      if (subdirStr == null || subdirStr.isEmpty) filename
      else s"${subdirStr.replace("/", "_")}_$filename"
    s"${prefix}_chunk_${chunkI}_of_$nTotalChunks"
  }
}

object FileChunk {
  /** Canonical wire schema (SURVEY.md §1.3). */
  val schema: StructType = StructType(Seq(
    StructField("filename", StringType),
    StructField("file_hash", BinaryType),
    StructField("chunk_hash", BinaryType),
    StructField("chunk_offset_write", LongType),
    StructField("chunk_i", IntegerType),
    StructField("n_total_chunks", IntegerType),
    StructField("subdir_str", StringType),
    StructField("filename_append", StringType),
    StructField("data", BinaryType),
    StructField("file_mtime", DoubleType)))
}

/** A fully reassembled, hash-verified file (the assembler's output row). */
final case class CompletedFile(
    relFilepath: String,
    filename: String,
    nChunks: Int,
    size: Long,
    fileHash: Array[Byte],
    fileMtime: Option[Double],
    data: Array[Byte])
