package graft.streaming

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.ForeachWriter
import org.apache.spark.util.LongAccumulator

import graft.batch.{AssembledFile, ChunkRow}

/** Executor-side sinks (K2 family).
  *
  * [[CompletedFileWriter]] writes whole verified files (the memory-mode path,
  * data_file_stream_handler.py:57-74): idempotent under replay because the
  * content is hash-verified upstream, so a rewrite is byte-identical.
  *
  * [[PositionedChunkWriter]] is the disk-mode path
  * (download_data_file.py:355-372): seek to `chunk_offset_write`, write,
  * flush — per-partition channels, one file per `rel_filepath`; partitioning
  * by file path upstream gives single-writer-per-file without locks.
  *
  * Both writers take an optional `rejected` [[LongAccumulator]] (register one
  * via `spark.sparkContext.longAccumulator("unsafe_paths")`) so path-rejected
  * rows are a queryable driver-side signal, matching the manifest row the
  * DiskModeAssembly path emits — not just a stderr line lost in executor logs.
  */
final class CompletedFileWriter(rootDir: String,
    rejected: Option[LongAccumulator] = None) extends ForeachWriter[AssembledFile] {
  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def process(f: AssembledFile): Unit = {
    if (f.code == graft.core.Assembly.Code.Complete && f.data != null) {
      // untrusted wire path: validate before any write (no `..`/absolute);
      // skip rather than throw so one malicious row can't poison the stream
      if (graft.core.SafePaths.isSafe(f.rel_filepath)) {
        val target = graft.core.SafePaths.resolveUnderMkdirs(rootDir, f.rel_filepath)
        Files.write(target, f.data)
      } else {
        rejected.foreach(_.add(1L))
        System.err.println(
          s"[CompletedFileWriter] unsafe rel_filepath skipped: '${f.rel_filepath}'")
      }
    }
  }
  override def close(errorOrNull: Throwable): Unit = ()
}

final class PositionedChunkWriter(rootDir: String,
    rejected: Option[LongAccumulator] = None) extends ForeachWriter[ChunkRow] {
  @transient private var channels: scala.collection.mutable.Map[String, FileChannel] = _
  override def open(partitionId: Long, epochId: Long): Boolean = {
    channels = scala.collection.mutable.Map.empty
    true
  }
  private def channel(rel: String): FileChannel =
    channels.getOrElseUpdate(rel, {
      val target = graft.core.SafePaths.resolveUnderMkdirs(rootDir, rel)
      FileChannel.open(target, StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    })
  override def process(c: ChunkRow): Unit = {
    val rel = if (c.subdir_str == null || c.subdir_str.isEmpty) c.filename
      else s"${c.subdir_str}/${c.filename}"
    if (graft.core.SafePaths.isSafe(rel))
      channel(rel).write(ByteBuffer.wrap(c.data), c.chunk_offset_write)
    else {
      rejected.foreach(_.add(1L))
      System.err.println(
        s"[PositionedChunkWriter] unsafe rel_filepath skipped: '$rel'")
    }
  }
  override def close(errorOrNull: Throwable): Unit = {
    if (channels != null) channels.valuesIterator.foreach { ch =>
      try { ch.force(false); ch.close() } catch { case _: Throwable => }
    }
  }
}
