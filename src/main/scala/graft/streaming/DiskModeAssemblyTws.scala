package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.batch.ChunkRow
import DiskModeAssembly.{DiskState, FileManifest}

/** Disk-mode reassembly on `transformWithState` — completing the operator
  * matrix: {buffered, disk-mode} × {flatMapGroupsWithState,
  * transformWithState}. Both disk-mode operators call ONE shared fold
  * ([[DiskModeAssembly.foldDisk]]: positioned writes, generation policy,
  * sha512 completion verification, tombstones) and one shared expiry
  * ([[DiskModeAssembly.expire]]), so the classic and modern state APIs
  * cannot drift; only the timer model differs (explicit per-key timers,
  * re-armed per touching batch). Requires the RocksDB state store, same as
  * [[AssemblyStreamTws]] — the at-scale configuration where disk mode
  * matters most: a 50 GB file is ~1 KB of state either way, but the TWS
  * path adds state-schema evolution and per-key timer control for
  * long-lived production streams. */
object DiskModeAssemblyTws {

  /** Set-free mirror of [[DiskState]] for the state store (the TWS value
    * encoder rejects `Set`); pure representation change. */
  final case class DiskStateTws(
      fileHash: Array[Byte],
      nTotal: Int,
      mtime: Option[Double],
      offsets: Array[Long],
      completed: Boolean)

  private def toTws(s: DiskState): DiskStateTws =
    DiskStateTws(s.fileHash, s.nTotal, s.mtime, s.offsets.toArray, s.completed)
  private def fromTws(t: DiskStateTws): DiskState =
    DiskState(t.fileHash, t.nTotal, t.mtime, t.offsets.toSet, t.completed)

  final class DiskProcessor(rootDir: String, timeoutMs: Long)
      extends StatefulProcessor[String, ChunkRow, FileManifest] {

    @transient private var st: ValueState[DiskStateTws] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DiskStateTws](
        "disk", Encoders.product[DiskStateTws], TTLConfig.NONE)

    private def clearTimers(): Unit =
      getHandle.listTimers().foreach(getHandle.deleteTimer)

    override def handleInputRows(
        key: String,
        rows: Iterator[ChunkRow],
        timerValues: TimerValues): Iterator[FileManifest] = {
      val prior = if (st.exists()) Option(fromTws(st.get())) else None
      val (out, next) = DiskModeAssembly.foldDisk(rootDir, key, prior, rows)
      next match {
        case Some(s) =>
          st.update(toTws(s))
          if (timeoutMs > 0) {
            clearTimers()
            getHandle.registerTimer(
              timerValues.getCurrentProcessingTimeInMs() + timeoutMs)
          }
        case None =>
          if (st.exists()) st.clear()
          if (timeoutMs > 0) clearTimers()
      }
      out.iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FileManifest] = {
      val out =
        if (st.exists()) DiskModeAssembly.expire(rootDir, key, fromTws(st.get()))
        else None
      if (st.exists()) st.clear()
      out.iterator
    }
  }

  /** Wire disk-mode assembly on transformWithState over a (streaming)
    * chunk Dataset. `timeoutMs <= 0` disables eviction (no timers). */
  def assemble(
      chunks: Dataset[ChunkRow],
      rootDir: String,
      timeoutMs: Long = AssemblyStream.DefaultTimeoutMs): Dataset[FileManifest] = {
    import chunks.sparkSession.implicits._
    val timeMode =
      if (timeoutMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    chunks
      .groupByKey(_.toChunk.relFilepath)
      .transformWithState(
        new DiskProcessor(rootDir, timeoutMs), timeMode, OutputMode.Append())
  }
}
