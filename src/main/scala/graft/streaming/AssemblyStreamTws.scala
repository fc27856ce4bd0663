package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.batch.{AsmBuf, AssembledFile, ChunkRow}

/** Streaming reassembly on Spark's `transformWithState` operator — the
  * arbitrary-stateful-processing successor to `flatMapGroupsWithState`
  * (SPARK-46815): typed state variables, explicit per-key timers, state
  * schema evolution, and first-class RocksDB integration. Functionally
  * identical to [[AssemblyStream.assemble]] — both call the same
  * [[AssemblyStream.foldRows]] policy fold, so the two operators cannot
  * drift — but the timer model differs: eviction here is an explicit
  * per-key timer (re-armed on every batch that touches the key, deleted on
  * state drop) instead of the group-state timeout duration.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` →
  * `RocksDBStateStoreProvider`) — Spark rejects `transformWithState` on the
  * default HDFS-backed store. That is the at-scale configuration anyway
  * (SCALE.md streaming posture; `SPARK_GRAFT_STATE_STORE=rocksdb` in apps).
  */
object AssemblyStreamTws {

  /** Map-free mirror of [[AsmBuf]] for the state store: transformWithState's
    * state serialization rejects `MapType` in value-state schemas, so the
    * buffered `offset → payload` map flattens to two parallel arrays for
    * the wire and reconstitutes on read. Pure representation change — the
    * policy still works on [[AsmBuf]]. */
  final case class AsmBufTws(
      relFilepath: String,
      filename: String,
      fileHash: Array[Byte],
      nTotal: Int,
      mtime: Option[Double],
      offsets: Array[Long],
      payloads: Array[Array[Byte]],
      completed: Boolean)

  private def toTws(b: AsmBuf): AsmBufTws = {
    val entries = b.buffered.toArray
    AsmBufTws(b.relFilepath, b.filename, b.fileHash, b.nTotal, b.mtime,
      entries.map(_._1), entries.map(_._2), b.completed)
  }
  private def fromTws(t: AsmBufTws): AsmBuf =
    AsmBuf(t.relFilepath, t.filename, t.fileHash, t.nTotal, t.mtime,
      t.offsets.zip(t.payloads).toMap, t.completed)

  /** Per-key processor: one `ValueState[AsmBuf]` plus one live eviction
    * timer per key. The reference keeps partial-file state forever
    * (data_file_chunk_handlers.py:51-53); the timer surfaces timed-out
    * partials as quarantine rows and silently expires completion
    * tombstones, exactly like the group-state-timeout path. */
  final class AssemblyProcessor(timeoutMs: Long)
      extends StatefulProcessor[String, ChunkRow, AssembledFile] {

    @transient private var buf: ValueState[AsmBufTws] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[AsmBufTws](
        "buf", Encoders.product[AsmBufTws], TTLConfig.NONE)

    private def clearTimers(): Unit =
      getHandle.listTimers().foreach(getHandle.deleteTimer)

    override def handleInputRows(
        key: String,
        rows: Iterator[ChunkRow],
        timerValues: TimerValues): Iterator[AssembledFile] = {
      val prior = if (buf.exists()) Option(fromTws(buf.get())) else None
      val (emitted, nextBuf) = AssemblyStream.foldRows(key, prior, rows)
      nextBuf match {
        case Some(b) =>
          buf.update(toTws(b))
          if (timeoutMs > 0) {
            // exactly one live timer per key: re-arm from this batch's clock
            clearTimers()
            getHandle.registerTimer(
              timerValues.getCurrentProcessingTimeInMs() + timeoutMs)
          }
        case None =>
          if (buf.exists()) buf.clear()
          if (timeoutMs > 0) clearTimers()
      }
      emitted.iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AssembledFile] = {
      val out =
        if (buf.exists()) AssemblyStream.quarantineRow(fromTws(buf.get())) else None
      if (buf.exists()) buf.clear()
      out.iterator
    }
  }

  /** Wire the transformWithState assembly over a (streaming) chunk Dataset.
    * `timeoutMs <= 0` disables eviction (TimeMode.None — no timers). */
  def assemble(
      chunks: Dataset[ChunkRow],
      timeoutMs: Long = AssemblyStream.DefaultTimeoutMs): Dataset[AssembledFile] = {
    import chunks.sparkSession.implicits._
    val timeMode =
      if (timeoutMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    chunks
      .groupByKey(_.toChunk.relFilepath)
      .transformWithState(
        new AssemblyProcessor(timeoutMs), timeMode, OutputMode.Append())
  }

  /** [[AsmBufTws]] EVOLVED: adds `firstSeenMs` (when the key's first chunk
    * arrived — the partial-age diagnostic an operator wants when deciding
    * whether a stuck upload is worth waiting for; readable offline via the
    * `statestore` data source). `Option` so the Avro state encoder treats
    * it as nullable-with-default: a V1 checkpoint's rows decode with None.
    * This is the state-schema-evolution path transformWithState exists to
    * support (SPARK-46815); AssemblyTwsSpec proves a checkpoint written by
    * [[AssemblyProcessor]] resumes under [[AssemblyProcessorV2]] with
    * `spark.sql.streaming.stateStore.encodingFormat=avro`. */
  final case class AsmBufTwsV2(
      relFilepath: String,
      filename: String,
      fileHash: Array[Byte],
      nTotal: Int,
      mtime: Option[Double],
      offsets: Array[Long],
      payloads: Array[Array[Byte]],
      completed: Boolean,
      firstSeenMs: Option[Long])

  /** [[AssemblyProcessor]] on the evolved state schema — same fold, same
    * timers; only the buffer representation gains the first-seen stamp. */
  final class AssemblyProcessorV2(timeoutMs: Long)
      extends StatefulProcessor[String, ChunkRow, AssembledFile] {

    @transient private var buf: ValueState[AsmBufTwsV2] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[AsmBufTwsV2](
        "buf", Encoders.product[AsmBufTwsV2], TTLConfig.NONE)

    private def clearTimers(): Unit =
      getHandle.listTimers().foreach(getHandle.deleteTimer)

    private def fromV2(t: AsmBufTwsV2): AsmBuf =
      AsmBuf(t.relFilepath, t.filename, t.fileHash, t.nTotal, t.mtime,
        t.offsets.zip(t.payloads).toMap, t.completed)

    override def handleInputRows(
        key: String,
        rows: Iterator[ChunkRow],
        timerValues: TimerValues): Iterator[AssembledFile] = {
      val priorV2 = if (buf.exists()) Option(buf.get()) else None
      val (emitted, nextBuf) =
        AssemblyStream.foldRows(key, priorV2.map(fromV2), rows)
      nextBuf match {
        case Some(b) =>
          val entries = b.buffered.toArray
          val firstSeen = priorV2.flatMap(_.firstSeenMs)
            .orElse(Some(timerValues.getCurrentProcessingTimeInMs()))
          buf.update(AsmBufTwsV2(b.relFilepath, b.filename, b.fileHash,
            b.nTotal, b.mtime, entries.map(_._1), entries.map(_._2),
            b.completed, firstSeen))
          if (timeoutMs > 0) {
            clearTimers()
            getHandle.registerTimer(
              timerValues.getCurrentProcessingTimeInMs() + timeoutMs)
          }
        case None =>
          if (buf.exists()) buf.clear()
          if (timeoutMs > 0) clearTimers()
      }
      emitted.iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AssembledFile] = {
      val out =
        if (buf.exists()) AssemblyStream.quarantineRow(fromV2(buf.get())) else None
      if (buf.exists()) buf.clear()
      out.iterator
    }
  }

  /** [[assemble]] on the evolved state schema. */
  def assembleV2(
      chunks: Dataset[ChunkRow],
      timeoutMs: Long = AssemblyStream.DefaultTimeoutMs): Dataset[AssembledFile] = {
    import chunks.sparkSession.implicits._
    val timeMode =
      if (timeoutMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    chunks
      .groupByKey(_.toChunk.relFilepath)
      .transformWithState(
        new AssemblyProcessorV2(timeoutMs), timeMode, OutputMode.Append())
  }
}
