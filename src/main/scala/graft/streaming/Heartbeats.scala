package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heartbeat and log-forwarding aggregations (G6/G7): tumbling event-time
  * windows over the message stream, emitted as JSON `(key, value)` rows for
  * a heartbeat/log topic sink (reference heartbeat_producibles.py:9-108,
  * log_producibles.py:10-27; intervals default 900 s / 60 s per
  * utilities/argument_parsing.py:95-97).
  *
  * The reference counts activity since the last beat with mutable counters;
  * the windowed aggregation is the Spark-native equivalent — watermarking
  * bounds state, and counts are per (window, program) exactly-once.
  */
object Heartbeats {

  /** `msgs` needs columns (ts TIMESTAMP, program_id STRING, n_bytes LONG). */
  def heartbeatStream(
      msgs: DataFrame,
      intervalSecs: Int = 900,
      watermark: String = "1 minute"): DataFrame = {
    msgs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$intervalSecs seconds"), col("program_id"))
      .agg(count(lit(1)).as("n_messages"), sum("n_bytes").as("n_bytes"))
      .select(
        concat(col("program_id"), lit("_heartbeat")).as("key"),
        to_json(struct(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("timestamp"),
          col("program_id"), col("n_messages"), col("n_bytes"))).as("value"))
  }

  /** Name under which [[observed]] publishes its per-batch metrics. */
  val ObserveName = "graft_progress"

  /** Zero-cost progress counters piggybacked on the MAIN dataflow
    * (`Dataset.observe`): the accumulator-backed metrics ride the query
    * that is running anyway — no second aggregation, no second
    * subscription over the stream (what [[heartbeatStream]] costs when the
    * beats must be exact event-time windows; these are per-micro-batch
    * processing-time counters, which is precisely the reference's mutable
    * produce-counter semantics, heartbeat_producibles.py:9-108). Expects a
    * wire frame with a binary/string `value` column. */
  def observed(wire: DataFrame): DataFrame =
    wire.observe(ObserveName,
      count(lit(1)).as("n_messages"),
      coalesce(sum(length(col("value"))), lit(0L)).as("n_bytes"))

  /** Listener turning each micro-batch's observed metrics into a reference-
    * shaped heartbeat `(key, value)` pair handed to `onBeat` — the
    * heartbeat-topic producer hook (register on `spark.streams`). */
  final class ProgressBeats(programId: String, onBeat: (String, String) => Unit)
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val m = e.progress.observedMetrics.get(ObserveName)
      if (m != null)
        onBeat(s"${programId}_heartbeat",
          s"""{"batch":${e.progress.batchId},"program_id":"$programId",""" +
            s""""n_messages":${m.getLong(0)},"n_bytes":${m.getLong(1)}}""")
    }
  }

  /** State-store observability → parquet registry: one row per
    * (micro-batch, stateful operator) with `num_rows_total`,
    * rows updated/removed this batch, and the store's memory footprint —
    * the metrics that make assembly-state growth (the reference's known
    * failure mode: `files_in_progress_by_path` grows forever,
    * stream_handler_registries.py:19-51) a QUERYABLE table instead of a
    * log line. Register on `spark.streams`; rows append to `registryDir`
    * as ordinary parquet next to the K5 processing registry, so the same
    * SQL that audits completions can audit state: eviction working ⇒
    * `num_rows_total` shrinks after timeouts fire ([[graft.streaming
    * .AssemblyStream]] quarantine path), and a monotone series is the
    * alert. Rows are captured on the listener-bus thread (cheap) but the
    * parquet append — a full Spark job — runs on a dedicated daemon
    * thread, so a slow filesystem never delays delivery to other
    * listeners; the queue is bounded (beats drop with a log line past 64
    * in flight) and a write failure logs and drops the beat rather than
    * failing the listener. */
  final class StateRegistry(spark: org.apache.spark.sql.SparkSession,
      programId: String, registryDir: String)
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val pending = new java.util.concurrent.atomic.AtomicInteger(0)
    private val exec = java.util.concurrent.Executors.newSingleThreadExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-state-registry"); t.setDaemon(true); t
      })
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    @volatile private var lastEventNanos = System.nanoTime()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      lastEventNanos = System.nanoTime()
      val ops = e.progress.stateOperators
      if (ops == null || ops.isEmpty) return
      val rows = ops.zipWithIndex.toSeq.map { case (op, i) =>
        (programId, e.progress.id.toString, e.progress.batchId, i,
          op.operatorName, op.numRowsTotal, op.numRowsUpdated,
          op.numRowsRemoved, op.memoryUsedBytes, e.progress.timestamp)
      }
      if (pending.incrementAndGet() > 64) {
        pending.decrementAndGet()
        System.err.println("[state-registry] backlog > 64 appends; dropping beat")
      } else exec.submit(new Runnable {
        override def run(): Unit =
          try {
            import spark.implicits._
            rows.toDF("program_id", "query_id", "batch_id", "op_idx", "operator",
                "num_rows_total", "num_rows_updated", "num_rows_removed",
                "state_bytes", "ts")
              .write.mode("append").parquet(registryDir)
          } catch {
            case ex: Exception =>
              System.err.println(s"[state-registry] append failed: ${ex.getMessage}")
          } finally pending.decrementAndGet()
      })
    }
    /** Block until every queued append has landed (shutdown/test hook).
      * StreamingQueryListener events ride Spark's async listener bus, so a
      * final beat can be DELIVERED after awaitTermination() returns; a bare
      * queue-flush would miss it. Two conditions must both hold before the
      * executor queue is flushed: at least `settleMillis` has elapsed
      * since drain() was CALLED (an event already queued on a lagging bus
      * at call time gets that long to arrive), and no new progress event
      * has landed for `settleMillis` (the bus has gone quiet). Heuristic —
      * the bus exposes no public drained-signal — but bounded (30 s) and
      * strictly conservative in both directions. */
    def drain(settleMillis: Long = 1000L): Unit = {
      val start = System.nanoTime()
      val settle = settleMillis * 1000000L
      val deadline = start + 30L * 1000 * 1000 * 1000
      while ({
        val now = System.nanoTime()
        (now - start < settle || now - lastEventNanos < settle) &&
          now < deadline
      }) Thread.sleep(50)
      exec.submit(new Runnable { override def run(): Unit = () }).get()
    }
  }

  /** Log forwarding (G7): drain log records into one JSON message per
    * (window, program), capped at `maxLogsPerMessage` (default 65536,
    * controlled_processes_heartbeats_logs.py:266-269). */
  def logStream(
      logs: DataFrame, // (ts TIMESTAMP, program_id STRING, message STRING)
      intervalSecs: Int = 60,
      maxLogsPerMessage: Int = 65536,
      watermark: String = "1 minute"): DataFrame = {
    logs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$intervalSecs seconds"), col("program_id"))
      .agg(slice(collect_list(col("message")), 1, maxLogsPerMessage).as("messages"))
      .select(
        concat(col("program_id"), lit("_logs")).as("key"),
        to_json(struct(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("timestamp"),
          col("program_id"), col("messages"))).as("value"))
  }
}
