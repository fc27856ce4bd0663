package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 (type-2 history) maintenance: x98's versioned validity
  * intervals built incrementally at ingest — the reference's file registry
  * as a stream instead of a rewrite-in-place table (its dataclass_table
  * keeps only CURRENT state per file; this emits each state's closed
  * interval the moment the next state supersedes it, so the full history
  * x89/x98 read temporally accretes as an append-only log).
  *
  * State per user is ONE open run (type, version, start, count) — O(1),
  * independent of event rate. A micro-batch folds its events in
  * `(ts, event_id)` order (the batch query's total-order tiebreak); every
  * type TRANSITION emits the superseded run as a closed
  * `[valid_from, valid_to)` row. The open run stays in state: it is the
  * registry's current-state row, emitted only when superseded — so the
  * emitted stream equals exactly the `valid_to IS NOT NULL` rows of x98
  * when each user's events arrive in timestamp order (per-key Kafka
  * ordering; the spec pins this parity on real events). Late cross-batch
  * disorder folds the event into the CURRENT run rather than rewriting
  * committed intervals — append-only sinks cannot retract; run x98 as
  * batch backfill for the exact historical answer.
  *
  * Scale posture: one shuffle by `user_id` (identical to x98's single
  * exchange), O(1) state per active user, and a processing-time timeout
  * evicts idle users (`timeoutMs <= 0` → NoTimeout for availableNow
  * tests — the AssemblyStream contract). An evicted user's open run is
  * dropped, not emitted: the authoritative open row is the registry's
  * current-state table, and emitting it would fabricate a `valid_to`. */
object Scd2Stream {

  /** The one open run per user held in state. */
  final case class RunState(tpe: String, ver: Int, fromUs: Long, n: Long)

  /** A closed validity interval (append-only history row). */
  final case class ClosedRun(user_id: Long, ver: Int, event_type: String,
      valid_from_us: Long, valid_to_us: Long, n_events: Long)

  /** `events`: user_id LONG, event_id LONG, event_type STRING, ts TIMESTAMP. */
  def history(events: DataFrame, timeoutMs: Long = 0L): Dataset[ClosedRun] = {
    import events.sparkSession.implicits._
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (user: Long, batch: Iterator[(Long, Long, String, Long)],
         state: GroupState[RunState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = Vector.newBuilder[ClosedRun]
            var cur = state.getOption.orNull
            for ((_, _, tpe, us) <- batch.toSeq.sortBy(t => (t._4, t._2))) {
              if (cur == null) cur = RunState(tpe, 1, us, 1L)
              else if (cur.tpe == tpe) cur = cur.copy(n = cur.n + 1L)
              else {
                out += ClosedRun(user, cur.ver, cur.tpe, cur.fromUs, us, cur.n)
                cur = RunState(tpe, cur.ver + 1, us, 1L)
              }
            }
            if (cur != null) state.update(cur)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            out.result().iterator
          }
      }
  }
}
