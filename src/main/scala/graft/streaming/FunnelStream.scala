package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-sequence funnel: x85's conversion query (stage N enters
  * at the MIN timestamp of its event type that falls inside the window
  * after stage N−1's entry) as an ingest-time stateful operator. State per
  * user is just the three entry timestamps — O(1), independent of event
  * rate; each micro-batch folds its events in timestamp order and emits a
  * row whenever the user's reached stage ADVANCES (append mode — a
  * monotone progress ticker per user).
  *
  * Ordering contract: entry times are exact when each user's events arrive
  * in timestamp order (the Kafka-keyed-by-user deployment — per-key order
  * is guaranteed; the spec pins stream/batch parity under it). Under
  * cross-batch disorder the fold still never regresses (stage times only
  * ever improve within a batch, and stages only advance), but an
  * earlier-timestamped stage-1 event arriving after stage 2 was committed
  * cannot retroactively widen the stage-2 window — the documented
  * approximation every online funnel makes; run x85 as batch backfill for
  * the exact answer.
  *
  * Scale posture: one shuffle by `user_id` (the same key every funnel
  * stage aggregates on in the batch query); state is three longs per
  * ACTIVE user; a processing-time timeout evicts users idle past the
  * funnel horizon (`timeoutMs <= 0` → NoTimeout for availableNow tests,
  * the AssemblyStream contract).
  */
object FunnelStream {

  /** (t1, t2, t3) entry micros; -1 = not reached. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long) {
    def stage: Int = if (t3 >= 0) 3 else if (t2 >= 0) 2 else if (t1 >= 0) 1 else 0
  }

  final case class FunnelHit(user_id: Long, stage: Int, entry_us: Long)

  /** `events`: user_id LONG, event_type STRING, ts TIMESTAMP.
    * `stages`: the ordered event types (default x85's view→click→purchase);
    * `windowUs`: per-step conversion window (default 1 day), matching
    * x85's `INTERVAL 1 DAY`. */
  def track(
      events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      windowUs: Long = 86400000000L,
      timeoutMs: Long = 0L): Dataset[FunnelHit] = {
    require(stages.length == 3, "three-stage funnel")
    import events.sparkSession.implicits._
    val Seq(s1, s2, s3) = stages
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (user: Long, batch: Iterator[(Long, String, Long)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val before = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            // fold this batch's events in ts order: min-entry semantics
            // within the batch, monotone advancement across batches
            val after = batch.toSeq.sortBy(_._3).foldLeft(before) {
              case (s, (_, tpe, us)) =>
                if (tpe == s1 && (s.t1 < 0 || us < s.t1) && s.t2 < 0)
                  // t1 may improve until stage 2 commits
                  FunnelState(us, s.t2, s.t3)
                else if (tpe == s2 && s.t1 >= 0 && s.t2 < 0 &&
                  us > s.t1 && us <= s.t1 + windowUs)
                  FunnelState(s.t1, us, s.t3)
                else if (tpe == s3 && s.t2 >= 0 && s.t3 < 0 &&
                  us > s.t2 && us <= s.t2 + windowUs)
                  FunnelState(s.t1, s.t2, us)
                else s
            }
            state.update(after)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            if (after.stage > before.stage)
              Iterator(FunnelHit(user,
                after.stage,
                after.stage match {
                  case 3 => after.t3
                  case 2 => after.t2
                  case _ => after.t1
                }))
            else Iterator.empty
          }
      }
  }
}
