package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.batch.Sketches

/** Streaming heavy-hitter terms: x84's Misra–Gries sketch maintained as
  * ingest-time state — the "what's trending in the corpus RIGHT NOW"
  * monitor a training-data intake runs, without ever re-scanning history.
  *
  * Tokens hash into `nShards` independent shards; each shard folds its
  * tokens through one [[Sketches.MGSummary]] held in state (O(k) per
  * shard — total state is nShards·k counters, CONSTANT in stream length).
  * Because sharding partitions the token space, each shard's classic MG
  * guarantee holds against its own processed count: every token with true
  * frequency > n_shard/(k+1) is present in that shard's counters, and no
  * count is ever overestimated. A reader unions the newest emission of
  * every shard ([[merged]]) for the global candidate set — disjoint
  * supports make the union trivially valid (no cross-shard counter can
  * name the same token).
  *
  * Each micro-batch that touches a shard appends `(shard, gen, counters,
  * processed)` with a per-shard generation number, so an append-only sink
  * stays a valid time series of sketch snapshots and the newest `gen` per
  * shard is the current state. One shuffle by shard; a processing-time
  * timeout (`timeoutMs <= 0` → NoTimeout, the AssemblyStream contract)
  * evicts shards idle past the monitoring horizon. */
object TopTermsStream {

  final case class ShardSketch(shard: Int, gen: Long,
      counters: Map[String, Long], processed: Long)

  /** Stable shard id — replicated by specs/readers, so keep it trivial. */
  def shardOf(token: String, nShards: Int): Int =
    math.floorMod(token.hashCode, nShards)

  /** `tokens`: a streaming DataFrame with a string `tok` column. */
  def track(tokens: DataFrame, k: Int = 64, nShards: Int = 16,
      timeoutMs: Long = 0L): Dataset[ShardSketch] = {
    import tokens.sparkSession.implicits._
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val mg = new Sketches.MisraGries(k)
    tokens
      .select(col("tok").cast("string"))
      .as[String]
      .groupByKey(shardOf(_, nShards))
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (shard: Int, batch: Iterator[String],
         state: GroupState[(Long, Sketches.MGSummary)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (gen, before) = state.getOption.getOrElse((0L, mg.zero))
            val after = batch.foldLeft(before)(mg.reduce)
            state.update((gen + 1, after))
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            Iterator(ShardSketch(shard, gen + 1, after.counters, after.processed))
          }
      }
  }

  /** Union the NEWEST emission per shard into the global candidate set
    * (token supports are disjoint across shards, so plain concatenation is
    * the exact union). `emissions`: a batch frame of [[ShardSketch]] rows,
    * e.g. the memory/parquet sink an append query fed. */
  def merged(emissions: DataFrame): Map[String, Long] = {
    import emissions.sparkSession.implicits._
    emissions
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("gen").desc)))
      .filter(col("rn") === 1)
      .select(explode(col("counters")))
      .as[(String, Long)]
      .collect().toMap
  }
}
