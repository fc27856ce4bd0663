package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: the MinHash+LSH dedup of the batch
  * surface (x02 candidates / x27 survivor labeling) as an ingest-time
  * stateful operator. Every arriving document computes its 8-slot MinHash
  * signature IN-ROW (no exploded-shingle shuffle — Core.wordNgrams posture),
  * explodes into 4 LSH band buckets, and each bucket's state remembers the
  * first (anchor) document it ever saw: later arrivals in the same bucket
  * emit `(doc_id, anchor_id)` hits in append mode. Duplicates are flagged
  * against the canonical survivor the moment they arrive, across
  * microbatches — the reference has no analog (its dedup is per-file chunk
  * identity, download_data_file.py:98-107); this is the LLM-pipeline
  * generalization the north star asks for.
  *
  * Scheme (seed format, hash, banding) is IDENTICAL to the batch queries —
  * minhash s = min over word-3-grams g of md5(g || ':' || s), band b's
  * signature = mh_b || mh_{b+4} — so batch backfills and the stream can
  * never disagree on what "near-duplicate" means.
  *
  * Scale posture: state is one tiny row (anchor id) per OBSERVED bucket,
  * partitioned by (band, sig) — the same equi-key that bounds the batch
  * LSH join to Σ bucket²; hot buckets (boilerplate) cost one state row
  * regardless of multiplicity. A processing-time timeout evicts buckets
  * idle past the dedup horizon, so state tracks the active window, not
  * corpus history. RocksDB state store + changelog checkpointing at scale.
  */
object NearDupStream {

  /** A band-bucket collision: `doc_id` matched the bucket whose first-seen
    * (canonical) document is `anchor_id`. */
  case class BandHit(doc_id: Long, anchor_id: Long, band: Int, sig: String)

  /** Per-bucket state: the first (canonical) document this bucket saw. */
  case class Bucket(anchorId: Long)

  val DefaultTimeoutMs: Long = 60 * 60 * 1000L

  /** In-row LSH bands of a (doc_id LONG, text STRING) frame — streaming or
    * batch. Documents with fewer than 3 lowercase-word tokens have no
    * shingles and produce no bands (they cannot near-dup by this measure). */
  def bands(docs: DataFrame): DataFrame = {
    val toks = graft.queries.Core.tokens(col("text"))
    val grams = graft.queries.Core.wordNgrams(toks, 3)
    val mh = (0 until 8).map(s =>
      array_min(transform(col("g"), g => md5(concat(g, lit(s":$s"))))).as(s"mh$s"))
    docs
      .select(col("doc_id"), grams.as("g"))
      .filter(size(col("g")) > 0)
      .select(col("doc_id") +: mh: _*)
      .select(col("doc_id"), explode(array(
        (0 until 4).map(b => struct(lit(b).as("band"),
          concat(col(s"mh$b"), col(s"mh${b + 4}")).as("sig"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Band hits over a streaming document frame. Within one microbatch the
    * anchor of a new bucket is the smallest doc_id (deterministic under
    * micro-batch nondeterminism); everything else in the bucket — same
    * batch or any later one while the bucket lives — emits a hit.
    * `timeoutMs <= 0` disables eviction (NoTimeout) — same contract as
    * [[AssemblyStream.assemble]]: processing-time timeouts re-trigger the
    * microbatch loop continuously even with no data, right for a standing
    * production stream, pure churn for availableNow/test runs. */
  def hits(docs: DataFrame, timeoutMs: Long = DefaultTimeoutMs): Dataset[BandHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bands(docs)
      .as[(Long, Int, String)]
      .groupByKey { case (_, band, sig) => (band, sig) }
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: (Int, String), rows: Iterator[(Long, Int, String)],
            state: GroupState[Bucket]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = rows.map(_._1).toVector.sorted
            val (anchor, dups) = state.getOption match {
              case Some(b) => (b.anchorId, ids)
              case None =>
                val a = ids.head
                state.update(Bucket(a))
                (a, ids.tail)
            }
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            dups.iterator.filter(_ != anchor)
              .map(d => BandHit(d, anchor, key._1, key._2))
          }
        })
  }
}
