package graft.batch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequency sketches — the 100 TB replacements for exact
  * "top terms" / heavy-hitter scans (x24 covers distinct counts and
  * percentiles with HLL++/GK; this adds frequencies). Implemented as a
  * typed [[Aggregator]] (custom UDAF surface, SURVEY §2.9): fixed-size
  * state, associative map-side merge, so the full corpus never shuffles —
  * only O(k) counters per partition do.
  */
object Sketches {

  /** Misra–Gries heavy-hitters summary: at most `k` counters. For a stream
    * of n items, every item with true frequency > n/(k+1) is guaranteed
    * present, and each reported count underestimates the true count by at
    * most n/(k+1) (classic MG bound; the merge of Agarwal et al. 2013 —
    * sum counters, then subtract the (k+1)-th largest and drop ≤0 —
    * preserves it, which is what makes the sketch cluster-safe: partitions
    * sketch independently and merge associatively). */
  final case class MGSummary(counters: Map[String, Long], processed: Long)

  final class MisraGries(k: Int)
      extends Aggregator[String, MGSummary, Map[String, Long]] {
    require(k > 0, "k must be positive")

    override def zero: MGSummary = MGSummary(Map.empty, 0L)

    override def reduce(s: MGSummary, item: String): MGSummary = {
      val c = s.counters
      val next =
        if (c.contains(item)) c.updated(item, c(item) + 1L)
        else if (c.size < k) c.updated(item, 1L)
        else {
          // Decrement-all step: every counter pays one; zeros evicted.
          c.iterator.map { case (w, n) => (w, n - 1L) }
            .filter(_._2 > 0L).toMap
        }
      MGSummary(next, s.processed + 1L)
    }

    override def merge(a: MGSummary, b: MGSummary): MGSummary = {
      val summed = b.counters.foldLeft(a.counters) { case (acc, (w, n)) =>
        acc.updated(w, acc.getOrElse(w, 0L) + n)
      }
      val trimmed =
        if (summed.size <= k) summed
        else {
          val kth = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
          summed.iterator.map { case (w, n) => (w, n - kth) }
            .filter(_._2 > 0L).toMap
        }
      MGSummary(trimmed, a.processed + b.processed)
    }

    override def finish(s: MGSummary): Map[String, Long] = s.counters

    override def bufferEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
