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

  /** Register the sketches as SQL aggregate functions (the UDAF face of
    * SURVEY §2.9, next to pack_chunk/vec_dot's Expression face): `mg_topk`
    * (string → map of heavy hitters), `kmv_distinct` (string → distinct
    * estimate), `bottomk_sample` (string → k-sample array), `ares_sample`
    * (string, weight → weighted sample). Sketch sizes are fixed at
    * registration — SQL functions cannot thread constructor parameters —
    * with the same defaults the x84/x95/x97/x99 queries use. */
  def registerSql(spark: org.apache.spark.sql.SparkSession,
      mgK: Int = 256, kmvK: Int = 256, bottomK: Int = 20, aresK: Int = 20): Unit = {
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("mg_topk", udaf(new MisraGries(mgK), Encoders.STRING))
    spark.udf.register("kmv_distinct", udaf(new Kmv(kmvK), Encoders.STRING))
    spark.udf.register("bottomk_sample", udaf(new BottomK(bottomK), Encoders.STRING))
    spark.udf.register("ares_sample", udaf(new ARes(aresK),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)))
  }

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

  /** KMV (k-minimum-values) distinct sketch — the theta-sketch family's
    * simplest member (Bar-Yossef et al. 2002; Beyer et al. 2007 for the
    * unbiased estimator), and the structure behind Druid/Trino's
    * `approx_set` union/intersection algebra. State = the k smallest
    * 64-bit hashes seen; merge = union-then-trim (associative, so
    * partitions sketch independently — O(k) per partition crosses the
    * wire). Distinct estimate = (k−1)/R where R is the k-th smallest hash
    * normalized to (0,1]; with fewer than k values the count is exact.
    * Two sketches also answer SET questions: Jaccard ≈ overlap fraction in
    * the k smallest of the union ([[Kmv.jaccard]]), which HLL cannot do. */
  final case class KmvState(values: Vector[Long])

  final class Kmv(k: Int) extends Aggregator[String, KmvState, Double] {
    require(k > 1, "k must be > 1")

    // hashes are masked non-negative (63 bits), so ascending signed sort IS
    // ascending uniform order and norm maps to (0, 1]
    private def norm(h: Long): Double = (h.toDouble + 1.0) / Long.MaxValue.toDouble

    private def trim(sorted: Vector[Long]): Vector[Long] =
      if (sorted.length <= k) sorted else sorted.take(k)

    override def zero: KmvState = KmvState(Vector.empty)

    override def reduce(s: KmvState, item: String): KmvState = {
      val h = (scala.util.hashing.MurmurHash3.stringHash(item).toLong << 32 |
        (scala.util.hashing.MurmurHash3.stringHash(item.reverse).toLong & 0xffffffffL)) &
        Long.MaxValue
      // hot-path: a full sketch rejects anything ≥ its k-th value in O(1) —
      // once warm, almost every row takes this branch
      if (s.values.length == k && h >= s.values.last) s
      else if (s.values.contains(h)) s
      else KmvState(trim((s.values :+ h).sorted))
    }

    override def merge(a: KmvState, b: KmvState): KmvState =
      KmvState(trim((a.values ++ b.values).distinct.sorted))

    override def finish(s: KmvState): Double =
      if (s.values.length < k) s.values.length.toDouble // exact below k
      else (k - 1).toDouble / norm(s.values.last)

    override def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  object Kmv {
    /** Jaccard similarity estimate from two same-k KMV states: the overlap
      * fraction within the k smallest hashes of the union (the classic
      * KMV set-operation trick). */
    def jaccard(a: KmvState, b: KmvState, k: Int): Double = {
      val union = (a.values ++ b.values).distinct.sorted.take(k)
      if (union.isEmpty) return 0.0
      val inBoth = union.count(h => a.values.contains(h) && b.values.contains(h))
      inBoth.toDouble / union.length
    }
  }

  /** [[Kmv]] variant surfacing the raw sketch STATE (the k minimum hashes)
    * instead of the collapsed estimate — the form set algebra needs: states
    * combine across groups (union = merged minima, intersection share =
    * overlap within the union's k smallest), where finished numbers cannot.
    * Same reduce/merge, so every partition-invariance property carries. */
  final class KmvValues(k: Int)
      extends Aggregator[String, KmvState, Seq[Long]] {
    private val inner = new Kmv(k)
    override def zero: KmvState = inner.zero
    override def reduce(s: KmvState, item: String): KmvState = inner.reduce(s, item)
    override def merge(a: KmvState, b: KmvState): KmvState = inner.merge(a, b)
    override def finish(s: KmvState): Seq[Long] = s.values
    override def bufferEncoder: Encoder[KmvState] = inner.bufferEncoder
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Count-Min frequency sketch (Cormode & Muthukrishnan 2005): a depth×width
    * grid of counters; each item increments one counter per row (row-seeded
    * hash), a point query reads the MINIMUM across rows. Estimates only ever
    * OVERcount (collisions add, never subtract), and exceed the true count by
    * more than e·n/width with probability ≤ e^-depth. Unlike Misra–Gries the
    * merge is an element-wise SUM — exact and commutative — so the sketch is
    * bit-identical at any parallelism, and unlike MG it answers point queries
    * for ANY item, not just the survivors. MG finds the candidates (x84);
    * CM audits any candidate's frequency without a second corpus pass. */
  final case class CmState(counts: Array[Long], n: Long)

  final class CountMin(depth: Int, width: Int)
      extends Aggregator[String, CmState, CmState] {
    require(depth > 0 && width > 1, "depth must be > 0, width > 1")

    // fresh array per group: reduce/merge mutate in place (the typed
    // Aggregator keeps partition-local buffers as live objects; only
    // partition boundaries serialize), so zero must never share state
    override def zero: CmState = CmState(new Array[Long](depth * width), 0L)

    override def reduce(s: CmState, item: String): CmState = {
      var r = 0
      while (r < depth) {
        s.counts(r * width + CountMin.cell(item, r, width)) += 1L
        r += 1
      }
      CmState(s.counts, s.n + 1L)
    }

    override def merge(a: CmState, b: CmState): CmState = {
      var i = 0
      while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
      CmState(a.counts, a.n + b.n)
    }

    override def finish(s: CmState): CmState = s

    override def bufferEncoder: Encoder[CmState] = Encoders.product[CmState]
    override def outputEncoder: Encoder[CmState] = Encoders.product[CmState]
  }

  object CountMin {
    /** Row-r cell index for an item: murmur3 with the row number as seed. */
    def cell(item: String, r: Int, width: Int): Int = {
      val h = scala.util.hashing.MurmurHash3.stringHash(item, r)
      math.floorMod(h, width)
    }

    /** Point-frequency estimate: min across the depth rows. */
    def estimate(counts: Seq[Long], depth: Int, width: Int, item: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = counts(r * width + cell(item, r, width))
        if (c < best) best = c
        r += 1
      }
      best
    }
  }

  /** Deterministic bottom-k sample: keep the k items with the smallest
    * md5(item) — the sketch form of a uniform k-sample without replacement
    * (md5 is the reproducible stand-in for a random priority, the same
    * convention as the hash-sampling queries x22/x36/x40). The window-sort
    * quota sampler (x36) computes the identical selection by SORTING each
    * stratum; this Aggregator carries only O(k) state per partition and
    * merges by union-then-trim, so nothing is ever sorted beyond k rows —
    * the selection is a pure function of the item set, hence identical at
    * any parallelism, across retries, and to a DuckDB md5-rank oracle.
    * Duplicate items hash identically and dedup: the sample is over the
    * DISTINCT item set. */
  final case class BkEntry(prio: String, value: String)
  final case class BkState(entries: Vector[BkEntry])

  /** Weighted-sample sketch (A-RES, Efraimidis–Spirakis 2006): keep the k
    * items with the LARGEST priority ln(u)/w, where u is the same
    * deterministic md5-derived 52-bit uniform as the window-sort sampler
    * x79 — so this is x79's selection computed as a mergeable sketch
    * (O(k) state per partition, union-then-trim merge, no stratum sort),
    * exactly [[BottomK]]'s relationship to x36 but weight-aware: an item
    * with weight w wins a slot with probability proportional to w. The
    * priority is a pure function of (item, weight), so the sample is
    * identical at any parallelism and reproducible by a SQL oracle. */
  final case class WEntry(k: Double, value: String)
  final case class WState(entries: Vector[WEntry])

  final class ARes(slots: Int)
      extends Aggregator[(String, Long), WState, Seq[WEntry]] {
    require(slots > 0, "slots must be positive")

    /** ln(u)/w with u = (52-bit md5 prefix + 1) / 2^52 — byte-for-byte the
      * x79 key, so sketch and window sampler can never disagree. */
    private def prio(item: String, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(item.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4503599627370496.0
      math.log(u) / w
    }

    override def zero: WState = WState(Vector.empty)

    override def reduce(s: WState, item: (String, Long)): WState = {
      val k = prio(item._1, item._2)
      // warm-sketch fast path: a full sample rejects any priority ≤ its
      // worst kept one in O(1)
      if (s.entries.length == slots && k <= s.entries.last.k) s
      else if (s.entries.exists(_.value == item._1)) s
      else WState((s.entries :+ WEntry(k, item._1)).sortBy(-_.k).take(slots))
    }

    override def merge(a: WState, b: WState): WState =
      WState((a.entries ++ b.entries).distinctBy(_.value).sortBy(-_.k).take(slots))

    /** Kept entries in priority (descending-key) order. */
    override def finish(s: WState): Seq[WEntry] = s.entries

    override def bufferEncoder: Encoder[WState] = Encoders.product[WState]
    override def outputEncoder: Encoder[Seq[WEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[WEntry]]()
  }

  /** Bounded top-k aggregator — the heap form of "top N per group": keep
    * the k best `(key DESC, a ASC, b ASC)` entries seen. The window form
    * (q21g/x74) SORTS every group to rank it; this carries O(k) state per
    * group per partition and map-side combines, so a group's rows never
    * gather anywhere — the right shape when groups are huge (a hot
    * supplier at 100 TB) or skewed. Multiset semantics: genuinely duplicate
    * rows each keep their slot (matching what a window rank over the same
    * data emits). Selection is a pure function of the row set → identical
    * at any parallelism, provable by a row_number oracle. */
  final case class TEntry(key: Long, a: Long, b: Long)
  final case class TState(entries: Vector[TEntry])

  final class TopKBy(slots: Int)
      extends Aggregator[(Long, Long, Long), TState, Seq[TEntry]] {
    require(slots > 0, "slots must be positive")

    private val ord: Ordering[TEntry] =
      Ordering.by((e: TEntry) => (-e.key, e.a, e.b))

    override def zero: TState = TState(Vector.empty)

    override def reduce(s: TState, item: (Long, Long, Long)): TState = {
      val e = TEntry(item._1, item._2, item._3)
      // warm fast path: a full state rejects anything ordered at-or-after
      // its worst entry in O(1)
      if (s.entries.length == slots && ord.gteq(e, s.entries.last)) s
      else TState((s.entries :+ e).sorted(ord).take(slots))
    }

    override def merge(a: TState, b: TState): TState =
      TState((a.entries ++ b.entries).sorted(ord).take(slots))

    /** Kept entries best-first. */
    override def finish(s: TState): Seq[TEntry] = s.entries

    override def bufferEncoder: Encoder[TState] = Encoders.product[TState]
    override def outputEncoder: Encoder[Seq[TEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TEntry]]()
  }

  final class BottomK(k: Int) extends Aggregator[String, BkState, Seq[String]] {
    require(k > 0, "k must be positive")

    private def prio(item: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(item.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }

    override def zero: BkState = BkState(Vector.empty)

    override def reduce(s: BkState, item: String): BkState = {
      val p = prio(item)
      // warm-sketch fast path, mirroring Kmv: a full sample rejects any
      // priority ≥ its k-th in O(1)
      if (s.entries.length == k && p >= s.entries.last.prio) s
      else if (s.entries.exists(_.prio == p)) s
      else BkState((s.entries :+ BkEntry(p, item)).sortBy(_.prio).take(k))
    }

    override def merge(a: BkState, b: BkState): BkState =
      BkState((a.entries ++ b.entries).distinctBy(_.prio).sortBy(_.prio).take(k))

    /** Sampled items in priority (md5-rank) order. */
    override def finish(s: BkState): Seq[String] = s.entries.map(_.value)

    override def bufferEncoder: Encoder[BkState] = Encoders.product[BkState]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }
}
