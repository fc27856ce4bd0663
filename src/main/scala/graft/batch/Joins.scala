package graft.batch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew- and shuffle-aware join utilities (SCALE.md):
  *
  * [[saltedJoin]] — for a skewed equi-join key (one hot key swamping a
  * partition): the left (large, skewed) side gets a deterministic salt in
  * [0, buckets); the right side is replicated once per salt value. Each hot
  * key spreads over `buckets` partitions. AQE's skew-join handles moderate
  * skew automatically; salting is for pathological keys beyond even split
  * thresholds.
  *
  * [[writeBucketed]] — persist a table bucketed+sorted by its join key: two
  * tables bucketed the same way join with zero Exchange (asserted on the
  * physical plan in the spec).
  */
object Joins {

  /** Salt is xxhash of the whole left row → deterministic under replay. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets)).cast("int"))
    val saltValues = right.sparkSession.range(buckets)
      .select(col("id").cast("int").as("_salt"))
    val replicated = right.crossJoin(broadcast(saltValues))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Write a DataFrame as a bucketed+sorted managed parquet table
    * (co-located join input). Join via `spark.table(name)`. Drops any prior
    * table AND its leftover warehouse location first — an in-memory catalog
    * (fresh session) forgets tables but not their directories, and
    * saveAsTable refuses to create over an existing location. */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(warehouse), name)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)
  }

  /** Persist a table partitioned by the DATE of `tsCol` (Hive-style
    * `p_date=…` directories) — the canonical 100 TB event-log layout: any
    * read filtering on `p_date` prunes to the matching directories before
    * a single file opens (`PartitionFilters` in the scan, pinned in the
    * spec), so a one-day query over a decade of data scans one day. Pair
    * with `spark.sql.files.maxPartitionBytes` sizing; within each date,
    * files stay splittable parquet. The temporal queries (x89's as-of
    * cutoff, x21/x25's windows) are exactly the reads this layout serves. */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite").partitionBy("p_date").parquet(path)

  /** Range (interval) join via bin-bucketing — the scale rewrite of the
    * naive nested-loop interval join. Each interval row is exploded into
    * the fixed-width time bins it overlaps; the probe side computes its
    * single bin; the two equi-join on the bin id (hash or broadcast —
    * Catalyst's pick) and the exact range predicate
    * `start <= probeTs < end` re-applies as a residual filter. Cost is
    * O(probe + intervals·binsPerInterval) instead of O(probe·intervals),
    * and the shuffle partitions by bin, so time-skew spreads across the
    * cluster. Pick `binSeconds` near the typical interval length: one bin
    * replica per interval, probe rows never duplicated.
    *
    * Column names in `probe` and `intervals` must be disjoint (standard
    * for a join you'll project from). Intervals with `end <= start` match
    * nothing.
    */
  def rangeJoinBinned(
      probe: DataFrame,
      probeTs: String,
      intervals: DataFrame,
      start: String,
      end: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binMicros = binSeconds * 1000000L
    val p = probe.withColumn("_bin_p", floor(unix_micros(col(probeTs)) / binMicros))
    // Last covered bin uses end-1µs: `end` is exclusive. greatest() guards
    // degenerate end<=start intervals from sequence()'s descending mode.
    val iv = intervals.withColumn("_bin_i",
      explode(sequence(
        floor(unix_micros(col(start)) / binMicros),
        greatest(
          floor((unix_micros(col(end)) - 1) / binMicros),
          floor(unix_micros(col(start)) / binMicros)))))
    p.join(iv,
        col("_bin_p") === col("_bin_i") &&
        col(probeTs) >= col(start) && col(probeTs) < col(end))
      .drop("_bin_p", "_bin_i")
  }

  /** Exact global rank (1-based, dense in input order of `keys`) with NO
    * single-partition stage — the scalable replacement for
    * `row_number() OVER (ORDER BY ...)`, whose empty PARTITION BY pulls the
    * whole table through one task. Classic two-pass shape, declaratively:
    *
    *   1. range-partition by the sort keys (sampled boundaries; ordering
    *      holds BETWEEN partitions),
    *   2. rank within each range partition (window keyed by partition id —
    *      every partition ranks in parallel),
    *   3. add per-partition row-count offsets, computed as a cumulative sum
    *      over the ≤`partitions` counts (a window over 32 rows, not 32M)
    *      and broadcast back.
    *
    * Cost: the range exchange, a hash exchange on the partition id, plus a
    * cheap re-aggregation for the counts branch — each a full-data shuffle
    * at worst, none a single-task bottleneck. Ties rank arbitrarily within
    * key-equal rows (make `keys` a total order for determinism).
    */
  def globalRank(df: DataFrame, partitions: Int, keys: String*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df.repartitionByRange(partitions, keys.map(col): _*)
      .withColumn("_gr_pid", spark_partition_id())
    val within = row_number().over(
      Window.partitionBy("_gr_pid").orderBy(keys.map(col): _*))
    // this partitionless window triggers WindowExec's "No Partition
    // Defined" WARN, but here the single-task funnel is the DESIGN, not an
    // accident: the frame is the per-partition counts (≤`partitions` rows,
    // i.e. 32, not 32M). A constant PARTITION BY would not silence it —
    // EliminateWindowPartitions folds literal keys back to the empty spec —
    // so the harness mains filter the logger instead (Bench/Verify).
    val offsets = ranged.groupBy("_gr_pid").agg(count(lit(1)).as("_gr_cnt"))
      .withColumn("_gr_off",
        sum("_gr_cnt").over(Window.orderBy("_gr_pid")) - col("_gr_cnt"))
      .select("_gr_pid", "_gr_off")
    ranged.join(broadcast(offsets), "_gr_pid")
      .withColumn("global_rank", within + col("_gr_off"))
      .drop("_gr_pid")
  }

  /** Exact per-group percentiles as a whole-stage-codegen plan (round 16,
    * guide §1.2 step 2 / §4) — the drop-in replacement for
    * `percentile(v, p)` aggregates, whose interpreted ObjectHashAggregate
    * builds an OpenHashMap of every distinct value per (group, partition),
    * serializes the maps whole through the exchange and merges them per
    * group on one core: on near-unique values "partial" aggregation
    * reduces nothing and the query ANTI-scales with partition count
    * (driver r15: x17 2.2 s at 32 cores vs 0.7 at 8). Shape instead:
    * range-partitioned parallel ranking over (group, value) via
    * [[globalRank]], within-group rank by subtracting broadcast group
    * offsets, and each requested percentile interpolates its two order
    * statistics with EXACTLY Spark Percentile.getPercentile's formula —
    * `(higher−pos)·lo + (pos−lower)·hi`, `lo` when the indices coincide —
    * so results are bit-identical to the aggregate's (value-at-rank is
    * deterministic under ties because tied rows hold equal values).
    *
    * Returns one row per group: `groupCol`, `_ep_n` (BIGINT group count),
    * `_ep_p0 … _ep_p{k-1}` (DOUBLE, un-rounded) in `ps` order. The data
    * path is parallel at any group count (no per-group single-task sort,
    * no per-partition value map); the per-group COUNTS branch is a
    * single-task window + broadcast over one row per group — fine for
    * the handful-of-groups shape it serves, a funnel once groups number
    * in the millions (scope the same way globalRank scopes its offsets
    * frame). PRECONDITION: `groupCol` and `valueCol` non-null — the
    * aggregate it replaces ignores null values but keeps null groups,
    * while this shape would rank nulls first and drop a null group at
    * the offsets join; both current callers read NOT NULL columns. The
    * 100 TB swap for truly enormous inputs remains approx_percentile
    * (SCALE.md).
    */
  def exactPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Rank within each group WITHOUT collapsing a group onto one task: a
    // plain `row_number() OVER (PARTITION BY group ORDER BY v)` sorts
    // every group on a single task (measured 8.5–10 s vs 3.8 for the old
    // aggregate on 6M rows / 3 groups), so the rank comes from the
    // range-partitioned [[globalRank]] over (group, value) — every
    // partition sorts in parallel — and the within-group rank is the
    // global rank minus the group's start offset (exclusive prefix sum of
    // group counts over the ≤|groups| count rows, broadcast back).
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 2)
    val ranked = globalRank(df.select(groupCol, valueCol), parts,
      groupCol, valueCol)
    val cnt = df.select(groupCol).groupBy(groupCol)
      .agg(count(lit(1)).as("_ep_n"))
    val off = cnt.withColumn("_ep_off",
      coalesce(sum("_ep_n").over(
        Window.orderBy(groupCol).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val r2 = ranked.join(broadcast(off), groupCol)
      .withColumn("_ep_rn", col("global_rank") - col("_ep_off"))
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val pos = lit(p) * (col("_ep_n") - 1).cast("double")
      Seq(
        max(when(col("_ep_rn") === floor(pos) + 1, col(valueCol)))
          .as(s"_ep_lo$i"),
        max(when(col("_ep_rn") === ceil(pos) + 1, col(valueCol)))
          .as(s"_ep_hi$i"))
    } :+ max(col("_ep_n")).as("_ep_n")
    val g = r2.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
    val outs = ps.indices.map { i =>
      val pos = lit(ps(i)) * (col("_ep_n") - 1).cast("double")
      val lower = floor(pos)
      val higher = ceil(pos)
      when(higher === lower, col(s"_ep_lo$i"))
        .otherwise((higher.cast("double") - pos) * col(s"_ep_lo$i") +
          (pos - lower.cast("double")) * col(s"_ep_hi$i")).as(s"_ep_p$i")
    }
    g.select(col(groupCol) +: col("_ep_n") +: outs: _*)
  }

  /** Exact EXCLUSIVE prefix sum of `valueCol` in `keys` order with NO
    * single-partition stage — the distributed scan primitive behind
    * stream-position assignment (sequence packing, byte-offset layout,
    * global histogram CDFs). Same two-pass shape as [[globalRank]]:
    *
    *   1. range-partition by the sort keys,
    *   2. within-partition running sum (window keyed by partition id —
    *      parallel across partitions),
    *   3. per-partition totals → cumulative offsets over ≤`partitions`
    *      rows, broadcast back.
    *
    * Adds `cum_before` (sum of all values strictly before the row in key
    * order). Make `keys` a total order or equal-key rows get an arbitrary
    * but consistent relative order within one run. `valueCol` must be
    * integral (exact long arithmetic end to end).
    */
  def globalCumSum(df: DataFrame, partitions: Int, valueCol: String,
      keys: String*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df.repartitionByRange(partitions, keys.map(col): _*)
      .withColumn("_cs_pid", spark_partition_id())
    val within = Window.partitionBy("_cs_pid").orderBy(keys.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // partitionless by design over the ≤`partitions`-row totals frame —
    // see the globalRank note (WARN is benign here; harness filters it)
    val offsets = ranged.groupBy("_cs_pid")
      .agg(sum(valueCol).cast("long").as("_cs_tot"))
      .withColumn("_cs_off",
        coalesce(sum("_cs_tot").over(
          Window.orderBy("_cs_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_cs_pid", "_cs_off")
    ranged
      .withColumn("_cs_incl", sum(valueCol).over(within).cast("long"))
      .join(broadcast(offsets), "_cs_pid")
      .withColumn("cum_before",
        col("_cs_off") + col("_cs_incl") - col(valueCol).cast("long"))
      .drop("_cs_pid", "_cs_incl", "_cs_off")
  }
}
