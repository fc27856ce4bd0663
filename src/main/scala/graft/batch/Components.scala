package graft.batch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the transitive
  * closure a dedup pass needs when near-dup clusters chain through shared
  * LSH buckets (A~B, B~C, but A and C never share a bucket). One round of
  * bucket-min labeling (x27) under-merges chains; this iterates to fixpoint.
  *
  * Scale posture: the standard large-graph CC loop — each iteration is one
  * edge⋈label join plus one min-aggregation (both hash-partitioned,
  * map-side combining), state is one (node, label) row per node, and
  * convergence needs at most graph-diameter rounds (LSH bucket graphs are
  * star-shaped, so diameter stays small). The driver only orchestrates
  * plans and reads the converged count — no row data ever leaves executors.
  * Each round materializes via localCheckpoint so the lineage (and thus
  * task size) stays constant instead of growing per iteration.
  */
object Components {

  /** `nodes`: one column `id`. `edges`: columns `src`, `dst` (directed; pass
    * both directions for undirected closure). Returns `(id, rep)` where
    * `rep` is the minimum node id reachable through the closure.
    *
    * Per-iteration shape (the round-15 rewrite — same fixpoint, less
    * work per round): neighbor messages min-combine per node BEFORE
    * touching the label table (map-side combine), the self-label rides a
    * single left join instead of a union re-shuffle of all labels, and
    * the converged-check reads the SAME checkpointed join output (old
    * label carried as a column) instead of running a second
    * label⋈label join — one aggregation shuffle + one cheap count per
    * round.
    */
  def minLabelFixpoint(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the edge list once — its lineage (e.g. a full LSH
    // signature pipeline) must not be recomputed every round. Join
    // strategy inside the loop stays Catalyst/AQE's pick: while the label
    // table fits the broadcast threshold (always, locally) each round is
    // broadcast-join + one aggregation exchange; at cluster scale the
    // same code degrades to the standard shuffled CC loop.
    val e = edges.localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("rep")).localCheckpoint()
    var changed = 1L
    var iter = 0
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    while (changed > 0 && iter < maxIter) {
      // neighbor messages, min-combined per node (map-side combine); the
      // self-label rides the join below instead of a union, so the labels
      // table itself is never re-shuffled
      val m = e.join(labels, e("dst") === labels("id"))
        .groupBy(e("src").as("id")).agg(min("rep").as("mrep"))
      val step = labels.withColumnRenamed("rep", "old")
        .join(m, Seq("id"), "left_outer")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("mrep"), col("old"))).as("rep"))
        .localCheckpoint()
      // the convergence count reads the materialized step rows — no
      // recompute, no extra join
      changed = step.filter(col("rep") < col("old")).count()
      labels = step.select("id", "rep")
      iter += 1
    }
    if (changed > 0)
      // Surface non-convergence instead of letting it appear downstream as
      // a silent result divergence (graph diameter > maxIter).
      log.warn(s"minLabelFixpoint did NOT converge after $maxIter iterations " +
        s"($changed labels still changing); results are partial — raise maxIter")
    labels
  }
}
