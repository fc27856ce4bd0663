package graft

/** Shared helpers for the harness mains (Bench / Verify / Prof) — one
  * definition so the three 300-query JVMs keep identical memory behavior
  * and stay comparable.
  */
private[graft] object Harness {

  /** UNTIMED unpersist sweep (round 16): localCheckpoint blocks are
    * per-invocation — nothing references them once a query's action
    * returns — but nothing freed them either, so across 300+ queries ×
    * 3 runs they accumulated in the shared 8 g heap's storage pool and
    * competed with execution memory exactly when 32 tasks run (guide §5
    * "unpersist when done"; the round-15 32-core-only regressions).
    * Blocking so cleanup cannot bleed into the next timed region. */
  def sweepCheckpoints(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

  /** The sweep frees checkpointed RDDs whose lineage is gone; Spark WARNs
    * once per such RDD that it "cannot be recomputed after unpersisting"
    * — true, intended, and noise at 300+ queries, so the harness mains
    * silence that logger and keep the output window clean. */
  def silenceSweepWarn(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
}
