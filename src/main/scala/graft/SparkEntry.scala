package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every declared query (SURVEY §2.12) is one [[graft.queries.DQ]]: a
  * Spark-first implementation plus, when SQL-expressible, a DuckDB oracle.
  */
object SparkEntry {

  /** Full registry of declared queries. */
  val registry: Seq[DQ] =
    Relational.all ++ Documents.all ++ Similarity.all ++ Dataflow.all ++
      TextOps.all ++ Breadth.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q13.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
