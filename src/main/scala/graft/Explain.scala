package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain [queryName ...]` prints the
  * formatted physical plan of each named declared query (all if none given)
  * against SPARK_GRAFT_SF_DIR. Used to audit pushdown/pruning/broadcast
  * decisions (see SCALE.md).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n========== $name ==========")
          println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
