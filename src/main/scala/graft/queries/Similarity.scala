package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Core._

/** Embedding similarity search (SURVEY.md §2.12 Q26 + scale-path variants).
  * Vectors are `array<float>` columns; math runs through codegen'd
  * higher-order functions (`zip_with`/`aggregate`) — no UDFs, no explode on
  * the Spark side.
  */
object Similarity {

  /** Double-accumulated dot product of two float vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Q26 brute-force cosine top-k vs the `vec_id = 1` query vector (north
    * star baseline ANN; 1-row broadcast cross join, single pass, no shuffle
    * until the final top-k). */
  val q26 = DQ("q26_cosine_topk", Some(
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
      |ex AS (
      |  SELECT e.vec_id,
      |         CAST(e.embedding[u.i] AS DOUBLE) AS x,
      |         CAST(q.qv[u.i] AS DOUBLE) AS y
      |  FROM embeddings e CROSS JOIN q
      |  CROSS JOIN (SELECT CAST(generate_series AS INT) AS i FROM generate_series(1, 64)) u),
      |s AS (
      |  SELECT vec_id, sum(x*y) AS dp, sqrt(sum(x*x)) AS ne, sqrt(sum(y*y)) AS nq
      |  FROM ex GROUP BY vec_id)
      |SELECT vec_id, round(dp / (ne * nq), 6) AS sim FROM s
      |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin)) {
    (spark, dir) =>
      val emb = table(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 1).select(col("embedding").as("qv"))
      emb.crossJoin(broadcast(q))
        .withColumn("sim", round(
          dot(col("embedding"), col("qv")) / (norm(col("embedding")) * norm(col("qv"))), 6))
        .select("vec_id", "sim")
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
  }

  val all: Seq[DQ] = Seq(q26)
}
