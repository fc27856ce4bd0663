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

  /** x04: IVF-style ANN — partition vectors into K=8 inverted lists by
    * nearest centroid (centroids = vec_id 0..7 as a deterministic stand-in
    * for k-means), then search only the query's list. At 100 TB this is the
    * scale path: the centroid table broadcasts, assignment is a map-side
    * argmin, and the search touches one partition instead of all vectors. */
  val x04 = DQ("x04_ann_ivf", Some(
    """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
      |ser AS (SELECT CAST(generate_series AS INT) AS i FROM generate_series(1, 64)),
      |d2 AS (
      |  SELECT e.vec_id, c.cid,
      |         sum((CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
      |             (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))) AS dist2
      |  FROM embeddings e CROSS JOIN c CROSS JOIN ser
      |  GROUP BY e.vec_id, c.cid),
      |assign AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
      |    FROM d2) t WHERE rn = 1),
      |qc AS (SELECT cid FROM assign WHERE vec_id = 1),
      |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
      |cand AS (
      |  SELECT e.vec_id, e.embedding FROM embeddings e
      |  JOIN assign a ON e.vec_id = a.vec_id JOIN qc ON a.cid = qc.cid),
      |ex AS (
      |  SELECT cand.vec_id,
      |         CAST(cand.embedding[u.i] AS DOUBLE) AS x, CAST(q.qv[u.i] AS DOUBLE) AS y
      |  FROM cand CROSS JOIN q
      |  CROSS JOIN (SELECT CAST(generate_series AS INT) AS i FROM generate_series(1, 64)) u),
      |s AS (SELECT vec_id, sum(x*y) AS dp, sqrt(sum(x*x)) AS ne, sqrt(sum(y*y)) AS nq
      |      FROM ex GROUP BY vec_id)
      |SELECT vec_id, round(dp / (ne * nq), 6) AS sim FROM s
      |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin)) {
    (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = table(spark, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val dist2 = aggregate(
        zip_with(col("embedding"), col("cv"),
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
      val w = Window.partitionBy("vec_id").orderBy(col("dist2"), col("cid"))
      val assign = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"), dist2.as("dist2"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("vec_id", "cid")
      val qc = assign.filter(col("vec_id") === 1).select(col("cid").as("qcid"))
      val q = emb.filter(col("vec_id") === 1).select(col("embedding").as("qv"))
      emb.join(assign, "vec_id")
        .join(broadcast(qc), col("cid") === col("qcid"))
        .crossJoin(broadcast(q))
        .withColumn("sim", round(
          dot(col("embedding"), col("qv")) / (norm(col("embedding")) * norm(col("qv"))), 6))
        .select("vec_id", "sim")
        .orderBy(col("sim").desc, col("vec_id")).limit(5)
  }

  val all: Seq[DQ] = Seq(q26, x04)
}
