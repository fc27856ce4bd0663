package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** The SparkSessionExtensions install path: a session built with
  * GraftExtensions resolves pack_chunk/unpack_chunk in SQL with no explicit
  * registration call. Runs in its own suite so the fresh session (with
  * extensions applied at build time) isn't shadowed by a cached default. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions installs codec functions for SQL") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      // Fail loudly (no interpreted fallback) if the codec expressions'
      // doGenCode emits Java that janino can't compile.
      .config("spark.sql.codegen.fallback", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      val data = "extensions payload".getBytes
      val chunk = graft.core.Chunker.chunk("e.bin", "", data, 16, Nil, Some(7.0))
        .map(graft.batch.ChunkRow(_))
      spark.createDataset(chunk).createOrReplaceTempView("ext_chunks")
      val n = spark.sql(
        """SELECT count(*) AS n FROM ext_chunks
          |WHERE unpack_chunk(pack_chunk(struct(
          |  filename, file_hash, chunk_hash, chunk_offset_write, chunk_i,
          |  n_total_chunks, subdir_str, filename_append, data, file_mtime))).chunk_i = chunk_i
          |""".stripMargin).as[Long].head()
      assert(n == chunk.length)
      // Native vector math (same session, still with codegen fallback off):
      // exact doubles vs the HOF formulation they replaced.
      val (d, nrm, hofD) = spark.sql(
        """SELECT vec_dot(a, b), vec_norm(a),
          |       aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |                 CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
          |FROM VALUES (array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT), CAST(0.25 AS FLOAT)),
          |             array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT), CAST(8.0 AS FLOAT))) t(a, b)
          |""".stripMargin).as[(Double, Double, Double)].head()
      assert(d == hofD && d == 1.5 * 4.0 + -2.0 * 0.5 + 0.25 * 8.0)
      assert(nrm == math.sqrt(1.5 * 1.5 + 2.0 * 2.0 + 0.25 * 0.25))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
