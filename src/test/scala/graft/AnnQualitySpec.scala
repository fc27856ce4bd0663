package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Similarity

/** ANN quality gates: the approximate paths (x04 IVF, x29 LSH-bucketed)
  * must actually find the true neighbors the brute-force baseline (q26)
  * returns — an approximate operator with silent zero recall would still
  * pass its own oracle (the oracle replicates the approximation). Fixture
  * is deterministic, so recall here is a fixed number; the floors pin it
  * against regression. */
class AnnQualitySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq

  test("IVF ANN (x04) recalls the exact top-5 within its searched list") {
    val exact = ids(Similarity.q26.run(spark, sf).limit(5))
    val approx = ids(Similarity.x04.run(spark, sf))
    val recall = approx.count(exact.contains).toDouble / 5.0
    info(s"IVF recall@5 = $recall (approx=$approx exact=$exact)")
    assert(recall >= 0.6, s"IVF recall@5 regressed: $recall")
  }

  test("LSH ANN (x29) recalls the exact top-3") {
    val exact = ids(Similarity.q26.run(spark, sf).limit(3))
    val approx = ids(Similarity.x29.run(spark, sf))
    val recall = approx.count(exact.contains).toDouble / 3.0
    info(s"LSH recall@3 = $recall (approx=$approx exact=$exact)")
    // radius-2 multi-probe finds neighbors to Hamming 2; the one miss on
    // this fixture sits at Hamming 4 of the 8-bit signature
    assert(recall >= 0.6, s"LSH recall@3 regressed: $recall")
  }
}
