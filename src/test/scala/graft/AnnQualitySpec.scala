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

  // the query vector (vec_id=1) is trivially in its own list/bucket and in
  // the exact top-k at sim 1.0 — counting it would gift every gate one free
  // recall slot, so both sides measure NON-SELF neighbors only
  private def nonSelf(xs: Seq[Long], k: Int): Seq[Long] =
    xs.filter(_ != 1L).take(k)

  test("IVF ANN (x04) recalls the exact non-self top-4 within its searched list") {
    val exact = nonSelf(ids(Similarity.q26.run(spark, sf)), 4)
    val approx = nonSelf(ids(Similarity.x04.run(spark, sf)), 4)
    val recall = approx.count(exact.contains).toDouble / 4.0
    info(s"IVF non-self recall@4 = $recall (approx=$approx exact=$exact)")
    assert(recall >= 0.75, s"IVF recall@4 regressed: $recall")
  }

  test("LSH ANN (x29) recalls the exact non-self top-3") {
    val exact = nonSelf(ids(Similarity.q26.run(spark, sf)), 3)
    val approx = nonSelf(ids(Similarity.x29.run(spark, sf)), 4)
    val recall = exact.count(approx.contains).toDouble / 3.0
    info(s"LSH non-self recall@3 = $recall (approx=$approx exact=$exact)")
    // radius-2 multi-probe finds the neighbors to Hamming 2; the one miss
    // on this fixture sits at Hamming 4 of the 8-bit signature
    assert(recall >= 0.6, s"LSH recall@3 regressed: $recall")
  }
}
