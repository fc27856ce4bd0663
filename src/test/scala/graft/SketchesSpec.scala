package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.batch.Sketches

/** Misra–Gries heavy-hitters guarantees against exact counts: every true
  * heavy hitter is present, estimates never exceed true counts, and the
  * underestimate stays within the n/(k+1) bound — at different partition
  * counts (the distributed merge must preserve the bound regardless of how
  * partials combine).
  */
class SketchesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("MG sketch: presence, underestimate-only, n/(k+1) error bound") {
    import spark.implicits._
    // Skewed stream: token t_i (i in 0..99) appears (100-i)^2 times.
    val items = (0 until 100).flatMap(i => Seq.fill((100 - i) * (100 - i))(s"t$i"))
    val n = items.size.toLong
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 32
    for (parts <- Seq(1, 2, 8)) {
      val ds = spark.createDataset(items).repartition(parts)
      val got = ds.select(new Sketches.MisraGries(k).toColumn.name("m"))
        .head()
      assert(got.size <= k)
      val bound = n / (k + 1) // classic MG guarantee, preserved by merge
      for ((tok, true_n) <- exact if true_n > bound)
        assert(got.contains(tok), s"heavy hitter $tok (n=$true_n) missing at parts=$parts")
      for ((tok, est) <- got) {
        val t = exact(tok)
        assert(est <= t, s"$tok overestimated: est=$est true=$t parts=$parts")
        assert(t - est <= bound, s"$tok error ${t - est} > $bound at parts=$parts")
      }
    }
  }

  test("MG merge is order-insensitive on disjoint halves' guarantees") {
    // Two adversarial halves: half A is all one token, half B spreads k+5
    // distinct tokens. The merged sketch must still surface the global
    // majority token with a near-exact count.
    import spark.implicits._
    val a = Seq.fill(5000)("major")
    val b = (0 until 37).flatMap(i => Seq.fill(100)(s"minor$i"))
    val ds = spark.createDataset(scala.util.Random.shuffle(a ++ b)).repartition(4)
    val got = ds.select(new Sketches.MisraGries(16).toColumn.name("m"))
      .head()
    val n = (a.size + b.size).toLong
    assert(got.contains("major"))
    assert(got("major") >= 5000L - n / 17)
  }
}
