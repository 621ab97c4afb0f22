package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.model.{LevelLibrary => ll}
import graft.training.Training

/**
 * Exact numerical parity with the reference's own cross-version tests
 * (`tests/test_compare_splink2.py` + `tests/basic_settings.py`): the same
 * fake_1000 fixture, the same model, and the same training runs must
 * reproduce splink2's PUBLISHED numbers — the match weight of pair
 * (479, 481) (`tests/datasets/splink2_479_vs_481.csv`) and the λ / m EM
 * trajectories (`tests/datasets/splink2_*_history_*.csv`). This is the
 * strongest external anchor available: three independent implementations
 * (splink2, splink4, this engine) agreeing digit-for-digit.
 */
class SplinkParitySpec extends SparkSpec {

  private val ds = "/root/reference/tests/datasets"

  lazy val fake1000 = spark.read.option("header", "true")
    .schema("unique_id LONG, first_name STRING, surname STRING, " +
      "dob STRING, city STRING, email STRING, cluster LONG")
    .csv(s"$ds/fake_1000_from_splink_demos.csv")

  // basic_settings.py: λ = bayes_factor_to_prob(prob_to_bayes_factor(0.3)/9)
  private val glo = { val o = (0.3 / 0.7) / (0.9 / 0.1); o / (1 + o) }

  private def simple(c: String) = Comparison(c, Seq(
    ll.nullLevel(c),
    ll.exactMatch(c).withM(0.9).withU(0.1),
    ll.elseLevel.withM(0.1).withU(0.9)))

  def settings: LinkSettings = LinkSettings(
    linkType = LinkType.DedupeOnly,
    blockingRules = Seq(BlockingRule.blockOn("surname")),
    probabilityTwoRandomRecordsMatch = glo,
    comparisons = Seq(
      Comparison("first_name", Seq(
        ll.nullLevel("first_name"),
        ll.exactMatch("first_name", tfAdjustment = true)
          .withM(0.7).withU(0.1).copy(tfAdjustmentWeight = 0.6),
        ll.levenshtein("first_name", 2).withM(0.2).withU(0.1),
        ll.elseLevel.withM(0.1).withU(0.8))),
      simple("surname"), simple("dob"), simple("email"), simple("city")))

  test("predict reproduces splink2's match weight for pair (479, 481)") {
    val linker = new Linker(fake1000, settings)
    val row = linker.predict()
      .filter(col("unique_id_l") === 479 && col("unique_id_r") === 481)
      .select("match_weight", "match_probability").collect()
    assert(row.length == 1)
    // splink2_479_vs_481.csv: 0.5101493570766487 / 0.5874923778509089 —
    // exact match + tf(Jack, weight .6) + dob agree, city/email disagree
    assert(math.abs(row(0).getDouble(0) - 0.5101493570766487) < 1e-9,
      row(0).toString)
    assert(math.abs(row(0).getDouble(1) - 0.5874923778509089) < 1e-9)
  }

  private def assertTrajectory(expected: Seq[Double], actual: Seq[Double],
      what: String): Unit = {
    assert(actual.size >= expected.size, s"$what: only ${actual.size} iters")
    expected.zip(actual).zipWithIndex.foreach { case ((e, a), i) =>
      assert(math.abs(e - a) <= 1e-6 * math.abs(e), s"$what iter $i: $e vs $a")
    }
  }

  test("EM fixed-u blocked on surname reproduces splink2's λ and m paths") {
    val r = Training.expectationMaximisation(
      Seq("fake_1000" -> fake1000), settings, BlockingRule.blockOn("surname"),
      fixU = true, maxIterations = 20, tolerance = 0.001,
      withTermFrequencies = true)
    // session λ starts at 0.3: global glo odds x surname exact BF 9
    assertTrajectory(
      Seq(0.3, 0.2588110991484573, 0.2823831219907462),
      r.lambdaHistory, "λ fixed-u")
    val fn = r.activeComparisons.indexOf("first_name")
    assert(fn >= 0 && r.deactivated == Seq("surname"))
    assertTrajectory(
      Seq(0.2, 0.1422119783401823, 0.13468402611428465),
      r.mHistory.map(_(fn)(1)), "m[first_name lev<=2] fixed-u")
  }

  test("EM free-u blocked on surname reproduces splink2's λ and m paths") {
    val r = Training.expectationMaximisation(
      Seq("fake_1000" -> fake1000), settings, BlockingRule.blockOn("surname"),
      fixU = false, maxIterations = 20, tolerance = 0.001,
      withTermFrequencies = true)
    assertTrajectory(
      Seq(0.3, 0.2588110991484573, 0.2954053465070158),
      r.lambdaHistory, "λ free-u")
    val fn = r.activeComparisons.indexOf("first_name")
    assertTrajectory(
      Seq(0.2, 0.1422119783401823, 0.1568402413576787),
      r.mHistory.map(_(fn)(1)), "m[first_name lev<=2] free-u")
  }
}
