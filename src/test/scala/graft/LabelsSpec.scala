package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.model.{LevelLibrary => ll}
import graft.operators.{Blocking, Labels}
import graft.training.Training

/** Labels-table workflows (reference `block_from_labels.py:12-92`,
  * `lower_id_on_lhs.py:47`, `m_from_labels.py:26-102`,
  * `linker_components/evaluation.py:37-351`), trained-value median
  * semantics (`comparison_level.py:355-399`, `linker.py:459-467`) and the
  * exploding-rule NOT-previous dedupe (`blocking.py:814-827`). */
class LabelsSpec extends SparkSpec {
  import spark.implicits._

  private def fnModel(prior: Double = 0.5): LinkSettings = LinkSettings(
    blockingRules = Seq(BlockingRule.CustomBlockingRule("1=1")),
    comparisons = Seq(Comparison("fn", Seq(ll.nullLevel("fn"),
      ll.exactMatch("fn").withM(0.9).withU(0.01),
      ll.elseLevel.withM(0.1).withU(0.99)))),
    probabilityTwoRandomRecordsMatch = prior)

  test("Labels.prepared swaps every paired _l/_r column together") {
    val labels = Seq(
      (5L, 2L, "B", "A", 0.9), // reversed orientation -> must swap
      (1L, 3L, "C", "D", 0.8)  // already canonical -> untouched
    ).toDF("unique_id_l", "unique_id_r", "name_l", "name_r", "clerical_match_score")
    val p = Labels.prepared(labels, LinkSettings()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4))).sortBy(_._1)
    assert(p(0) == ((1L, 3L, "C", "D", 0.8)))
    assert(p(1) == ((2L, 5L, "A", "B", 0.9)))
  }

  test("labels without source_dataset columns are rejected for link jobs") {
    val labels = Seq((1L, 2L)).toDF("unique_id_l", "unique_id_r")
    val s = LinkSettings(linkType = LinkType.LinkOnly)
    val e = intercept[IllegalArgumentException](Labels.idPairs(labels, s))
    assert(e.getMessage.contains("source_dataset"))
  }

  test("estimateMFromPairwiseLabels matches hand-counted m") {
    val records = Seq((1L, "ann"), (2L, "ann"), (3L, "bob"), (4L, "xyz"))
      .toDF("unique_id", "fn")
    // labelled true matches: (1,2) agrees on fn, (3,4) does not
    val labels = Seq((1L, 2L), (4L, 3L)).toDF("unique_id_l", "unique_id_r")
    val s = LinkSettings(comparisons = Seq(Comparison("fn",
      Seq(ll.nullLevel("fn"), ll.exactMatch("fn"), ll.elseLevel))))
    val trained = Training.estimateMFromPairwiseLabels(
      Seq("t" -> records), s, labels)
    val levels = trained.comparisonByName("fn").activeLevels
    assert(levels.head.m.contains(0.5)) // exact: 1 of 2 labelled pairs
    assert(levels.last.m.contains(0.5)) // else: the other
    assert(levels.head.trainedM.size == 1 && levels.head.trainedM.head.observed)
  }

  test("predictionErrorsFromLabelsTable yields exact FP/FN membership") {
    val records = Seq((1L, "ann"), (2L, "ann"), (3L, "bob"), (4L, "xyz"),
      (5L, "cat"), (6L, "cat")).toDF("unique_id", "fn")
    val linker = new Linker(records, fnModel())
    val labels = Seq(
      (1L, 2L, 0.0), // scores high (exact fn), labelled non-match -> FP
      (4L, 3L, 1.0), // reversed; scores low, labelled match -> FN
      (5L, 6L, 1.0)  // scores high, labelled match -> no error
    ).toDF("unique_id_l", "unique_id_r", "clerical_match_score")
    val errs = linker.evaluation.predictionErrorsFromLabelsTable(labels)
      .collect().map(r => (r.getAs[Long]("unique_id_l"),
        r.getAs[Long]("unique_id_r")) -> r.getAs[String]("error_type")).toMap
    assert(errs == Map((1L, 2L) -> "FP", (3L, 4L) -> "FN"))
  }

  test("scorePairsFromLabels keeps label cardinality for duplicate pairs") {
    val records = Seq((1L, "ann"), (2L, "ann")).toDF("unique_id", "fn")
    val linker = new Linker(records, fnModel())
    val labels = Seq((1L, 2L, 1.0), (2L, 1L, 1.0)) // same pair twice
      .toDF("unique_id_l", "unique_id_r", "clerical_match_score")
    // no quadratic fan-out: one output row per label row
    assert(linker.scorePairsFromLabels(labels).count() == 2)
  }

  test("truthSpaceFromLabelsTable confusion counts are exact") {
    val records = Seq((1L, "ann"), (2L, "ann"), (3L, "bob"), (4L, "xyz"),
      (5L, "cat"), (6L, "cat")).toDF("unique_id", "fn")
    val linker = new Linker(records, fnModel())
    val labels = Seq((1L, 2L, 0.0), (3L, 4L, 1.0), (5L, 6L, 1.0))
      .toDF("unique_id_l", "unique_id_r", "clerical_match_score")
    val ts = linker.evaluation.truthSpaceFromLabelsTable(labels).collect()
    assert(ts.length == 2) // two distinct match weights -> two thresholds
    // at the exact-match threshold: the two exact pairs are predicted
    // positive (1 TP + 1 FP), the else pair negative (1 FN)
    val high = ts.maxBy(_.getAs[Double]("truth_threshold"))
    assert(high.getAs[Long]("tp") == 1 && high.getAs[Long]("fp") == 1)
    assert(high.getAs[Long]("fn") == 1 && high.getAs[Long]("tn") == 0)
    // at the lowest threshold everything is predicted positive
    val low = ts.minBy(_.getAs[Double]("truth_threshold"))
    assert(low.getAs[Long]("tp") == 2 && low.getAs[Long]("fp") == 1)
    assert(low.getAs[Long]("fn") == 0 && low.getAs[Long]("tn") == 0)
  }

  test("median across sessions excludes unobserved entries") {
    val lv = ll.exactMatch("x")
    assert(lv.addTrainedM(0.2, "a").addTrainedM(0.4, "b").addTrainedM(0.6, "c")
      .m.contains(0.4))
    // sentinel session must not drag the median (ADVICE r2)
    assert(lv.addTrainedM(Model.UnobservedSentinel, "s0", observed = false)
      .addTrainedM(0.3, "em").m.contains(0.3))
    // sentinel only when nothing observed
    assert(lv.addTrainedM(Model.UnobservedSentinel, "s0", observed = false)
      .m.contains(Model.UnobservedSentinel))
  }

  test("two EM sessions record history and set the live value to the median") {
    val people = (0L until 80L).map { i =>
      (i, s"name${i % 7}", s"sur${i % 4}", s"city${i % 2}")
    }.toDF("unique_id", "fn", "sn", "city")
    val s = LinkSettings(
      blockingRules = Seq(BlockingRule.blockOn("sn")),
      comparisons = Seq(
        Comparison("fn", Seq(ll.nullLevel("fn"),
          ll.exactMatch("fn").withM(0.6).withU(0.4),
          ll.elseLevel.withM(0.4).withU(0.6))),
        Comparison("sn", Seq(ll.nullLevel("sn"),
          ll.exactMatch("sn").withM(0.6).withU(0.4),
          ll.elseLevel.withM(0.4).withU(0.6))),
        Comparison("city", Seq(ll.nullLevel("city"),
          ll.exactMatch("city").withM(0.6).withU(0.4),
          ll.elseLevel.withM(0.4).withU(0.6)))),
      probabilityTwoRandomRecordsMatch = 0.05)
    val linker = new Linker(people, s)
    // fn is active in both sessions (blocked on sn, then on city)
    linker.training.estimateParametersUsingExpectationMaximisation(
      BlockingRule.blockOn("sn"))
    linker.training.estimateParametersUsingExpectationMaximisation(
      BlockingRule.blockOn("city"))
    val exact = linker.settings.comparisonByName("fn").activeLevels.head
    assert(exact.trainedM.size == 2)
    assert(exact.m.contains(Model.medianObserved(exact.trainedM)))
  }

  test("trainedM/U history survives the model-JSON round trip") {
    val lv = ll.exactMatch("x").withU(0.1)
      .addTrainedM(0.3, "EM, blocked on sn")
      .addTrainedM(Model.UnobservedSentinel, "labels", observed = false)
    val s = LinkSettings(comparisons = Seq(
      Comparison("x", Seq(ll.nullLevel("x"), lv, ll.elseLevel.withM(0.2).withU(0.8)))))
    val back = SettingsJson.fromJson(SettingsJson.toJson(s))
    val got = back.comparisonByName("x").activeLevels.head
    assert(got.trainedM == lv.trainedM)
    assert(got.m == lv.m && got.u == lv.u)
  }

  test("overlapping exploding + plain rules dedupe to min match_key") {
    val df = Seq(
      (1L, Seq("a", "b"), "x"),
      (2L, Seq("b", "c"), "x"), // shares element 'b' with 1 AND grp 'x'
      (3L, Seq("q"), "x"),      // shares only grp with 1, 2
      (4L, Seq("z"), "y")
    ).toDF("unique_id", "arr", "grp")
    val s = LinkSettings(blockingRules = Seq(
      BlockingRule.blockOn("arr").withExplode("arr"),
      BlockingRule.blockOn("grp")))
    val pairs = Blocking.blockedIdPairs(df, s)
      .collect().map(r => (r.getAs[Long]("join_key_l"),
        r.getAs[Long]("join_key_r")) -> r.getAs[String](Cols.MatchKey))
    // pair (1,2) must appear EXACTLY once, under the exploding rule's key —
    // whole-array equality in NOT-previous can't see the element overlap
    assert(pairs.count(_._1 == ((1L, 2L))) == 1)
    val byPair = pairs.toMap
    assert(byPair((1L, 2L)) == "0")
    assert(byPair((1L, 3L)) == "1" && byPair((2L, 3L)) == "1")
    assert(!byPair.contains((1L, 4L)))
  }
}
