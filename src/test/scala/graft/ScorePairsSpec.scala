package graft

import org.apache.spark.sql.functions._

import graft.model._
import graft.model.{LevelLibrary => ll}

/** Realtime cartesian scoring (`inference.py:815-900` `score_pairs`,
  * `realtime.py`): no blocking, three-tier TF resolution (input tf columns
  * > registered lookup > derived from the linker's own corpus), optional
  * `found_by_blocking_rules` flag. */
class ScorePairsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "John", "London"), (1L, "John", "London"), (2L, "John", "Leeds"),
    (3L, "Mary", "London"), (4L, "Mary", "Luton"), (5L, "Peter", "London"),
    (6L, "Zoe", "Hull"), (7L, "Zoe", "London"), (8L, "Ann", "London"),
    (9L, "Ann", "York")
  ).toDF("unique_id", "first_name", "city")

  private def settings = LinkSettings(
    linkType = LinkType.DedupeOnly,
    blockingRules = Seq(BlockingRule.blockOn("first_name")),
    comparisons = Seq(
      Comparison("city", Seq(
        ll.nullLevel("city"),
        ll.exactMatch("city", tfAdjustment = true).withM(0.9).withU(0.2),
        ll.elseLevel.withM(0.1).withU(0.8))),
      Comparison("first_name", Seq(
        ll.nullLevel("first_name"),
        ll.exactMatch("first_name").withM(0.8).withU(0.1),
        ll.elseLevel.withM(0.2).withU(0.9)))),
    probabilityTwoRandomRecordsMatch = 0.05)

  private def records(rows: (Long, String, String)*) =
    rows.toSeq.toDF("unique_id", "first_name", "city")

  test("scorePairs scores the full cartesian product, no blocking") {
    val linker = new Linker(corpus, settings)
    val out = linker.scorePairs(
      records((100L, "John", "London"), (101L, "Zoe", "Hull")),
      records((200L, "John", "Paris"), (201L, "Ann", "Hull")))
    assert(out.count() == 4) // 2 x 2, including non-blocked combinations
    assert(out.columns.contains("match_probability"))
  }

  test("TF precedence: derived from corpus when nothing else is provided") {
    val linker = new Linker(corpus, settings)
    val out = linker.scorePairs(
      records((100L, "Jo", "London")), records((200L, "Jo", "London")))
      .collect()(0)
    // London: 6 of 10 corpus rows
    assert(math.abs(out.getAs[Double]("tf_city_l") - 0.6) < 1e-12)
    assert(math.abs(out.getAs[Double]("tf_city_r") - 0.6) < 1e-12)
  }

  test("TF precedence: registered lookup beats derived values") {
    val linker = new Linker(corpus, settings)
    linker.registerTermFrequencyLookup(
      Seq(("London", 0.2), ("Hull", 0.8)).toDF("city", "tf_city"), "city")
    val out = linker.scorePairs(
      records((100L, "Jo", "London")), records((200L, "Jo", "Hull")))
      .collect()(0)
    assert(out.getAs[Double]("tf_city_l") == 0.2) // lookup, not corpus 0.6
    assert(out.getAs[Double]("tf_city_r") == 0.8)
  }

  test("TF precedence: tf values on the input records beat everything") {
    val linker = new Linker(corpus, settings)
    linker.registerTermFrequencyLookup(
      Seq(("London", 0.2)).toDF("city", "tf_city"), "city")
    val withTf = records((100L, "Jo", "London"))
      .withColumn("tf_city", lit(0.05))
    val out = linker.scorePairs(withTf,
      records((200L, "Jo", "London")).withColumn("tf_city", lit(0.07)))
      .collect()(0)
    assert(out.getAs[Double]("tf_city_l") == 0.05)
    assert(out.getAs[Double]("tf_city_r") == 0.07)
  }

  test("TF-adjusted weight matches the in-pipeline predict for the same pair") {
    // scorePairs with corpus-derived TF must agree with predict() on a
    // pair both paths score
    val linker = new Linker(corpus, settings)
    val predicted = linker.predict()
      .where($"unique_id_l" === 0L && $"unique_id_r" === 1L)
      .select("match_weight").collect()(0).getDouble(0)
    val scored = linker.scorePairs(
      corpus.where($"unique_id" === 0L), corpus.where($"unique_id" === 1L))
      .select("match_weight").collect()(0).getDouble(0)
    assert(math.abs(predicted - scored) < 1e-12)
  }

  test("found_by_blocking_rules flags pairs a prediction rule would emit") {
    val linker = new Linker(corpus, settings)
    val out = linker.scorePairs(
      records((100L, "John", "London"), (101L, "Zoe", "Hull")),
      records((200L, "John", "Paris"), (201L, "Ann", "Hull")),
      includeFoundByBlockingRules = true)
      .select("unique_id_l", "unique_id_r", "found_by_blocking_rules")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    // block_on(first_name): only John/John agrees
    assert(out((100L, 200L)))
    assert(!out((100L, 201L)) && !out((101L, 200L)) && !out((101L, 201L)))
  }

  test("null blocking columns stay false under coalesce, not null") {
    val linker = new Linker(corpus, settings)
    val out = linker.scorePairs(
      records((100L, null, "London")),
      records((200L, "John", "London")),
      includeFoundByBlockingRules = true).collect()(0)
    assert(!out.getAs[Boolean]("found_by_blocking_rules"))
  }
}
