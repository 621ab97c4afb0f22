package graft

import org.apache.spark.sql.functions._

import graft.model._
import graft.model.{LevelLibrary => ll}

/** Applying a TRAINED model to new data (`inference.py:1156-1430`
  * `predict_within` / `predict_between`): blocked + scored predictions
  * over records the linker was not built on, with strict TF resolution
  * (registered lookups or hardcoded tf columns — never derived from the
  * new batch). */
class PredictWithinSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "John", "London"), (1L, "John", "London"), (2L, "John", "Leeds"),
    (3L, "Mary", "London"), (4L, "Mary", "Luton"), (5L, "Peter", "London"),
    (6L, "Zoe", "Hull"), (7L, "Zoe", "London"), (8L, "Ann", "London"),
    (9L, "Ann", "York")
  ).toDF("unique_id", "first_name", "city")

  private def newBatch = Seq(
    (100L, "John", "London"), (101L, "John", "Hull"),
    (102L, "Mary", "London"), (103L, "Zoe", "Hull")
  ).toDF("unique_id", "first_name", "city")

  private def tfSettings = LinkSettings(
    linkType = LinkType.DedupeOnly,
    blockingRules = Seq(BlockingRule.blockOn("first_name")),
    comparisons = Seq(
      Comparison("city", Seq(
        ll.nullLevel("city"),
        ll.exactMatch("city", tfAdjustment = true).withM(0.9).withU(0.2),
        ll.elseLevel.withM(0.1).withU(0.8)))),
    probabilityTwoRandomRecordsMatch = 0.05)

  test("predictWithin without registered TF fails loudly, never derives") {
    val linker = new Linker(corpus, tfSettings)
    val e = intercept[IllegalArgumentException](
      linker.predictWithin(newBatch).collect())
    assert(e.getMessage.contains("term-frequency"))
    assert(e.getMessage.contains("city"))
  }

  test("predictWithin scores new data under the trained blocking rules " +
      "with the registered (corpus) TF, not the batch's") {
    val linker = new Linker(corpus, tfSettings)
    linker.computeTfTable("city") // corpus frequencies: London 0.6
    val out = linker.predictWithin(newBatch)
    val pairs = out.select("unique_id_l", "unique_id_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // block_on(first_name) within the batch: John/John and nothing else
    assert(pairs == Set((100L, 101L)))
    // TF rides from the corpus lookup even though the batch's own London
    // share (2/4) differs — the 100/102 pair is not blocked, so check via
    // a batch whose pair agrees on city
    val out2 = linker.predictWithin(Seq(
      (200L, "Ann", "London"), (201L, "Ann", "London"))
      .toDF("unique_id", "first_name", "city"))
    assert(math.abs(out2.collect()(0).getAs[Double]("tf_city_l") - 0.6) < 1e-12)
  }

  test("predictWithin equals a fresh Linker's predict when the lookup IS " +
      "the batch's own TF") {
    val linker = new Linker(corpus, tfSettings)
    linker.registerTermFrequencyLookup(
      operators.TermFrequency.table(newBatch, "city"), "city")
    val within = linker.predictWithin(newBatch)
      .select("unique_id_l", "unique_id_r", "match_weight").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fresh = new Linker(newBatch, tfSettings).predict()
      .select("unique_id_l", "unique_id_r", "match_weight").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(within == fresh)
  }

  test("predictWithin honours blocking-rule and threshold overrides") {
    val linker = new Linker(corpus, tfSettings)
    linker.computeTfTable("city")
    val out = linker.predictWithin(Seq("b" -> newBatch),
      blockingRulesOverride = Some(Seq(BlockingRule.blockOn("city"))))
    val pairs = out.select("unique_id_l", "unique_id_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // city blocks: London {100,102}, Hull {101,103}
    assert(pairs == Set((100L, 102L), (101L, 103L)))
  }

  test("predictBetween pairs left x right only, never within a side") {
    val linker = new Linker(corpus, tfSettings)
    linker.computeTfTable("city")
    val leftRole = Seq((300L, "John", "London"), (301L, "John", "Leeds"))
      .toDF("unique_id", "first_name", "city")
    val rightRole = Seq((400L, "John", "Hull"), (401L, "Mary", "Hull"))
      .toDF("unique_id", "first_name", "city")
    val pairs = linker.predictBetween(leftRole, rightRole)
      .select("unique_id_l", "unique_id_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // John-block pairs across roles only: (300,400), (301,400) — the
    // within-left pair (300,301) must NOT appear
    assert(pairs == Set((300L, 400L), (301L, 400L)))
  }

  test("predictBetween under link_only requires different source datasets") {
    val s = tfSettings.copy(linkType = LinkType.LinkOnly)
    val a = Seq((0L, "John", "London")).toDF("unique_id", "first_name", "city")
    val b = Seq((1L, "John", "Leeds")).toDF("unique_id", "first_name", "city")
    val linker = new Linker(Seq("a" -> a, "b" -> b), s)
    linker.computeTfTable("city")
    // same frame plays both roles under ONE dataset name: every cross-role
    // pair shares the source dataset, so link_only keeps nothing
    val none = linker.predictBetween(
      Seq("a" -> a), Seq("a" -> a))
    assert(none.count() == 0)
    // different datasets: the cross pair survives
    val some = linker.predictBetween(Seq("a" -> a), Seq("b" -> b))
    assert(some.count() == 1)
  }
}
