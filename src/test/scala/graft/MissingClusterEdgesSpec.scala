package graft

import org.apache.spark.sql.functions._

import graft.model._
import graft.model.{LevelLibrary => ll}

/** Score-missing-cluster-edges (`linker_components/inference.py:574-744`
  * `_score_missing_cluster_edges`): every same-cluster pair the blocking
  * rules never generated, scored through the trained model, with the
  * already-scored predict edges anti-joined away. */
class MissingClusterEdgesSpec extends SparkSpec {
  import spark.implicits._

  // blocking on first_name leaves same-cluster cross-name pairs unscored
  private def records = Seq(
    (0L, "John", "London"), (1L, "John", "Leeds"), (2L, "Mary", "London"),
    (3L, "Mary", "Luton"), (4L, "John", "Hull"), (5L, "Zoe", "York"),
    (6L, "Zoe", "London"), (7L, "Ann", "York")
  ).toDF("unique_id", "first_name", "city")

  private def settings = LinkSettings(
    linkType = LinkType.DedupeOnly,
    blockingRules = Seq(BlockingRule.blockOn("first_name")),
    comparisons = Seq(
      Comparison("city", Seq(
        ll.nullLevel("city"),
        ll.exactMatch("city").withM(0.9).withU(0.2),
        ll.elseLevel.withM(0.1).withU(0.8)))),
    probabilityTwoRandomRecordsMatch = 0.05)

  // clusters: {0,1,2,3} and {4,5,6}; 7 unclustered (absent from frame)
  private def clusters = Seq(
    (0L, "a"), (1L, "a"), (2L, "a"), (3L, "a"),
    (4L, "b"), (5L, "b"), (6L, "b")
  ).toDF("unique_id", "cluster_id")

  private def pairKeys(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("unique_id_l").cast("long"), col("unique_id_r").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("without a predict frame: all intra-cluster pairs, ordered uid_l < uid_r") {
    val linker = new Linker(records, settings)
    val out = linker.scoreMissingClusterEdges(clusters)
    // C(4,2) + C(3,2) = 6 + 3
    assert(out.count() == 9)
    val keys = pairKeys(out)
    assert(keys.contains((0L, 1L)) && keys.contains((4L, 6L)))
    assert(keys.forall { case (l, r) => l < r })
    // no cross-cluster pair
    assert(!keys.contains((0L, 4L)) && !keys.contains((3L, 5L)))
    // record 7 has no cluster row -> appears nowhere
    assert(keys.forall { case (l, r) => l != 7L && r != 7L })
  }

  test("predict edges are anti-joined away; scores match a direct predict") {
    val linker = new Linker(records, settings)
    val edges = linker.predict()
    // blocked pairs: John {0,1,4} -> (0,1),(0,4),(1,4); Mary (2,3); Zoe (5,6)
    val out = linker.scoreMissingClusterEdges(clusters, Some(edges))
    val keys = pairKeys(out)
    // cluster a = {0,1,2,3} minus blocked John (0,1) and Mary (2,3):
    // (0,2),(0,3),(1,2),(1,3); cluster b = {4,5,6} minus Zoe (5,6): (4,5),(4,6)
    assert(keys == Set((0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (4L, 5L), (4L, 6L)))
    // a missing edge's score equals the model's score for that gamma:
    // (0,2) shares city London -> exact-match level
    val row = out.filter(col("unique_id_l") === 0L && col("unique_id_r") === 2L)
      .select("match_weight").collect()(0).getDouble(0)
    val prior = math.log(0.05 / 0.95) / math.log(2)
    val bf = math.log(0.9 / 0.2) / math.log(2)
    assert(math.abs(row - (prior + bf)) < 1e-9)
  }

  test("thresholds filter the scored output") {
    val linker = new Linker(records, settings)
    val all = linker.scoreMissingClusterEdges(clusters)
    val thresholded = linker.scoreMissingClusterEdges(clusters,
      thresholdMatchProbability = Some(0.5))
    assert(thresholded.count() ==
      all.filter(col("match_probability") >= 0.5).count())
    assert(thresholded.count() < all.count())
  }

  test("multi-frame link types anti-join on the composite source+uid key") {
    val a = Seq((0L, "John", "London"), (1L, "Mary", "Luton"))
      .toDF("unique_id", "first_name", "city")
    val b = Seq((0L, "John", "London"), (1L, "Zoe", "York"))
      .toDF("unique_id", "first_name", "city")
    val s2 = settings.copy(linkType = LinkType.LinkAndDedupe)
    val linker = new Linker(Seq("a" -> a, "b" -> b), s2)
    val edges = linker.predict() // John-John across frames
    val cl = Seq((0L, "a", "c0"), (0L, "b", "c0"), (1L, "a", "c0"))
      .toDF("unique_id", "source_dataset", "cluster_id")
    val out = linker.scoreMissingClusterEdges(cl, Some(edges))
    // intra-cluster pairs: (a0,b0),(a0,a1),(a1,b0); predict scored (a0,b0)
    val keys = out.select("source_dataset_l", "unique_id_l",
        "source_dataset_r", "unique_id_r")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(keys == Set(("a", 0L, "a", 1L), ("a", 1L, "b", 0L)))
  }
}
