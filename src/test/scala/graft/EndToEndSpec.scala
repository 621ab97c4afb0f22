package graft

import org.apache.spark.sql.functions._
import scala.util.Random
import graft.model._
import graft.model.{ComparisonLibrary => cl, LevelLibrary => ll}
import graft.training.Training

/**
 * Full-pipeline statistical test on a synthetic population with PLANTED
 * duplicates and known cluster ground truth — the reference's
 * `tests/test_full_example_*.py` shape: train u, train m via EM, predict,
 * cluster, compare against truth.
 */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val firstNames = Vector("john", "mary", "peter", "alice", "bob",
    "carol", "dave", "erin", "frank", "grace", "henry", "iris")
  private val surnames = Vector("smith", "jones", "brown", "taylor", "wilson",
    "davies", "evans", "nguyen", "patel", "khan")

  /** ~nClusters entities, 1-3 records each; duplicates get typos/missing
    * fields with fixed probabilities. */
  def generate(nClusters: Int, seed: Int): org.apache.spark.sql.DataFrame = {
    val rng = new Random(seed)
    def typo(s: String): String = {
      if (s.length < 3) s
      else {
        val i = 1 + rng.nextInt(s.length - 2)
        s.substring(0, i) + s.charAt(i + 1) + s.charAt(i) + s.substring(i + 2)
      }
    }
    var uid = 0L
    val rows = (0 until nClusters).flatMap { c =>
      val fn = firstNames(rng.nextInt(firstNames.size))
      val sn = surnames(rng.nextInt(surnames.size))
      val dob = f"19${50 + rng.nextInt(50)}%02d-${1 + rng.nextInt(12)}%02d-${1 + rng.nextInt(28)}%02d"
      val city = Vector("london", "leeds", "york", "hull")(rng.nextInt(4))
      val copies = 1 + rng.nextInt(3)
      (0 until copies).map { _ =>
        uid += 1
        val f2 = if (rng.nextDouble() < 0.2) typo(fn) else fn
        val d2 = if (rng.nextDouble() < 0.1) null else dob
        (uid, f2, sn, d2, city, c.toLong)
      }
    }
    rows.toDF("unique_id", "first_name", "surname", "dob", "city", "cluster")
  }

  test("train -> predict -> cluster recovers planted duplicates") {
    val data = generate(120, seed = 7).cache()
    val base = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(
        BlockingRule.blockOn("surname"),
        BlockingRule.blockOn("dob")),
      comparisons = Seq(
        Comparison("first_name", Seq(
          ll.nullLevel("first_name"),
          ll.exactMatch("first_name"),
          ll.jaroWinkler("first_name", 0.88),
          ll.elseLevel)),
        cl.exactMatch("dob"),
        cl.exactMatch("city")),
      probabilityTwoRandomRecordsMatch = 0.01)

    val linker = new Linker(data.drop("cluster"), base)
    // u from random pairs, m via EM blocked on surname (first_name/dob/city
    // stay active), lambda from the dob rule
    linker.training.estimateU(maxPairs = 50000)
    linker.settings = Training.withDefaultMU(linker.settings)
    val em = linker.training.estimateParametersUsingExpectationMaximisation(
      BlockingRule.blockOn("surname"))
    assert(em.iterations >= 1)

    // trained m for exact first_name should exceed its else level's
    val fn = linker.settings.comparisonByName("first_name")
    assert(fn.activeLevels.head.m.get > fn.activeLevels.last.m.get)

    val preds = linker.predict()
    val clusters = linker.clusterPairwisePredictionsAtThreshold(preds, 0.9)
      .select(col("unique_id"), col("cluster_id"))
    val joined = clusters.join(data.select("unique_id", "cluster"), "unique_id")
      .collect().map(r => (r.getAs[Long]("unique_id"),
        r.getAs[Any]("cluster_id").toString, r.getAs[Long]("cluster")))

    // pairwise precision/recall of predicted clustering vs truth
    val byPred = joined.groupBy(_._2).values.toSeq
    val byTruth = joined.groupBy(_._3).values.toSeq
    def pairs(groups: Seq[Array[(Long, String, Long)]]): Set[(Long, Long)] =
      groups.flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    val predPairs = pairs(byPred)
    val truthPairs = pairs(byTruth)
    val tp = (predPairs intersect truthPairs).size.toDouble
    val precision = if (predPairs.isEmpty) 1.0 else tp / predPairs.size
    val recall = if (truthPairs.isEmpty) 1.0 else tp / truthPairs.size
    info(s"pairwise precision=$precision recall=$recall " +
      s"(${predPairs.size} predicted, ${truthPairs.size} true)")
    assert(precision > 0.8, s"precision $precision")
    assert(recall > 0.6, s"recall $recall")
  }

  test("missing-cluster-edge scoring completes every cluster's edge set") {
    val data = generate(60, seed = 11).cache()
    val settings = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(BlockingRule.blockOn("surname")),
      comparisons = Seq(
        Comparison("first_name", Seq(
          ll.nullLevel("first_name"),
          ll.exactMatch("first_name").withM(0.9).withU(0.01),
          ll.elseLevel.withM(0.1).withU(0.99)))),
      probabilityTwoRandomRecordsMatch = 0.05)
    val linker = new Linker(data.drop("cluster"), settings)
    val preds = linker.predict()
    val clusters = linker.clusterPairwisePredictionsAtThreshold(preds, 0.5)
      .select(col("unique_id"), col("cluster_id"))
    val missing = linker.scoreMissingClusterEdges(clusters, Some(preds))

    def keySet(df: org.apache.spark.sql.DataFrame) =
      df.select("unique_id_l", "unique_id_r").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val predKeys = keySet(preds)
    val missingKeys = keySet(missing)
    // disjoint from the already-scored edges
    assert((predKeys intersect missingKeys).isEmpty)
    // together they cover EXACTLY the intra-cluster pair sets
    val members = clusters.collect()
      .map(r => r.getAs[Any]("cluster_id").toString -> r.getAs[Long]("unique_id"))
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val allIntra = members.flatMap { ids =>
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        yield (ids(i), ids(j))
    }.toSet
    val clusterOf = clusters.collect()
      .map(r => r.getAs[Long]("unique_id") -> r.getAs[Any]("cluster_id").toString)
      .toMap
    val intraPredKeys = predKeys.filter { case (a, b) =>
      clusterOf(a) == clusterOf(b) }
    assert((missingKeys union intraPredKeys) == allIntra)
  }

  test("two-dataset link_only fast path joins frames directly") {
    val a = generate(40, seed = 1).drop("cluster")
    val b = generate(40, seed = 1).drop("cluster")
      .withColumn("unique_id", col("unique_id") + 1000)
    val s = Training.withDefaultMU(LinkSettings(
      linkType = LinkType.LinkOnly,
      blockingRules = Seq(BlockingRule.blockOn("surname")),
      comparisons = Seq(cl.exactMatch("first_name"), cl.exactMatch("dob")),
      probabilityTwoRandomRecordsMatch = 0.01))
    val linker = new Linker(Seq("a" -> a, "b" -> b), s)
    val pairs = linker.blockedIdPairs().collect()
    assert(pairs.nonEmpty)
    // all pairs cross-dataset, a on the left
    pairs.foreach { r =>
      assert(r.getString(1).startsWith("a-__-"))
      assert(r.getString(2).startsWith("b-__-"))
    }
    // and scoring works through the junction joins
    val scored = linker.predict(thresholdMatchProbability = Some(0.5))
    assert(scored.count() > 0)
  }
}
