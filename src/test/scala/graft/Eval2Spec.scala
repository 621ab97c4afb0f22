package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.model.{LevelLibrary => ll}
import graft.evaluation.Evaluation
import graft.pipeline.DedupOps

/** Prediction errors at multiple thresholds, simhash approximate-regime
  * guarantees, and link-type-aware comparison counting. */
class Eval2Spec extends SparkSpec {
  import spark.implicits._

  test("predictionErrors: exact FP/FN lists at two thresholds") {
    // three score tiers: exact fn (high), levenshtein-close (mid), else (low)
    val records = Seq(
      (1L, "ann", "g1"), (2L, "ann", "g2"),   // high score, labels differ -> FP
      (3L, "bob", "g3"), (4L, "bol", "g3"),   // mid score, same label
      (5L, "cat", "g4"), (6L, "dog", "g4")    // low score, same label -> FN
    ).toDF("unique_id", "fn", "label")
    val s = LinkSettings(
      blockingRules = Seq(BlockingRule.CustomBlockingRule(
        "l.unique_id + 1 = r.unique_id AND l.unique_id % 2 = 1")),
      comparisons = Seq(Comparison("fn", Seq(ll.nullLevel("fn"),
        ll.exactMatch("fn").withM(0.8).withU(0.01),
        ll.levenshtein("fn", 1).withM(0.15).withU(0.09),
        ll.elseLevel.withM(0.05).withU(0.9)))),
      additionalColumnsToRetain = Seq("label"),
      probabilityTwoRandomRecordsMatch = 0.5)
    val linker = new Linker(records, s)
    val scored = linker.predict()
    def errs(t: Double) = Evaluation.predictionErrors(scored, "label", t)
      .collect().map(r => (r.getAs[Long]("unique_id_l"),
        r.getAs[Long]("unique_id_r")) -> r.getAs[String]("error_type")).toMap
    // mid pair probability: prior 0 weight + log2(.15/.09)=0.737 -> p~0.625
    val atHalf = errs(0.5)
    assert(atHalf == Map((1L, 2L) -> "FP", (5L, 6L) -> "FN"))
    // raising the threshold above the mid tier flips (3,4) to FN
    val atNinety = errs(0.9)
    assert(atNinety == Map((1L, 2L) -> "FP", (3L, 4L) -> "FN", (5L, 6L) -> "FN"))
  }

  test("simhash approximate regime: no false pairs, hamming<=3 recall exhaustive") {
    // long shared text + one-word edits -> hamming 2-6 between variants
    val base = "the quick brown fox jumps over the lazy dog and then runs " +
      "far away into the deep dark forest tonight while the moon rises " +
      "slowly over the quiet hills and the river keeps flowing gently past " +
      "the old stone bridge near the village square where children play"
    val docs = Seq(
      (1L, base), (2L, base.replace("quick", "quack")),
      (3L, base.replace("dog", "cat")),
      (4L, "completely different content about spark catalyst optimizer " +
        "rules and whole stage code generation pipelines"),
      (5L, base + " now")
    ).toDF("doc_id", "text")
    val approx = DedupOps.simhashDedupPairs(docs, "doc_id", "text", maxHamming = 6)
      .collect().map(r => (r.getAs[Long]("id_l"), r.getAs[Long]("id_r")) ->
        r.getAs[Int]("hamming")).toMap
    // brute force within the (single) block
    val sigs = docs.select(col("doc_id"),
      DedupOps.simhash(DedupOps.shingles(col("text"), 8)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def sharesBand(x: Long, y: Long): Boolean =
      (0 until 4).exists(b => ((x >>> (16 * b)) & 0xFFFFL) == ((y >>> (16 * b)) & 0xFFFFL))
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      d = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if d <= 6 && sharesBand(sigs(a), sigs(b))
    } yield (a, b) -> d).toMap
    // the approximate regime is EXACTLY characterised: hamming<=6 AND at
    // least one equal 16-bit band (pigeonhole makes hamming<=3 a subset)
    assert(approx == expected)
    assert(expected.nonEmpty) // the fixture actually emits candidate pairs
  }

  test("countComparisonsLinkAware: keyed == materialised, cartesian fallback") {
    val a = (0L until 30L).map(i => (i, s"k${i % 5}", "a")).toDF("unique_id", "key", "src")
    val dedupe = LinkSettings(linkType = LinkType.DedupeOnly)
    val rule = BlockingRule.blockOn("key")

    def n(df: org.apache.spark.sql.DataFrame) =
      df.collect().head.getAs[Long]("n_comparisons")

    // dedupe: keyed per-key n(n-1)/2 equals materialised pairs
    val keyed = Evaluation.countComparisonsLinkAware(a, dedupe, rule)
    assert(keyed.collect().head.getAs[String]("method") == "keyed")
    val materialized = graft.operators.Blocking.blockedIdPairs(a,
      dedupe.copy(blockingRules = Seq(rule))).count()
    assert(n(keyed) == materialized && materialized == 5 * 6 * 5 / 2)

    // link_only: per-key cross-frame products
    val b = (100L until 115L).map(i => (i, s"k${i % 5}", "b")).toDF("unique_id", "key", "src")
    val linkOnly = LinkSettings(linkType = LinkType.LinkOnly,
      sourceDatasetColumn = "src")
    val concat = a.unionByName(b)
    val keyedLink = Evaluation.countComparisonsLinkAware(concat, linkOnly, rule)
    assert(n(keyedLink) == 5 * 6 * 3) // 5 keys x (6 in a) x (3 in b)

    // non-equi rule: cartesian bound without materialising
    val cart = Evaluation.countComparisonsLinkAware(a, dedupe,
      BlockingRule.CustomBlockingRule("abs(l.unique_id - r.unique_id) < 3"))
    assert(cart.collect().head.getAs[String]("method") == "cartesian_bound")
    assert(n(cart) == 30L * 29 / 2)

    // exact = true materialises and counts exactly
    val exact = Evaluation.countComparisonsLinkAware(a, dedupe,
      BlockingRule.CustomBlockingRule("abs(l.unique_id - r.unique_id) < 3"),
      exact = true)
    assert(exact.collect().head.getAs[String]("method") == "materialised")
    assert(n(exact) == 29 + 28) // distance 1 and 2 pairs
  }

  test("profileDistribution percentile covers all non-null rows") {
    val df = Seq("a", "a", "a", "b", "b", "c", "d", null)
      .toDF("v")
    val got = Evaluation.profileDistribution(df, Seq("v")).collect()
      .map(r => r.getAs[Long]("value_count") ->
        (r.getAs[Long]("n_values"), r.getAs[Long]("cum_rows"),
          r.getAs[Double]("percentile"))).toMap
    // counts: a->3, b->2, c->1, d->1 over 7 non-null rows
    assert(got(3L) == ((1L, 3L, 3.0 / 7)))
    assert(got(2L) == ((1L, 5L, 5.0 / 7)))
    assert(got(1L) == ((2L, 7L, 1.0)))
  }
  test("parameterEstimateChartData: live row per level + one per session") {
    val lv = ll.exactMatch("x").withM(0.8).withU(0.05)
      .addTrainedM(0.75, "EM, blocked on a")
      .addTrainedM(0.85, "EM, blocked on b")
    val s = LinkSettings(comparisons = Seq(Comparison("x", Seq(
      ll.nullLevel("x"), lv, ll.elseLevel.withM(0.2).withU(0.95)))))
    val chart = Evaluation.parameterEstimateChartData(s, spark)
    val exact = chart.filter(col("gamma") === 1).collect()
    assert(exact.count(_.getAs[String]("estimate_source") == "live") == 1)
    val sessions = exact.filter(_.getAs[String]("estimate_source") != "live")
    assert(sessions.map(_.getAs[Double]("m")).sorted.toSeq == Seq(0.75, 0.85))
    // live match weight is log2(m/u)
    val liveRow = exact.find(_.getAs[String]("estimate_source") == "live").get
    assert(math.abs(liveRow.getAs[Double]("match_weight")
      - math.log(0.8 / 0.05) / math.log(2.0)) < 1e-12)
  }
  test("truth space reproduces the reference's labels fp_rate case") {
    // tests/test_accuracy.py:157-206 — three labelled pairs with
    // precomputed match weights 0.0 / 0.4 / 1.0 and clerical scores
    // 0.1 / 0.45 / 0.01 (>= 0.5 is a clerical match). At threshold 0.4:
    // (1,11) TN, (2,12) FP, (3,13) FP -> fp_rate 2/3, precision 0
    val scored = Seq((0.0, 0.1), (0.4, 0.45), (1.0, 0.01))
      .toDF("match_weight", "clerical_score")
      .withColumn("clerical_match",
        (col("clerical_score") >= 0.5).cast("int"))
    val ts = Evaluation.truthSpaceTable(scored)
    val row = ts.filter(col("truth_threshold") > 0.39 &&
        col("truth_threshold") < 0.41)
      .select("tp", "fp", "tn", "fn", "precision").collect()(0)
    assert(row.getLong(0) == 0 && row.getLong(1) == 2)
    assert(row.getLong(2) == 1 && row.getLong(3) == 0)
    val fpRate = row.getLong(1).toDouble / (row.getLong(1) + row.getLong(2))
    assert(math.abs(fpRate - 2.0 / 3.0) < 1e-12)
    assert(row.getDouble(4) == 0.0)
  }
}
