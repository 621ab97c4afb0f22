package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Materialise.Ops
import org.apache.spark.sql.expressions.Window
import graft.model._
import graft.model.{LevelLibrary => ll}
import graft.operators._
import graft.clustering.{ClusteringOps, ConnectedComponents}
import graft.evaluation.Evaluation
import graft.pipeline.{AnnOps, CorpusOps, DedupOps, MultimodalOps, TextOps, TimeOps}
import graft.training.Training

/**
 * Driver contract: one query per implemented operator family (SURVEY.md §2)
 * over the TPC-H-ish testdata, each with an equivalent DuckDB oracle SQL
 * (`oracleSql`) the driver hash-compares at sf0.01. Column names are kept
 * identical between the Spark result and the oracle; double outputs are
 * rounded to 9 decimals on both sides.
 */
object SparkEntry {

  private def pq(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table with `ts` canonicalised to an epoch-microsecond long
    * `ts_us`, tolerant of the driver datagen's timestamp vintage:
    * TIMESTAMP(NANOS) parquet arrives as nano-epoch longs (under
    * `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS) as
    * TIMESTAMP_NTZ. The NTZ branch interprets wall-clock as UTC
    * (Verify/Bench/specs pin `spark.sql.session.timeZone=UTC`), exactly
    * DuckDB's `epoch_us(ts)` on the same file. */
  private[graft] def eventsUs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val e = pq(spark, dir, "events")
    val tsUs = e.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case TimestampType => unix_micros(col("ts"))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other")
    }
    e.withColumn("ts_us", tsUs)
  }

  /** The linkage model used by the ER queries: dedupe customers, blocking
    * on (nation, mktsegment) then (nation, acctbal-bucket). */
  private[graft] def customerSettings: LinkSettings = LinkSettings(
    linkType = LinkType.DedupeOnly,
    blockingRules = Seq(
      BlockingRule.blockOn("c_nationkey", "c_mktsegment"),
      BlockingRule.blockOn("c_nationkey", "round(c_acctbal, -2)")),
    comparisons = Seq(
      Comparison("c_name", Seq(
        ll.nullLevel("c_name"),
        ll.exactMatch("c_name").withM(0.9).withU(0.001),
        ll.levenshtein("c_name", 3).withM(0.05).withU(0.01),
        ll.jaroWinkler("c_name", 0.88).withM(0.03).withU(0.05),
        ll.elseLevel.withM(0.02).withU(0.939))),
      Comparison("c_acctbal", Seq(
        ll.nullLevel("c_acctbal"),
        ll.absoluteDifference("c_acctbal", 100.0).withM(0.7).withU(0.02),
        ll.percentageDifference("c_acctbal", 0.05).withM(0.2).withU(0.03),
        ll.elseLevel.withM(0.1).withU(0.95)))),
    probabilityTwoRandomRecordsMatch = 0.001)

  /** Variant of [[customerSettings]] whose fuzzy name level is
    * damerau-levenshtein — puts the banded `damerau_levenshtein_lte`
    * kernel (the transposition-aware sibling of the banded levenshtein)
    * on the oracle gate and the measured bench scale points. */
  private[graft] def customerSettingsDL: LinkSettings = LinkSettings(
    linkType = LinkType.DedupeOnly,
    blockingRules = Seq(BlockingRule.blockOn("c_nationkey", "c_mktsegment")),
    comparisons = Seq(
      Comparison("c_name", Seq(
        ll.nullLevel("c_name"),
        ll.exactMatch("c_name").withM(0.9).withU(0.001),
        ll.damerauLevenshtein("c_name", 2).withM(0.05).withU(0.01),
        ll.elseLevel.withM(0.05).withU(0.989)))),
    probabilityTwoRandomRecordsMatch = 0.001)

  private def customers(spark: SparkSession, dir: String): DataFrame =
    pq(spark, dir, "customer").withColumnRenamed("c_custkey", "unique_id")

  /** Consecutive-order edge derivation (lag window per customer) — the
    * ONE definition every graph-query family derives from: q_cluster /
    * q_cluster_dist, the one-to-one families, and their DuckDB oracles
    * all replay exactly this shape, so the edge definition must not fork. */
  private def orderPathRaw(s: SparkSession, dir: String): DataFrame = {
    val o = pq(s, dir, "orders")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    o.select(col("o_custkey"), col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
  }

  private def orderPathEdges(s: SparkSession, dir: String): DataFrame =
    orderPathRaw(s, dir)
      .select(col("prev").as("unique_id_l"), col("o_orderkey").as("unique_id_r"))

  /** Probability-weighted path edges + synthetic dataset labels — shared
    * by q_one_to_one_constrained (gated) and q_one_to_one_dist (forced
    * distributed). */
  private def constrainedOneToOneInputs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val edges = orderPathRaw(s, dir)
      .select(col("prev").as("unique_id_l"), col("o_orderkey").as("unique_id_r"),
        (((col("prev") + col("o_orderkey")) % 97) / 96.0).as("match_probability"))
    val nodeDs = pq(s, dir, "orders")
      .select(col("o_orderkey").as("node_id"),
        concat(lit("ds"), (col("o_orderkey") % 3).cast("string"))
          .as("source_dataset"))
    (edges, nodeDs)
  }

  /** One-or-more EM iterations over blocked customer pairs, parameters
    * flattened to rows — shared by q_em_mstep (driver M-step, 1
    * iteration), q_em_mstep_dist (forced distributed M-step) and
    * q_em_train (the full multi-iteration training loop; tolerance 0
    * pins the iteration count so the DuckDB oracle can unroll it
    * exactly). */
  private def emMstep(s: SparkSession, dir: String,
      maxIterations: Int = 1, tolerance: Double = 1e-4): DataFrame = {
    val res = Training.expectationMaximisation(
      Seq("customer" -> customers(s, dir)), customerSettings,
      BlockingRule.blockOn("c_nationkey", "c_mktsegment"),
      fixU = false, maxIterations = maxIterations, tolerance = tolerance)
    val rows = res.settings.comparisons.flatMap { cmp =>
      cmp.activeLevelsWithGamma.flatMap { case (lv, g) =>
        Seq(("m", cmp.outputColumnName, g, lv.m.get),
          ("u", cmp.outputColumnName, g, lv.u.get)) } } :+
      (("lambda", "", -1, res.trainedLambda))
    s.createDataFrame(rows).toDF("param", "comparison", "gamma", "value")
      .withColumn("value", round(col("value"), 9))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val linker = new Linker(customers(spark, "/root/testdata/sf0.001"), customerSettings)
    linker.predict()
  }

  // Shared SQL fragments for the oracle side (DuckDB dialect).
  private val oracleGammaName =
    """CASE WHEN l.c_name IS NULL OR r.c_name IS NULL THEN -1
      |     WHEN l.c_name = r.c_name THEN 3
      |     WHEN levenshtein(l.c_name, r.c_name) <= 3 THEN 2
      |     WHEN jaro_winkler_similarity(l.c_name, r.c_name) >= 0.88 THEN 1
      |     ELSE 0 END""".stripMargin
  private val oracleGammaBal =
    """CASE WHEN l.c_acctbal IS NULL OR r.c_acctbal IS NULL THEN -1
      |     WHEN abs(l.c_acctbal - r.c_acctbal) <= 100.0 THEN 2
      |     WHEN abs(l.c_acctbal - r.c_acctbal) / greatest(abs(l.c_acctbal), abs(r.c_acctbal)) < 0.05 THEN 1
      |     ELSE 0 END""".stripMargin
  /** Blocked pairs (both rules, NOT-previous dedupe) as an oracle CTE. */
  private val oraclePairsCte =
    s"""WITH pairs AS (
       |  SELECT '0' AS match_key, l.c_custkey AS uid_l, r.c_custkey AS uid_r
       |  FROM customer l JOIN customer r
       |    ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
       |   AND l.c_custkey < r.c_custkey
       |  UNION ALL
       |  SELECT '1', l.c_custkey, r.c_custkey
       |  FROM customer l JOIN customer r
       |    ON l.c_nationkey = r.c_nationkey AND round(l.c_acctbal, -2) = round(r.c_acctbal, -2)
       |   AND l.c_custkey < r.c_custkey
       |   AND NOT coalesce(l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment, false)
       |)""".stripMargin

  /** Cross-document duplicated 10-token spans over `documents`, as a
    * `spans(doc_id, span_start, span_end, n_windows)` oracle CTE chain:
    * window per start position, windows seen in >=2 docs, gaps-and-islands
    * merge of overlapping/adjacent duplicated windows. */
  private val oracleDupSpansCte =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |  FROM documents WHERE trim(text) <> ''),
      |wins AS (
      |  SELECT doc_id, i - 1 AS pos, array_to_string(t[i : i + 9], ' ') AS w
      |  FROM toks, unnest(range(1, len(t) - 9 + 1)) AS u(i)),
      |duph AS (
      |  SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
      |dupw AS (
      |  SELECT doc_id, pos FROM wins JOIN duph USING (w)),
      |pe AS (
      |  SELECT doc_id, pos,
      |    max(pos + 9) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM dupw),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(CASE WHEN pos > coalesce(prev_end, -2147483648) + 1
      |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM pe),
      |spans AS (
      |  SELECT doc_id, island, min(pos) AS span_start, max(pos) + 9 AS span_end,
      |    count(*) AS n_windows
      |  FROM isl GROUP BY doc_id, island)""".stripMargin

  /** One entry per implemented operator from SURVEY.md §2. */
  // ListMap: INSERTION-ordered iteration, so Bench executes queries in the
  // stable order written here — a plain Map's hash-derived order reshuffles
  // whenever a query is added, making round-over-round per-query deltas an
  // ordering artifact (r6 verdict finding #3).
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(

    // §2.4 aggregation baseline (also the bench headline shape).
    // Sums are exact integers (floor to whole units / cents, LONG add) so
    // neither engine's double->decimal cast rounding nor sum-output
    // precision (Spark DECIMAL(28,x) vs DuckDB DECIMAL(38,x)/HUGEINT) can
    // poison the driver's typed hash.
    "q1_agg" -> ((s, dir) => {
      pq(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(floor(col("l_quantity"))).as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100)).as("sum_price_cents"),
          count(lit(1)).as("n_rows"))
    }),

    // §2.2 vertical concat + composite uid
    "q_concat" -> ((s, dir) => {
      val settings = LinkSettings(linkType = LinkType.LinkAndDedupe)
      val c = pq(s, dir, "customer").select(col("c_custkey").as("unique_id"),
        col("c_name").as("name"))
      val sup = pq(s, dir, "supplier").select(col("s_suppkey").as("unique_id"),
        col("s_name").as("name"))
      VerticalConcat(Seq("customer" -> c, "supplier" -> sup), settings)
        .withColumn("composite_uid", VerticalConcat.compositeUid(settings))
    }),

    // §2.4 term-frequency table
    "q_tf" -> ((s, dir) => {
      TermFrequency.table(pq(s, dir, "customer"), "c_mktsegment")
        .withColumn("tf_c_mktsegment", round(col("tf_c_mktsegment"), 9))
    }),

    // §2.3 blocking join, single equi rule
    "q_blocked_pairs" -> ((s, dir) => {
      val settings = customerSettings.copy(
        blockingRules = customerSettings.blockingRules.take(1))
      Blocking.blockedIdPairs(customers(s, dir), settings)
        .select(col("join_key_l").cast("bigint").as("uid_l"),
          col("join_key_r").cast("bigint").as("uid_r"))
    }),

    // §2.8 salted blocking on a deliberately hot key (c_mktsegment: 5
    // values): salts=4 splits each rule join into 4 bucketed sub-joins so
    // no single task carries a whole hot block. The oracle is the PLAIN
    // unsalted join — salting must not change the pair set
    "q_salted_pairs" -> ((s, dir) => {
      val c = pq(s, dir, "customer").filter(col("c_custkey") % 20 === 0)
        .select(col("c_custkey").as("unique_id"), col("c_mktsegment"))
      val settings = LinkSettings(linkType = LinkType.DedupeOnly,
        blockingRules = Seq(
          BlockingRule.BlockOnRule(Seq("c_mktsegment"), salts = 4)))
      Blocking.blockedIdPairs(c, settings)
        .select(col("join_key_l").cast("bigint").as("uid_l"),
          col("join_key_r").cast("bigint").as("uid_r"))
    }),

    // AUTO-salted blocking through the full Linker path
    // (`spark.graft.autoSalt=true`): c_mktsegment has 5 values, so the
    // largest block far exceeds an even per-task share and the advisor
    // salts the rule at plan time. The oracle is the PLAIN unsalted join —
    // auto-salting is a physical rewrite only
    "q_autosalt_pairs" -> ((s, dir) => {
      val c = pq(s, dir, "customer").filter(col("c_custkey") % 20 === 0)
        .select(col("c_custkey").as("unique_id"), col("c_mktsegment"))
      val settings = LinkSettings(linkType = LinkType.DedupeOnly,
        blockingRules = Seq(BlockingRule.blockOn("c_mktsegment")),
        comparisons = Seq(Comparison("c_mktsegment", Seq(
          ll.nullLevel("c_mktsegment"),
          ll.exactMatch("c_mktsegment").withM(0.9).withU(0.2),
          ll.elseLevel.withM(0.1).withU(0.8)))))
      s.conf.set("spark.graft.autoSalt", "true")
      try {
        // blockedIdPairs probes + rewrites the rules eagerly at call time
        new Linker(c, settings).blockedIdPairs()
          .select(col("join_key_l").cast("bigint").as("uid_l"),
            col("join_key_r").cast("bigint").as("uid_r"))
      } finally s.conf.unset("spark.graft.autoSalt")
    }),

    // §2.3 multi-rule dedupe with match_key
    "q_multi_rule_pairs" -> ((s, dir) => {
      Blocking.blockedIdPairs(customers(s, dir), customerSettings)
        .select(col("match_key"),
          col("join_key_l").cast("bigint").as("uid_l"),
          col("join_key_r").cast("bigint").as("uid_r"))
    }),

    // §2.2/§2.8 comparison vectors: gamma CASE incl. native jaro-winkler
    "q_comparison_vectors" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      linker.comparisonVectors()
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          col("gamma_c_name"), col("gamma_c_acctbal"))
    }),

    // §2.9 Fellegi-Sunter scoring end to end
    "q_predict" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      linker.predict()
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          round(col("match_weight"), 6).as("match_weight"),
          round(col("match_probability"), 6).as("match_probability"))
    }),

    // the CHUNKED scoring path under the SAME oracle as q_predict (the
    // driver contract's forced-alternate-path pattern, like
    // q_cluster_dist): pairs materialise once, each hash-chunk scores and
    // checkpoints separately — the bounded-peak-memory shape for scoring
    // runs that exceed one shuffle's budget
    "q_predict_chunked" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      linker.predictChunked(numChunks = 3)
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          round(col("match_weight"), 6).as("match_weight"),
          round(col("match_probability"), 6).as("match_probability"))
    }),

    // the GRID-chunked path (input records hash-split on both sides,
    // blocking re-run per left x right chunk pair — the reference's
    // num_chunks_left x num_chunks_right shape for inputs too big for one
    // blocking join), same exact oracle
    "q_predict_grid" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      linker.predictChunked(numChunksLeft = 2, numChunksRight = 2,
          thresholdMatchProbability = None)
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          round(col("match_weight"), 6).as("match_weight"),
          round(col("match_probability"), 6).as("match_probability"))
    }),

    // §2.12 prediction errors against a ground-truth label column
    // (`evaluation.py:37-351`): customers labelled in consecutive pairs
    // (grp = floor(uid/2)), FP = scored >= t but labels differ, FN = same
    // label scored below t; full predict replay in the oracle
    "q_prediction_errors" -> ((s, dir) => {
      val c = customers(s, dir).withColumn("grp", floor(col("unique_id") / 2))
      val linker = new Linker(c, customerSettings.copy(
        additionalColumnsToRetain = Seq("grp")))
      val scored = linker.predict()
        .withColumn("match_probability", round(col("match_probability"), 6))
      Evaluation.predictionErrors(scored, "grp", 0.5)
        .select(col("unique_id_l").as("uid_l"),
          col("unique_id_r").as("uid_r"), col("error_type"))
    }),

    // §2.9 TF-adjusted scoring: low-frequency mktsegment matches get a
    // term-frequency bonus relative to u_exact (`comparison_level.py:671-731`)
    "q_predict_tf" -> ((s, dir) => {
      val settings = LinkSettings(
        linkType = LinkType.DedupeOnly,
        blockingRules = Seq(BlockingRule.blockOn("c_nationkey")),
        comparisons = Seq(
          Comparison("c_mktsegment", Seq(
            ll.nullLevel("c_mktsegment"),
            ll.exactMatch("c_mktsegment", tfAdjustment = true).withM(0.9).withU(0.2),
            ll.elseLevel.withM(0.1).withU(0.8)))),
        probabilityTwoRandomRecordsMatch = 0.01)
      val linker = new Linker(customers(s, dir), settings)
      linker.predict()
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          col("gamma_c_mktsegment"),
          round(col("match_weight"), 6).as("match_weight"))
    }),

    // §2.9 realtime cartesian scoring (`inference.py:815-900` score_pairs):
    // NO blocking — every left record against every right record, TF
    // resolved from the linker's own corpus, plus the reference's
    // found_by_blocking_rules flag (`accuracy.py:293-309`: would any
    // prediction rule have generated this pair)
    "q_score_pairs" -> ((s, dir) => {
      val settings = LinkSettings(
        linkType = LinkType.DedupeOnly,
        blockingRules = Seq(BlockingRule.blockOn("c_nationkey")),
        comparisons = Seq(
          Comparison("c_mktsegment", Seq(
            ll.nullLevel("c_mktsegment"),
            ll.exactMatch("c_mktsegment", tfAdjustment = true).withM(0.9).withU(0.2),
            ll.elseLevel.withM(0.1).withU(0.8)))),
        probabilityTwoRandomRecordsMatch = 0.01)
      val c = customers(s, dir)
      val linker = new Linker(c, settings)
      linker.scorePairs(
          c.filter(col("unique_id") % 150 === 0),
          c.filter(col("unique_id") % 173 === 0),
          includeFoundByBlockingRules = true)
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          col("gamma_c_mktsegment"),
          round(col("match_weight"), 6).as("match_weight"),
          col("found_by_blocking_rules"))
    }),

    // §2.9 trained model over NEW data (`inference.py:1156-1250`
    // predict_within): candidates blocked within the new batch under the
    // trained rules; TF comes from the REGISTERED corpus table
    // (computeTfTable), never from the batch itself — the oracle joins
    // frequencies computed over the FULL customer table onto pairs drawn
    // only from the batch
    "q_predict_within" -> ((s, dir) => {
      val settings = LinkSettings(
        linkType = LinkType.DedupeOnly,
        blockingRules = Seq(BlockingRule.blockOn("c_nationkey")),
        comparisons = Seq(
          Comparison("c_mktsegment", Seq(
            ll.nullLevel("c_mktsegment"),
            ll.exactMatch("c_mktsegment", tfAdjustment = true).withM(0.9).withU(0.2),
            ll.elseLevel.withM(0.1).withU(0.8)))),
        probabilityTwoRandomRecordsMatch = 0.01)
      val c = customers(s, dir)
      val linker = new Linker(c, settings)
      linker.computeTfTable("c_mktsegment")
      linker.predictWithin(c.filter(col("unique_id") % 7 === 0))
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          col("gamma_c_mktsegment"),
          round(col("match_weight"), 6).as("match_weight"))
    }),

    // embedding clustering: one distributed Lloyd iteration from the
    // deterministic hash seeds, assignments after the mean update
    // (centroids 9dp-rounded on both sides so float-sum ordering cannot
    // flip an assignment)
    "q_kmeans" -> ((s, dir) => {
      val e = pq(s, dir, "embeddings")
      val ctr = AnnOps.kmeansFit(e, "embedding", k = 4, iterations = 1)
      val rounded = ctr.map(_.map(x =>
        BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      AnnOps.kmeansAssign(e, "embedding", rounded)
        .select(col("vec_id"), col("cell").cast("int").as("cell"))
    }),

    // §2.9 trained model BETWEEN two new record collections
    // (`inference.py:1260-1430` predict_between): cross-role blocking
    // only (no within-side pairs by construction), strict registered TF
    "q_predict_between" -> ((s, dir) => {
      val settings = LinkSettings(
        linkType = LinkType.DedupeOnly,
        blockingRules = Seq(BlockingRule.blockOn("c_nationkey")),
        comparisons = Seq(
          Comparison("c_mktsegment", Seq(
            ll.nullLevel("c_mktsegment"),
            ll.exactMatch("c_mktsegment", tfAdjustment = true).withM(0.9).withU(0.2),
            ll.elseLevel.withM(0.1).withU(0.8)))),
        probabilityTwoRandomRecordsMatch = 0.01)
      val c = customers(s, dir)
      val linker = new Linker(c, settings)
      linker.computeTfTable("c_mktsegment")
      linker.predictBetween(c.filter(col("unique_id") % 5 === 0),
          c.filter(col("unique_id") % 6 === 0))
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          col("gamma_c_mktsegment"),
          round(col("match_weight"), 6).as("match_weight"))
    }),

    // §2.12 find matches to new records: block + score a small batch of
    // incoming records against the corpus without re-linking the corpus to
    // itself (`find_matches_to_new_records.py:14-51`). No uid-ordering
    // filter: l = corpus, r = new, so a record present in both sides
    // scores against itself too.
    "q_new_records" -> ((s, dir) => {
      val c = customers(s, dir)
      val linker = new Linker(c, customerSettings)
      linker.findMatchesToNewRecords(c.filter(col("unique_id") % 97 === 0))
        .select(col("match_key"),
          col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          round(col("match_weight"), 6).as("match_weight"),
          round(col("match_probability"), 6).as("match_probability"))
    }),

    // misc query_sql (`misc.py:52`): arbitrary SQL over the linker's
    // named intermediates registered as views
    "q_query_sql" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      linker.querySql(
        """SELECT c_mktsegment, count(*) AS n, min(c_acctbal) AS min_bal
          |FROM `__splink__df_concat` GROUP BY c_mktsegment""".stripMargin)
    }),

    // §2.12 score missing intra-cluster edges (`inference.py:574-744`
    // _score_missing_cluster_edges): every same-cluster pair the model's
    // blocking rules never generated, scored through the trained model;
    // pairs already present in the predict frame are anti-joined away
    "q_missing_cluster_edges" -> ((s, dir) => {
      val c = customers(s, dir).filter(col("unique_id") % 3 === 0)
      val linker = new Linker(c, customerSettings)
      val edges = linker.predict()
      val clusters = c.select(col("unique_id"),
        concat(lit("n"), col("c_nationkey")).as("cluster_id"))
      linker.scoreMissingClusterEdges(clusters, Some(edges))
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          round(col("match_weight"), 6).as("match_weight"),
          round(col("match_probability"), 6).as("match_probability"))
    }),

    // §2.12 realtime compare_records: small frames cross-joined through
    // the trained model with no blocking (`realtime.py:44-159`)
    "q_compare_records" -> ((s, dir) => {
      val c = customers(s, dir)
      val linker = new Linker(c, customerSettings)
      linker.compareRecords(c.filter(col("unique_id") % 499 === 0),
          c.filter(col("unique_id") % 313 === 0))
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          col("gamma_c_name"), col("gamma_c_acctbal"),
          round(col("match_weight"), 6).as("match_weight"))
    }),

    // §2.12 waterfall-chart data: the additive log2-Bayes-factor
    // decomposition of every scored pair — prior row, one row per
    // comparison, final row (`waterfall_chart.py:11-170`)
    "q_waterfall" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      Evaluation.waterfallData(linker.predict(), customerSettings)
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          col("term"), col("bar_sort_order"),
          round(col("log2_bayes_factor"), 6).as("log2_bayes_factor"))
    }),

    // comparison-viewer example rows (`splink_comparison_viewer.py:85-146`):
    // per gamma pattern, the 2 lowest-(uid_l, uid_r) example pairs with the
    // pattern's count, proportion, and no-TF pattern weight — deterministic
    // (the reference samples by random(); we pick by id so DuckDB replays it)
    "q_viewer_rows" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      graft.charts.Dashboards.viewerExampleRows(
          linker.predict(), customerSettings, 2)
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          col("gam_concat"),
          round(col("sort_avg_match_weight"), 6).as("sort_avg_match_weight"),
          col("row_example_index").cast("long").as("row_example_index"),
          col("count_rows_in_comparison_vector_group").as("pattern_count"),
          round(col("proportion_of_comparisons"), 9).as("proportion"))
    }),

    // §2.4 agreement-pattern counts (EM E-step input)
    "q_em_patterns" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      linker.comparisonVectors()
        .groupBy("gamma_c_name", "gamma_c_acctbal")
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // the same pattern-aggregate shape with a DAMERAU-levenshtein fuzzy
    // level: the scan is dominated by the bounded-DL predicate, so this
    // query is the measured evidence for the banded kernel at scale
    "q_em_patterns_dl" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettingsDL)
      linker.comparisonVectors()
        .groupBy("gamma_c_name")
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // §2.11 connected components over a multi-hop path graph:
    // consecutive orders of each customer form a path; components = customers.
    "q_cluster" -> ((s, dir) => {
      // lag-derived consecutive pairs are distinct and single-orientation
      // by construction — the documented skip-dedupe contract
      ConnectedComponents.run(orderPathEdges(s, dir),
        assumeDistinctPairs = true)
    }),

    // the SAME component solve FORCED through the fully distributed
    // min-label + pointer-jumping loop (smallGraphThreshold = 0 disables
    // the driver union-find fast path) — the 100 TB path, under the same
    // oracle, and on the bench's sf1 scale point for a measured slope
    "q_cluster_dist" -> ((s, dir) => {
      ConnectedComponents.run(orderPathEdges(s, dir), smallGraphThreshold = 0L,
        assumeDistinctPairs = true)
    }),

    // §2.5 window functions: cluster sizes + rank of node within cluster
    "q_cluster_stats" -> ((s, dir) => {
      val o = pq(s, dir, "orders")
      o.groupBy(col("o_custkey").as("cluster_key"))
        .agg(count(lit(1)).as("cluster_size"),
          min("o_orderkey").as("min_node"), max("o_orderkey").as("max_node"))
        .filter(col("cluster_size") >= 2)
    }),

    // §2.4 blocking analysis: comparisons-per-rule counts without materialising
    "q_blocking_analysis" -> ((s, dir) => {
      val c = pq(s, dir, "customer")
      val byKey = c.groupBy("c_nationkey", "c_mktsegment").count()
      byKey.agg(sum(col("count") * (col("count") - 1) / 2).cast("bigint").as("n_comparisons"))
    }),

    // time-series: tumbling-hour windowed aggregation over the events table
    // (the batch shape of the streaming watermark+window pipeline).
    "q_events_window" -> ((s, dir) => {
      eventsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          // exact micro-unit LONG sum: floor(x*1e6) is bit-identical IEEE
          // math in Spark and DuckDB, and integer addition is order-free
          sum(floor(col("value") * 1000000)).as("sum_value_micros"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // §2.8 native string-similarity kernels oracled value-for-value
    // against DuckDB's built-ins (`comparison_level_library.py` distance
    // families): levenshtein (Spark built-in), damerau-levenshtein, jaro,
    // jaro-winkler (native codegen exprs), char-set jaccard (the
    // DuckDB-semantics kernel duckdb-dialect model.json conditions use)
    "q_string_sims" -> ((s, dir) => {
      val c = pq(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_name"))
      val prs = c.alias("l").join(c.alias("r"), col("l.k") + 1 === col("r.k"))
        .select(col("l.k").as("k"), col("l.c_name").as("a"),
          col("r.c_name").as("b"))
      prs.select(col("k"),
        levenshtein(col("a"), col("b")).cast("bigint").as("lev"),
        graft.functions.funcs.damerau_levenshtein(col("a"), col("b"))
          .cast("bigint").as("dlev"),
        round(graft.functions.funcs.jaro_sim(col("a"), col("b")), 9).as("jaro"),
        round(graft.functions.funcs.jaro_winkler(col("a"), col("b")), 9).as("jw"),
        round(graft.functions.funcs.jaccard_chars(col("a"), col("b")), 9).as("jac1"))
    }),

    // exploratory similarity-analysis comparator matrix
    // (`similarity_analysis.py:48-80` comparator_score_df): the same five
    // comparators the reference scores IN DuckDB, at its default 2dp
    // rounding, over a synthesized pair frame — oracled value-for-value
    "q_comparator_scores" -> ((s, dir) => {
      val c = pq(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_name"))
      val prs = c.alias("l").join(c.alias("r"), col("l.k") + 1 === col("r.k"))
        .select(col("l.k").as("k"), col("l.c_name").as("a"),
          col("r.c_name").as("b"))
      graft.exploratory.SimilarityAnalysis.comparatorScoreDf(prs, "a", "b")
    }),

    // §2.8 remaining level families oracled as evaluated CONDITIONS: the
    // pair frame synthesises `_l`/`_r` columns from consecutive custkeys
    // and each output column is the level library's own sqlCondition
    // (literal match, columns-reversed, date/time difference, haversine
    // km, array intersect/subset — `comparison_level_library.py`)
    "q_levels_extra" -> ((s, dir) => {
      import graft.model.{LevelLibrary => lv}
      val c = pq(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("k"), col("c_name"),
          col("c_mktsegment"))
      val prs = c.alias("l").join(c.alias("r"), col("l.k") + 1 === col("r.k"))
        .select(col("l.k").as("k"),
          col("l.c_name").as("nm1_l"), col("r.c_name").as("nm1_r"),
          col("r.c_name").as("nm2_l"),
          when(col("l.k") % 5 === 0, col("l.c_name"))
            .otherwise(col("r.c_name")).as("nm2_r"),
          col("l.c_mktsegment").as("seg_l"), col("r.c_mktsegment").as("seg_r"),
          date_add(lit("2020-01-01").cast("date"),
            ((col("l.k") * 7) % 300).cast("int")).as("d_l"),
          date_add(lit("2020-01-01").cast("date"),
            ((col("r.k") * 7) % 300).cast("int")).as("d_r"),
          timestamp_seconds(lit(1577836800L) + (col("l.k") * col("l.k")) % 86400)
            .as("t_l"),
          timestamp_seconds(lit(1577836800L) + (col("r.k") * col("r.k")) % 86400)
            .as("t_r"),
          (col("l.k") % 160 - 80 + lit(0.25)).as("lat_l"),
          (col("r.k") % 160 - 80 + lit(0.25)).as("lat_r"),
          (col("l.k") % 350 - 175 + lit(0.25)).as("lon_l"),
          (col("r.k") % 350 - 175 + lit(0.25)).as("lon_r"),
          array(concat(lit("a"), (col("l.k") % 5).cast("string")),
            concat(lit("b"), (col("l.k") % 7).cast("string"))).as("arr_l"),
          when(col("l.k") % 3 === 0,
            array(concat(lit("a"), (col("l.k") % 5).cast("string")),
              concat(lit("b"), (col("l.k") % 7).cast("string"))))
            .otherwise(array(concat(lit("a"), (col("l.k") % 5).cast("string")),
              concat(lit("b"), (col("r.k") % 7).cast("string")))).as("arr_r"))
      prs.select(col("k"),
        expr(lv.literalMatch("seg", "BUILDING").sqlCondition).as("lm"),
        expr(lv.columnsReversed("nm1", "nm2").sqlCondition).as("cr"),
        expr(lv.absoluteDateDifference("d", 30).sqlCondition).as("ad"),
        expr(lv.absoluteTimeDifference("t", 2000).sqlCondition).as("at"),
        expr(lv.distanceInKM("lat", "lon", 500).sqlCondition).as("km"),
        expr(lv.arrayIntersect("arr", 1).sqlCondition).as("ai"),
        expr(lv.arraySubset("arr").sqlCondition).as("asb"))
    }),

    // §2.10 deterministic hash sampling (portable md5-derived hash)
    "q_sample" -> ((s, dir) => {
      val o = pq(s, dir, "orders")
      o.filter(TextOps.hashSample(col("o_orderkey"), 0.1))
        .select("o_orderkey", "o_custkey")
    }),

    // training-data ops: exact dedup on documents
    "q_exact_dedup" -> ((s, dir) => {
      DedupOps.exactDedup(pq(s, dir, "documents"), "doc_id", "text")
    }),

    // dedup: asymmetric containment |A∩B|/|A| — boilerplate/quotation
    // detection Jaccard misses; NO length bucket in the block key (it
    // would separate exactly the short-in-long pairs this finds)
    "q_containment_pairs" -> ((s, dir) => {
      val d = pq(s, dir, "documents")
      DedupOps.containmentPairs(d, "doc_id", "text",
        Seq(col("lang"), col("source")), threshold = 0.5)
    }),

    // dedup: MOSS winnowing fingerprints (Schleimer et al. 2003) — the
    // guarantee-bearing document fingerprint selection (~2/(w+1) of the
    // q-gram hashes, every match of length >= w+q-1 shares one)
    "q_winnow" -> ((s, dir) => {
      pq(s, dir, "documents").select(col("doc_id"),
        explode(graft.functions.funcs.winnow_fingerprints(col("text"), 8, 4))
          .as("fp"))
    }),

    // dedup: cross-document duplicated token spans (exact-substring dedup,
    // Lee et al. arXiv:2107.06499 re-shaped as window-hash + islands)
    "q_dup_spans" -> ((s, dir) => {
      DedupOps.duplicatedSpans(pq(s, dir, "documents"), "doc_id", "text",
          k = 10, minDocs = 2)
        .select(col("doc_id"),
          col("span_start").cast("bigint").as("span_start"),
          col("span_end").cast("bigint").as("span_end"),
          col("n_windows").cast("bigint").as("n_windows"))
    }),

    // dedup: APPLY the span dedup — drop duplicated spans from every
    // non-owning document, keeping one copy corpus-wide
    "q_dedup_spans_apply" -> ((s, dir) => {
      DedupOps.removeDuplicatedSpans(pq(s, dir, "documents"), "doc_id", "text",
        k = 10, minDocs = 2)
    }),

    // dedup: per-document duplicated-token ratio over the same spans
    "q_dup_token_stats" -> ((s, dir) => {
      DedupOps.duplicatedTokenStats(pq(s, dir, "documents"), "doc_id", "text",
          k = 10, minDocs = 2)
        .select(col("doc_id"),
          col("n_tokens").cast("bigint").as("n_tokens"),
          col("dup_tokens").cast("bigint").as("dup_tokens"), col("dup_ratio"))
    }),

    // text analysis: token counts, ratios, quality, language, fingerprint
    "q_text_stats" -> ((s, dir) => {
      TextOps.metricsFrame(pq(s, dir, "documents"), "text", Seq("doc_id"))
    }),

    // text analysis: token budgeting — whitespace tokens vs BPE-ish
    // pre-tokenizer matches (portable lookahead-free GPT-2-style pattern)
    "q_token_counts" -> ((s, dir) => {
      TextOps.tokenCounts(pq(s, dir, "documents"), "doc_id", "text")
    }),

    // text analysis: Gopher rule-based quality gate (Rae et al. 2021
    // A1.1), thresholds tuned to the synthetic corpus' short documents
    "q_gopher_rules" -> ((s, dir) => {
      TextOps.gopherRules(pq(s, dir, "documents"), "doc_id", "text",
        minTokens = 20, minStopHits = 1)
    }),

    // dedup: token-set jaccard pairs, blocked by (lang, source, length bucket)
    "q_jaccard_pairs" -> ((s, dir) => {
      val d = pq(s, dir, "documents")
      DedupOps.tokenJaccardPairs(d, "doc_id", "text",
        Seq(col("lang"), col("source"), floor(col("n_chars") / 50)), 0.35)
    }),

    // dedup: character 5-gram Jaccard — catches reordered/joined/split
    // words that token-level sets miss; same hashed-sorted-longs shuffle
    // shape as q_jaccard_pairs. The oracle computes Jaccard on the raw
    // shingle string sets, which equals the engine's hashed-set value
    // absent an xxhash64 collision.
    "q_ngram_pairs" -> ((s, dir) => {
      DedupOps.ngramJaccardPairs(pq(s, dir, "documents"), "doc_id", "text",
        Seq(col("lang"), col("source")), 0.1, q = 5)
    }),

    // similarity search: brute-force cosine top-5 for query vecs (id < 10)
    "q_ann_topk" -> ((s, dir) => {
      val e = pq(s, dir, "embeddings")
      AnnOps.bruteForceTopK(e.filter(col("vec_id") < 10), e, 5)
    }),

    // similarity search: IVF with full probing must equal brute force —
    // oracles the quantizer + cell assignment + probe + re-rank machinery
    "q_ann_ivf" -> ((s, dir) => {
      val e = pq(s, dir, "embeddings")
      AnnOps.ivfTopK(e.filter(col("vec_id") < 10), e, 5, nCells = 8, nProbe = 8)
    }),

    // similarity search: multi-table hyperplane LSH — candidate buckets
    // from 8 tables x 8 bits, exact cosine re-rank inside buckets. The
    // oracle replays the seeded hyperplane signatures bit for bit, so this
    // checks the approximate path's ACTUAL output (bucket collisions
    // included), not just recall.
    "q_ann_lsh" -> ((s, dir) => {
      val e = pq(s, dir, "embeddings")
      AnnOps.lshTopK(e.filter(col("vec_id") < 10), e, 5, bits = 8, tables = 8)
    }),

    // dedup: embedding cosine pairs >= 0.2 among vec_id % 20 == 0 subset
    "q_embed_pairs" -> ((s, dir) => {
      val e = pq(s, dir, "embeddings").filter(col("vec_id") % 20 === 0)
      DedupOps.embeddingDupPairs(e, "vec_id", "embedding", col("label"), 0.2)
    }),

    // §2.3 exploding array blocking: parts sharing a type-word (arrays
    // synthesised by splitting p_type); distinct marginal id pairs
    "q_exploding_pairs" -> ((s, dir) => {
      val parts = pq(s, dir, "part").filter(col("p_partkey") % 10 === 0)
        .select(col("p_partkey").as("unique_id"),
          split(col("p_type"), " ").as("words"))
      val settings = LinkSettings(
        linkType = LinkType.DedupeOnly,
        blockingRules = Seq(BlockingRule.BlockOnRule(Seq("words"),
          arraysToExplode = Seq("words"))),
        comparisons = Seq(Comparison("unique_id", Seq(
          ll.exactMatch("unique_id"), ll.elseLevel))))
      Blocking.blockedIdPairs(parts, settings)
        .select(col("join_key_l").cast("bigint").as("uid_l"),
          col("join_key_r").cast("bigint").as("uid_r"))
    }),

    // §2.3 exploding + plain rules in ONE settings object
    // (`blocking.py:814-827`): NOT-previous cannot express an exploding
    // rule's element-overlap condition, so with any exploding rule in play
    // cross-rule dedupe is the reference's global min(match_key) group-by;
    // the exploding rule's own join still excludes preceding PLAIN rules
    // (`blocking.py:350-408` marginal_exploded_id_pairs_table_sql)
    "q_exploding_multi_rule" -> ((s, dir) => {
      val parts = pq(s, dir, "part").filter(col("p_partkey") % 10 === 0)
        .select(col("p_partkey").as("unique_id"), col("p_brand"),
          col("p_size"), split(col("p_type"), " ").as("words"))
      val settings = LinkSettings(
        linkType = LinkType.DedupeOnly,
        blockingRules = Seq(
          BlockingRule.blockOn("p_brand"),
          BlockingRule.BlockOnRule(Seq("words"), arraysToExplode = Seq("words")),
          BlockingRule.blockOn("pmod(p_size, 5)")),
        comparisons = Seq(Comparison("unique_id", Seq(
          ll.exactMatch("unique_id"), ll.elseLevel))))
      Blocking.blockedIdPairs(parts, settings)
        .select(col("match_key"),
          col("join_key_l").cast("bigint").as("uid_l"),
          col("join_key_r").cast("bigint").as("uid_r"))
    }),

    // §2.8 array comparison levels over word arrays: intersect-size and
    // best-pairwise-jaro-winkler gammas (higher-order functions end to end)
    "q_array_levels" -> ((s, dir) => {
      val parts = pq(s, dir, "part").filter(col("p_partkey") % 10 === 0)
        .select(col("p_partkey").as("unique_id"), col("p_size"),
          split(col("p_type"), " ").as("words"))
      val settings = LinkSettings(
        linkType = LinkType.DedupeOnly,
        blockingRules = Seq(BlockingRule.blockOn("pmod(p_size, 10)")),
        comparisons = Seq(Comparison("words", Seq(
          ll.nullLevel("words"),
          ll.arrayIntersect("words", 2),
          ll.pairwiseStringDistance("words", "jaro_winkler", 0.95),
          ll.elseLevel))))
      val linker = new Linker(parts, settings)
      linker.comparisonVectors()
        .select(col("unique_id_l").as("uid_l"), col("unique_id_r").as("uid_r"),
          col("gamma_words"))
    }),

    // §2.7 anti join: customers with no high-value order
    "q_anti_join" -> ((s, dir) => {
      pq(s, dir, "customer").alias("c")
        .join(pq(s, dir, "orders").filter(col("o_totalprice") > 150000).alias("o"),
          col("c.c_custkey") === col("o.o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // §2.12 truth-space table: cumulative TP/FP/TN/FN over thresholds;
    // clerical truth := same mktsegment (rule 2 pairs may differ)
    "q_truth_space" -> ((s, dir) => {
      val settings = customerSettings.copy(
        additionalColumnsToRetain = Seq("c_mktsegment"))
      val linker = new Linker(customers(s, dir), settings)
      val scored = Evaluation.withClericalFromLabelColumn(
        linker.predict(), "c_mktsegment")
      Evaluation.truthSpaceTable(scored)
        .select(col("truth_threshold"), col("tp"), col("fp"), col("tn"), col("fn"),
          round(col("precision"), 9).as("precision"),
          round(col("recall"), 9).as("recall"),
          round(col("f1"), 9).as("f1"))
    }),

    // §2.12 unlinkables: self-link match-weight distribution
    "q_unlinkables" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      Evaluation.unlinkables(linker.selfLink())
        .select(col("match_weight"), col("match_probability"),
          round(col("prop"), 9).as("prop"), round(col("cum_prop"), 9).as("cum_prop"))
    }),

    // §2.12 completeness per column
    "q_completeness" -> ((s, dir) => {
      Evaluation.completeness(customers(s, dir),
        customerSettings, Seq("c_name", "c_acctbal", "c_mktsegment"))
    }),

    // §2.6 profiling: top-10 values per column
    "q_profile" -> ((s, dir) => {
      Evaluation.profileColumns(pq(s, dir, "part"), Seq("p_brand", "p_type"), 10)
    }),

    // §2.4 n-largest blocks for a blocking rule
    "q_largest_blocks" -> ((s, dir) => {
      Evaluation.nLargestBlocks(pq(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), 10)
    }),

    // §2.11 multi-threshold clustering over the order-path graph with
    // deterministic pseudo-probabilities
    "q_multi_threshold" -> ((s, dir) => {
      val o = pq(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val edges = o.select(col("o_custkey"), col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .select(col("prev").as("unique_id_l"), col("o_orderkey").as("unique_id_r"),
          (((col("prev") + col("o_orderkey")) % 97) / 96.0).as("match_probability"))
      ClusteringOps.atMultipleThresholds(edges, Seq(0.3, 0.7))
    }),

    // §2.11 incremental cluster maintenance (beyond the reference): fold
    // the 0.5..0.7 edges into the 0.7 clustering; result must equal a
    // fresh solve at 0.5 (the oracle replays exactly that)
    "q_incremental_cluster" -> ((s, dir) => {
      val o = pq(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val edges = o.select(col("o_custkey"), col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .select(col("prev").as("unique_id_l"), col("o_orderkey").as("unique_id_r"),
          (((col("prev") + col("o_orderkey")) % 97) / 96.0).as("match_probability"))
      val existing = graft.clustering.ConnectedComponents.run(
        edges.filter(col("match_probability") >= 0.7))
      ClusteringOps.incrementalCluster(existing,
        edges.filter(col("match_probability") >= 0.5 &&
          col("match_probability") < 0.7))
    }),

    // §2.11 multi-threshold cluster summary stats
    // (`clustering.py:291-345` output_cluster_summary_stats)
    "q_multi_threshold_stats" -> ((s, dir) => {
      val o = pq(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val edges = o.select(col("o_custkey"), col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .select(col("prev").as("unique_id_l"), col("o_orderkey").as("unique_id_r"),
          (((col("prev") + col("o_orderkey")) % 97) / 96.0).as("match_probability"))
      ClusteringOps.atMultipleThresholdsSummary(edges, Seq(0.3, 0.7))
        .select(col("threshold_match_probability"),
          round(col("threshold_match_weight"), 9).as("threshold_match_weight"),
          col("num_clusters"), col("max_cluster_size"),
          round(col("avg_cluster_size"), 9).as("avg_cluster_size"))
    }),

    // §2.11 one-to-one (mutual best link) clustering, single round
    "q_one_to_one" -> ((s, dir) => {
      val o = pq(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val edges = o.select(col("o_custkey"), col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .select(col("prev").as("unique_id_l"), col("o_orderkey").as("unique_id_r"),
          (((col("prev") + col("o_orderkey")) % 97) / 96.0).as("match_probability"))
      ClusteringOps.oneToOne(edges, maxRounds = 1)
    }),

    // blocking-analysis-driven salt sizing (SaltAdvisor over the hot
    // c_mktsegment key, explicit per-task target so the oracle is
    // session-independent)
    "q_salt_advice" -> ((s, dir) => {
      val advice = SaltAdvisor.advise(pq(s, dir, "customer"),
        BlockingRule.BlockOnRule(Seq("c_mktsegment")),
        targetRowsPerTask = 1000)
      import s.implicits._
      Seq((advice.rule.describe, advice.largestBlockRows, advice.totalRows,
          advice.recommendedSalts))
        .toDF("rule", "largest_block_rows", "total_rows", "recommended_salts")
    }),

    // §2.3/§2.4 candidate blocking-rule generation: the whole singleton +
    // pair lattice over three key expressions profiled in ONE grouping-sets
    // pass (comparison counts, block counts, skew, completeness per rule).
    "q_blocking_advisor" -> ((s, dir) =>
      graft.operators.BlockingAdvisor.profile(pq(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment", "substr(c_name, 1, 8)"))),

    // the SAMPLED advisor path (portable-hash sample, counts scaled by
    // 1/f^2 pairs / 1/f block size): f = 0.5 makes the scaling exact
    // integer multiplication, so DuckDB replays it value-for-value —
    // the same md5-prefix hash as q_sample selects the same rows
    "q_blocking_advisor_sampled" -> ((s, dir) =>
      graft.operators.BlockingAdvisor.profileSampled(pq(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment", "substr(c_name, 1, 8)"),
        "c_custkey", sampleFraction = 0.5)),

    // §2.11 one-to-one with the duplicate-free-dataset constraint +
    // ties_method="drop" (reference cluster_using_single_best_links).
    // Single round so the mutual-best fixpoint is SQL-expressible; datasets
    // are synthesised as o_orderkey%3, with ds0/ds1 duplicate-free and ds2
    // unconstrained.
    "q_one_to_one_constrained" -> ((s, dir) => {
      val (edges, nodeDs) = constrainedOneToOneInputs(s, dir)
      ClusteringOps.oneToOneConstrained(edges, nodeDs, maxRounds = 1,
        duplicateFreeDatasets = Some(Seq("ds0", "ds1")), tiesMethod = "drop")
    }),

    // the SAME constrained single round FORCED through the distributed
    // mutual-best loop (smallGraphThreshold = 0 disables the gated driver
    // fast path) — same oracle, and on the bench's sf1 scale point
    "q_one_to_one_dist" -> ((s, dir) => {
      val (edges, nodeDs) = constrainedOneToOneInputs(s, dir)
      ClusteringOps.oneToOneConstrained(edges, nodeDs, maxRounds = 1,
        duplicateFreeDatasets = Some(Seq("ds0", "ds1")), tiesMethod = "drop",
        smallGraphThreshold = 0L)
    }),

    // multimodal: opaque binary payload + codegen'd metadata triage
    "q_multimodal_meta" -> ((s, dir) => {
      val media = MultimodalOps.asMediaTable(pq(s, dir, "documents"), "doc_id", "text")
      val metas = MultimodalOps.payloadMetadata(col("payload"))
      media.select(col("media_id") +: col("kind") +:
        col("meta.declared_bytes").as("declared_bytes") +:
        metas.map { case (n, c) => c.as(n) }: _*)
    }),

    // multimodal: partition-wise decode stub (real plumbing, deterministic
    // FNV-1a codec). Per-row oracle: DuckDB recomputes the FNV stream over
    // the payload bytes with HUGEINT mod-2^64 arithmetic.
    "q_multimodal_decode" -> ((s, dir) => {
      val media = MultimodalOps.asMediaTable(pq(s, dir, "documents"), "doc_id", "text")
      MultimodalOps.decode(media)
        .select(col("media_id"), col("width"), col("height"), col("n_channels"),
          size(col("feature")).as("feature_len"))
    }),

    // multimodal: perceptual image near-dup (aHash band join). Each
    // customer contributes TWO real 8x8 BMP files whose pixel pattern is
    // the bit pattern of FNV-1a(custkey) — the second with one pixel
    // flipped, so aHash hamming(pair) = 1. The whole pipeline (BMP encode
    // -> real pixel decode -> aHash -> 4x16 band join -> hamming verify)
    // runs in Spark; DuckDB replays FNV + banding + hamming closed-form.
    "q_image_neardup" -> ((s, dir) => {
      import graft.pipeline.Codecs
      val mk = udf((k: Long) => {
        val h = graft.functions.SimHashKernel.fnv1a64(k.toString)
        def bmp(hh: Long) = Codecs.encodeBmp24(Array.tabulate(64)(p =>
          if (((hh >> (63 - p)) & 1L) == 1L) 200.toByte else 40.toByte), 8, 8)
        Seq((2 * k, bmp(h)), (2 * k + 1, bmp(h ^ 1L)))
      })
      val media = pq(s, dir, "customer")
        .select(explode(mk(col("c_custkey").cast("long"))).as("m"))
        .select(col("m._1").as("media_id"), col("m._2").as("payload"))
      DedupOps.imageNearDuplicates(media, maxHamming = 3)
        .select(col("id_l").cast("bigint"), col("id_r").cast("bigint"),
          col("hamming").cast("bigint"))
    }),

    // dedup: MinHash-LSH near-dup pairs. Fully oracle-able: the shingle
    // hash is FNV-1a (portable), the k universal-hash params are fixed JVM
    // literals exported into the oracle SQL, and band equality reduces to
    // slot-value equality — DuckDB replays signature + banding + verify.
    "q_minhash_pairs" -> ((s, dir) => {
      DedupOps.minhashDedupPairs(pq(s, dir, "documents"), "doc_id", "text",
        k = 32, rowsPerBand = 4, threshold = 0.5)
    }),

    // dedup, end to end: the same verified near-dup pairs fed through
    // connected components; one canonical doc per near-dup cluster.
    "q_dedup_docs" -> ((s, dir) => {
      DedupOps.dedupeByMinhash(pq(s, dir, "documents"), "doc_id", "text",
        k = 32, rowsPerBand = 4, threshold = 0.5)
    }),

    // dedup: SimHash near-dup pairs. maxHamming=3 < 4 bands makes the band
    // blocking provably exhaustive (pigeonhole), so the output is exactly
    // "all within-block pairs with hamming <= 3" — deterministic and
    // recomputable in DuckDB from the portable FNV-1a token hashes.
    "q_simhash_pairs" -> ((s, dir) => {
      DedupOps.simhashDedupPairs(pq(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3,
        blockKeys = Seq(col("lang"), floor(col("n_chars") / 50)))
    }),

    // dedup, end to end: the same simhash band pairs fed through connected
    // components; one canonical doc per near-dup cluster — the simhash
    // twin of q_dedup_docs, same oracle shape (pair replay + recursive
    // closure)
    "q_dedup_simhash" -> ((s, dir) => {
      DedupOps.dedupeBySimhash(pq(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3,
        blockKeys = Seq(col("lang"), floor(col("n_chars") / 50)))
    }),

    // §2.12 labels-table workflow end to end: clerical labels synthesised
    // from consecutive custkeys (some reversed orientation, some NULL
    // scores = definite matches), canonicalised, scored through the model,
    // rolled into the truth-space table (`block_from_labels.py`,
    // `lower_id_on_lhs.py:47`).
    "q_labels_truth_space" -> ((s, dir) => {
      val c = customers(s, dir)
      val base = c.filter(col("unique_id") % 5 === 0)
        .select(col("unique_id").as("k"), (col("unique_id") + 1).as("other"))
      val labels = base.select(
        when(col("k") % 10 === 0, col("other")).otherwise(col("k")).as("unique_id_l"),
        when(col("k") % 10 === 0, col("k")).otherwise(col("other")).as("unique_id_r"),
        when(col("k") % 15 === 0, lit(null).cast("double"))
          .otherwise((col("k") % 97) / lit(96.0)).as("clerical_match_score"))
      val linker = new Linker(c, customerSettings)
      linker.evaluation.truthSpaceFromLabelsTable(labels)
        .select(col("truth_threshold"), col("tp"), col("fp"), col("tn"), col("fn"),
          round(col("precision"), 9).as("precision"),
          round(col("recall"), 9).as("recall"),
          round(col("f1"), 9).as("f1"))
    }),

    // §2.5/§2.6 profiling distribution: value-frequency percentile table
    // (`profile_data.py:105-208`)
    "q_profile_dist" -> ((s, dir) => {
      Evaluation.profileDistribution(pq(s, dir, "part"), Seq("p_brand", "p_type"))
        .select(col("column_name"), col("value_count"), col("n_values"),
          col("cum_rows"), round(col("percentile"), 9).as("percentile"))
    }),

    // §2.4 TF chart data: most/least-frequent values per TF column
    // (`term_frequencies.py:146-153`)
    "q_tf_chart" -> ((s, dir) => {
      Evaluation.tfChartData(pq(s, dir, "part"), Seq("p_type"), 5)
        .select(col("column_name"), col("side"), col("value"), col("value_count"),
          round(col("tf"), 9).as("tf"),
          col("rank_most_frequent"), col("rank_least_frequent"))
    }),

    // §2.4 blocking analysis: marginal + cumulative comparisons per rule
    // under NOT-previous semantics (`blocking_analysis.py:601-724`)
    "q_cumulative_comparisons" -> ((s, dir) => {
      Evaluation.cumulativeComparisonsPerRule(customers(s, dir), customerSettings)
    }),

    // §2.4 blocking-analysis chart records, the reference's FULL layout
    // (`blocking_analysis.py:284-294`) including the deterministic-sample
    // estimation path (threshold ceil(p·10000)/10000, counts scaled 1/f²;
    // `em_sampling.py:64-84`). p=0.37 exercises the ceil+scale math
    "q_count_comparisons" -> ((s, dir) => {
      Evaluation.countComparisonsFromRules(customers(s, dir),
        customerSettings, recordSampleProportion = 0.37)
    }),

    // §2.11 node-level graph metrics (`graph_metrics.py:28-113`): degree,
    // cluster size, size-adjusted centrality over the orders path graph
    "q_node_metrics" -> ((s, dir) => {
      val (edges, clusters) = ordersPathGraph(s, dir)
      ClusteringOps.nodeMetrics(clusters, edges)
        .select(col("node_id"), col("cluster_id"), col("degree"),
          col("cluster_size"), round(col("centrality"), 9).as("centrality"))
    }),

    // §2.11 cluster-level graph metrics (`graph_metrics.py:116-170`):
    // node/edge counts and density 2E/(n(n-1))
    "q_cluster_density" -> ((s, dir) => {
      val (edges, clusters) = ordersPathGraph(s, dir)
      ClusteringOps.clusterMetrics(clusters, edges)
        .select(col("cluster_id"), col("n_nodes"), col("n_edges"),
          round(col("density"), 9).as("density"))
    }),

    // §2.11 bridge edges end to end, BOTH execution branches in one query
    // (`edge_metrics.py:28-60`): even custkeys build triangles (3 nodes,
    // under the cap -> task-side Tarjan, no edge is a bridge), odd
    // custkeys build a 5-node star whose first two rays are closed by a
    // cross edge (over the cap -> the fully distributed BFS +
    // cycle-space-XOR path: the cross edge exercises non-tree coverage,
    // rays 3 and 4 are true bridges; star shape keeps BFS at one round).
    // The constructed family keeps the truth closed-form so DuckDB can
    // oracle it in plain SQL while the engine runs the real
    // spanning-forest pipeline.
    "q_bridges" -> ((s, dir) => {
      val base = pq(s, dir, "customer")
        .select((col("c_custkey").cast("long") * 10).as("b"),
          (col("c_custkey") % 2).as("odd"))
      def e(l: Column, r: Column) = struct(l.as("l"), r.as("r"))
      val edges = base.select(explode(when(col("odd") === 0, array(
            e(col("b"), col("b") + 1), e(col("b") + 1, col("b") + 2),
            e(col("b"), col("b") + 2)))
          .otherwise(array(
            e(col("b"), col("b") + 1), e(col("b"), col("b") + 2),
            e(col("b"), col("b") + 3), e(col("b"), col("b") + 4),
            e(col("b") + 1, col("b") + 2))))
          .as("ed"))
        .select(col("ed.l").as("unique_id_l"), col("ed.r").as("unique_id_r"))
      // cluster assignment is closed-form for this family (min node = b);
      // re-running CC here would only re-bench what q_cluster measures
      val clusters = base.select(col("b"), explode(when(col("odd") === 0,
          sequence(col("b"), col("b") + 2))
          .otherwise(sequence(col("b"), col("b") + 4))).as("node_id"))
        .select(col("node_id"), col("b").as("cluster_id"))
      ClusteringOps.edgeBridges(clusters, edges, maxClusterSize = 3,
          distributeOversize = true)
        .select(col("cluster_id"),
          col("unique_id_l").cast("bigint").as("uid_l"),
          col("unique_id_r").cast("bigint").as("uid_r"), col("is_bridge"))
    }),

    // §2.11 articulation (cut) vertices over the same closed-form family as
    // q_bridges: even clusters are triangles (no cut vertex), odd clusters
    // a triangle at a hub carrying two pendants (only the hub cuts).
    // maxClusterSize=3 sends every odd cluster through the distributed
    // Tarjan–Vishkin pass and every even one through the task-side Tarjan,
    // so the oracle covers both physical paths.
    "q_articulation" -> ((s, dir) => {
      val base = pq(s, dir, "customer")
        .select((col("c_custkey").cast("long") * 10).as("b"),
          (col("c_custkey") % 2).as("odd"))
      def e(l: Column, r: Column) = struct(l.as("l"), r.as("r"))
      val edges = base.select(explode(when(col("odd") === 0, array(
            e(col("b"), col("b") + 1), e(col("b") + 1, col("b") + 2),
            e(col("b"), col("b") + 2)))
          .otherwise(array(
            e(col("b"), col("b") + 1), e(col("b"), col("b") + 2),
            e(col("b"), col("b") + 3), e(col("b"), col("b") + 4),
            e(col("b") + 1, col("b") + 2))))
          .as("ed"))
        .select(col("ed.l").as("unique_id_l"), col("ed.r").as("unique_id_r"))
      val clusters = base.select(col("b"), explode(when(col("odd") === 0,
          sequence(col("b"), col("b") + 2))
          .otherwise(sequence(col("b"), col("b") + 4))).as("node_id"))
        .select(col("node_id"), col("b").as("cluster_id"))
      ClusteringOps.articulationPoints(clusters, edges, maxClusterSize = 3,
          distributeOversize = true)
        .select(col("cluster_id"), col("node_id").cast("bigint"),
          col("is_articulation"))
    }),

    // §2.11 the FUSED graph-metrics pass: bridges AND articulation from
    // one shared scaffold (one per-cluster aggregate task-side, one BFS
    // forest + fold set distributed), over the same closed-form family as
    // q_bridges/q_articulation so both verdict columns stay oracle-exact.
    // Output: the edge-grain and node-grain verdict frames stacked.
    "q_graph_metrics" -> ((s, dir) => {
      val base = pq(s, dir, "customer")
        .select((col("c_custkey").cast("long") * 10).as("b"),
          (col("c_custkey") % 2).as("odd"))
      def e(l: Column, r: Column) = struct(l.as("l"), r.as("r"))
      val edges = base.select(explode(when(col("odd") === 0, array(
            e(col("b"), col("b") + 1), e(col("b") + 1, col("b") + 2),
            e(col("b"), col("b") + 2)))
          .otherwise(array(
            e(col("b"), col("b") + 1), e(col("b"), col("b") + 2),
            e(col("b"), col("b") + 3), e(col("b"), col("b") + 4),
            e(col("b") + 1, col("b") + 2))))
          .as("ed"))
        .select(col("ed.l").as("unique_id_l"), col("ed.r").as("unique_id_r"))
      val clusters = base.select(col("b"), explode(when(col("odd") === 0,
          sequence(col("b"), col("b") + 2))
          .otherwise(sequence(col("b"), col("b") + 4))).as("node_id"))
        .select(col("node_id"), col("b").as("cluster_id"))
      val gm = ClusteringOps.graphMetrics(clusters, edges,
        maxClusterSize = 3, distributeOversize = true)
      // the stacked frame: both verdict grains — exactly the two outputs
      // the separate q_bridges / q_articulation queries produce (so the
      // fused-vs-separate bench comparison measures only the shared
      // scaffold), and on the task-side path its rows stream out of ONE
      // un-checkpointed Tarjan pass
      gm.stacked
    }),

    // §2.3 deterministic (rules-only) link: blocked pairs re-joined to full
    // records without scoring (`linker_components/inference.py`
    // deterministic_link)
    "q_deterministic_link" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      linker.deterministicLink()
        .select(col("match_key"),
          col("unique_id_l").cast("bigint").as("uid_l"),
          col("unique_id_r").cast("bigint").as("uid_r"),
          col("c_name_l"), col("c_name_r"))
    }),

    // corpus: benchmark decontamination — word-3-gram overlap of every
    // document against the probe subset (doc_id % 20 == 0 plays the held-out
    // benchmark); probe n-gram set is broadcast, corpus never reshuffles
    "q_contamination" -> ((s, dir) => {
      val d = pq(s, dir, "documents")
      CorpusOps.contaminationReport(d, "doc_id", "text",
        d.filter(col("doc_id") % 20 === 0), "text", n = 3)
    }),

    // corpus: top-3 TF-IDF keywords per document (integer-deterministic
    // rank: tf desc, doc_freq asc, term asc)
    "q_tfidf" -> ((s, dir) => {
      CorpusOps.tfidfTopK(pq(s, dir, "documents"), "doc_id", "text", k = 3)
    }),

    // corpus: sliding-window chunking for embedding pipelines (80-char
    // windows every 60 chars, final partial window kept)
    "q_doc_chunks" -> ((s, dir) => {
      CorpusOps.chunkDocuments(pq(s, dir, "documents"), "doc_id", "text",
        size = 80, stride = 60)
    }),

    // corpus: PII detection + redaction fingerprint. The synthetic corpus
    // has no PII, so the query injects deterministic synthetic PII derived
    // from doc_id (identically in the oracle) to exercise every pattern.
    "q_pii" -> ((s, dir) => {
      val d = pq(s, dir, "documents")
      val injected = concat(col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, concat(lit(" from 10.0."),
          (col("doc_id") % 200).cast("string"), lit(".7"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, concat(lit(" call +44 7700 900"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, concat(lit(" ssn 123-45-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")))
      val piiCols = CorpusOps.piiCounts(injected).map { case (n, c) => c.as(n) }
      d.select((col("doc_id") +: piiCols) :+
        substring(md5(CorpusOps.redactPii(injected)), 1, 16).as("redacted_fp"): _*)
    }),

    // corpus: repetition/junk quality metrics (dup-token and dup-bigram
    // ratios, longest token, digit ratio) via the one-pass native kernel
    "q_repetition" -> ((s, dir) =>
      CorpusOps.repetitionFrame(pq(s, dir, "documents"), "doc_id", "text")),

    // corpus: pack documents into 512-token training sequences over 8
    // portable-hash bucket streams (concat-then-chunk pretraining shape)
    "q_pack" -> ((s, dir) => {
      CorpusOps.packSequences(pq(s, dir, "documents"), "doc_id", "text",
        budget = 512, numBuckets = 8)
    }),

    // corpus: deterministic weighted language mixing; every rate is an
    // exact multiple of 2^-32 so the md5 threshold is engine-exact
    "q_mix" -> ((s, dir) => {
      CorpusOps.weightedSample(pq(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 0.25, "de" -> 0.125), defaultRate = 0.75)
        .select("doc_id", "lang")
    }),

    // §2.12 training: m from a ground-truth label column — pairs blocked
    // on label equality are true matches; each level's m is its share of
    // non-null gammas (`m_training.py:26-102`). The output IS the trained
    // model state, so the oracle replays block -> gamma -> share in SQL.
    "q_m_from_labels" -> ((s, dir) => {
      graft.functions.funcs.registerAll(s) // no Linker on this direct path
      val c = customers(s, dir).withColumn("label",
        concat_ws("|", col("c_nationkey"), col("c_mktsegment")))
      val trained = Training.estimateMFromLabelColumn(
        Seq("customer" -> c), customerSettings, "label")
      val rows = trained.comparisons.flatMap { cmp =>
        cmp.activeLevelsWithGamma.map { case (lv, g) =>
          (cmp.outputColumnName, g, lv.m.get) } }
      s.createDataFrame(rows).toDF("comparison", "gamma", "m")
    }),

    // §2.9 training: prior λ from deterministic high-precision rules +
    // assumed recall (`linker_components/training.py:35-161`):
    // λ = (observed/recall)/possible, clamped to [ProbFloor, 1]
    "q_lambda" -> ((s, dir) => {
      val c = customers(s, dir)
      val settings = customerSettings
      val trained = Training.estimateLambdaFromDeterministicRules(
        Seq("customer" -> c), settings, settings.blockingRules, recall = 0.8)
      val concat = VerticalConcat(Seq("customer" -> c), settings)
      val observed = Blocking.blockedIdPairs(concat, settings).count()
      s.createDataFrame(Seq((observed, c.count(),
        trained.probabilityTwoRandomRecordsMatch)))
        .toDF("observed_pairs", "n_records", "lambda")
    }),

    // §2.4/§2.9 EM M-step: ONE full expectation-maximisation iteration
    // (fixU=false) blocked on rule 1 — pairs -> gammas -> agreement
    // patterns -> E-step pattern probabilities -> M-step m/u shares + λ
    // (`expectation_maximisation.py:225-311`). The oracle re-derives the
    // entire iteration in SQL from the same literal init params, so the
    // engine's driver-side emCore math is cross-checked end to end; a
    // level no pattern observed records the 1e-6 unobserved sentinel.
    "q_em_mstep" -> ((s, dir) => emMstep(s, dir)),

    // the SAME one-iteration M-step forced through the DISTRIBUTED path
    // (pattern cap 1 -> Training.emCoreDistributed): the codegen'd E-step
    // column + single global aggregate per iteration sits under the same
    // DuckDB replay as the driver path — both must round to identical
    // 9-decimal parameters
    "q_em_mstep_dist" -> ((s, dir) => {
      s.conf.set("spark.graft.em.maxPatterns", "1")
      try emMstep(s, dir)
      finally s.conf.unset("spark.graft.em.maxPatterns")
    }),

    // the FULL training loop (`expectation_maximisation.py:225-311`):
    // three complete E/M iterations — pattern aggregate built once,
    // parameters re-estimated and fed back twice more — with tolerance 0
    // so the iteration count is data-independent and the DuckDB oracle
    // can unroll the exact same three rounds as chained CTEs. This is
    // the reference's estimate_parameters_using_expectation_maximisation
    // story measured end to end (the mstep queries time one iteration).
    "q_em_train" -> ((s, dir) =>
      emMstep(s, dir, maxIterations = 3, tolerance = 0.0)),

    // §2.10/§2.12 estimate-u: deterministic hash sample sized for ~1M
    // pairs, cartesian self-join, u = each level's share of non-null
    // gammas (`estimate_u.py:443-517`). numChunks=1 keeps the replay
    // exact (the multi-chunk early-exit path is spec-covered); the
    // sample threshold replays the engine's portable md5 hash.
    "q_estimate_u" -> ((s, dir) => {
      val trained = Training.estimateU(Seq("customer" -> customers(s, dir)),
        customerSettings, maxPairs = 1000000L, numChunks = 1)
      val rows = trained.comparisons.flatMap { cmp =>
        cmp.activeLevelsWithGamma.map { case (lv, g) =>
          (cmp.outputColumnName, g, lv.u.get) } }
      s.createDataFrame(rows).toDF("comparison", "gamma", "u")
    }),

    // corpus: SemDeDup-style semantic dedup over the embeddings table —
    // deterministic seed cells (bottom-8 by portable id hash), within-cell
    // cosine pairs >= 0.3, transitive closure, canonical keep flag
    "q_semantic_dedup" -> ((s, dir) => {
      DedupOps.semanticDedup(pq(s, dir, "embeddings"), "vec_id", "embedding",
        nCells = 8, threshold = 0.3)
    }),

    // similarity search: int8 scalar-quantised top-k — unit-normalise,
    // quantise to the 127-grid, rank by EXACT integer dot product (the
    // 4x-memory tier of a quantised-then-rerank retrieval stack)
    "q_ann_int8" -> ((s, dir) => {
      val e = pq(s, dir, "embeddings")
      AnnOps.int8TopK(e.filter(col("vec_id") < 10), e, 5)
    }),

    // time-series: gap-based sessionization of the events stream (30-min
    // inactivity closes a session); per-session bounds + integer-safe sums.
    // engine and oracle both work in epoch microseconds (eventsUs / epoch_us)
    "q_sessions" -> ((s, dir) => {
      val e = eventsUs(s, dir)
      TimeOps.sessionStats(e, "user_id", "ts_us",
        gap = 1800L * 1000000L, tieCol = "event_id",
        valueCol = "value")
        .withColumnRenamed("start_ts", "start_us")
        .withColumnRenamed("end_ts", "end_us")
    }),

    // time-series: as-of join — every click event picks the same user's
    // most recent purchase at or before it (union-merge shape, one shuffle,
    // never a range-join blow-up)
    "q_asof" -> ((s, dir) => {
      val e = eventsUs(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("p_user"), col("ts_us").as("p_ts"))
        .agg(max("event_id").as("purchase_id"),
          max(floor(col("value") * 1000000).cast("bigint")).as("purchase_micros"))
      TimeOps.asofJoin(clicks, purchases, "user_id", "p_user", "ts_us", "p_ts",
        Seq("purchase_id", "purchase_micros"))
    }),

    // corpus: deterministic train/val/test assignment — portable-hash
    // ladder, integer thresholds folded in once on the driver
    "q_splits" -> ((s, dir) => {
      CorpusOps.assignSplits(pq(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")
    }),

    // §2.12 evaluation: match-weight histogram chart data over the full
    // predict output (half-unit bins; tiny result no matter the pair count)
    "q_mw_histogram" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      Evaluation.matchWeightHistogram(linker.predict())
    }),

    // blocking: sorted-neighbourhood candidates — distributed global rank
    // by (segment, balance), pairs within 3 positions (Hernández & Stolfo)
    "q_snm_pairs" -> ((s, dir) => {
      SortedNeighbourhood.pairs(pq(s, dir, "customer"), "c_custkey",
        struct(col("c_mktsegment"), col("c_acctbal")), window = 3)
    }),

    // §2.6 cluster-studio sampling, deterministic variant: top clusters by
    // size (node count desc, id asc) over the orders path graph
    "q_top_clusters" -> ((s, dir) => {
      val (edges, clusters) = ordersPathGraph(s, dir)
      val metrics = ClusteringOps.clusterMetrics(clusters, edges)
        .breakLineage() // sample + re-join read one metrics pass
      Evaluation.sampleClustersFromMetrics(metrics, "by_cluster_size", 15)
        .join(metrics, Seq("cluster_id"))
        .select(col("cluster_id"), col("n_nodes"), col("n_edges"))
    }),

    // §2.6 cluster-studio sampling, remaining strategies
    // (`cluster_studio.py:157-296`): seeded portable-hash "random" and
    // lowest-density-by-size — both deterministic and engine-replayable
    "q_cluster_sample" -> ((s, dir) => {
      val (edges, clusters) = ordersPathGraph(s, dir)
      // one metrics pass feeds both strategies
      val metrics = ClusteringOps.clusterMetrics(clusters, edges)
        .breakLineage()
      // explicit-ids strategy (the reference's user-supplied
      // `cluster_ids` list): derive a deterministic list (top-3 by size)
      // and pass it back explicitly, with an unknown id that must be
      // silently dropped
      val explicit = Evaluation.sampleClustersFromMetrics(
          metrics, "by_cluster_size", 3)
        .collect().map(_.getLong(0)).toSeq
      Evaluation.sampleClustersFromMetrics(metrics, "random", 5)
        .withColumn("method", lit("random"))
        .unionByName(
          Evaluation.sampleClustersFromMetrics(metrics,
            "lowest_density_clusters_by_size", 5)
            .withColumn("method", lit("lowest_density")))
        .unionByName(
          Evaluation.sampleClustersFromMetrics(metrics, "by_cluster_ids",
            0, clusterIds = explicit :+ -1L)
            .withColumn("method", lit("by_cluster_ids")))
        .select(col("method"), col("cluster_id"))
    }),

    // corpus: token-count histogram (16-token bins) — the length
    // distribution that drives packing budgets and truncation policy
    "q_tokens_hist" -> ((s, dir) => {
      val d = pq(s, dir, "documents")
      d.select((floor(TextOps.tokenCountNative(col("text")) / 16)).cast("bigint").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n_docs"))
        .withColumn("bin_start", (col("bin") * 16).cast("bigint"))
    }),

    // §3 flagship three-stage pipeline in ONE oracled query: predict ->
    // cluster at probability 0.9 -> re-join onto every record (singletons
    // keep their own id). Probability rounded to 6dp BEFORE thresholding
    // so the edge set is engine-portable.
    "q_cluster_records" -> ((s, dir) => {
      val linker = new Linker(customers(s, dir), customerSettings)
      val scored = linker.predict()
        .withColumn("match_probability", round(col("match_probability"), 6))
      linker.clusterPairwisePredictionsAtThreshold(scored, 0.9)
        .select(col("unique_id").cast("bigint").as("uid"),
          col("cluster_id").cast("bigint").as("cluster_id"))
    }),

    // §2.2 ColumnExpression transform chain end to end: lower+substr,
    // NULLIF-wrapped regex extract, nullif, cast-to-string, try-parse-date
    // (valid and invalid inputs) — the reference's column_expression.py
    // surface as one oracled projection
    "q_colexpr" -> ((s, dir) => {
      import graft.model.ColExpr
      val c = pq(s, dir, "customer").withColumn("date_str",
        when(col("c_custkey") % 10 === 0, lit("not-a-date"))
          .otherwise(concat(lit("2020-01-"),
            lpad((col("c_custkey") % 28 + 1).cast("string"), 2, "0"))))
      c.select(col("c_custkey"),
        expr(ColExpr("c_name").lower.substr(1, 8).sql).as("name_lo"),
        expr(ColExpr("c_name").regexExtract("[0-9]+").sql).as("digits"),
        expr(ColExpr("c_mktsegment").nullif("BUILDING").sql).as("seg_nn"),
        expr(ColExpr("c_nationkey").castToString.sql).as("nk_str"),
        expr(ColExpr("date_str").tryParseDate().sql).as("parsed_date"))
    }),

    // §2.3 two-dataset link_only end to end: even customers play dataset
    // "a", odd play "b"; same model as q_predict but cross-dataset pairs
    // only (sd_l < sd_r orientation), scored through the full pipeline
    "q_link_only" -> ((s, dir) => {
      val c = customers(s, dir)
      val a = c.filter(col("unique_id") % 2 === 0)
      val b = c.filter(col("unique_id") % 2 === 1)
      val settings = customerSettings.copy(linkType = LinkType.LinkOnly)
      val linker = new Linker(Seq("a" -> a, "b" -> b), settings)
      linker.predict()
        .select(col("source_dataset_l"), col("source_dataset_r"),
          col("unique_id_l").cast("bigint").as("uid_l"),
          col("unique_id_r").cast("bigint").as("uid_r"),
          round(col("match_weight"), 6).as("match_weight"))
    }),

    // corpus: incremental near-dup detection — the doc_id % 20 == 0 batch
    // plays a new ingestion batch scored against the rest of the corpus
    "q_near_dups" -> ((s, dir) => {
      val d = pq(s, dir, "documents")
      DedupOps.minhashNearDuplicates(
        d.filter(col("doc_id") % 20 =!= 0), d.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", threshold = 0.5)
    }),

    // §2.12 ROC AUC scalar over the same truth space as q_truth_space
    "q_auc" -> ((s, dir) => {
      val settings = customerSettings.copy(
        additionalColumnsToRetain = Seq("c_mktsegment"))
      val linker = new Linker(customers(s, dir), settings)
      val scored = Evaluation.withClericalFromLabelColumn(
        linker.predict(), "c_mktsegment")
      Evaluation.aucFromTruthSpace(Evaluation.truthSpaceTable(scored))
    }),

    // corpus: model-based quality filter — linear classifier over the
    // one-pass text features, fixed term order, keep = raw score >= 0
    "q_quality_classify" -> ((s, dir) => {
      TextOps.qualityClassify(pq(s, dir, "documents"), "doc_id", "text",
        Map("n_tokens" -> 0.01, "n_chars" -> -0.001,
          "punct_ratio" -> -2.0, "stopword_ratio" -> 3.0),
        bias = -0.25, threshold = 0.0)
    })
  )

  /** Path graph over each customer's consecutive orders (shared by the
    * graph-metric queries; same construction as q_cluster). */
  private def ordersPathGraph(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val o = pq(s, dir, "orders")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    // edges are checkpointed once so CC and the metrics pass both read the
    // materialised list instead of re-running the window pipeline (the
    // reference materialises predictions before clustering/metrics too)
    val edges = o.select(col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .select(col("prev").as("unique_id_l"),
        col("o_orderkey").as("unique_id_r"))
      .breakLineage()
    (edges, ConnectedComponents.run(edges))
  }

  // ---- portable-hash oracle fragments ----------------------------------
  // The minhash/simhash/decode kernels hash with FNV-1a 64 (and, for
  // minhash, fixed universal-hash params), so DuckDB can REPLAY the whole
  // pipeline with HUGEINT mod-2^64 arithmetic: candidate generation,
  // banding, and verification all become plain SQL.
  private val M64 = "18446744073709551616::HUGEINT"
  private val M32 = "4294967296::HUGEINT"
  private val Neg = "9223372036854775808::HUGEINT" // 2^63
  /** FNV-1a 64 of a varchar's UTF-16 code units as HUGEINT in [0, 2^64).
    * Replays the JVM kernels (ShingleKernel/SimHash `charAt` loops): ord()
    * yields the codepoint, which equals the UTF-16 code unit for all BMP
    * text — exact for any BMP unicode, diverging only on surrogate pairs.
    * NULL-safe: NULL in -> NULL out. */
  private def fnvSql(g: String): String =
    s"CASE WHEN $g IS NULL THEN NULL ELSE " +
      s"list_reduce(list_prepend(14695981039346656037::HUGEINT, " +
      s"list_transform(range(1, len($g)+1), i -> ord(substr($g, CAST(i AS INT), 1))::HUGEINT)), " +
      s"(h, b) -> (xor(h, b) * 1099511628211::HUGEINT) % $M64) END"
  /** FNV-1a 64 of a varchar's UTF-8 BYTES as HUGEINT in [0, 2^64).
    * Replays the byte-wise JVM kernels (MultimodalOps.decodeStub hashes the
    * binary payload = utf8 bytes of `text`): hex-decodes encode($g) so the
    * oracle is byte-accurate for any unicode content, not just ASCII.
    * NULL-safe: NULL in -> NULL out. */
  private def fnvBytesSql(g: String): String = {
    val hx = s"hex(encode($g))"
    val byte = s"(16 * (strpos('0123456789ABCDEF', substr($hx, CAST(2*i-1 AS INT), 1)) - 1)" +
      s" + (strpos('0123456789ABCDEF', substr($hx, CAST(2*i AS INT), 1)) - 1))::HUGEINT"
    s"CASE WHEN $g IS NULL THEN NULL ELSE " +
      s"list_reduce(list_prepend(14695981039346656037::HUGEINT, " +
      s"list_transform(range(1, octet_length(encode($g))+1), i -> $byte)), " +
      s"(h, b) -> (xor(h, b) * 1099511628211::HUGEINT) % $M64) END"
  }
  /** Unsigned decimal literal of a JVM long. */
  private def u64(v: Long): String = java.lang.Long.toUnsignedString(v)

  /** CTE chain up to the banded signatures (`bands(doc_id, band, bkey)`
    * plus `sets(doc_id, s)`): FNV shingle hashes -> 32 universal-hash
    * slots -> 8 bands of 4 — the shared front half of every minhash
    * oracle. */
  private lazy val minhashBandCtes: String = {
    val params = graft.functions.ShingleKernel.hashParams(32)
    val slotExprs = (0 until 32).map { x =>
      val a = u64(params(2 * x)); val b = u64(params(2 * x + 1))
      val v = s"((($a::HUGEINT * h0) + (($a::HUGEINT * h1) % $M32) * $M32) % $M64" +
        s" + $b::HUGEINT) % $M64"
      s"min(CAST(CASE WHEN ($v) >= $Neg THEN ($v) - $M64 ELSE ($v) END AS BIGINT)) AS s$x"
    }.mkString(",\n    ")
    val bandSelects = (0 until 8).map { b =>
      val key = (0 until 4).map(j => s"CAST(s${4 * b + j} AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws('-', $key) AS bkey FROM slots"
    }.mkString(" UNION ALL ")
    s"""${shingleCte()},
       |sets AS (SELECT doc_id, list_distinct(gs) AS s FROM sh
       |         WHERE len(list_distinct(gs)) > 0),
       |tok AS (SELECT doc_id, unnest(s) AS g FROM sets),
       |hashed AS (SELECT doc_id, ${fnvSql("g")} AS hv FROM tok),
       |hsplit AS (SELECT doc_id, hv % $M32 AS h0, hv // $M32 AS h1 FROM hashed),
       |slots AS (SELECT doc_id,
       |    $slotExprs
       |  FROM hsplit GROUP BY doc_id),
       |bands AS ($bandSelects)""".stripMargin
  }

  /** Shared CTE chain replaying MinHash-LSH end to end (used by
    * q_minhash_pairs and q_dedup_docs): banded signatures -> candidate
    * join -> jaccard verify at threshold 0.5. Terminal CTE:
    * `pairs(id_l, id_r, jaccard)`. */
  /** SimHash pair replay as CTEs ending in `pairs(id_l, id_r, hamming)`
    * — shared by q_simhash_pairs and q_dedup_simhash (per-bit FNV votes
    * -> 64-bit signature -> within-block pairs at hamming <= 3). */
  private lazy val simhashPairCtes: String = {
    val bits = (0 until 64).map { b =>
      val p = u64(1L << b)
      s"(CASE WHEN sum(CASE WHEN (hv // $p::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) > 0 " +
        s"THEN $p::HUGEINT ELSE 0::HUGEINT END)"
    }.mkString(" + ")
    s"""${shingleCte(", lang, CAST(floor(n_chars / 50) AS BIGINT) AS bucket", ", lang, bucket")},
       |tok AS (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM sh),
       |hashed AS (SELECT doc_id, ${fnvSql("g")} AS hv FROM tok),
       |simv AS (SELECT doc_id, ($bits) AS v FROM hashed GROUP BY doc_id),
       |sim AS (SELECT n.doc_id, n.lang, n.bucket,
       |    CAST(CASE WHEN coalesce(s.v, 0::HUGEINT) >= $Neg
       |         THEN coalesce(s.v, 0::HUGEINT) - $M64
       |         ELSE coalesce(s.v, 0::HUGEINT) END AS BIGINT) AS sh
       |  FROM norm n LEFT JOIN simv s ON n.doc_id = s.doc_id),
       |pairs AS (
       |  SELECT l.doc_id AS id_l, r.doc_id AS id_r,
       |    CAST(bit_count(xor(l.sh, r.sh)) AS INT) AS hamming
       |  FROM sim l JOIN sim r
       |    ON l.lang = r.lang AND l.bucket = r.bucket AND l.doc_id < r.doc_id
       |  WHERE bit_count(xor(l.sh, r.sh)) <= 3)""".stripMargin
  }

  private lazy val minhashPairCtes: String =
    s"""$minhashBandCtes,
       |cands AS (SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id),
       |pairs AS (SELECT c.id_l, c.id_r,
       |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 9) AS jaccard
       |FROM cands c JOIN sets a ON c.id_l = a.doc_id JOIN sets b ON c.id_r = b.doc_id
       |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5)""".stripMargin
  /** Normalisation identical to ShingleKernel: lower, collapse \s+, trim. */
  private val normSql = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""
  /** Distinct q-gram shingle list of the normalised text (q=8).
    * `normExtra` = computed extra columns (against documents);
    * `shExtra` = their plain names (re-selected from norm). */
  private def shingleCte(normExtra: String = "", shExtra: String = "",
      q: Int = 8): String =
    s"""norm AS (SELECT doc_id$normExtra, $normSql AS t FROM documents),
       |sh AS (SELECT doc_id$shExtra,
       |    CASE WHEN len(t) = 0 THEN []::VARCHAR[] WHEN len(t) <= $q THEN [t]
       |         ELSE list_transform(range(1, len(t) - ${q - 2}), i -> substr(t, CAST(i AS INT), $q)) END AS gs
       |  FROM norm)""".stripMargin

  /** log2(m/u) as a DuckDB double literal. */
  private def wlog(m: Double, u: Double): String =
    s"(${math.log(m / u) / math.log(2.0)})::DOUBLE"

  /** The customerSettings match weight over gamma columns g_name / g_bal. */
  private val oracleCustomerMw: String = {
    val prior = s"(${math.log(0.001 / 0.999) / math.log(2.0)})::DOUBLE"
    s"""$prior
       |    + CASE g_name WHEN -1 THEN 0.0::DOUBLE WHEN 3 THEN ${wlog(0.9, 0.001)}
       |        WHEN 2 THEN ${wlog(0.05, 0.01)} WHEN 1 THEN ${wlog(0.03, 0.05)}
       |        ELSE ${wlog(0.02, 0.939)} END
       |    + CASE g_bal WHEN -1 THEN 0.0::DOUBLE WHEN 2 THEN ${wlog(0.7, 0.02)}
       |        WHEN 1 THEN ${wlog(0.2, 0.03)} ELSE ${wlog(0.1, 0.95)} END""".stripMargin
  }

  /** Truth-space cumulative tail over an `mw(truth_threshold, pos)` CTE. */
  private val oracleTruthTail: String =
    """tot AS (SELECT CAST(sum(pos) AS BIGINT) AS total_p,
      |               CAST(sum(1 - pos) AS BIGINT) AS total_n FROM mw),
      |by_t AS (SELECT truth_threshold, CAST(sum(pos) AS BIGINT) AS p_at,
      |                CAST(sum(1 - pos) AS BIGINT) AS n_at
      |         FROM mw GROUP BY 1),
      |cum AS (SELECT truth_threshold,
      |          CAST(sum(p_at) OVER (ORDER BY truth_threshold DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
      |          CAST(sum(n_at) OVER (ORDER BY truth_threshold DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
      |        FROM by_t)
      |SELECT truth_threshold, tp, fp,
      |  (SELECT total_n FROM tot) - fp AS tn,
      |  (SELECT total_p FROM tot) - tp AS fn,
      |  round(CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp) ELSE 0.0::DOUBLE END, 9) AS precision,
      |  round(CASE WHEN (SELECT total_p FROM tot) > 0
      |    THEN tp::DOUBLE / (SELECT total_p FROM tot) ELSE 0.0::DOUBLE END, 9) AS recall,
      |  round(CASE WHEN 2 * tp + fp + ((SELECT total_p FROM tot) - tp) > 0
      |    THEN 2.0::DOUBLE * tp / (2 * tp + fp + ((SELECT total_p FROM tot) - tp))
      |    ELSE 0.0::DOUBLE END, 9) AS f1
      |FROM cum""".stripMargin

  /** DuckDB-dialect oracle SQL per query (tables registered by name). */
  /** Shared by q_cluster (gated driver union-find) and q_cluster_dist
    * (forced distributed min-label + pointer-jumping) — one replay. */
  private lazy val clusterOracleSql: String =
    """SELECT o_orderkey AS node_id,
      |       min(o_orderkey) OVER (PARTITION BY o_custkey) AS cluster_id
      |FROM orders
      |QUALIFY count(*) OVER (PARTITION BY o_custkey) >= 2""".stripMargin

  /** Shared by q_one_to_one_constrained (gated driver loop) and
    * q_one_to_one_dist (forced distributed mutual-best) — full replay of
    * the single constrained round: symmetric neighbours -> drop
    * same-dataset equal-probability ties (both directions) ->
    * singleton-cluster candidate edges under the ds0/ds1 disjointness
    * constraint -> mutual rank-1 merges -> representative update. */
  private lazy val oneToOneConstrainedOracleSql: String =
    """WITH e AS (
      |  SELECT prev AS na, o_orderkey AS nb,
      |         ((prev + o_orderkey) % 97) / 96.0 AS p
      |  FROM (SELECT o_custkey, o_orderkey,
      |          lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev
      |        FROM orders)
      |  WHERE prev IS NOT NULL AND prev <> o_orderkey),
      |nd AS (SELECT o_orderkey AS node_id,
      |              'ds' || CAST(o_orderkey % 3 AS VARCHAR) AS sd
      |       FROM orders),
      |sym AS (SELECT na, nb, p FROM e UNION ALL SELECT nb, na, p FROM e),
      |wsd AS (SELECT s.na, s.nb, s.p, dl.sd AS sd_l, dr.sd AS sd_r
      |        FROM sym s
      |        JOIN nd dl ON s.na = dl.node_id
      |        JOIN nd dr ON s.nb = dr.node_id),
      |tied AS (SELECT na, sd_l, sd_r, p FROM wsd
      |         GROUP BY na, sd_l, sd_r, p
      |         HAVING count(DISTINCT nb) > 1 AND sd_r IN ('ds0', 'ds1')),
      |e0 AS (SELECT e.na, e.nb, e.p FROM e
      |       WHERE NOT EXISTS (SELECT 1 FROM tied t
      |               JOIN nd dl ON e.na = dl.node_id
      |               JOIN nd dr ON e.nb = dr.node_id
      |               WHERE t.na = e.na AND t.sd_l = dl.sd
      |                 AND t.sd_r = dr.sd AND t.p = e.p)
      |         AND NOT EXISTS (SELECT 1 FROM tied t
      |               JOIN nd dl ON e.na = dl.node_id
      |               JOIN nd dr ON e.nb = dr.node_id
      |               WHERE t.na = e.nb AND t.sd_l = dr.sd
      |                 AND t.sd_r = dl.sd AND t.p = e.p)),
      |ce AS (SELECT e0.na AS ra, e0.nb AS rb, e0.p FROM e0
      |       JOIN nd da ON e0.na = da.node_id
      |       JOIN nd db ON e0.nb = db.node_id
      |       WHERE NOT (da.sd = db.sd AND da.sd IN ('ds0', 'ds1'))),
      |sym2 AS (SELECT ra, rb, p FROM ce UNION ALL SELECT rb, ra, p FROM ce),
      |best AS (SELECT ra, rb FROM (
      |    SELECT ra, rb, row_number() OVER (
      |      PARTITION BY ra ORDER BY p DESC, rb ASC) AS rn
      |    FROM sym2) WHERE rn = 1),
      |merges AS (SELECT x.ra AS ka, x.rb AS kb FROM best x
      |           JOIN best y ON x.ra = y.rb AND x.rb = y.ra
      |           WHERE x.ra < x.rb),
      |nodes AS (SELECT DISTINCT node_id FROM (
      |    SELECT na AS node_id FROM e0 UNION ALL SELECT nb FROM e0))
      |SELECT n.node_id, coalesce(m.ka, n.node_id) AS cluster_id
      |FROM nodes n LEFT JOIN merges m ON n.node_id = m.kb""".stripMargin

  /** Shared by q_em_mstep (driver path) and q_em_mstep_dist (forced
    * distributed M-step) — identical semantics, one replay. */
  private lazy val emMstepOracleSql: String =
    s"""WITH pr AS (
         |  SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r
         |  FROM customer l JOIN customer r
         |    ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
         |   AND l.c_custkey < r.c_custkey),
         |g AS (
         |  SELECT $oracleGammaName AS gn, $oracleGammaBal AS gb, count(*) AS n
         |  FROM pr p JOIN customer l ON p.uid_l = l.c_custkey
         |            JOIN customer r ON p.uid_r = r.c_custkey
         |  GROUP BY 1, 2),
         |p AS (
         |  SELECT gn, gb, n, pm / (pm + pu) AS prob FROM (
         |    SELECT gn, gb, n,
         |      CAST(0.001 AS DOUBLE)
         |        * CAST(CASE gn WHEN 3 THEN 0.9 WHEN 2 THEN 0.05 WHEN 1 THEN 0.03 WHEN 0 THEN 0.02 ELSE 1.0 END AS DOUBLE)
         |        * CAST(CASE gb WHEN 2 THEN 0.7 WHEN 1 THEN 0.2 WHEN 0 THEN 0.1 ELSE 1.0 END AS DOUBLE) AS pm,
         |      CAST(0.999 AS DOUBLE)
         |        * CAST(CASE gn WHEN 3 THEN 0.001 WHEN 2 THEN 0.01 WHEN 1 THEN 0.05 WHEN 0 THEN 0.939 ELSE 1.0 END AS DOUBLE)
         |        * CAST(CASE gb WHEN 2 THEN 0.02 WHEN 1 THEN 0.03 WHEN 0 THEN 0.95 ELSE 1.0 END AS DOUBLE) AS pu
         |    FROM g)),
         |agg AS (
         |  SELECT 'c_name' AS comparison, gn AS gamma,
         |         sum(prob * n) AS mw, sum((1 - prob) * n) AS uw
         |  FROM p WHERE gn >= 0 GROUP BY gn
         |  UNION ALL
         |  SELECT 'c_acctbal', gb, sum(prob * n), sum((1 - prob) * n)
         |  FROM p WHERE gb >= 0 GROUP BY gb),
         |tot AS (SELECT comparison, sum(mw) AS md, sum(uw) AS ud
         |        FROM agg GROUP BY comparison),
         |lv AS (SELECT * FROM (VALUES ('c_name', 3), ('c_name', 2), ('c_name', 1), ('c_name', 0),
         |    ('c_acctbal', 2), ('c_acctbal', 1), ('c_acctbal', 0)) AS t(comparison, gamma))
         |SELECT 'm' AS param, lv.comparison, CAST(lv.gamma AS INT) AS gamma,
         |  round(CASE WHEN agg.mw IS NULL THEN 1e-6 ELSE agg.mw / tot.md END, 9) AS value
         |FROM lv LEFT JOIN agg ON lv.comparison = agg.comparison AND lv.gamma = agg.gamma
         |        JOIN tot ON lv.comparison = tot.comparison
         |UNION ALL
         |SELECT 'u', lv.comparison, CAST(lv.gamma AS INT),
         |  round(CASE WHEN agg.uw IS NULL THEN 1e-6 ELSE agg.uw / tot.ud END, 9)
         |FROM lv LEFT JOIN agg ON lv.comparison = agg.comparison AND lv.gamma = agg.gamma
         |        JOIN tot ON lv.comparison = tot.comparison
         |UNION ALL
         |SELECT 'lambda', '', CAST(-1 AS INT),
         |  round(sum(prob * n) / sum(n), 9) FROM p""".stripMargin

  /** q_em_train's oracle: `iterations` complete E/M rounds unrolled as
    * chained CTEs. Each round scores the (once-computed) agreement
    * patterns from the PREVIOUS round's parameter table (par{k-1} /
    * lam{k-1}), then re-estimates. Faithful to the engine's emCore:
    * a gamma of -1 contributes factor 1.0 (the LEFT JOIN misses),
    * observed factors are floored at 1e-32 (ProbFloor), a level that
    * never appears in any pattern re-estimates internally to 0.0 but is
    * REPORTED as the 1e-6 unobserved sentinel (the engine's merge-back
    * records LEVEL_NOT_OBSERVED for it — final `obs` join), and an
    * entirely-unobserved comparison records the sentinel for every
    * level. */
  private def emTrainOracleSql(iterations: Int): String = {
    val iterCtes = (1 to iterations).map { k =>
      val j = k - 1
      s"""p$k AS (
         |  SELECT gn, gb, n, pm / (pm + pu) AS prob FROM (
         |    SELECT g.gn, g.gb, g.n,
         |      lam.lam
         |        * greatest(coalesce(mn.m, 1.0), 1e-32)
         |        * greatest(coalesce(mb.m, 1.0), 1e-32) AS pm,
         |      (1.0 - lam.lam)
         |        * greatest(coalesce(mn.u, 1.0), 1e-32)
         |        * greatest(coalesce(mb.u, 1.0), 1e-32) AS pu
         |    FROM g CROSS JOIN lam$j lam
         |    LEFT JOIN par$j mn ON mn.comparison = 'c_name' AND mn.gamma = g.gn
         |    LEFT JOIN par$j mb ON mb.comparison = 'c_acctbal' AND mb.gamma = g.gb)),
         |agg$k AS (
         |  SELECT 'c_name' AS comparison, gn AS gamma,
         |         sum(prob * n) AS mw, sum((1 - prob) * n) AS uw
         |  FROM p$k WHERE gn >= 0 GROUP BY gn
         |  UNION ALL
         |  SELECT 'c_acctbal', gb, sum(prob * n), sum((1 - prob) * n)
         |  FROM p$k WHERE gb >= 0 GROUP BY gb),
         |tot$k AS (SELECT comparison, sum(mw) AS md, sum(uw) AS ud
         |          FROM agg$k GROUP BY comparison),
         |par$k AS (
         |  SELECT lv.comparison, lv.gamma,
         |    CASE WHEN coalesce(tot$k.md, 0) = 0 THEN 1e-6
         |         ELSE coalesce(agg$k.mw, 0) / tot$k.md END AS m,
         |    CASE WHEN coalesce(tot$k.ud, 0) = 0 THEN 1e-6
         |         ELSE coalesce(agg$k.uw, 0) / tot$k.ud END AS u
         |  FROM lv
         |  LEFT JOIN agg$k ON lv.comparison = agg$k.comparison
         |                 AND lv.gamma = agg$k.gamma
         |  LEFT JOIN tot$k ON lv.comparison = tot$k.comparison),
         |lam$k AS (SELECT sum(prob * n) / sum(n) AS lam FROM p$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH pr AS (
       |  SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r
       |  FROM customer l JOIN customer r
       |    ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
       |   AND l.c_custkey < r.c_custkey),
       |g AS (
       |  SELECT $oracleGammaName AS gn, $oracleGammaBal AS gb, count(*) AS n
       |  FROM pr p JOIN customer l ON p.uid_l = l.c_custkey
       |            JOIN customer r ON p.uid_r = r.c_custkey
       |  GROUP BY 1, 2),
       |lv AS (SELECT * FROM (VALUES
       |  ('c_name', 3), ('c_name', 2), ('c_name', 1), ('c_name', 0),
       |  ('c_acctbal', 2), ('c_acctbal', 1), ('c_acctbal', 0))
       |  AS t(comparison, gamma)),
       |par0 AS (SELECT * FROM (VALUES
       |  ('c_name', 3, 0.9::DOUBLE, 0.001::DOUBLE),
       |  ('c_name', 2, 0.05::DOUBLE, 0.01::DOUBLE),
       |  ('c_name', 1, 0.03::DOUBLE, 0.05::DOUBLE),
       |  ('c_name', 0, 0.02::DOUBLE, 0.939::DOUBLE),
       |  ('c_acctbal', 2, 0.7::DOUBLE, 0.02::DOUBLE),
       |  ('c_acctbal', 1, 0.2::DOUBLE, 0.03::DOUBLE),
       |  ('c_acctbal', 0, 0.1::DOUBLE, 0.95::DOUBLE))
       |  AS t(comparison, gamma, m, u)),
       |lam0 AS (SELECT 0.001::DOUBLE AS lam),
       |$iterCtes,
       |obs AS (
       |  SELECT 'c_name' AS comparison, gn AS gamma FROM g WHERE gn >= 0 GROUP BY gn
       |  UNION ALL
       |  SELECT 'c_acctbal', gb FROM g WHERE gb >= 0 GROUP BY gb)
       |SELECT 'm' AS param, p.comparison, CAST(p.gamma AS INT) AS gamma,
       |       round(CASE WHEN o.gamma IS NULL THEN 1e-6 ELSE p.m END, 9) AS value
       |FROM par$iterations p LEFT JOIN obs o
       |  ON p.comparison = o.comparison AND p.gamma = o.gamma
       |UNION ALL
       |SELECT 'u', p.comparison, CAST(p.gamma AS INT),
       |       round(CASE WHEN o.gamma IS NULL THEN 1e-6 ELSE p.u END, 9)
       |FROM par$iterations p LEFT JOIN obs o
       |  ON p.comparison = o.comparison AND p.gamma = o.gamma
       |UNION ALL
       |SELECT 'lambda', '', CAST(-1 AS INT), round(lam, 9)
       |FROM lam$iterations""".stripMargin
  }

  /** The blocking-advisor oracle: the six-candidate (3 singletons + 3
    * pairs) lattice as per-set GROUP BY replays — ONE builder so the
    * plain and sampled entries can never drift; the sampled variant
    * differs only in the sample predicate on `t` and the exact integer
    * scale factors (pairs x 1/f^2, block sizes x 1/f). */
  private def advisorOracleSql(sampleWhere: String, pairScale: Int,
      blockScale: Int): String = {
    case class Cand(label: String, nCols: Int, notNull: Seq[String])
    val cands = Seq(
      Cand("block_on(c_nationkey)", 1, Seq("k1")),
      Cand("block_on(c_mktsegment)", 1, Seq("k2")),
      Cand("block_on(substr(c_name, 1, 8))", 1, Seq("k3")),
      Cand("block_on(c_nationkey, c_mktsegment)", 2, Seq("k1", "k2")),
      Cand("block_on(c_nationkey, substr(c_name, 1, 8))", 2, Seq("k1", "k3")),
      Cand("block_on(c_mktsegment, substr(c_name, 1, 8))", 2, Seq("k2", "k3")))
    val branches = cands.map { c =>
      val where = c.notNull.map(k => s"$k IS NOT NULL").mkString(" AND ")
      val by = c.notNull.mkString(", ")
      s"""  SELECT '${c.label}' AS rule, ${c.nCols} AS n_columns, g.* FROM (
         |    SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS n_comparisons,
         |           count(*) AS n_blocks,
         |           CAST(coalesce(max(n), 0) AS BIGINT) AS largest_block,
         |           CAST(coalesce(sum(n), 0) AS BIGINT) AS covered
         |    FROM (SELECT count(*) AS n FROM t WHERE $where GROUP BY $by)) g""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH t AS (SELECT c_nationkey AS k1, c_mktsegment AS k2,
       |                  substr(c_name, 1, 8) AS k3 FROM customer$sampleWhere),
       |tot AS (SELECT count(*) AS n FROM t),
       |m AS (
       |$branches)
       |SELECT rule, n_columns, n_comparisons * $pairScale AS n_comparisons,
       |       n_blocks, largest_block * $blockScale AS largest_block,
       |       round(covered * 1.0 / greatest(tot.n, 1), 9) AS completeness
       |FROM m CROSS JOIN tot""".stripMargin
  }

  private lazy val predictOracleSql: String = {
    // match weights folded from the model params (log2(m/u) per level).
    // ::DOUBLE casts are load-bearing: DuckDB parses bare decimal
    // literals as DECIMAL and would do exact decimal arithmetic (the
    // reference forces double literals for the same reason,
    // `custom_spark_dialect.py:5-19`). Shared by q_predict and
    // q_predict_chunked — the chunked path must stay value-identical.
    def w(m: Double, u: Double) = s"(${math.log(m / u) / math.log(2.0)})::DOUBLE"
    val prior = s"(${math.log(0.001 / 0.999) / math.log(2.0)})::DOUBLE"
    s"""$oraclePairsCte,
       |cv AS (
       |  SELECT p.uid_l, p.uid_r,
       |    $oracleGammaName AS g_name,
       |    $oracleGammaBal AS g_bal
       |  FROM pairs p
       |  JOIN customer l ON p.uid_l = l.c_custkey
       |  JOIN customer r ON p.uid_r = r.c_custkey),
       |mw AS (
       |  SELECT uid_l, uid_r,
       |    $prior
       |    + CASE g_name WHEN -1 THEN 0.0::DOUBLE WHEN 3 THEN ${w(0.9, 0.001)}
       |        WHEN 2 THEN ${w(0.05, 0.01)} WHEN 1 THEN ${w(0.03, 0.05)}
       |        ELSE ${w(0.02, 0.939)} END
       |    + CASE g_bal WHEN -1 THEN 0.0::DOUBLE WHEN 2 THEN ${w(0.7, 0.02)}
       |        WHEN 1 THEN ${w(0.2, 0.03)} ELSE ${w(0.1, 0.95)} END AS mw
       |  FROM cv)
       |SELECT uid_l, uid_r, round(mw, 6) AS match_weight,
       |  round(1.0 / (1.0 + power(2.0, -mw)), 6) AS match_probability
       |FROM mw""".stripMargin
  }

  def oracleSql: Map[String, String] = scala.collection.immutable.ListMap(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_concat" ->
      """SELECT unique_id, name, source_dataset,
        |  source_dataset || '-__-' || CAST(unique_id AS VARCHAR) AS composite_uid
        |FROM (
        |  SELECT c_custkey AS unique_id, c_name AS name, 'customer' AS source_dataset FROM customer
        |  UNION ALL
        |  SELECT s_suppkey, s_name, 'supplier' FROM supplier)""".stripMargin,

    "q_tf" ->
      """SELECT c_mktsegment,
        |  round(CAST(count(*) AS DOUBLE) / (SELECT count(c_mktsegment) FROM customer), 9)
        |    AS tf_c_mktsegment
        |FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment""".stripMargin,

    "q_blocked_pairs" ->
      """SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r
        |FROM customer l JOIN customer r
        |  ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
        | AND l.c_custkey < r.c_custkey""".stripMargin,

    // salted-blocking replay: salting is a physical rewrite only, so the
    // oracle is simply the unsalted hot-key join
    "q_salted_pairs" ->
      """SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r
        |FROM customer l JOIN customer r
        |  ON l.c_mktsegment = r.c_mktsegment AND l.c_custkey < r.c_custkey
        |WHERE l.c_custkey % 20 = 0 AND r.c_custkey % 20 = 0""".stripMargin,

    // auto-salt replay: identical — the advisor-driven rewrite must not
    // change the pair set either
    "q_autosalt_pairs" ->
      """SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r
        |FROM customer l JOIN customer r
        |  ON l.c_mktsegment = r.c_mktsegment AND l.c_custkey < r.c_custkey
        |WHERE l.c_custkey % 20 = 0 AND r.c_custkey % 20 = 0""".stripMargin,

    "q_multi_rule_pairs" ->
      s"""$oraclePairsCte SELECT match_key, uid_l, uid_r FROM pairs""",

    "q_comparison_vectors" ->
      s"""$oraclePairsCte
         |SELECT p.uid_l, p.uid_r,
         |  $oracleGammaName AS gamma_c_name,
         |  $oracleGammaBal AS gamma_c_acctbal
         |FROM pairs p
         |JOIN customer l ON p.uid_l = l.c_custkey
         |JOIN customer r ON p.uid_r = r.c_custkey""".stripMargin,

    "q_predict" -> predictOracleSql,
    // identical semantics through the chunked scoring path
    "q_predict_chunked" -> predictOracleSql,
    // identical semantics through the grid-chunked (re-blocked) path
    "q_predict_grid" -> predictOracleSql,

    "q_prediction_errors" -> {
      s"""$oraclePairsCte,
         |cv AS (
         |  SELECT p.uid_l, p.uid_r,
         |    $oracleGammaName AS g_name,
         |    $oracleGammaBal AS g_bal
         |  FROM pairs p
         |  JOIN customer l ON p.uid_l = l.c_custkey
         |  JOIN customer r ON p.uid_r = r.c_custkey),
         |mw AS (
         |  SELECT uid_l, uid_r,
         |    $oracleCustomerMw AS mw
         |  FROM cv),
         |verdicts AS (
         |  SELECT uid_l, uid_r,
         |    CASE WHEN round(1.0 / (1.0 + power(2.0, -mw)), 6) >= 0.5
         |         THEN 1 ELSE 0 END AS predicted,
         |    CASE WHEN floor(uid_l / 2) = floor(uid_r / 2)
         |         THEN 1 ELSE 0 END AS clerical
         |  FROM mw)
         |SELECT uid_l, uid_r,
         |  CASE WHEN predicted = 1 THEN 'FP' ELSE 'FN' END AS error_type
         |FROM verdicts WHERE predicted <> clerical""".stripMargin
    },

    "q_predict_tf" -> {
      def w(m: Double, u: Double) = s"(${math.log(m / u) / math.log(2.0)})::DOUBLE"
      val prior = s"(${math.log(0.01 / 0.99) / math.log(2.0)})::DOUBLE"
      val log2uExact = s"(${math.log(0.2) / math.log(2.0)})::DOUBLE"
      s"""WITH tf AS (
         |  SELECT c_mktsegment AS seg,
         |    CAST(count(*) AS DOUBLE) / (SELECT count(c_mktsegment) FROM customer) AS tf_v
         |  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1),
         |pairs AS (
         |  SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r,
         |    CASE WHEN l.c_mktsegment IS NULL OR r.c_mktsegment IS NULL THEN -1
         |         WHEN l.c_mktsegment = r.c_mktsegment THEN 1 ELSE 0 END AS g,
         |    tl.tf_v AS tf_l, tr.tf_v AS tf_r
         |  FROM customer l
         |  JOIN customer r ON l.c_nationkey = r.c_nationkey AND l.c_custkey < r.c_custkey
         |  LEFT JOIN tf tl ON l.c_mktsegment = tl.seg
         |  LEFT JOIN tf tr ON r.c_mktsegment = tr.seg)
         |SELECT uid_l, uid_r, g AS gamma_c_mktsegment,
         |  round($prior
         |    + CASE g WHEN -1 THEN 0.0::DOUBLE WHEN 1 THEN ${w(0.9, 0.2)}
         |        ELSE ${w(0.1, 0.8)} END
         |    + CASE WHEN g = 1 THEN
         |        CASE WHEN coalesce(tf_l, tf_r) IS NULL THEN 0.0::DOUBLE
         |          ELSE ($log2uExact - log2(greatest(coalesce(tf_l, tf_r),
         |                coalesce(tf_r, tf_l), 0.0::DOUBLE))) * 1.0::DOUBLE END
         |      ELSE 0.0::DOUBLE END, 6) AS match_weight
         |FROM pairs""".stripMargin
    },

    "q_score_pairs" -> {
      def w(m: Double, u: Double) = s"(${math.log(m / u) / math.log(2.0)})::DOUBLE"
      val prior = s"(${math.log(0.01 / 0.99) / math.log(2.0)})::DOUBLE"
      val log2uExact = s"(${math.log(0.2) / math.log(2.0)})::DOUBLE"
      s"""WITH tf AS (
         |  SELECT c_mktsegment AS seg,
         |    CAST(count(*) AS DOUBLE) / (SELECT count(c_mktsegment) FROM customer) AS tf_v
         |  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1),
         |ls AS (SELECT * FROM customer WHERE c_custkey % 150 = 0),
         |rs AS (SELECT * FROM customer WHERE c_custkey % 173 = 0),
         |pairs AS (
         |  SELECT ls.c_custkey AS uid_l, rs.c_custkey AS uid_r,
         |    CASE WHEN ls.c_mktsegment IS NULL OR rs.c_mktsegment IS NULL THEN -1
         |         WHEN ls.c_mktsegment = rs.c_mktsegment THEN 1 ELSE 0 END AS g,
         |    tl.tf_v AS tf_l, tr.tf_v AS tf_r,
         |    coalesce(ls.c_nationkey = rs.c_nationkey, false) AS fbr
         |  FROM ls CROSS JOIN rs
         |  LEFT JOIN tf tl ON ls.c_mktsegment = tl.seg
         |  LEFT JOIN tf tr ON rs.c_mktsegment = tr.seg)
         |SELECT uid_l, uid_r, g AS gamma_c_mktsegment,
         |  round($prior
         |    + CASE g WHEN -1 THEN 0.0::DOUBLE WHEN 1 THEN ${w(0.9, 0.2)}
         |        ELSE ${w(0.1, 0.8)} END
         |    + CASE WHEN g = 1 THEN
         |        CASE WHEN coalesce(tf_l, tf_r) IS NULL THEN 0.0::DOUBLE
         |          ELSE ($log2uExact - log2(greatest(coalesce(tf_l, tf_r),
         |                coalesce(tf_r, tf_l), 0.0::DOUBLE))) * 1.0::DOUBLE END
         |      ELSE 0.0::DOUBLE END, 6) AS match_weight,
         |  fbr AS found_by_blocking_rules
         |FROM pairs""".stripMargin
    },

    "q_predict_within" -> {
      def w(m: Double, u: Double) = s"(${math.log(m / u) / math.log(2.0)})::DOUBLE"
      val prior = s"(${math.log(0.01 / 0.99) / math.log(2.0)})::DOUBLE"
      val log2uExact = s"(${math.log(0.2) / math.log(2.0)})::DOUBLE"
      s"""WITH tf AS (
         |  SELECT c_mktsegment AS seg,
         |    CAST(count(*) AS DOUBLE) / (SELECT count(c_mktsegment) FROM customer) AS tf_v
         |  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1),
         |batch AS (SELECT * FROM customer WHERE c_custkey % 7 = 0),
         |pairs AS (
         |  SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r,
         |    CASE WHEN l.c_mktsegment IS NULL OR r.c_mktsegment IS NULL THEN -1
         |         WHEN l.c_mktsegment = r.c_mktsegment THEN 1 ELSE 0 END AS g,
         |    tl.tf_v AS tf_l, tr.tf_v AS tf_r
         |  FROM batch l
         |  JOIN batch r ON l.c_nationkey = r.c_nationkey AND l.c_custkey < r.c_custkey
         |  LEFT JOIN tf tl ON l.c_mktsegment = tl.seg
         |  LEFT JOIN tf tr ON r.c_mktsegment = tr.seg)
         |SELECT uid_l, uid_r, g AS gamma_c_mktsegment,
         |  round($prior
         |    + CASE g WHEN -1 THEN 0.0::DOUBLE WHEN 1 THEN ${w(0.9, 0.2)}
         |        ELSE ${w(0.1, 0.8)} END
         |    + CASE WHEN g = 1 THEN
         |        CASE WHEN coalesce(tf_l, tf_r) IS NULL THEN 0.0::DOUBLE
         |          ELSE ($log2uExact - log2(greatest(coalesce(tf_l, tf_r),
         |                coalesce(tf_r, tf_l), 0.0::DOUBLE))) * 1.0::DOUBLE END
         |      ELSE 0.0::DOUBLE END, 6) AS match_weight
         |FROM pairs""".stripMargin
    },

    "q_kmeans" ->
      """WITH h AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS hh FROM embeddings),
        |seeds AS (SELECT CAST(row_number() OVER (ORDER BY hh, vec_id) AS INT) - 1 AS cell, v AS sv
        |  FROM h ORDER BY hh, vec_id LIMIT 4),
        |a0 AS (SELECT h.vec_id, h.v,
        |    (SELECT s.cell FROM seeds s
        |     ORDER BY list_distance(h.v, s.sv), s.cell LIMIT 1) AS cell FROM h),
        |dims AS (SELECT cell, i, sum(v[i]) AS s, count(*) AS n
        |  FROM a0, unnest(range(1, len(v) + 1)) AS u(i) GROUP BY cell, i),
        |ctr AS (SELECT cell, list(round(s / n, 9) ORDER BY i) AS cv FROM dims GROUP BY cell),
        |a1 AS (SELECT h.vec_id,
        |    (SELECT c.cell FROM ctr c ORDER BY list_distance(h.v, c.cv), c.cell LIMIT 1) AS cell
        |  FROM h)
        |SELECT vec_id, CAST(cell AS INT) AS cell FROM a1""".stripMargin,

    "q_predict_between" -> {
      def w(m: Double, u: Double) = s"(${math.log(m / u) / math.log(2.0)})::DOUBLE"
      val prior = s"(${math.log(0.01 / 0.99) / math.log(2.0)})::DOUBLE"
      val log2uExact = s"(${math.log(0.2) / math.log(2.0)})::DOUBLE"
      s"""WITH tf AS (
         |  SELECT c_mktsegment AS seg,
         |    CAST(count(*) AS DOUBLE) / (SELECT count(c_mktsegment) FROM customer) AS tf_v
         |  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1),
         |ls AS (SELECT * FROM customer WHERE c_custkey % 5 = 0),
         |rs AS (SELECT * FROM customer WHERE c_custkey % 6 = 0),
         |pairs AS (
         |  SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r,
         |    CASE WHEN l.c_mktsegment IS NULL OR r.c_mktsegment IS NULL THEN -1
         |         WHEN l.c_mktsegment = r.c_mktsegment THEN 1 ELSE 0 END AS g,
         |    tl.tf_v AS tf_l, tr.tf_v AS tf_r
         |  FROM ls l
         |  JOIN rs r ON l.c_nationkey = r.c_nationkey
         |  LEFT JOIN tf tl ON l.c_mktsegment = tl.seg
         |  LEFT JOIN tf tr ON r.c_mktsegment = tr.seg)
         |SELECT uid_l, uid_r, g AS gamma_c_mktsegment,
         |  round($prior
         |    + CASE g WHEN -1 THEN 0.0::DOUBLE WHEN 1 THEN ${w(0.9, 0.2)}
         |        ELSE ${w(0.1, 0.8)} END
         |    + CASE WHEN g = 1 THEN
         |        CASE WHEN coalesce(tf_l, tf_r) IS NULL THEN 0.0::DOUBLE
         |          ELSE ($log2uExact - log2(greatest(coalesce(tf_l, tf_r),
         |                coalesce(tf_r, tf_l), 0.0::DOUBLE))) * 1.0::DOUBLE END
         |      ELSE 0.0::DOUBLE END, 6) AS match_weight
         |FROM pairs""".stripMargin
    },

    "q_new_records" -> {
      def w(m: Double, u: Double) = s"(${math.log(m / u) / math.log(2.0)})::DOUBLE"
      val prior = s"(${math.log(0.001 / 0.999) / math.log(2.0)})::DOUBLE"
      s"""WITH nr AS (SELECT * FROM customer WHERE c_custkey % 97 = 0),
         |pairs AS (
         |  SELECT '0' AS match_key, l.c_custkey AS uid_l, r.c_custkey AS uid_r
         |  FROM customer l JOIN nr r
         |    ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
         |  UNION ALL
         |  SELECT '1', l.c_custkey, r.c_custkey
         |  FROM customer l JOIN nr r
         |    ON l.c_nationkey = r.c_nationkey
         |   AND round(l.c_acctbal, -2) = round(r.c_acctbal, -2)
         |   AND NOT coalesce(l.c_nationkey = r.c_nationkey
         |             AND l.c_mktsegment = r.c_mktsegment, false)),
         |mw AS (
         |  SELECT match_key, p.uid_l, p.uid_r,
         |    $prior
         |    + CASE $oracleGammaName WHEN -1 THEN 0.0::DOUBLE WHEN 3 THEN ${w(0.9, 0.001)}
         |        WHEN 2 THEN ${w(0.05, 0.01)} WHEN 1 THEN ${w(0.03, 0.05)}
         |        ELSE ${w(0.02, 0.939)} END
         |    + CASE $oracleGammaBal WHEN -1 THEN 0.0::DOUBLE WHEN 2 THEN ${w(0.7, 0.02)}
         |        WHEN 1 THEN ${w(0.2, 0.03)} ELSE ${w(0.1, 0.95)} END AS mw
         |  FROM pairs p
         |  JOIN customer l ON p.uid_l = l.c_custkey
         |  JOIN nr r ON p.uid_r = r.c_custkey)
         |SELECT match_key, uid_l, uid_r, round(mw, 6) AS match_weight,
         |  round(1.0 / (1.0 + power(2.0, -mw)), 6) AS match_probability
         |FROM mw""".stripMargin
    },

    "q_query_sql" ->
      """SELECT c_mktsegment, count(*) AS n, min(c_acctbal) AS min_bal
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    "q_missing_cluster_edges" ->
      s"""WITH sub AS (SELECT * FROM customer WHERE c_custkey % 3 = 0),
         |pairs AS (
         |  SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r
         |  FROM sub l JOIN sub r
         |    ON l.c_nationkey = r.c_nationkey AND l.c_custkey < r.c_custkey
         |  WHERE NOT coalesce(l.c_mktsegment = r.c_mktsegment, false)
         |    AND NOT coalesce(round(l.c_acctbal, -2) = round(r.c_acctbal, -2), false)),
         |cv AS (
         |  SELECT p.uid_l, p.uid_r,
         |    $oracleGammaName AS g_name,
         |    $oracleGammaBal AS g_bal
         |  FROM pairs p
         |  JOIN customer l ON p.uid_l = l.c_custkey
         |  JOIN customer r ON p.uid_r = r.c_custkey),
         |mw AS (SELECT uid_l, uid_r, $oracleCustomerMw AS mw FROM cv)
         |SELECT uid_l, uid_r, round(mw, 6) AS match_weight,
         |  round(1.0 / (1.0 + power(2.0, -mw)), 6) AS match_probability
         |FROM mw""".stripMargin,

    "q_compare_records" -> {
      def w(m: Double, u: Double) = s"(${math.log(m / u) / math.log(2.0)})::DOUBLE"
      val prior = s"(${math.log(0.001 / 0.999) / math.log(2.0)})::DOUBLE"
      s"""SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r,
         |  $oracleGammaName AS gamma_c_name,
         |  $oracleGammaBal AS gamma_c_acctbal,
         |  round($prior
         |    + CASE $oracleGammaName WHEN -1 THEN 0.0::DOUBLE WHEN 3 THEN ${w(0.9, 0.001)}
         |        WHEN 2 THEN ${w(0.05, 0.01)} WHEN 1 THEN ${w(0.03, 0.05)}
         |        ELSE ${w(0.02, 0.939)} END
         |    + CASE $oracleGammaBal WHEN -1 THEN 0.0::DOUBLE WHEN 2 THEN ${w(0.7, 0.02)}
         |        WHEN 1 THEN ${w(0.2, 0.03)} ELSE ${w(0.1, 0.95)} END, 6) AS match_weight
         |FROM customer l CROSS JOIN customer r
         |WHERE l.c_custkey % 499 = 0 AND r.c_custkey % 313 = 0""".stripMargin
    },

    "q_waterfall" -> {
      def w(m: Double, u: Double) = s"(${math.log(m / u) / math.log(2.0)})::DOUBLE"
      val prior = s"(${math.log(0.001 / 0.999) / math.log(2.0)})::DOUBLE"
      val wName = s"""CASE $oracleGammaName WHEN -1 THEN 0.0::DOUBLE
                     |    WHEN 3 THEN ${w(0.9, 0.001)} WHEN 2 THEN ${w(0.05, 0.01)}
                     |    WHEN 1 THEN ${w(0.03, 0.05)} ELSE ${w(0.02, 0.939)} END""".stripMargin
      val wBal = s"""CASE $oracleGammaBal WHEN -1 THEN 0.0::DOUBLE
                    |    WHEN 2 THEN ${w(0.7, 0.02)} WHEN 1 THEN ${w(0.2, 0.03)}
                    |    ELSE ${w(0.1, 0.95)} END""".stripMargin
      s"""$oraclePairsCte,
         |cv AS (
         |  SELECT p.uid_l, p.uid_r, $wName AS w_name, $wBal AS w_bal
         |  FROM pairs p
         |  JOIN customer l ON p.uid_l = l.c_custkey
         |  JOIN customer r ON p.uid_r = r.c_custkey)
         |SELECT uid_l, uid_r, 'prior' AS term, -1 AS bar_sort_order,
         |  round($prior, 6) AS log2_bayes_factor FROM cv
         |UNION ALL
         |SELECT uid_l, uid_r, 'c_name', 0, round(w_name, 6) FROM cv
         |UNION ALL
         |SELECT uid_l, uid_r, 'c_acctbal', 1, round(w_bal, 6) FROM cv
         |UNION ALL
         |SELECT uid_l, uid_r, 'final', 2, round($prior + w_name + w_bal, 6) FROM cv""".stripMargin
    },

    "q_viewer_rows" -> {
      def w(m: Double, u: Double) = s"(${math.log(m / u) / math.log(2.0)})::DOUBLE"
      val prior = s"(${math.log(0.001 / 0.999) / math.log(2.0)})::DOUBLE"
      s"""$oraclePairsCte,
         |cv AS (
         |  SELECT p.uid_l, p.uid_r,
         |    $oracleGammaName AS g_name, $oracleGammaBal AS g_bal
         |  FROM pairs p
         |  JOIN customer l ON p.uid_l = l.c_custkey
         |  JOIN customer r ON p.uid_r = r.c_custkey),
         |mw AS (
         |  SELECT uid_l, uid_r,
         |    CAST(g_name AS VARCHAR) || ',' || CAST(g_bal AS VARCHAR) AS gam_concat,
         |    $prior
         |      + CASE g_name WHEN -1 THEN 0.0::DOUBLE WHEN 3 THEN ${w(0.9, 0.001)}
         |          WHEN 2 THEN ${w(0.05, 0.01)} WHEN 1 THEN ${w(0.03, 0.05)}
         |          ELSE ${w(0.02, 0.939)} END
         |      + CASE g_bal WHEN -1 THEN 0.0::DOUBLE WHEN 2 THEN ${w(0.7, 0.02)}
         |          WHEN 1 THEN ${w(0.2, 0.03)} ELSE ${w(0.1, 0.95)} END AS mw_no_tf
         |  FROM cv),
         |num AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY gam_concat ORDER BY uid_l, uid_r)
         |      AS row_example_index,
         |    count(*) OVER (PARTITION BY gam_concat) AS pattern_count,
         |    count(*) OVER () AS total
         |  FROM mw)
         |SELECT uid_l, uid_r, gam_concat,
         |  round(mw_no_tf, 6) AS sort_avg_match_weight,
         |  row_example_index, pattern_count,
         |  round(pattern_count::DOUBLE / total, 9) AS proportion
         |FROM num WHERE row_example_index <= 2""".stripMargin
    },

    "q_em_patterns" ->
      s"""$oraclePairsCte
         |SELECT $oracleGammaName AS gamma_c_name,
         |       $oracleGammaBal AS gamma_c_acctbal,
         |       count(*) AS n_pairs
         |FROM pairs p
         |JOIN customer l ON p.uid_l = l.c_custkey
         |JOIN customer r ON p.uid_r = r.c_custkey
         |GROUP BY 1, 2""".stripMargin,

    "q_em_patterns_dl" ->
      """WITH pr AS (
        |  SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r
        |  FROM customer l JOIN customer r
        |    ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
        |   AND l.c_custkey < r.c_custkey)
        |SELECT CASE WHEN l.c_name IS NULL OR r.c_name IS NULL THEN -1
        |            WHEN l.c_name = r.c_name THEN 2
        |            WHEN damerau_levenshtein(l.c_name, r.c_name) <= 2 THEN 1
        |            ELSE 0 END AS gamma_c_name,
        |       count(*) AS n_pairs
        |FROM pr p JOIN customer l ON p.uid_l = l.c_custkey
        |          JOIN customer r ON p.uid_r = r.c_custkey
        |GROUP BY 1""".stripMargin,

    // components of the consecutive-order path graph = customers with >= 2
    // orders; cluster id = min orderkey. No recursion needed in the oracle.
    "q_cluster" -> clusterOracleSql,
    // identical semantics through the forced fully-distributed CC loop
    "q_cluster_dist" -> clusterOracleSql,

    "q_cluster_stats" ->
      """SELECT o_custkey AS cluster_key, count(*) AS cluster_size,
        |  min(o_orderkey) AS min_node, max(o_orderkey) AS max_node
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 2""".stripMargin,

    "q_blocking_analysis" ->
      """SELECT CAST(sum(cnt * (cnt - 1) / 2) AS BIGINT) AS n_comparisons FROM (
        |  SELECT count(*) AS cnt FROM customer
        |  GROUP BY c_nationkey, c_mktsegment)""".stripMargin,

    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_levels_extra" ->
      """WITH p AS (
        |  SELECT CAST(l.c_custkey AS BIGINT) AS k,
        |    l.c_name AS nm1_l, r.c_name AS nm1_r, r.c_name AS nm2_l,
        |    CASE WHEN l.c_custkey % 5 = 0 THEN l.c_name
        |         ELSE r.c_name END AS nm2_r,
        |    l.c_mktsegment AS seg_l, r.c_mktsegment AS seg_r,
        |    CAST(l.c_custkey AS BIGINT) + 1 AS k2
        |  FROM customer l JOIN customer r ON l.c_custkey + 1 = r.c_custkey
        |), q AS (
        |  SELECT *,
        |    (k % 160 - 80 + 0.25)::DOUBLE AS lat_l,
        |    (k2 % 160 - 80 + 0.25)::DOUBLE AS lat_r,
        |    (k % 350 - 175 + 0.25)::DOUBLE AS lon_l,
        |    (k2 % 350 - 175 + 0.25)::DOUBLE AS lon_r
        |  FROM p
        |)
        |SELECT k,
        |  (seg_l = 'BUILDING' AND seg_r = 'BUILDING') AS lm,
        |  (nm1_l = nm2_r AND nm2_l = nm1_r) AS cr,
        |  abs((k * 7) % 300 - (k2 * 7) % 300) <= 30 AS ad,
        |  abs((k * k) % 86400 - (k2 * k2) % 86400) <= 2000 AS at,
        |  2 * 6371 * asin(sqrt(
        |    pow(sin(radians(lat_r - lat_l) / 2), 2) +
        |    cos(radians(lat_l)) * cos(radians(lat_r)) *
        |    pow(sin(radians(lon_r - lon_l) / 2), 2))) <= 500 AS km,
        |  true AS ai,
        |  (k % 3 = 0 OR k % 7 = k2 % 7) AS asb
        |FROM q""".stripMargin,

    "q_string_sims" ->
      """WITH p AS (
        |  SELECT l.c_custkey AS k, l.c_name AS a, r.c_name AS b
        |  FROM customer l JOIN customer r ON l.c_custkey + 1 = r.c_custkey
        |)
        |SELECT k, levenshtein(a, b) AS lev,
        |  damerau_levenshtein(a, b) AS dlev,
        |  round(jaro_similarity(a, b), 9) AS jaro,
        |  round(jaro_winkler_similarity(a, b), 9) AS jw,
        |  round(jaccard(a, b), 9) AS jac1
        |FROM p""".stripMargin,

    "q_comparator_scores" ->
      """WITH p AS (
        |  SELECT l.c_custkey AS k, l.c_name AS a, r.c_name AS b
        |  FROM customer l JOIN customer r ON l.c_custkey + 1 = r.c_custkey
        |)
        |SELECT k, a, b,
        |  levenshtein(a, b) AS levenshtein_distance,
        |  damerau_levenshtein(a, b) AS damerau_levenshtein_distance,
        |  round(jaro_similarity(a, b), 2) AS jaro_similarity,
        |  round(jaro_winkler_similarity(a, b), 2) AS jaro_winkler_similarity,
        |  round(jaccard(a, b), 2) AS jaccard_similarity
        |FROM p""".stripMargin,

    "q_sample" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
        |      < CAST(0.1 * 4294967296 AS BIGINT)""".stripMargin,

    "q_exploding_pairs" ->
      """SELECT DISTINCT l.p_partkey AS uid_l, r.p_partkey AS uid_r
        |FROM (SELECT p_partkey, unnest(string_split(p_type, ' ')) AS w
        |      FROM part WHERE p_partkey % 10 = 0) l
        |JOIN (SELECT p_partkey, unnest(string_split(p_type, ' ')) AS w
        |      FROM part WHERE p_partkey % 10 = 0) r
        |  ON l.w = r.w AND l.p_partkey < r.p_partkey""".stripMargin,

    "q_array_levels" ->
      """SELECT l.p_partkey AS uid_l, r.p_partkey AS uid_r,
        |  CASE WHEN l.words IS NULL OR r.words IS NULL THEN -1
        |       WHEN len(list_intersect(l.words, r.words)) >= 2 THEN 2
        |       WHEN list_max(flatten(list_transform(l.words,
        |            x -> list_transform(r.words,
        |                 y -> jaro_winkler_similarity(x, y))))) >= 0.95 THEN 1
        |       ELSE 0 END AS gamma_words
        |FROM (SELECT p_partkey, p_size, string_split(p_type, ' ') AS words
        |      FROM part WHERE p_partkey % 10 = 0) l
        |JOIN (SELECT p_partkey, p_size, string_split(p_type, ' ') AS words
        |      FROM part WHERE p_partkey % 10 = 0) r
        |  ON l.p_size % 10 = r.p_size % 10 AND l.p_partkey < r.p_partkey""".stripMargin,

    "q_exploding_multi_rule" ->
      """WITH parts AS (
        |  SELECT p_partkey AS uid, p_brand, p_size,
        |         string_split(p_type, ' ') AS words
        |  FROM part WHERE p_partkey % 10 = 0
        |), r0 AS (
        |  SELECT 0 AS mk, l.uid AS uid_l, r.uid AS uid_r
        |  FROM parts l JOIN parts r
        |    ON l.p_brand = r.p_brand AND l.uid < r.uid
        |), ex AS (
        |  SELECT uid, p_brand, unnest(words) AS w FROM parts
        |), r1 AS (
        |  SELECT DISTINCT 1 AS mk, l.uid AS uid_l, r.uid AS uid_r
        |  FROM ex l JOIN ex r ON l.w = r.w AND l.uid < r.uid
        |  WHERE NOT coalesce(l.p_brand = r.p_brand, false)
        |), r2 AS (
        |  SELECT 2 AS mk, l.uid AS uid_l, r.uid AS uid_r
        |  FROM parts l JOIN parts r
        |    ON l.p_size % 5 = r.p_size % 5 AND l.uid < r.uid
        |  WHERE NOT coalesce(l.p_brand = r.p_brand, false)
        |), u AS (
        |  SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |)
        |SELECT CAST(min(mk) AS VARCHAR) AS match_key, uid_l, uid_r
        |FROM u GROUP BY uid_l, uid_r""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 150000)""".stripMargin,

    "q_truth_space" ->
      s"""$oraclePairsCte,
         |cv AS (
         |  SELECT p.uid_l, p.uid_r,
         |    $oracleGammaName AS g_name, $oracleGammaBal AS g_bal,
         |    CASE WHEN l.c_mktsegment = r.c_mktsegment THEN 1 ELSE 0 END AS pos
         |  FROM pairs p
         |  JOIN customer l ON p.uid_l = l.c_custkey
         |  JOIN customer r ON p.uid_r = r.c_custkey),
         |mw AS (
         |  SELECT round($oracleCustomerMw, 6) AS truth_threshold, pos
         |  FROM cv),
         |$oracleTruthTail""".stripMargin,

    // labelled pairs scored through the same model; clerical truth from
    // the (NULL -> 1.0) score; identical cumulative tail
    "q_labels_truth_space" ->
      s"""WITH labels AS (
         |  SELECT c_custkey AS uid_l, c_custkey + 1 AS uid_r,
         |    CASE WHEN c_custkey % 15 = 0 THEN 1.0::DOUBLE
         |         ELSE (c_custkey % 97) / 96.0 END AS score
         |  FROM customer WHERE c_custkey % 5 = 0),
         |cv AS (
         |  SELECT b.uid_l, b.uid_r,
         |    $oracleGammaName AS g_name, $oracleGammaBal AS g_bal,
         |    CASE WHEN b.score >= 0.5 THEN 1 ELSE 0 END AS pos
         |  FROM labels b
         |  JOIN customer l ON b.uid_l = l.c_custkey
         |  JOIN customer r ON b.uid_r = r.c_custkey),
         |mw AS (
         |  SELECT round($oracleCustomerMw, 6) AS truth_threshold, pos
         |  FROM cv),
         |$oracleTruthTail""".stripMargin,

    "q_unlinkables" -> {
      def log2(x: Double) = math.log(x) / math.log(2.0)
      val mw = log2(0.001 / 0.999) + log2(0.9 / 0.001) + log2(0.7 / 0.02)
      val p = 1.0 / (1 + math.pow(2, -mw))
      val mwR = BigDecimal(mw).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val pR = BigDecimal(p).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      // every customer has non-null name + acctbal, so the self-link weight
      // is a single constant; the distribution collapses to one row
      s"""SELECT ($mwR)::DOUBLE AS match_weight, ($pR)::DOUBLE AS match_probability,
         |  1.0::DOUBLE AS prop, 1.0::DOUBLE AS cum_prop
         |FROM (SELECT count(*) AS c FROM customer) WHERE c > 0""".stripMargin
    },

    "q_completeness" ->
      """SELECT 'all' AS source_dataset, 'c_name' AS column_name,
        |  count(*) AS total_rows, count(c_name) AS non_null_rows,
        |  count(c_name)::DOUBLE / count(*) AS completeness FROM customer
        |UNION ALL
        |SELECT 'all', 'c_acctbal', count(*), count(c_acctbal),
        |  count(c_acctbal)::DOUBLE / count(*) FROM customer
        |UNION ALL
        |SELECT 'all', 'c_mktsegment', count(*), count(c_mktsegment),
        |  count(c_mktsegment)::DOUBLE / count(*) FROM customer""".stripMargin,

    "q_profile" ->
      """SELECT * FROM (
        |  SELECT 'p_brand' AS column_name, CAST(p_brand AS VARCHAR) AS value,
        |    count(*) AS value_count,
        |    CAST(row_number() OVER (ORDER BY count(*) DESC, CAST(p_brand AS VARCHAR) ASC) AS INT) AS rank
        |  FROM part WHERE p_brand IS NOT NULL GROUP BY p_brand) WHERE rank <= 10
        |UNION ALL
        |SELECT * FROM (
        |  SELECT 'p_type', CAST(p_type AS VARCHAR), count(*),
        |    CAST(row_number() OVER (ORDER BY count(*) DESC, CAST(p_type AS VARCHAR) ASC) AS INT) AS rank
        |  FROM part WHERE p_type IS NOT NULL GROUP BY p_type) WHERE rank <= 10""".stripMargin,

    "q_profile_dist" -> {
      def one(c: String) =
        s"""SELECT '$c' AS column_name, value_count, n_values, cum_rows,
           |  round(cum_rows::DOUBLE / total_rows, 9) AS percentile
           |FROM (
           |  SELECT value_count, n_values,
           |    CAST(sum(value_count * n_values) OVER (ORDER BY value_count DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rows,
           |    CAST(sum(value_count * n_values) OVER () AS BIGINT) AS total_rows
           |  FROM (
           |    SELECT value_count, count(*) AS n_values FROM (
           |      SELECT count(*) AS value_count FROM part
           |      WHERE $c IS NOT NULL GROUP BY $c)
           |    GROUP BY value_count))""".stripMargin
      s"${one("p_brand")}\nUNION ALL\n${one("p_type")}"
    },

    "q_tf_chart" -> {
      def one(side: String, order: String) =
        s"""SELECT 'p_type' AS column_name, '${side}_frequent' AS side,
           |  value, value_count, round(tf, 9) AS tf,
           |  ${if (side == "most") "CAST(rank AS INT)" else "CAST(NULL AS INT)"} AS rank_most_frequent,
           |  ${if (side == "most") "CAST(NULL AS INT)" else "CAST(rank AS INT)"} AS rank_least_frequent
           |FROM (
           |  SELECT CAST(p_type AS VARCHAR) AS value, count(*) AS value_count,
           |    count(*)::DOUBLE / (SELECT count(p_type) FROM part) AS tf,
           |    row_number() OVER (ORDER BY count(*) $order,
           |      CAST(p_type AS VARCHAR) ASC) AS rank
           |  FROM part WHERE p_type IS NOT NULL GROUP BY p_type)
           |WHERE rank <= 5""".stripMargin
      s"${one("most", "DESC")}\nUNION ALL\n${one("least", "ASC")}"
    },

    "q_cumulative_comparisons" ->
      s"""$oraclePairsCte,
         |counts AS (SELECT match_key, count(*) AS row_count FROM pairs GROUP BY 1),
         |rules AS (SELECT '0' AS match_key, 'block_on(c_nationkey, c_mktsegment)' AS rule
         |          UNION ALL
         |          SELECT '1', 'block_on(c_nationkey, round(c_acctbal, -2))'),
         |n AS (SELECT count(*) AS cnt FROM customer)
         |SELECT r.match_key, r.rule,
         |  CAST(coalesce(c.row_count, 0) AS BIGINT) AS row_count,
         |  CAST(sum(coalesce(c.row_count, 0)) OVER (ORDER BY CAST(r.match_key AS INT)
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_rows,
         |  (SELECT CAST(cnt * (cnt - 1) / 2 AS BIGINT) FROM n) AS cartesian
         |FROM rules r LEFT JOIN counts c USING (match_key)""".stripMargin,

    // chart-record replay: portable-hash 37% sample on both sides
    // (threshold 3700/10000), NOT-previous marginal counts scaled by
    // 1/0.37², exact cartesian from the unsampled table
    "q_count_comparisons" ->
      """WITH s AS (SELECT * FROM customer
        |  WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 10000 < 3700),
        |pairs AS (
        |  SELECT '0' AS match_key FROM s l JOIN s r
        |    ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
        |   AND l.c_custkey < r.c_custkey
        |  UNION ALL
        |  SELECT '1' FROM s l JOIN s r
        |    ON l.c_nationkey = r.c_nationkey
        |   AND round(l.c_acctbal, -2) = round(r.c_acctbal, -2)
        |   AND l.c_custkey < r.c_custkey
        |   AND NOT coalesce(l.c_nationkey = r.c_nationkey
        |                    AND l.c_mktsegment = r.c_mktsegment, false)),
        |counts AS (SELECT match_key, count(*) AS sampled FROM pairs GROUP BY 1),
        |rules AS (
        |  SELECT '0' AS match_key,
        |    'block_on(c_nationkey, c_mktsegment)' AS blocking_rule,
        |    'l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment'
        |      AS equi_join_conditions
        |  UNION ALL
        |  SELECT '1', 'block_on(c_nationkey, round(c_acctbal, -2))',
        |    'l.c_nationkey = r.c_nationkey AND l.round(c_acctbal, -2) = r.round(c_acctbal, -2)'),
        |n AS (SELECT count(*) AS cnt FROM customer),
        |est AS (SELECT r.match_key, r.blocking_rule, r.equi_join_conditions,
        |  CAST(round(coalesce(c.sampled, 0) / (0.37 * 0.37)) AS BIGINT)
        |    AS marginal_comparison_count
        |  FROM rules r LEFT JOIN counts c USING (match_key))
        |SELECT blocking_rule, equi_join_conditions, '' AS filter_conditions,
        |  'l.unique_id < r.unique_id' AS link_type_join_condition,
        |  marginal_comparison_count,
        |  CAST(sum(marginal_comparison_count) OVER (ORDER BY CAST(match_key AS INT)
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cumulative_comparison_count,
        |  (SELECT CAST(cnt * (cnt - 1) / 2 AS BIGINT) FROM n)
        |    AS total_possible_comparison_count,
        |  match_key, 0.37::DOUBLE AS record_sample_proportion,
        |  true AS is_estimate
        |FROM est""".stripMargin,

    "q_bridges" ->
      """WITH k AS (
        |  SELECT CAST(c_custkey AS BIGINT) * 10 AS b, c_custkey % 2 AS odd
        |  FROM customer
        |)
        |SELECT CAST(b AS VARCHAR) AS cluster_id,
        |  unnest(CASE WHEN odd = 0 THEN [b, b+1, b]
        |              ELSE [b, b, b, b, b+1] END) AS uid_l,
        |  unnest(CASE WHEN odd = 0 THEN [b+1, b+2, b+2]
        |              ELSE [b+1, b+2, b+3, b+4, b+2] END) AS uid_r,
        |  unnest(CASE WHEN odd = 0 THEN [false, false, false]
        |              ELSE [false, false, true, true, false] END) AS is_bridge
        |FROM k""".stripMargin,

    "q_articulation" ->
      """WITH k AS (
        |  SELECT CAST(c_custkey AS BIGINT) * 10 AS b, c_custkey % 2 AS odd
        |  FROM customer
        |)
        |SELECT CAST(b AS VARCHAR) AS cluster_id,
        |  unnest(CASE WHEN odd = 0 THEN [b, b+1, b+2]
        |              ELSE [b, b+1, b+2, b+3, b+4] END) AS node_id,
        |  unnest(CASE WHEN odd = 0 THEN [false, false, false]
        |              ELSE [true, false, false, false, false] END)
        |    AS is_articulation
        |FROM k""".stripMargin,

    "q_graph_metrics" ->
      """WITH k AS (
        |  SELECT CAST(c_custkey AS BIGINT) * 10 AS b, c_custkey % 2 AS odd
        |  FROM customer
        |)
        |SELECT CAST(b AS VARCHAR) AS cluster_id, 'edge' AS grain,
        |  unnest(CASE WHEN odd = 0 THEN [b, b+1, b]
        |              ELSE [b, b, b, b, b+1] END) AS id_a,
        |  unnest(CASE WHEN odd = 0 THEN [b+1, b+2, b+2]
        |              ELSE [b+1, b+2, b+3, b+4, b+2] END) AS id_b,
        |  unnest(CASE WHEN odd = 0 THEN [false, false, false]
        |              ELSE [false, false, true, true, false] END) AS verdict
        |FROM k
        |UNION ALL
        |SELECT CAST(b AS VARCHAR) AS cluster_id, 'node' AS grain,
        |  unnest(CASE WHEN odd = 0 THEN [b, b+1, b+2]
        |              ELSE [b, b+1, b+2, b+3, b+4] END) AS id_a,
        |  CAST(NULL AS BIGINT) AS id_b,
        |  unnest(CASE WHEN odd = 0 THEN [false, false, false]
        |              ELSE [true, false, false, false, false] END) AS verdict
        |FROM k""".stripMargin,

    "q_node_metrics" ->
      """WITH e AS (
        |  SELECT lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nl,
        |         o_orderkey AS nr
        |  FROM orders
        |  QUALIFY nl IS NOT NULL
        |), deg AS (
        |  SELECT node_id, count(*) AS degree FROM (
        |    SELECT nl AS node_id FROM e UNION ALL SELECT nr FROM e) u
        |  GROUP BY node_id
        |), cl AS (
        |  SELECT o_orderkey AS node_id,
        |         min(o_orderkey) OVER (PARTITION BY o_custkey) AS cluster_id
        |  FROM orders
        |  QUALIFY count(*) OVER (PARTITION BY o_custkey) >= 2
        |)
        |SELECT cl.node_id, cl.cluster_id,
        |  CAST(coalesce(deg.degree, 0) AS BIGINT) AS degree,
        |  count(*) OVER (PARTITION BY cl.cluster_id) AS cluster_size,
        |  CASE WHEN count(*) OVER (PARTITION BY cl.cluster_id) > 1
        |       THEN round(coalesce(deg.degree, 0)::DOUBLE
        |                  / (count(*) OVER (PARTITION BY cl.cluster_id) - 1), 9)
        |       ELSE 0.0::DOUBLE END AS centrality
        |FROM cl LEFT JOIN deg ON cl.node_id = deg.node_id""".stripMargin,

    "q_cluster_density" ->
      """WITH e AS (
        |  SELECT lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nl,
        |         o_orderkey AS nr
        |  FROM orders
        |  QUALIFY nl IS NOT NULL
        |), cl AS (
        |  SELECT o_orderkey AS node_id,
        |         min(o_orderkey) OVER (PARTITION BY o_custkey) AS cluster_id
        |  FROM orders
        |  QUALIFY count(*) OVER (PARTITION BY o_custkey) >= 2
        |), ne AS (
        |  SELECT cl.cluster_id, count(*) AS n_edges
        |  FROM e JOIN cl ON e.nl = cl.node_id
        |  GROUP BY cl.cluster_id
        |), nn AS (SELECT cluster_id, count(*) AS n_nodes FROM cl GROUP BY cluster_id)
        |SELECT nn.cluster_id, nn.n_nodes,
        |  CAST(coalesce(ne.n_edges, 0) AS BIGINT) AS n_edges,
        |  CASE WHEN nn.n_nodes > 1
        |       THEN round(coalesce(ne.n_edges, 0)::DOUBLE * 2
        |                  / (nn.n_nodes * (nn.n_nodes - 1)), 9)
        |       ELSE 0.0::DOUBLE END AS density
        |FROM nn LEFT JOIN ne ON nn.cluster_id = ne.cluster_id""".stripMargin,

    "q_deterministic_link" ->
      s"""$oraclePairsCte
         |SELECT p.match_key, p.uid_l, p.uid_r, l.c_name AS c_name_l, r.c_name AS c_name_r
         |FROM pairs p
         |JOIN customer l ON p.uid_l = l.c_custkey
         |JOIN customer r ON p.uid_r = r.c_custkey""".stripMargin,

    "q_largest_blocks" ->
      """SELECT c_nationkey AS key_0, c_mktsegment AS key_1,
        |  count(*) AS count_l, count(*) AS count_r,
        |  count(*) * count(*) AS block_count
        |FROM customer GROUP BY 1, 2
        |ORDER BY block_count DESC, key_0, key_1 LIMIT 10""".stripMargin,

    // path-graph components = maximal runs of consecutive orders whose edge
    // pseudo-probability clears the threshold -> window SQL, no recursion
    "q_multi_threshold" -> {
      def oneThreshold(t: Double) =
        s"""SELECT o_orderkey AS node_id,
           |  min(o_orderkey) OVER (PARTITION BY o_custkey, segment) AS cluster_id,
           |  ($t)::DOUBLE AS threshold
           |FROM (
           |  SELECT o_custkey, o_orderkey, prev_ok, next_ok,
           |    sum(CASE WHEN prev_ok IS NULL OR prev_ok = 0 THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS segment
           |  FROM (
           |    SELECT o_custkey, o_orderkey,
           |      CASE WHEN lag(o_orderkey) OVER w IS NULL THEN NULL
           |        WHEN ((lag(o_orderkey) OVER w + o_orderkey) % 97) / 96.0 >= $t
           |        THEN 1 ELSE 0 END AS prev_ok,
           |      CASE WHEN lead(o_orderkey) OVER w IS NULL THEN NULL
           |        WHEN ((o_orderkey + lead(o_orderkey) OVER w) % 97) / 96.0 >= $t
           |        THEN 1 ELSE 0 END AS next_ok
           |    FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)))
           |WHERE coalesce(prev_ok, 0) = 1 OR coalesce(next_ok, 0) = 1""".stripMargin
      s"${oneThreshold(0.3)}\nUNION ALL\n${oneThreshold(0.7)}"
    },

    "q_incremental_cluster" ->
      """SELECT o_orderkey AS node_id,
        |  min(o_orderkey) OVER (PARTITION BY o_custkey, segment) AS cluster_id
        |FROM (
        |  SELECT o_custkey, o_orderkey, prev_ok, next_ok,
        |    sum(CASE WHEN prev_ok IS NULL OR prev_ok = 0 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS segment
        |  FROM (
        |    SELECT o_custkey, o_orderkey,
        |      CASE WHEN lag(o_orderkey) OVER w IS NULL THEN NULL
        |        WHEN ((lag(o_orderkey) OVER w + o_orderkey) % 97) / 96.0 >= 0.5
        |        THEN 1 ELSE 0 END AS prev_ok,
        |      CASE WHEN lead(o_orderkey) OVER w IS NULL THEN NULL
        |        WHEN ((o_orderkey + lead(o_orderkey) OVER w) % 97) / 96.0 >= 0.5
        |        THEN 1 ELSE 0 END AS next_ok
        |    FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)))
        |WHERE coalesce(prev_ok, 0) = 1 OR coalesce(next_ok, 0) = 1""".stripMargin,

    "q_multi_threshold_stats" -> {
      def oneThreshold(t: Double) =
        s"""SELECT ($t)::DOUBLE AS threshold_match_probability,
           |  round(log2(($t)::DOUBLE / (1.0 - ($t)::DOUBLE)), 9)
           |    AS threshold_match_weight,
           |  count(*) AS num_clusters, max(n) AS max_cluster_size,
           |  round(avg(n), 9) AS avg_cluster_size
           |FROM (
           |  SELECT cluster_id, count(*) AS n FROM (
           |    SELECT o_orderkey AS node_id,
           |      min(o_orderkey) OVER (PARTITION BY o_custkey, segment) AS cluster_id
           |    FROM (
           |      SELECT o_custkey, o_orderkey, prev_ok, next_ok,
           |        sum(CASE WHEN prev_ok IS NULL OR prev_ok = 0 THEN 1 ELSE 0 END)
           |          OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS segment
           |      FROM (
           |        SELECT o_custkey, o_orderkey,
           |          CASE WHEN lag(o_orderkey) OVER w IS NULL THEN NULL
           |            WHEN ((lag(o_orderkey) OVER w + o_orderkey) % 97) / 96.0 >= $t
           |            THEN 1 ELSE 0 END AS prev_ok,
           |          CASE WHEN lead(o_orderkey) OVER w IS NULL THEN NULL
           |            WHEN ((o_orderkey + lead(o_orderkey) OVER w) % 97) / 96.0 >= $t
           |            THEN 1 ELSE 0 END AS next_ok
           |        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)))
           |    WHERE coalesce(prev_ok, 0) = 1 OR coalesce(next_ok, 0) = 1)
           |  GROUP BY cluster_id)""".stripMargin
      s"${oneThreshold(0.3)}\nUNION ALL\n${oneThreshold(0.7)}"
    },

    "q_one_to_one" ->
      """WITH e AS (
        |  SELECT prev AS l, o_orderkey AS r, ((prev + o_orderkey) % 97) / 96.0 AS p
        |  FROM (SELECT o_custkey, o_orderkey,
        |          lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev
        |        FROM orders)
        |  WHERE prev IS NOT NULL),
        |sym AS (SELECT l AS a, r AS b, p FROM e
        |        UNION ALL SELECT r, l, p FROM e),
        |best AS (SELECT a, b FROM (
        |    SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY p DESC, b ASC) AS rn
        |    FROM sym) WHERE rn = 1),
        |mutual AS (SELECT x.a, x.b FROM best x
        |           JOIN best y ON x.a = y.b AND x.b = y.a WHERE x.a < x.b)
        |SELECT a AS node_id, a AS cluster_id FROM mutual
        |UNION ALL SELECT b, a FROM mutual""".stripMargin,

    "q_salt_advice" ->
      """SELECT 'block_on(c_mktsegment)' AS rule,
        |  max(c) AS largest_block_rows,
        |  CAST(sum(c) AS BIGINT) AS total_rows,
        |  CAST(least(64, greatest(1,
        |    CAST(ceil(max(c)::DOUBLE / 1000) AS BIGINT))) AS INT)
        |    AS recommended_salts
        |FROM (SELECT count(*) AS c FROM customer
        |      WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment)""".stripMargin,

    // per-candidate replay of the grouping-sets lattice: one group-by CTE
    // per candidate conjunction, identical null-rejecting semantics
    "q_blocking_advisor" -> advisorOracleSql("", pairScale = 1, blockScale = 1),

    // the sampled advisor: identical lattice over the portable-hash
    // half-sample (md5-prefix % 10000 < 5000 — same hash family as
    // q_sample), pair counts x4 (1/f^2) and block sizes x2 (1/f) exactly
    // because f = 0.5; completeness stays a within-sample ratio
    "q_blocking_advisor_sampled" -> advisorOracleSql(
      " WHERE (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT) % 10000 < 5000",
      pairScale = 4, blockScale = 2),

    // full replay of the single constrained round: symmetric neighbours ->
    // drop same-dataset equal-probability ties (both directions) ->
    // singleton-cluster candidate edges under the ds0/ds1 disjointness
    // constraint -> mutual rank-1 merges -> representative update
    "q_one_to_one_constrained" -> oneToOneConstrainedOracleSql,
    // identical semantics through the forced distributed mutual-best loop
    "q_one_to_one_dist" -> oneToOneConstrainedOracleSql,

    // payload is the utf8 bytes of `text`; ASCII corpus makes byte ops and
    // char ops coincide, so the oracle runs on the text column
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        |  len(text)::BIGINT AS declared_bytes,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  md5(text) AS digest,
        |  hex(CAST(substring(text, 1, 8) AS BLOB)) AS prefix_hex
        |FROM documents""".stripMargin,

    // FNV-1a decode stub replayed over the payload BYTES (fnvBytesSql is
    // byte-accurate for any unicode payload); NULL text yields hv NULL ->
    // all-NULL metadata, matching the engine's NULL row.
    "q_multimodal_decode" ->
      s"""WITH h AS (SELECT doc_id AS media_id, ${fnvBytesSql("text")} AS hv FROM documents),
         |s AS (SELECT media_id, hv,
         |  CAST(CASE WHEN hv >= $Neg THEN hv - $M64 ELSE hv END AS BIGINT) AS hs
         |  FROM h)
         |SELECT media_id,
         |  CAST(64 + abs(hs) % 1024 AS INT) AS width,
         |  CAST(64 + (hv // 131072::HUGEINT) % 1024 AS INT) AS height,
         |  CASE WHEN hv IS NULL THEN NULL ELSE 3 END AS n_channels,
         |  CASE WHEN hv IS NULL THEN NULL ELSE 8 END AS feature_len
         |FROM s""".stripMargin,

    // Perceptual image near-dup replay: the BMP pixel pattern IS the bit
    // pattern of FNV-1a(custkey), and the real decode -> aHash round-trip
    // reproduces it exactly (two-level image: cells above the mean are
    // precisely the bright ones), so the oracle replays FNV, the 4x16-bit
    // banding and the hamming verify in closed form.
    "q_image_neardup" -> {
      val divs = Seq("1::HUGEINT", "65536::HUGEINT", "4294967296::HUGEINT",
        "281474976710656::HUGEINT")
      val bandDiv = "CASE band WHEN 0 THEN 1::HUGEINT WHEN 1 THEN " +
        "65536::HUGEINT WHEN 2 THEN 4294967296::HUGEINT ELSE " +
        "281474976710656::HUGEINT END"
      val hamming = divs.map(d =>
        s"bit_count(CAST((xor(lh, rh) // $d) % 65536 AS BIGINT))")
        .mkString(" + ")
      s"""WITH ks AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
         |h AS (SELECT k, ${fnvSql("CAST(k AS VARCHAR)")} AS hv FROM ks),
         |imgs AS (
         |  SELECT 2 * k AS id, hv FROM h
         |  UNION ALL
         |  SELECT 2 * k + 1 AS id, xor(hv, 1::HUGEINT) AS hv FROM h),
         |banded AS (
         |  SELECT id, hv, CAST((hv // ($bandDiv)) % 65536 AS BIGINT) AS bv,
         |    band
         |  FROM imgs, (SELECT unnest([0, 1, 2, 3]) AS band) bands),
         |cand AS (
         |  SELECT DISTINCT l.id AS id_l, r.id AS id_r, l.hv AS lh, r.hv AS rh
         |  FROM banded l JOIN banded r
         |    ON l.band = r.band AND l.bv = r.bv AND l.id < r.id)
         |SELECT id_l, id_r, CAST($hamming AS BIGINT) AS hamming
         |FROM cand WHERE $hamming <= 3""".stripMargin
    },

    // Full MinHash-LSH replay: FNV shingle hashes -> 32 universal-hash
    // slots (params exported from ShingleKernel.hashParams — signed-long
    // min semantics) -> 8 bands of 4 -> candidate join -> jaccard verify.
    "q_minhash_pairs" ->
      s"""WITH $minhashPairCtes
         |SELECT id_l, id_r, jaccard FROM pairs""".stripMargin,

    // The end-to-end dedupe on top of the same replay: verified near-dup
    // pairs -> transitive closure via a recursive min-label CTE (the SQL
    // twin of the engine's pointer-jumping CC) -> canonical = component
    // min; singletons keep themselves.
    "q_dedup_docs" ->
      s"""WITH RECURSIVE $minhashPairCtes,
         |edges AS (SELECT id_l AS a, id_r AS b FROM pairs
         |          UNION ALL SELECT id_r, id_l FROM pairs),
         |reach(n, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.m FROM edges e JOIN reach ON reach.n = e.b)
         |SELECT n AS doc_id, min(m) AS canonical_id,
         |  CAST(CASE WHEN n = min(m) THEN 1 ELSE 0 END AS INT) AS keep
         |FROM reach GROUP BY n""".stripMargin,

    // SimHash replay: per-bit FNV votes -> 64-bit signature -> all
    // within-block pairs at hamming <= 3 (band blocking is exhaustive
    // there, so LSH output == brute force within blocks). Pair semantics
    // live in the shared simhashPairCtes — the end-to-end dedupe entry
    // composes the SAME definition, so the two can never drift.
    "q_simhash_pairs" ->
      s"""WITH $simhashPairCtes
         |SELECT id_l, id_r, hamming FROM pairs""".stripMargin,

    // the simhash end-to-end dedupe: the shared pairs replay + the
    // q_dedup_docs recursive-CTE transitive closure
    "q_dedup_simhash" ->
      s"""WITH RECURSIVE $simhashPairCtes,
         |edges AS (SELECT id_l AS a, id_r AS b FROM pairs
         |          UNION ALL SELECT id_r, id_l FROM pairs),
         |reach(n, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, reach.m FROM edges e JOIN reach ON reach.n = e.b)
         |SELECT n AS doc_id, min(m) AS canonical_id,
         |  CAST(CASE WHEN n = min(m) THEN 1 ELSE 0 END AS INT) AS keep
         |FROM reach GROUP BY n""".stripMargin,

    "q_exact_dedup" ->
      """SELECT substr(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 16)
        |         AS fingerprint,
        |       min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q_token_counts" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN trim(text) = '' THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |    AS ws_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s'))
        |    AS BIGINT) AS bpe_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  round(CASE WHEN len(regexp_extract_all(text,
        |      '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s')) = 0
        |    THEN 0.0
        |    ELSE length(text)::DOUBLE / len(regexp_extract_all(text,
        |      '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s'))
        |    END, 9) AS chars_per_token
        |FROM documents""".stripMargin,

    "q_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS t,
        |    regexp_split_to_array(text, '\n') AS lines
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    round(CASE WHEN len(t) = 0 THEN 0.0
        |      ELSE list_sum(list_transform(t, x -> len(x)))::DOUBLE / len(t) END, 9)
        |      AS mean_word_len,
        |    round(CASE WHEN len(t) = 0 THEN 0.0
        |      ELSE ((length(text) - length(replace(text, '#', '')))
        |        + (length(text) - length(replace(text, '...', ''))) / 3)::DOUBLE
        |        / len(t) END, 9) AS symbol_word_ratio,
        |    round(CASE WHEN len(lines) = 0 THEN 0.0
        |      ELSE len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]')))::DOUBLE
        |        / len(lines) END, 9) AS bullet_line_ratio,
        |    round(CASE WHEN len(lines) = 0 THEN 0.0
        |      ELSE len(list_filter(lines, l -> regexp_matches(l, '\.\.\.\s*$')))::DOUBLE
        |        / len(lines) END, 9) AS ellipsis_line_ratio,
        |    round(CASE WHEN len(t) = 0 THEN 0.0
        |      ELSE len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
        |        / len(t) END, 9) AS alpha_word_ratio,
        |    CAST(len(list_intersect(list_distinct(list_transform(t, x -> lower(x))),
        |      ['the','be','to','of','and','that','have','with'])) AS BIGINT)
        |      AS n_stop_hits
        |  FROM base)
        |SELECT *,
        |  CAST(n_tokens BETWEEN 20 AND 100000
        |   AND mean_word_len BETWEEN 3 AND 10
        |   AND symbol_word_ratio < 0.1
        |   AND bullet_line_ratio < 0.9
        |   AND ellipsis_line_ratio < 0.3
        |   AND alpha_word_ratio > 0.8
        |   AND n_stop_hits >= 1 AS INT) AS keep
        |FROM feat""".stripMargin,

    "q_winnow" -> {
      def fnv(g: String) =
        s"list_reduce(list_prepend(14695981039346656037::HUGEINT, " +
          s"list_transform(range(1, len($g)+1), i2 -> ord(substr($g, CAST(i2 AS INT), 1))::HUGEINT)), " +
          s"(h, b) -> (xor(h, b) * 1099511628211::HUGEINT) % $M64)"
      s"""WITH norm AS (SELECT doc_id, $normSql AS t FROM documents),
         |hs AS (SELECT doc_id,
         |    CASE WHEN len(t) <= 8 THEN [${fnv("t")}]
         |         ELSE list_transform(range(1, len(t) - 6), i -> ${fnv("substr(t, CAST(i AS INT), 8)")}) END AS h
         |  FROM norm WHERE len(t) > 0),
         |wins AS (
         |  SELECT doc_id,
         |    CASE WHEN len(h) <= 4 THEN [list_aggregate(h, 'min')]
         |         ELSE list_transform(range(1, len(h) - 2),
         |           s -> list_aggregate(h[s : s + 3], 'min')) END AS fps
         |  FROM hs),
         |fp AS (SELECT DISTINCT doc_id, unnest(fps) AS f FROM wins)
         |SELECT doc_id,
         |  CAST(CASE WHEN f >= $Neg THEN f - $M64 ELSE f END AS BIGINT) AS fp
         |FROM fp""".stripMargin
    },

    "q_containment_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
        |  FROM documents WHERE trim(text) <> '')
        |SELECT l.doc_id AS id_l, r.doc_id AS id_r,
        |  round(CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE) / len(l.toks), 9)
        |    AS containment_l_in_r,
        |  round(CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE) / len(r.toks), 9)
        |    AS containment_r_in_l
        |FROM t l JOIN t r
        |  ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id
        |WHERE len(list_intersect(l.toks, r.toks)) > 0
        |  AND (CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE) / len(l.toks) >= 0.5
        |    OR CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE) / len(r.toks) >= 0.5)""".stripMargin,

    // the oracle groups k-token windows by their literal text where the
    // engine groups by xxhash64 of it — identical up to 64-bit collisions
    "q_dup_spans" ->
      s"""$oracleDupSpansCte
         |SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
         |  CAST(span_end AS BIGINT) AS span_end,
         |  CAST(n_windows AS BIGINT) AS n_windows
         |FROM spans""".stripMargin,

    "q_dedup_spans_apply" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |wins AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(t[i : i + 9], ' ') AS w
        |  FROM toks, unnest(range(1, len(t) - 9 + 1)) AS u(i)),
        |own AS (
        |  SELECT w, min(doc_id) AS owner FROM wins
        |  GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
        |foreignw AS (
        |  SELECT wins.doc_id, wins.pos FROM wins JOIN own USING (w)
        |  WHERE wins.doc_id <> own.owner),
        |cov AS (
        |  SELECT DISTINCT doc_id, pos + x AS cpos
        |  FROM foreignw, unnest(range(0, 10)) AS r(x)),
        |tokpos AS (
        |  SELECT doc_id, t[i] AS tok, i - 1 AS pos
        |  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)),
        |cleaned AS (
        |  SELECT t.doc_id,
        |    coalesce(string_agg(CASE WHEN c.cpos IS NULL THEN t.tok END,
        |      ' ' ORDER BY t.pos), '') AS text_deduped,
        |    count(c.cpos) AS n_removed
        |  FROM tokpos t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
        |  GROUP BY t.doc_id)
        |SELECT d.doc_id, coalesce(cl.text_deduped, '') AS text_deduped,
        |  CAST(coalesce(cl.n_removed, 0) AS BIGINT) AS n_removed
        |FROM documents d LEFT JOIN cleaned cl ON d.doc_id = cl.doc_id""".stripMargin,

    "q_dup_token_stats" ->
      s"""$oracleDupSpansCte,
         |per_doc AS (
         |  SELECT doc_id, CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_tokens
         |  FROM spans GROUP BY doc_id),
         |counts AS (
         |  SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0
         |    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT c.doc_id, c.n_tokens, coalesce(p.dup_tokens, 0) AS dup_tokens,
         |  round(coalesce(p.dup_tokens, 0) / greatest(c.n_tokens, 1)::DOUBLE, 9)
         |    AS dup_ratio
         |FROM counts c LEFT JOIN per_doc p ON c.doc_id = p.doc_id""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id,
        |  CASE WHEN trim(text) = '' THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  len(text) AS n_chars,
        |  round(CASE WHEN len(text) = 0 THEN 0.0
        |    ELSE CAST(len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |         / len(text) END, 9) AS punct_ratio,
        |  round(CASE WHEN trim(text) = '' THEN 0.0
        |    ELSE CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |           t -> list_contains(['the','a','an','of','to','and','in','is','it','that','or'], t))) AS DOUBLE)
        |         / len(regexp_split_to_array(trim(lower(text)), '\s+')) END, 9) AS stopword_ratio,
        |  round((CASE WHEN (CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END) BETWEEN 10 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
        |    + (CASE WHEN (CASE WHEN trim(text) = '' THEN 0.0
        |         ELSE CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |              t -> list_contains(['the','a','an','of','to','and','in','is','it','that','or'], t))) AS DOUBLE)
        |              / len(regexp_split_to_array(trim(lower(text)), '\s+')) END) > 0.05 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
        |    + (CASE WHEN (CASE WHEN len(text) = 0 THEN 0.0
        |         ELSE CAST(len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |              / len(text) END) < 0.2 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END), 9) AS quality,
        |  CASE
        |    WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      t -> list_contains(['the','a','of','and','to'], t))) >=
        |      greatest(
        |        len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> list_contains(['der','die','das','und','ist'], t))),
        |        len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> list_contains(['le','la','et','les','des'], t))),
        |        len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> list_contains(['el','los','de','y','que'], t))), 1)
        |      THEN 'en'
        |    WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> list_contains(['der','die','das','und','ist'], t))) >=
        |      greatest(
        |        len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> list_contains(['le','la','et','les','des'], t))),
        |        len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> list_contains(['el','los','de','y','que'], t))), 1)
        |      THEN 'de'
        |    WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> list_contains(['le','la','et','les','des'], t))) >=
        |      greatest(
        |        len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> list_contains(['el','los','de','y','que'], t))), 1)
        |      THEN 'fr'
        |    WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> list_contains(['el','los','de','y','que'], t))) >= 1
        |      THEN 'es'
        |    ELSE 'und' END AS lang_guess,
        |  substr(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 16) AS fingerprint
        |FROM documents""".stripMargin,

    "q_ngram_pairs" ->
      s"""WITH ${shingleCte(normExtra = ", lang, source", shExtra = ", lang, source", q = 5)},
         |sets AS (SELECT doc_id, lang, source, list_distinct(gs) AS s FROM sh
         |         WHERE len(list_distinct(gs)) > 0)
         |SELECT l.doc_id AS id_l, r.doc_id AS id_r,
         |  round(CAST(len(list_intersect(l.s, r.s)) AS DOUBLE)
         |    / (len(l.s) + len(r.s) - len(list_intersect(l.s, r.s))), 9) AS jaccard
         |FROM sets l JOIN sets r
         |  ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id
         |WHERE CAST(len(list_intersect(l.s, r.s)) AS DOUBLE)
         |    / (len(l.s) + len(r.s) - len(list_intersect(l.s, r.s))) >= 0.1""".stripMargin,

    "q_jaccard_pairs" ->
      """SELECT l.doc_id AS id_l, r.doc_id AS id_r,
        |  round(CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
        |    / (len(l.toks) + len(r.toks) - len(list_intersect(l.toks, r.toks))), 9) AS jaccard
        |FROM
        |  (SELECT doc_id, lang, source, CAST(floor(n_chars / 50) AS BIGINT) AS bucket,
        |     list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
        |   FROM documents) l
        |JOIN
        |  (SELECT doc_id, lang, source, CAST(floor(n_chars / 50) AS BIGINT) AS bucket,
        |     list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
        |   FROM documents) r
        |  ON l.lang = r.lang AND l.source = r.source AND l.bucket = r.bucket
        | AND l.doc_id < r.doc_id
        |WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
        |    / (len(l.toks) + len(r.toks) - len(list_intersect(l.toks, r.toks))) >= 0.35""".stripMargin,

    // CAST to DOUBLE[] is load-bearing: list_cosine_similarity on FLOAT[]
    // accumulates in float32 and diverges from Spark's double math.
    "q_ann_topk" ->
      """SELECT q.vec_id AS query_id, c.vec_id AS neighbour_id,
        |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 9) AS cosine,
        |  CAST(row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 9) DESC,
        |             c.vec_id ASC) AS INT) AS rank
        |FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |WHERE q.vec_id < 10
        |QUALIFY rank <= 5""".stripMargin,

    "q_ann_ivf" ->
      """SELECT q.vec_id AS query_id, c.vec_id AS neighbour_id,
        |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 9) AS cosine,
        |  CAST(row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 9) DESC,
        |             c.vec_id ASC) AS INT) AS rank
        |FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |WHERE q.vec_id < 10
        |QUALIFY rank <= 5""".stripMargin,

    // Hyperplane-LSH replay: the 64 seeded planes are regenerated here via
    // the same AnnOps.hyperplanes call the engine uses, and the dot
    // products fold in the same left-to-right double order as Spark's
    // aggregate(zip_with(...)) — float->double widening and double ops are
    // both exact/correctly-rounded, so every signature bit matches.
    "q_ann_lsh" -> {
      val planeRows = (for {
        t <- 0 until 8
        (plane, b) <- AnnOps.hyperplanes(64, 8, 42L + t).zipWithIndex
      } yield s"($t, ${1L << b}::BIGINT, [${plane.mkString(", ")}]::DOUBLE[])")
        .mkString(",\n  ")
      s"""WITH planes AS (SELECT * FROM (VALUES
         |  $planeRows) p(t, bit, plane)),
         |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |dots AS (SELECT vec_id, t, bit,
         |  list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(range(1, 65), i -> v[CAST(i AS INT)] * plane[CAST(i AS INT)])),
         |    (acc, x) -> acc + x) AS d
         |  FROM vecs CROSS JOIN planes),
         |sigs AS (SELECT vec_id, t,
         |    CAST(SUM(CASE WHEN d > 0 THEN bit ELSE 0 END) AS BIGINT) AS sig
         |  FROM dots GROUP BY vec_id, t),
         |cands AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbour_id
         |  FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
         |    AND q.vec_id != c.vec_id
         |  WHERE q.vec_id < 10)
         |SELECT query_id, neighbour_id,
         |  round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]), CAST(ce.embedding AS DOUBLE[])), 9) AS cosine,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]), CAST(ce.embedding AS DOUBLE[])), 9) DESC,
         |             neighbour_id ASC) AS INT) AS rank
         |FROM cands JOIN embeddings qe ON cands.query_id = qe.vec_id
         |           JOIN embeddings ce ON cands.neighbour_id = ce.vec_id
         |QUALIFY rank <= 5""".stripMargin
    },

    "q_embed_pairs" ->
      """SELECT l.vec_id AS id_l, r.vec_id AS id_r,
        |  round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])), 9) AS cosine
        |FROM embeddings l JOIN embeddings r
        |  ON l.label = r.label AND l.vec_id < r.vec_id
        |WHERE l.vec_id % 20 = 0 AND r.vec_id % 20 = 0
        |  AND round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])), 9) >= 0.2""".stripMargin,

    "q_contamination" ->
      s"""WITH $wordGramCte
         |probe AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 20 = 0),
         |cg AS (SELECT doc_id, unnest(gs) AS gram FROM g),
         |hits AS (SELECT doc_id, count(*) AS n_hits,
         |    count(DISTINCT gram) AS n_distinct_hits
         |  FROM cg JOIN probe USING (gram) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
         |  coalesce(h.n_distinct_hits, CAST(0 AS BIGINT)) AS n_distinct_hits
         |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,

    "q_tfidf" ->
      """WITH tk AS (SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(t) AS term FROM tk),
        |dt AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS doc_freq FROM dt GROUP BY term),
        |n AS (SELECT count(*) AS nn FROM documents)
        |SELECT doc_id, term, tf, doc_freq,
        |  round(tf * (ln((nn + 1)::DOUBLE / (doc_freq + 1)) + 1), 9) AS score,
        |  CAST(rank AS INT) AS rank
        |FROM (
        |  SELECT dt.doc_id, dt.term, dt.tf, dfreq.doc_freq, nn,
        |    row_number() OVER (PARTITION BY dt.doc_id
        |      ORDER BY dt.tf DESC, dfreq.doc_freq ASC, dt.term ASC) AS rank
        |  FROM dt JOIN dfreq USING (term) CROSS JOIN n) x
        |WHERE rank <= 3""".stripMargin,

    "q_doc_chunks" ->
      """WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents WHERE len(text) > 0),
        |c AS (SELECT doc_id, text,
        |    unnest(range(0, 1 + CAST(ceil(greatest(n - 80, 0)::DOUBLE / 60) AS BIGINT))) AS chunk_id
        |  FROM d)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  substr(text, CAST(chunk_id * 60 + 1 AS INT), 80) AS chunk_text,
        |  CAST(len(substr(text, CAST(chunk_id * 60 + 1 AS INT), 80)) AS INT) AS chunk_chars
        |FROM c""".stripMargin,

    "q_pii" -> {
      val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val ipv4 = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""
      val phone = """\+[0-9]{2}[0-9 -]{7,12}[0-9]"""
      val ssn = """\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"""
      s"""WITH inj AS (SELECT doc_id, concat(text,
         |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END,
         |    CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.7' ELSE '' END,
         |    CASE WHEN doc_id % 7 = 0 THEN ' call +44 7700 900' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ELSE '' END,
         |    CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END) AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$email')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$ipv4')) AS INT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(t, '$phone')) AS INT) AS n_phones,
         |  CAST(len(regexp_extract_all(t, '$ssn')) AS INT) AS n_ssn,
         |  (len(regexp_extract_all(t, '$email')) + len(regexp_extract_all(t, '$ipv4'))
         |   + len(regexp_extract_all(t, '$phone')) + len(regexp_extract_all(t, '$ssn'))) > 0 AS any_pii,
         |  substr(md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$email', '<EMAIL>', 'g'), '$ipv4', '<IP>', 'g'),
         |    '$phone', '<PHONE>', 'g'), '$ssn', '<SSN>', 'g')), 1, 16) AS redacted_fp
         |FROM inj""".stripMargin
    },

    "q_repetition" ->
      """WITH tk AS (SELECT doc_id, text,
        |    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tl,
        |    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS tr
        |  FROM documents),
        |g AS (SELECT doc_id, text, tl, tr,
        |    CASE WHEN len(tl) < 2 THEN []::VARCHAR[]
        |         ELSE list_transform(range(1, len(tl)), i -> concat_ws(' ', tl[i], tl[i+1])) END AS bg
        |  FROM tk)
        |SELECT doc_id,
        |  round(CASE WHEN len(tl) = 0 THEN 0.0
        |    ELSE (len(tl) - len(list_distinct(tl)))::DOUBLE / len(tl) END, 9) AS dup_token_ratio,
        |  round(CASE WHEN len(bg) = 0 THEN 0.0
        |    ELSE (len(bg) - len(list_distinct(bg)))::DOUBLE / len(bg) END, 9) AS dup_bigram_ratio,
        |  CAST(CASE WHEN len(tr) = 0 THEN 0
        |    ELSE list_max(list_transform(tr, x -> len(x))) END AS INT) AS max_word_len,
        |  round(CASE WHEN len(text) = 0 THEN 0.0
        |    ELSE (len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / len(text) END, 9) AS digit_ratio
        |FROM g""".stripMargin,

    // packing: same md5 bucket, same per-bucket cumulative token sum; all
    // output columns are integers so the hash compare is exact
    "q_pack" ->
      """WITH tk AS (SELECT doc_id,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS bucket
        |  FROM documents),
        |c AS (SELECT doc_id, bucket, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) - n_tokens AS BIGINT) AS strt
        |  FROM tk)
        |SELECT doc_id, bucket, n_tokens,
        |  CAST(floor(strt / 512) AS BIGINT) AS seq_id,
        |  strt % 512 AS seq_offset
        |FROM c""".stripMargin,

    "q_mix" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT <
        |  CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25
        |       WHEN 'de' THEN 0.125 ELSE 0.75 END * 4294967296 AS BIGINT)""".stripMargin,

    // m-from-label-column: pairs on label equality -> gamma CASE -> per-
    // level share of non-null gammas; unobserved levels get the 1e-6
    // sentinel exactly as Model.medianObserved does
    "q_m_from_labels" ->
      s"""WITH lab AS (SELECT c_custkey, c_name, c_acctbal,
         |    concat_ws('|', c_nationkey, c_mktsegment) AS label FROM customer),
         |g AS (SELECT
         |    $oracleGammaName AS g_name,
         |    $oracleGammaBal AS g_bal
         |  FROM lab l JOIN lab r ON l.label = r.label AND l.c_custkey < r.c_custkey),
         |lv AS (SELECT * FROM (VALUES ('c_name', 3), ('c_name', 2), ('c_name', 1), ('c_name', 0),
         |    ('c_acctbal', 2), ('c_acctbal', 1), ('c_acctbal', 0)) AS t(comparison, gamma)),
         |cnt AS (
         |  SELECT 'c_name' AS comparison, g_name AS gamma, count(*) AS n
         |  FROM g WHERE g_name >= 0 GROUP BY g_name
         |  UNION ALL
         |  SELECT 'c_acctbal', g_bal, count(*) FROM g WHERE g_bal >= 0 GROUP BY g_bal),
         |tot AS (SELECT comparison, CAST(sum(n) AS DOUBLE) AS total FROM cnt GROUP BY comparison)
         |SELECT lv.comparison, CAST(lv.gamma AS INT) AS gamma,
         |  CASE WHEN coalesce(cnt.n, 0) = 0 THEN 1e-6 ELSE cnt.n / tot.total END AS m
         |FROM lv
         |LEFT JOIN cnt ON lv.comparison = cnt.comparison AND lv.gamma = cnt.gamma
         |LEFT JOIN tot ON lv.comparison = tot.comparison""".stripMargin,

    // One EM iteration in SQL: rule-1 pairs -> gamma patterns -> E-step
    // probability per pattern from the literal init m/u/λ -> M-step
    // shares and λ. Literals are cast to DOUBLE so both engines run the
    // same IEEE arithmetic; outputs round to 9 decimals on both sides.
    "q_em_mstep" -> emMstepOracleSql,

    "q_em_mstep_dist" -> emMstepOracleSql,

    "q_em_train" -> emTrainOracleSql(3),

    // estimate-u replay: portable-hash sample (trunc to match Scala's
    // toLong), cartesian l<r, u = per-level share of non-null gammas;
    // identical integer counts divide on both sides, so no rounding.
    "q_estimate_u" ->
      s"""WITH c AS (
         |  SELECT * FROM customer
         |  WHERE (SELECT count(*) FROM customer) <= 1415
         |     OR ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
         |        < CAST(trunc(1415.0 / (SELECT count(*) FROM customer) * 4294967296.0) AS BIGINT)),
         |g AS (
         |  SELECT $oracleGammaName AS gn, $oracleGammaBal AS gb
         |  FROM c l JOIN c r ON l.c_custkey < r.c_custkey),
         |cnt AS (
         |  SELECT 'c_name' AS comparison, gn AS gamma, count(*) AS n
         |  FROM g WHERE gn >= 0 GROUP BY gn
         |  UNION ALL
         |  SELECT 'c_acctbal', gb, count(*) FROM g WHERE gb >= 0 GROUP BY gb),
         |tot AS (SELECT comparison, CAST(sum(n) AS DOUBLE) AS total
         |        FROM cnt GROUP BY comparison),
         |lv AS (SELECT * FROM (VALUES ('c_name', 3), ('c_name', 2), ('c_name', 1), ('c_name', 0),
         |    ('c_acctbal', 2), ('c_acctbal', 1), ('c_acctbal', 0)) AS t(comparison, gamma))
         |SELECT lv.comparison, CAST(lv.gamma AS INT) AS gamma,
         |  CASE WHEN coalesce(cnt.n, 0) = 0 THEN 1e-6 ELSE cnt.n / tot.total END AS u
         |FROM lv
         |LEFT JOIN cnt ON lv.comparison = cnt.comparison AND lv.gamma = cnt.gamma
         |LEFT JOIN tot ON lv.comparison = tot.comparison""".stripMargin,

    // λ from deterministic rules: same two blocking rules as the pairs
    // CTE; λ = (observed/recall)/((n*(n-1))/2) clamped to [1e-32, 1]
    "q_lambda" ->
      s"""$oraclePairsCte,
         |stats AS (SELECT (SELECT count(*) FROM pairs) AS observed,
         |                 (SELECT count(*) FROM customer) AS n)
         |SELECT observed AS observed_pairs, n AS n_records,
         |  greatest(least(1.0::DOUBLE, (observed::DOUBLE / 0.8::DOUBLE) / ((n::DOUBLE * (n::DOUBLE - 1)) / 2.0::DOUBLE)), 1e-32) AS lambda
         |FROM stats""".stripMargin,

    // SemDeDup replay: portable-hash bottom-8 seeds (rank = cell), argmax-
    // cosine assignment (9dp-rounded, ties to lower cell), within-cell
    // pairs >= 0.3, recursive min-label closure (same CTE as q_dedup_docs)
    "q_semantic_dedup" ->
      """WITH RECURSIVE h AS (SELECT vec_id, embedding,
        |    ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS hh FROM embeddings),
        |seeds AS (SELECT CAST(row_number() OVER (ORDER BY hh, vec_id) AS INT) - 1 AS cell,
        |    embedding AS sv
        |  FROM h ORDER BY hh, vec_id LIMIT 8),
        |assign AS (SELECT v.vec_id, v.embedding,
        |    (SELECT s.cell FROM seeds s
        |     ORDER BY round(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]), CAST(s.sv AS DOUBLE[])), 9) DESC, s.cell
        |     LIMIT 1) AS cell FROM h v),
        |pairs AS (SELECT l.vec_id AS id_l, r.vec_id AS id_r
        |  FROM assign l JOIN assign r ON l.cell = r.cell AND l.vec_id < r.vec_id
        |  WHERE round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])), 9) >= 0.3),
        |edges AS (SELECT id_l AS a, id_r AS b FROM pairs UNION ALL SELECT id_r, id_l FROM pairs),
        |reach(n, m) AS (SELECT vec_id, vec_id FROM embeddings
        |  UNION SELECT e.a, reach.m FROM edges e JOIN reach ON reach.n = e.b)
        |SELECT n AS vec_id, min(m) AS canonical_id,
        |  CAST(CASE WHEN n = min(m) THEN 1 ELSE 0 END AS INT) AS keep
        |FROM reach GROUP BY n""".stripMargin,

    // int8 quantisation replay: unit-normalise in double, 9dp-round, then
    // integer round — identical grid to the engine; dot products and ranks
    // are exact integer math from there on
    "q_ann_int8" ->
      """WITH qn AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(round(round(x / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * 127.0, 9)) AS INT)) AS qv
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, qv FROM qn WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbour_id, qv AS cv FROM qn),
        |scored AS (SELECT query_id, neighbour_id,
        |    CAST(round(list_inner_product(CAST(q.qv AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))) AS BIGINT) AS dot_i8
        |  FROM c, q WHERE query_id <> neighbour_id),
        |ranked AS (SELECT query_id, neighbour_id, dot_i8,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot_i8 DESC, neighbour_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, neighbour_id, dot_i8, rank FROM ranked WHERE rank <= 5""".stripMargin,

    // sessionization replay: same (ts, event_id) order, 30-min gap rule,
    // cumulative session counter, per-session integer-safe aggregates
    "q_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
        |m AS (SELECT user_id, event_id, t, value,
        |    CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
        |          OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e),
        |s AS (SELECT user_id, t, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM m)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(t) AS start_us, max(t) AS end_us,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros
        |FROM s GROUP BY 1, 2""".stripMargin,

    // as-of replay: DuckDB's native ASOF LEFT JOIN against the same
    // (user, ts)-unique purchase frame — checks the union-merge plan's
    // output, including same-instant inclusivity and no-match nulls
    "q_asof" ->
      """WITH clicks AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, epoch_us(ts) AS p_ts,
        |    max(event_id) AS purchase_id,
        |    max(CAST(floor(value * 1000000) AS BIGINT)) AS purchase_micros
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.ts_us, p.purchase_id, p.purchase_micros
        |FROM clicks c ASOF LEFT JOIN p
        |  ON c.user_id = p.p_user AND c.ts_us >= p.p_ts""".stripMargin,

    // split-ladder replay: same md5-prefix hash, same integer thresholds
    "q_splits" -> {
      val t1 = (0.8 * 4294967296.0).toLong
      val t2 = (0.9 * 4294967296.0).toLong
      s"""SELECT doc_id,
         |  CASE WHEN h < $t1 THEN 'train'
         |       WHEN h < $t2 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
         |  FROM documents)""".stripMargin
    },

    // histogram replay: full predict mw (same CTEs as q_predict), 6dp
    // rounding, half-unit bins
    "q_mw_histogram" ->
      s"""$oraclePairsCte,
         |cv AS (
         |  SELECT p.uid_l, p.uid_r,
         |    $oracleGammaName AS g_name,
         |    $oracleGammaBal AS g_bal
         |  FROM pairs p
         |  JOIN customer l ON p.uid_l = l.c_custkey
         |  JOIN customer r ON p.uid_r = r.c_custkey),
         |mw AS (SELECT round($oracleCustomerMw, 6) AS mwr FROM cv)
         |SELECT CAST(floor(mwr * 2) AS BIGINT) AS bin,
         |  CAST(floor(mwr * 2) AS DOUBLE) / 2 AS bin_start,
         |  count(*) AS n_pairs
         |FROM mw GROUP BY 1, 2""".stripMargin,

    // sorted-neighbourhood replay: one global row_number (fine at sf0.01;
    // the ENGINE does the two-pass distributed rank instead), rank-window
    // self-join
    "q_snm_pairs" ->
      """WITH ranked AS (SELECT c_custkey AS id,
        |    row_number() OVER (ORDER BY c_mktsegment, c_acctbal, c_custkey) AS rn
        |  FROM customer)
        |SELECT l.id AS id_l, r.id AS id_r, CAST(r.rn - l.rn AS INT) AS rank_distance
        |FROM ranked l JOIN ranked r ON r.rn > l.rn AND r.rn <= l.rn + 3""".stripMargin,

    // top-clusters replay: per-customer order paths ARE the components
    // (cluster id = min orderkey; n-1 path edges), size-desc/id-asc top 15
    "q_top_clusters" ->
      """WITH c AS (SELECT o_custkey, count(*) AS n, min(o_orderkey) AS cid
        |  FROM orders GROUP BY o_custkey HAVING count(*) >= 2)
        |SELECT cid AS cluster_id, n AS n_nodes, n - 1 AS n_edges
        |FROM c ORDER BY n DESC, cid LIMIT 15""".stripMargin,

    // cluster-sampling replay: per-customer order paths are the
    // components (cid = min orderkey, n nodes, n-1 edges); "random" ranks
    // by the same seeded md5-prefix portable hash, lowest-density by
    // 2E/(n(n-1)) with the n>2 filter and cid tie-break
    "q_cluster_sample" ->
      """WITH c AS (SELECT count(*) AS n, min(o_orderkey) AS cid
        |  FROM orders GROUP BY o_custkey HAVING count(*) >= 2),
        |m AS (SELECT cid, n,
        |  (n - 1)::DOUBLE * 2 / (n * (n - 1)) AS density FROM c)
        |SELECT * FROM (
        |  SELECT 'random' AS method, cid AS cluster_id FROM m
        |  ORDER BY ('0x' || substr(md5('42-' || CAST(cid AS VARCHAR)), 1, 8))::BIGINT,
        |           cid LIMIT 5)
        |UNION ALL
        |SELECT * FROM (
        |  SELECT 'lowest_density' AS method, cid AS cluster_id FROM m
        |  WHERE n > 2 ORDER BY density, cid LIMIT 5)
        |UNION ALL
        |SELECT 'by_cluster_ids' AS method, cid AS cluster_id FROM (
        |  SELECT cid FROM m ORDER BY n DESC, cid LIMIT 3)""".stripMargin,

    // token histogram replay: same whitespace token count, 16-wide bins
    "q_tokens_hist" ->
      """SELECT CAST(floor((CASE WHEN trim(text) = '' THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END) / 16.0) AS BIGINT) AS bin,
        |  count(*) AS n_docs,
        |  CAST(floor((CASE WHEN trim(text) = '' THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END) / 16.0) AS BIGINT) * 16 AS bin_start
        |FROM documents GROUP BY 1, 3""".stripMargin,

    // flagship pipeline replay: q_predict's weight CASE -> overflow-safe
    // sigmoid rounded to 6dp -> edges at >= 0.9 -> recursive min-label
    // closure seeded with every customer (singletons keep themselves)
    "q_cluster_records" ->
      s"""WITH RECURSIVE pairs0 AS (
         |  SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r,
         |    $oracleGammaName AS g_name, $oracleGammaBal AS g_bal
         |  FROM customer l JOIN customer r
         |    ON ((l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment)
         |        OR (l.c_nationkey = r.c_nationkey AND round(l.c_acctbal, -2) = round(r.c_acctbal, -2)))
         |   AND l.c_custkey < r.c_custkey),
         |mw AS (SELECT uid_l, uid_r, $oracleCustomerMw AS mwv FROM pairs0),
         |strong AS (SELECT uid_l, uid_r FROM mw
         |  WHERE round(CASE WHEN mwv >= 0 THEN 1.0/(1.0 + power(2.0, -mwv))
         |        ELSE power(2.0, mwv)/(1.0 + power(2.0, mwv)) END, 6) >= 0.9),
         |edges AS (SELECT uid_l AS a, uid_r AS b FROM strong
         |          UNION ALL SELECT uid_r, uid_l FROM strong),
         |reach(n, m) AS (SELECT c_custkey, c_custkey FROM customer
         |  UNION
         |  SELECT e.a, reach.m FROM edges e JOIN reach ON reach.n = e.b)
         |SELECT n AS uid, CAST(min(m) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY n""".stripMargin,

    // ColumnExpression replay: DuckDB equivalents of every transform;
    // regexp_extract returns '' on no match in both engines, so the
    // NULLIF('') wrap behaves identically
    "q_colexpr" ->
      """SELECT c_custkey,
        |  substring(lower(c_name), 1, 8) AS name_lo,
        |  nullif(regexp_extract(c_name, '[0-9]+', 0), '') AS digits,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_nn,
        |  CAST(c_nationkey AS VARCHAR) AS nk_str,
        |  CAST(try_strptime(
        |    CASE WHEN c_custkey % 10 = 0 THEN 'not-a-date'
        |         ELSE '2020-01-' || lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0') END,
        |    '%Y-%m-%d') AS DATE) AS parsed_date
        |FROM customer""".stripMargin,

    // link_only replay: cross-dataset pairs (even = a, odd = b) under both
    // rules with NOT-previous, scored with the q_predict weight CASE
    "q_link_only" -> {
      s"""WITH pairs AS (
         |  SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r
         |  FROM customer l JOIN customer r
         |    ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
         |   AND l.c_custkey % 2 = 0 AND r.c_custkey % 2 = 1
         |  UNION ALL
         |  SELECT l.c_custkey, r.c_custkey
         |  FROM customer l JOIN customer r
         |    ON l.c_nationkey = r.c_nationkey AND round(l.c_acctbal, -2) = round(r.c_acctbal, -2)
         |   AND l.c_custkey % 2 = 0 AND r.c_custkey % 2 = 1
         |   AND NOT coalesce(l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment, false)
         |),
         |cv AS (
         |  SELECT p.uid_l, p.uid_r,
         |    $oracleGammaName AS g_name,
         |    $oracleGammaBal AS g_bal
         |  FROM pairs p
         |  JOIN customer l ON p.uid_l = l.c_custkey
         |  JOIN customer r ON p.uid_r = r.c_custkey),
         |mw AS (SELECT uid_l, uid_r, $oracleCustomerMw AS mwv FROM cv)
         |SELECT 'a' AS source_dataset_l, 'b' AS source_dataset_r,
         |  uid_l, uid_r, round(mwv, 6) AS match_weight
         |FROM mw""".stripMargin
    },

    // incremental near-dup replay: same banded signatures, candidates are
    // probe x corpus bucket collisions (no id ordering constraint)
    "q_near_dups" ->
      s"""WITH $minhashBandCtes,
         |cands AS (SELECT DISTINCT p.doc_id AS probe_id, c.doc_id AS corpus_id
         |  FROM bands p JOIN bands c
         |    ON p.band = c.band AND p.bkey = c.bkey
         |   AND p.doc_id % 20 = 0 AND c.doc_id % 20 <> 0)
         |SELECT n.probe_id, n.corpus_id,
         |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 9) AS jaccard
         |FROM cands n JOIN sets a ON n.probe_id = a.doc_id
         |             JOIN sets b ON n.corpus_id = b.doc_id
         |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5""".stripMargin,

    // AUC replay: same truth-space CTEs as q_truth_space, then the
    // trapezoid over (FPR, TPR) ordered by descending threshold
    "q_auc" ->
      s"""$oraclePairsCte,
         |cv AS (
         |  SELECT p.uid_l, p.uid_r,
         |    $oracleGammaName AS g_name, $oracleGammaBal AS g_bal,
         |    CASE WHEN l.c_mktsegment = r.c_mktsegment THEN 1 ELSE 0 END AS pos
         |  FROM pairs p
         |  JOIN customer l ON p.uid_l = l.c_custkey
         |  JOIN customer r ON p.uid_r = r.c_custkey),
         |mw AS (
         |  SELECT round($oracleCustomerMw, 6) AS truth_threshold, pos
         |  FROM cv),
         |tot AS (SELECT sum(pos) AS total_p, sum(1 - pos) AS total_n FROM mw),
         |cum AS (SELECT truth_threshold,
         |          sum(sum(pos)) OVER (ORDER BY truth_threshold DESC
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         |          sum(sum(1 - pos)) OVER (ORDER BY truth_threshold DESC
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
         |        FROM mw GROUP BY truth_threshold),
         |pts AS (SELECT truth_threshold,
         |          CASE WHEN (SELECT total_n FROM tot) > 0
         |               THEN fp::DOUBLE / (SELECT total_n FROM tot) ELSE 0.0 END AS fpr,
         |          CASE WHEN (SELECT total_p FROM tot) > 0
         |               THEN tp::DOUBLE / (SELECT total_p FROM tot) ELSE 0.0 END AS tpr
         |        FROM cum),
         |seg AS (SELECT (fpr - coalesce(lag(fpr) OVER (ORDER BY truth_threshold DESC), 0.0))
         |          * (tpr + coalesce(lag(tpr) OVER (ORDER BY truth_threshold DESC), 0.0)) / 2 AS s
         |        FROM pts)
         |SELECT round(sum(s), 9) AS auc FROM seg""".stripMargin,

    // quality-classifier replay: same 9dp-rounded features, same fixed
    // term order; keep thresholds the UNROUNDED score like the engine
    "q_quality_classify" ->
      """WITH f AS (SELECT doc_id,
        |    (CASE WHEN trim(text) = '' THEN 0
        |          ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS n_tokens,
        |    len(text) AS n_chars,
        |    round(CASE WHEN len(text) = 0 THEN 0.0
        |      ELSE CAST(len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |           / len(text) END, 9) AS punct_ratio,
        |    round(CASE WHEN trim(text) = '' THEN 0.0
        |      ELSE CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |             t -> list_contains(['the','a','an','of','to','and','in','is','it','that','or'], t))) AS DOUBLE)
        |           / len(regexp_split_to_array(trim(lower(text)), '\s+')) END, 9) AS stopword_ratio
        |  FROM documents),
        |z AS (SELECT doc_id,
        |    (-0.25)::DOUBLE + n_tokens * (0.01)::DOUBLE + n_chars * (-0.001)::DOUBLE
        |      + punct_ratio * (-2.0)::DOUBLE + stopword_ratio * (3.0)::DOUBLE AS zv
        |  FROM f)
        |SELECT doc_id, round(zv, 9) AS score,
        |  CAST(CASE WHEN zv >= 0.0 THEN 1 ELSE 0 END AS INT) AS keep
        |FROM z""".stripMargin
  )

  /** Word-token and 3-gram lists of every document (DuckDB): `g(doc_id, gs)`
    * with gs = space-joined word 3-grams of the lowercased text.
    * Trim/split semantics deliberately mirror the Spark-side
    * `word_ngram_hashes` kernel (ShingleKernel.normalize): Java
    * `String.trim` drops ALL chars <= U+0020 from both ends (a plain SQL
    * `trim` is space-only and would keep an empty leading token for text
    * starting with a tab/newline), and Java regex `\s` is exactly
    * `[ \t\n\x0B\f\r]` (RE2's `\s` lacks \x0B). */
  private val wordGramCte: String =
    """tk0 AS (SELECT doc_id,
      |    regexp_replace(text, '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g') AS tt
      |  FROM documents),
      |tk AS (SELECT doc_id,
      |    CASE WHEN tt = '' THEN []::VARCHAR[]
      |         ELSE regexp_split_to_array(lower(tt), '[\t\n\x0B\f\r ]+') END AS t
      |  FROM tk0),
      |g AS (SELECT doc_id,
      |    CASE WHEN len(t) < 3 THEN []::VARCHAR[]
      |         ELSE list_transform(range(1, len(t) - 1), i -> concat_ws(' ', t[i], t[i+1], t[i+2])) END AS gs
      |  FROM tk),""".stripMargin
}
