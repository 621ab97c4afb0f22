package graft.evaluation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model._

/**
 * Evaluation and diagnostics operators (reference:
 * `splink/internals/accuracy.py`, `unlinkables.py`,
 * `comparison_vector_distribution.py`, `completeness.py`,
 * `profile_data.py`, `blocking_analysis.py`).
 */
object Evaluation {

  /**
   * Truth-space table (`accuracy.py:26-229`): one row per distinct score
   * threshold with TP/FP/TN/FN and derived metrics, computed in one pass
   * with cumulative windows (no per-threshold rescan).
   *
   * @param scored pairwise frame with `match_weight` and a boolean/0-1
   *               `clerical_match` ground-truth column
   */
  def truthSpaceTable(scored: DataFrame,
      clericalCol: String = "clerical_match"): DataFrame = {
    val truth = scored.select(
      round(col(Cols.MatchWeight), 6).as("truth_threshold"),
      col(clericalCol).cast("int").as("pos"))
    val byThreshold = truth.groupBy("truth_threshold")
      .agg(sum("pos").as("p_at"), sum(lit(1) - col("pos")).as("n_at"))
    // pairs scored at or ABOVE each threshold are predicted matches.
    // Totals come from a whole-frame window over the (small) per-threshold
    // aggregate — NOT a second scan of the scored pairs.
    val w = Window.orderBy(desc("truth_threshold"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byThreshold
      .withColumn("tp", sum("p_at").over(w))
      .withColumn("fp", sum("n_at").over(w))
      .withColumn("total_p", sum("p_at").over(wAll))
      .withColumn("total_n", sum("n_at").over(wAll))
      .withColumn("fn", col("total_p") - col("tp"))
      .withColumn("tn", col("total_n") - col("fp"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))).otherwise(0.0))
      .withColumn("recall",
        when(col("total_p") > 0,
          col("tp").cast("double") / col("total_p")).otherwise(0.0))
      .withColumn("specificity",
        when(col("total_n") > 0,
          col("tn").cast("double") / col("total_n")).otherwise(0.0))
      .withColumn("f1",
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          lit(2.0) * col("tp") / (lit(2) * col("tp") + col("fp") + col("fn")))
          .otherwise(0.0))
      .select("truth_threshold", "tp", "fp", "tn", "fn",
        "precision", "recall", "specificity", "f1")
  }

  /** ROC AUC from a [[truthSpaceTable]] frame: trapezoidal area over the
    * (FPR, TPR) curve traced by descending thresholds (the summary scalar
    * of the reference's roc_chart). The window and sum run over the
    * per-threshold aggregate — |distinct scores| rows, never the pairs. */
  def aucFromTruthSpace(truthSpace: DataFrame): DataFrame = {
    val pts = truthSpace.select(
      col("truth_threshold"),
      when(col("fp") + col("tn") > 0,
        col("fp").cast("double") / (col("fp") + col("tn")))
        .otherwise(0.0).as("fpr"),
      when(col("tp") + col("fn") > 0,
        col("tp").cast("double") / (col("tp") + col("fn")))
        .otherwise(0.0).as("tpr"))
    val w = Window.orderBy(desc("truth_threshold"))
    pts
      .withColumn("seg",
        (col("fpr") - coalesce(lag("fpr", 1).over(w), lit(0.0))) *
        (col("tpr") + coalesce(lag("tpr", 1).over(w), lit(0.0))) / 2)
      .agg(round(sum("seg"), 9).as("auc"))
  }

  /** Label pairs from a ground-truth label column: clerical_match = 1 iff
    * both sides share the label (`accuracy.py` labels_column path). */
  def withClericalFromLabelColumn(scored: DataFrame, labelCol: String): DataFrame =
    scored.withColumn("clerical_match",
      (col(Cols.l(labelCol)) === col(Cols.r(labelCol))).cast("int"))

  /**
   * Unlinkables chart data (`unlinkables.py:12-59`): score every record
   * against itself; the cumulative distribution of self-match weights shows
   * what share of records could never reach a given threshold.
   */
  def unlinkables(selfScored: DataFrame): DataFrame = {
    val rounded = selfScored.select(
      round(col(Cols.MatchWeight), 2).as("match_weight"),
      round(col(Cols.MatchProbability), 5).as("match_probability"))
    val total = rounded.count().toDouble
    val w = Window.orderBy("match_weight")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rounded.groupBy("match_weight")
      .agg(max("match_probability").as("match_probability"),
        count(lit(1)).as("cnt"))
      .withColumn("prop", col("cnt") / total)
      .withColumn("cum_prop", sum("prop").over(w))
      .select("match_weight", "match_probability", "prop", "cum_prop")
  }

  /** Comparison-vector distribution
    * (`comparison_vector_distribution.py:10-30`). */
  def comparisonVectorDistribution(cv: DataFrame,
      settings: LinkSettings): DataFrame = {
    val gammaCols = settings.comparisons.map(_.gammaColumnName)
    cv.groupBy(gammaCols.map(col): _*).agg(count(lit(1)).as("count"))
  }

  /** Completeness per column per source dataset (`completeness.py:20-109`). */
  def completeness(concat: DataFrame, settings: LinkSettings,
      columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns
      else concat.columns.toSeq.filterNot(c =>
        c == settings.uniqueIdColumn || c == settings.sourceDatasetColumn)
    val sd = if (concat.columns.contains(settings.sourceDatasetColumn))
      col(settings.sourceDatasetColumn) else lit("all")
    cols.map { c =>
      concat.groupBy(sd.as("source_dataset"))
        .agg(count(lit(1)).as("total_rows"), count(col(c)).as("non_null_rows"))
        .withColumn("column_name", lit(c))
        .withColumn("completeness",
          col("non_null_rows").cast("double") / col("total_rows"))
    }.reduce(_.unionByName(_))
      .select("source_dataset", "column_name", "total_rows",
        "non_null_rows", "completeness")
  }

  /** Column value profiling: top-N values by frequency per column
    * (`profile_data.py:105-208`). */
  def profileColumns(df: DataFrame, columns: Seq[String], topN: Int = 20): DataFrame =
    columns.map { c =>
      val counts = df.filter(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("value"))
        .agg(count(lit(1)).as("value_count"))
      val w = Window.orderBy(desc("value_count"), asc("value"))
      counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topN)
        .withColumn("column_name", lit(c))
        .select("column_name", "value", "value_count", "rank")
    }.reduce(_.unionByName(_))

  /** Value-frequency distribution / percentile table per column
    * (`profile_data.py:105-208`, percentile cumsum `:119-132`): one row per
    * distinct VALUE COUNT with how many values share it and the cumulative
    * share of non-null rows covered by values at least that frequent.
    * Grouping by count (not value) keeps the result deterministic under
    * ties and tiny — at 100 TB the window runs over |distinct counts| rows,
    * never the data. */
  def profileDistribution(df: DataFrame, columns: Seq[String]): DataFrame =
    columns.map { c =>
      val counts = df.filter(col(c).isNotNull)
        .groupBy(col(c))
        .agg(count(lit(1)).as("value_count"))
      val byCount = counts.groupBy("value_count")
        .agg(count(lit(1)).as("n_values"))
        .withColumn("rows_at_count", col("value_count") * col("n_values"))
      val w = Window.orderBy(desc("value_count"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      byCount
        .withColumn("cum_rows", sum("rows_at_count").over(w))
        .withColumn("percentile",
          col("cum_rows").cast("double") / sum("rows_at_count").over(wAll))
        .withColumn("column_name", lit(c))
        .select("column_name", "value_count", "n_values", "cum_rows", "percentile")
    }.reduce(_.unionByName(_))

  /** TF-adjustment chart data (`term_frequencies.py:146-153`): the N most-
    * and least-frequent values per TF column with their relative term
    * frequency — the diagnostic users consult when a TF-adjusted name
    * column misbehaves. Ranks tie-break on the value string, so the output
    * is deterministic. */
  def tfChartData(df: DataFrame, columns: Seq[String], n: Int = 10): DataFrame =
    columns.map { c =>
      val counts = df.filter(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("value"))
        .agg(count(lit(1)).as("value_count"))
      val total = counts.agg(sum("value_count").as("__total"))
      // orderBy+limit is a distributed TakeOrdered (per-partition top-k then
      // merge) — never a global sort/row_number over all distinct values;
      // the rank window then runs over <= n rows
      def ranked(ordered: DataFrame, rankCol: String) =
        ordered.limit(n).withColumn(rankCol,
          row_number().over(Window.orderBy(
            if (rankCol == "rank_most_frequent") desc("value_count") else asc("value_count"),
            asc("value"))))
      val most = ranked(counts.orderBy(desc("value_count"), asc("value")),
        "rank_most_frequent").withColumn("side", lit("most_frequent"))
      val least = ranked(counts.orderBy(asc("value_count"), asc("value")),
        "rank_least_frequent").withColumn("side", lit("least_frequent"))
      most.withColumn("rank_least_frequent", lit(null).cast("int"))
        .unionByName(least.withColumn("rank_most_frequent", lit(null).cast("int")))
        .crossJoin(broadcast(total))
        .withColumn("tf", col("value_count").cast("double") / col("__total"))
        .withColumn("column_name", lit(c))
        .select("column_name", "side", "value", "value_count", "tf",
          "rank_most_frequent", "rank_least_frequent")
    }.reduce(_.unionByName(_))

  /**
   * Count comparisons a blocking rule would generate WITHOUT materialising
   * the pairs (`blocking_analysis.py:118-190`): per-key counts on each
   * side, then sum of products. For self-join dedupe: sum n*(n-1)/2.
   */
  def countComparisonsForRule(df: DataFrame, keyExprs: Seq[String]): DataFrame = {
    val keys = keyExprs.zipWithIndex.map { case (e, i) => expr(e).as(s"k$i") }
    df.select(keys: _*)
      .groupBy(keyExprs.indices.map(i => col(s"k$i")): _*)
      .agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt") * (col("cnt") - 1) / 2).cast("bigint").as("n_comparisons"))
  }

  /** Total possible comparisons under the link type, as a lazy 1-row frame
    * (`blocking_analysis.py:601-700`): dedupe / link_and_dedupe = N(N-1)/2
    * over the concat; link_only = sum of cross-frame products. */
  def totalPossiblePairs(concat: DataFrame, settings: LinkSettings): DataFrame =
    settings.linkType match {
      case LinkType.LinkOnly =>
        val bySd = concat.groupBy(col(settings.sourceDatasetColumn).as("sd"))
          .agg(count(lit(1)).as("n"))
        bySd.alias("l").join(bySd.alias("r"), col("l.sd") < col("r.sd"))
          .agg(sum(col("l.n") * col("r.n")).cast("bigint").as("cartesian"))
      case _ =>
        concat.agg(count(lit(1)).as("__n"))
          .select((col("__n") * (col("__n") - 1) / 2).cast("bigint").as("cartesian"))
    }

  /** `count_comparisons_from_blocking_rules` with the reference's FULL
    * chart-record layout (`blocking_analysis.py:284-294,601-676`):
    * one row per rule with descriptive join/filter strings, marginal and
    * cumulative counts, the exact cartesian, and the sampling metadata.
    *
    * `recordSampleProportion < 1` estimates counts from a deterministic
    * hash sample of records on each side of the blocking join, scaled by
    * 1/fraction² with the reference's threshold math
    * (`em_sampling.py:64-84`: threshold = ceil(p·10000) over modulus
    * 10000). The hash is the engine's PORTABLE md5 bucket rather than a
    * backend-native hash() — the reference's bucket values differ per
    * backend anyway, and the portable hash makes the sample replayable by
    * external engines. The cartesian is exact (never sampled).
    */
  def countComparisonsFromRules(concat: DataFrame, settings: LinkSettings,
      recordSampleProportion: Double = 1.0): DataFrame = {
    import graft.operators.Blocking
    require(recordSampleProportion > 0 && recordSampleProportion <= 1,
      s"record_sample_proportion must be in (0, 1]; got $recordSampleProportion")
    val modulus = 10000L
    val threshold = math.min(modulus,
      math.max(1L, math.ceil(recordSampleProportion * modulus).toLong))
    val actualFraction = threshold.toDouble / modulus
    val sampled =
      if (threshold >= modulus) concat
      else concat.filter(
        graft.pipeline.TextOps.portableHash(
          Blocking.joinKeyCol(settings).cast("string")) % modulus < threshold)
    val scale = 1.0 / (actualFraction * actualFraction)
    def describe(r: graft.model.BlockingRule): (String, String) = r match {
      case graft.model.BlockingRule.BlockOnRule(exprs, _, _) =>
        (exprs.map(e => s"l.$e = r.$e").mkString(" AND "), "")
      // custom SQL is reported whole as the filter condition; the
      // reference splits equi vs filter with a SQL parser — a descriptive
      // nicety only (tooltips), never used in computation
      case c: graft.model.BlockingRule.CustomBlockingRule => ("", c.sql)
      case other => ("", other.describe)
    }
    val linkTypeCond = settings.linkType match {
      case graft.model.LinkType.LinkOnly =>
        s"l.${settings.sourceDatasetColumn} < r.${settings.sourceDatasetColumn}"
      case _ => s"l.${settings.uniqueIdColumn} < r.${settings.uniqueIdColumn}"
    }
    val ruleFrame = concat.sparkSession.createDataFrame(
      settings.blockingRules.zipWithIndex.map { case (r, i) =>
        val (equi, filt) = describe(r)
        (i.toString, r.describe, equi, filt)
      }).toDF(Cols.MatchKey, "blocking_rule", "equi_join_conditions",
        "filter_conditions")
    ruleCumulativeCounts(sampled, concat, settings, ruleFrame,
        round(col("__raw") * scale).cast("bigint"),
        "marginal_comparison_count", "cumulative_comparison_count")
      .select(col("blocking_rule"), col("equi_join_conditions"),
        col("filter_conditions"),
        lit(linkTypeCond).as("link_type_join_condition"),
        col("marginal_comparison_count"), col("cumulative_comparison_count"),
        col("cartesian").as("total_possible_comparison_count"),
        col(Cols.MatchKey).as("match_key"),
        // report the fraction ACTUALLY used (the ceil'd hash threshold),
        // not the raw request: counts are scaled by 1/actualFraction², so
        // a consumer reconstructing raw counts from this column must see
        // the same number, and is_estimate must be false whenever the
        // threshold clamped to no-sampling
        lit(actualFraction).as("record_sample_proportion"),
        lit(threshold < modulus).as("is_estimate"))
  }

  /** Marginal and cumulative comparison counts per blocking rule under
    * NOT-previous semantics (`blocking_analysis.py:601-724`): the chart
    * data behind `cumulative_comparisons_to_be_scored_from_blocking_rules`.
    * Counts come from the actual blocked-pairs plan (exact, including
    * salting/exploding), aggregated to one row per rule; the cumulative
    * window runs over |rules| rows only. */
  def cumulativeComparisonsPerRule(concat: DataFrame,
      settings: LinkSettings): DataFrame = {
    // keep zero-pair rules visible in the chart
    val ruleFrame = concat.sparkSession
      .createDataFrame(settings.blockingRules.zipWithIndex.map { case (r, i) =>
        (i.toString, r.describe) })
      .toDF(Cols.MatchKey, "rule")
    ruleCumulativeCounts(concat, concat, settings, ruleFrame,
        col("__raw"), "row_count", "cumulative_rows")
      .select(Cols.MatchKey, "rule", "row_count", "cumulative_rows", "cartesian")
  }

  /** Shared skeleton of the two per-rule cumulative-count charts:
    * blocked pairs on `input` (full or sampled) -> one count per
    * match_key -> broadcast rule-frame left join (zero-pair rules stay
    * visible) -> cumulative window over |rules| rows -> cartesian total
    * from `concat`. `marginal` maps the raw count column `__raw` to the
    * reported marginal value (identity, or the 1/f^2 sampling scale). */
  private def ruleCumulativeCounts(input: DataFrame, concat: DataFrame,
      settings: LinkSettings, ruleFrame: DataFrame, marginal: Column,
      marginalName: String, cumulativeName: String): DataFrame = {
    import graft.operators.Blocking
    val counts = Blocking.blockedIdPairs(input, settings)
      .groupBy(col(Cols.MatchKey)).agg(count(lit(1)).as("__raw"))
    val w = Window.orderBy(col(Cols.MatchKey).cast("int"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    broadcast(ruleFrame).join(counts, Seq(Cols.MatchKey), "left")
      .na.fill(0L, Seq("__raw"))
      .withColumn(marginalName, marginal)
      .withColumn(cumulativeName, sum(marginalName).over(w))
      .crossJoin(broadcast(totalPossiblePairs(concat, settings)))
  }

  /** The equi expressions of a rule when (and only when) a per-key count is
    * exact: a `block_on` or an AND of `block_on`s, no exploding arrays. */
  private def pureEquiExprs(rule: BlockingRule): Option[Seq[String]] = rule match {
    case BlockingRule.BlockOnRule(exprs, _, Nil) => Some(exprs)
    case BlockingRule.AndRule(parts) =>
      parts.foldLeft(Option(Seq.empty[String])) {
        case (Some(acc), BlockingRule.BlockOnRule(exprs, _, Nil)) => Some(acc ++ exprs)
        case _ => None
      }
    case _ => None
  }

  /**
   * Link-type-aware comparison count for ONE rule, with cartesian fallback
   * (`blocking_analysis.py:601-780`). Pure-equi rules never materialise
   * pairs: per-key counts are joined/aggregated instead (`method = keyed`).
   * Non-equi rules either materialise and count exactly (`exact = true`,
   * `method = materialised`) or return the link type's cartesian bound
   * (`method = cartesian_bound`) — the reference warns identically before
   * letting a user count a cartesian-ish rule.
   */
  def countComparisonsLinkAware(concat: DataFrame, settings: LinkSettings,
      rule: BlockingRule, exact: Boolean = false): DataFrame = {
    import graft.operators.Blocking
    val one = pureEquiExprs(rule) match {
      case Some(exprs) =>
        val keys = exprs.zipWithIndex.map { case (e, i) => expr(e).as(s"k$i") }
        val keyCols = exprs.indices.map(i => col(s"k$i"))
        settings.linkType match {
          case LinkType.LinkOnly =>
            val byKey = concat
              .select(keys :+ col(settings.sourceDatasetColumn).as("__sd"): _*)
              .groupBy(keyCols :+ col("__sd"): _*)
              .agg(count(lit(1)).as("n"))
            byKey.alias("l").join(byKey.alias("r"),
                exprs.indices.map(i => col(s"l.k$i") <=> col(s"r.k$i"))
                  .reduce(_ && _) && col("l.__sd") < col("r.__sd"))
              .agg(coalesce(sum(col("l.n") * col("r.n")), lit(0L))
                .cast("bigint").as("n_comparisons"))
          case _ =>
            concat.select(keys: _*).groupBy(keyCols: _*)
              .agg(count(lit(1)).as("n"))
              .agg(coalesce(sum(col("n") * (col("n") - 1) / 2), lit(0L))
                .cast("bigint").as("n_comparisons"))
        }
      case None if exact =>
        Blocking.blockedIdPairs(concat, settings.copy(blockingRules = Seq(rule)))
          .agg(count(lit(1)).cast("bigint").as("n_comparisons"))
      case None =>
        totalPossiblePairs(concat, settings)
          .select(col("cartesian").as("n_comparisons"))
    }
    val method = pureEquiExprs(rule) match {
      case Some(_) => "keyed"
      case None if exact => "materialised"
      case None => "cartesian_bound"
    }
    one.withColumn("rule", lit(rule.describe)).withColumn("method", lit(method))
      .select("rule", "method", "n_comparisons")
  }

  /** Top-N largest blocks for a rule (`blocking_analysis.py:725-780`). */
  def nLargestBlocks(df: DataFrame, keyExprs: Seq[String], n: Int): DataFrame = {
    val keys = keyExprs.zipWithIndex.map { case (e, i) => expr(e).as(s"key_$i") }
    val grouped = df.select(keys: _*)
      .groupBy(keyExprs.indices.map(i => col(s"key_$i")): _*)
      .agg(count(lit(1)).as("count_l"))
      .withColumn("count_r", col("count_l"))
      .withColumn("block_count", col("count_l") * col("count_r"))
    grouped.orderBy(
        (desc("block_count") +: keyExprs.indices.map(i => col(s"key_$i"))): _*)
      .limit(n)
  }

  /**
   * Cluster-studio style cluster sampling (`cluster_studio.py:157-296`):
   * pick cluster ids at random (seeded), by size band, or lowest density.
   */
  def sampleClusters(clusters: DataFrame, edges: DataFrame,
      method: String, n: Int, seed: Long = 42L,
      srcCol: String = "unique_id_l", dstCol: String = "unique_id_r",
      clusterIds: Seq[Any] = Nil): DataFrame = {
    import graft.clustering.ClusteringOps
    sampleClustersFromMetrics(
      ClusteringOps.clusterMetrics(clusters, edges, srcCol, dstCol),
      method, n, seed, clusterIds)
  }

  /** [[sampleClusters]] over precomputed cluster metrics — callers drawing
    * several samples compute (and persist) the metrics frame once.
    *
    * @param clusterIds for method `"by_cluster_ids"` only: the explicit
    *        cluster ids to return (the reference's `_get_cluster_ids`
    *        user-supplied list, `cluster_studio.py:297-313`) — kept in the
    *        caller's order, silently dropping ids not present in the
    *        metrics frame, capped at `n` when `n > 0` */
  def sampleClustersFromMetrics(metrics: DataFrame, method: String, n: Int,
      seed: Long = 42L, clusterIds: Seq[Any] = Nil): DataFrame = {
    method match {
      case "by_cluster_ids" =>
        require(clusterIds.nonEmpty,
          "method 'by_cluster_ids' needs a non-empty clusterIds list")
        val wanted = array(clusterIds.map(lit): _*)
        val picked = metrics
          .filter(array_position(wanted, col("cluster_id")) > 0)
          .orderBy(array_position(wanted, col("cluster_id")))
        (if (n > 0) picked.limit(n) else picked).select("cluster_id")
      case "random" =>
        // seeded PORTABLE hash order, not rand(): rand(seed) depends on the
        // physical partition layout (same seed, different partitioning,
        // different sample), while the md5-based rank is layout-independent,
        // identical at any scale, and replayable by external engines —
        // the reference pins its sample for the same reason
        // (`cluster_studio.py:157-186` / `dialects.py:177-206`)
        metrics.orderBy(
            graft.pipeline.TextOps.portableHash(
              concat_ws("-", lit(seed), col("cluster_id"))),
            col("cluster_id"))
          .limit(n).select("cluster_id")
      case "by_cluster_size" =>
        metrics.orderBy(desc("n_nodes"), asc("cluster_id")).limit(n)
          .select("cluster_id")
      case "lowest_density_clusters_by_size" =>
        metrics.filter(col("n_nodes") > 2)
          .orderBy(asc("density"), asc("cluster_id")).limit(n)
          .select("cluster_id")
      case other =>
        throw new IllegalArgumentException(s"unknown sampling method $other")
    }
  }

  /** Waterfall-chart data (`waterfall_chart.py:11-170`): per scored pair,
    * one row per comparison with its match-weight contribution plus prior
    * and final rows — the additive decomposition of the score. */
  def waterfallData(scored: DataFrame, settings: LinkSettings): DataFrame = {
    val uid = settings.uniqueIdColumn
    def row(term: String, order: Int, weight: Column) = struct(
      lit(term).as("term"), lit(order).as("bar_sort_order"),
      weight.as("log2_bayes_factor"))
    // one explode, not a UNION of per-term selects: a union re-evaluates
    // the scored frame (the whole predict pipeline, if unmaterialised)
    // once per term; this shape scans it exactly once
    val rows =
      row("prior", -1, lit(settings.priorMatchWeight)) +:
      settings.comparisons.zipWithIndex.map { case (c, i) =>
        row(c.outputColumnName, i, c.matchWeightColumn +
          (if (c.hasTfLevels) c.tfAdjustmentColumn else lit(0.0)))
      } :+
      row("final", settings.comparisons.size, col(Cols.MatchWeight))
    scored.select(col(Cols.l(uid)), col(Cols.r(uid)),
        explode(array(rows: _*)).as("w"))
      .select(col(Cols.l(uid)), col(Cols.r(uid)), col("w.term"),
        col("w.bar_sort_order"), col("w.log2_bayes_factor"))
  }

  /** Match-weights chart data (`match_weights_chart` /
    * `parameter_estimate_comparisons_chart`): one row per (comparison,
    * level) with the live m/u/match-weight, PLUS one row per recorded
    * training session so users can compare estimates across sessions —
    * driver-side model state surfaced as a frame. */
  def parameterEstimateChartData(settings: LinkSettings,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val rows = settings.comparisons.flatMap { c =>
      c.activeLevelsWithGamma.flatMap { case (lv, g) =>
        val live = (c.outputColumnName, g, lv.label, "live",
          lv.m.getOrElse(Double.NaN), lv.u.getOrElse(Double.NaN),
          lv.matchWeight)
        val sessions = lv.trainedM.map { tv =>
          (c.outputColumnName, g, lv.label, tv.description,
            tv.probability, lv.u.getOrElse(Double.NaN), Double.NaN)
        }
        live +: sessions
      }
    }
    rows.toDF("comparison", "gamma", "label", "estimate_source",
      "m", "u", "match_weight")
  }

  /** Match-weight histogram chart data (`match_weight_histogram.py` /
    * `linker.visualisations.match_weights_histogram`): pair counts per
    * half-unit match-weight bin. The weight is rounded to 6dp first (the
    * same grid predict emits) so bin edges are engine-portable; the
    * histogram is one groupBy over |bins| rows — at 100 TB the chart data
    * stays tiny no matter the pair count. */
  def matchWeightHistogram(scored: DataFrame, binWidth: Double = 0.5): DataFrame = {
    val perUnit = math.round(1.0 / binWidth)
    scored
      .select(floor(round(col(Cols.MatchWeight), 6) * perUnit)
        .cast("bigint").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("bin_start", col("bin").cast("double") / perUnit)
      .select("bin", "bin_start", "n_pairs")
  }

  /** False positives / false negatives at a threshold against a label
    * column (`linker_components/evaluation.py:37-351`). */
  def predictionErrors(scored: DataFrame, labelCol: String,
      threshold: Double): DataFrame = {
    val withTruth = withClericalFromLabelColumn(scored, labelCol)
    withTruth
      .withColumn("predicted", (col(Cols.MatchProbability) >= threshold).cast("int"))
      .filter(col("predicted") =!= col("clerical_match"))
      .withColumn("error_type",
        when(col("predicted") === 1, lit("FP")).otherwise(lit("FN")))
  }
}
