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
      srcCol: String = "unique_id_l", dstCol: String = "unique_id_r"): DataFrame = {
    import graft.clustering.ClusteringOps
    val metrics = ClusteringOps.clusterMetrics(clusters, edges, srcCol, dstCol)
    method match {
      case "random" =>
        metrics.orderBy(rand(seed)).limit(n).select("cluster_id")
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
    val prior = scored.select(col(Cols.l(uid)), col(Cols.r(uid)),
      lit("prior").as("term"), lit(-1).as("bar_sort_order"),
      lit(settings.priorMatchWeight).as("log2_bayes_factor"))
    val perComparison = settings.comparisons.zipWithIndex.map { case (c, i) =>
      scored.select(col(Cols.l(uid)), col(Cols.r(uid)),
        lit(c.outputColumnName).as("term"), lit(i).as("bar_sort_order"),
        (c.matchWeightColumn +
          (if (c.hasTfLevels) c.tfAdjustmentColumn else lit(0.0)))
          .as("log2_bayes_factor"))
    }
    val finalRow = scored.select(col(Cols.l(uid)), col(Cols.r(uid)),
      lit("final").as("term"), lit(settings.comparisons.size).as("bar_sort_order"),
      col(Cols.MatchWeight).as("log2_bayes_factor"))
    (prior +: perComparison :+ finalRow).reduce(_.unionByName(_))
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
