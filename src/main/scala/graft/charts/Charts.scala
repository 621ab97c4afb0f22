package graft.charts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.JsonDSL._

import graft.model.{Comparison, ComparisonLevel, LinkSettings, Model}
import graft.training.Training.EMResult
import VegaLite.{record, dfRecords, spec => mkSpec, titled}

/**
 * The reference's chart catalogue re-expressed as Vega-Lite emitters
 * (`charts.py:207-745` — MatchWeightsChart, MUParametersChart, the EM
 * interactive-history charts, WaterfallChart, ROC / precision-recall /
 * accuracy / threshold-selection charts over the truth space,
 * MatchWeightsHistogramChart, UnlinkablesChart, CompletenessChart,
 * CumulativeBlockingRuleComparisonsGeneratedChart, TFAdjustmentChart,
 * ParameterEstimateComparisonsChart, profile and comparator-score
 * charts). Each method takes the SAME records the reference feeds its
 * spec (model parameters, or the output of the corresponding
 * oracle-checked Evaluation query) and returns a [[ChartSpec]].
 *
 * Charts consume either driver-side model state (no Spark job at all) or
 * an already-small aggregate DataFrame — the distributed work happened in
 * the Evaluation/Linker query that produced it, so nothing here changes
 * shape at 100 TB.
 */
object Charts {

  // ---------------------------------------------------------------- model

  /** One record per active comparison level — the reference's
    * `ComparisonLevelDetailedRecord` (`charts.py:207-240` chart input). */
  def comparisonLevelRecords(settings: LinkSettings): List[JObject] = {
    val levels = settings.comparisons.toList.flatMap { c =>
      c.activeLevelsWithGamma.toList.map { case (lv, g) =>
        val m = lv.m.getOrElse(Model.UnobservedSentinel)
        val u = lv.u.getOrElse(Model.UnobservedSentinel)
        record(
          "comparison_name" -> c.outputColumnName,
          "label_for_charts" -> lv.label,
          "sql_condition" -> lv.sqlCondition,
          "comparison_vector_value" -> g,
          "m_probability" -> m,
          "u_probability" -> u,
          "bayes_factor" -> math.pow(2.0, lv.matchWeight),
          "log2_bayes_factor" -> lv.matchWeight,
          "has_tf_adjustments" -> lv.tfColumn.isDefined,
          "m_is_trained" -> (lv.trainedM.nonEmpty || lv.fixMProbability),
          "u_is_trained" -> (lv.trainedU.nonEmpty || lv.fixUProbability))
      }
    }
    val prior = record(
      "comparison_name" -> "Prior",
      "label_for_charts" -> "Starting match weight",
      "sql_condition" -> JNull,
      "comparison_vector_value" -> -1,
      "m_probability" -> JNull, "u_probability" -> JNull,
      "bayes_factor" -> math.pow(2.0, settings.priorMatchWeight),
      "log2_bayes_factor" -> settings.priorMatchWeight,
      "has_tf_adjustments" -> false,
      "m_is_trained" -> true, "u_is_trained" -> true)
    prior :: levels
  }

  private def symDomain(vals: Seq[Double]): List[Double] = {
    val finite = vals.filter(v => !v.isNaN && !v.isInfinite).map(math.abs)
    val m = math.ceil(if (finite.isEmpty) 1.0 else finite.max)
    List(-m, m)
  }

  private def mwColor: JObject =
    "color" -> (("field" -> "log2_bayes_factor") ~ ("type" -> "quantitative") ~
      ("scale" -> (("scheme" -> "redyellowgreen") ~ ("domainMid" -> 0))) ~
      ("legend" -> JNull))

  private val levelTooltip: JArray = JArray(List(
    ("field" -> "comparison_name") ~ ("type" -> "nominal"): JValue,
    ("field" -> "label_for_charts") ~ ("type" -> "nominal"),
    ("field" -> "sql_condition") ~ ("type" -> "nominal"),
    ("field" -> "m_probability") ~ ("type" -> "quantitative") ~ ("format" -> ".6g"),
    ("field" -> "u_probability") ~ ("type" -> "quantitative") ~ ("format" -> ".6g"),
    ("field" -> "bayes_factor") ~ ("type" -> "quantitative") ~ ("format" -> ".4g"),
    ("field" -> "log2_bayes_factor") ~ ("type" -> "quantitative") ~ ("format" -> ".4g")))

  /** Final match weights per comparison level (`charts.py:207` /
    * `match_weights_chart`): prior panel above per-comparison bars on a
    * shared symmetric log2-Bayes-factor axis. */
  def matchWeightsChart(settings: LinkSettings): ChartSpec = {
    val recs = comparisonLevelRecords(settings)
    val dom = symDomain(recs.map(r => (r \ "log2_bayes_factor") match {
      case JDouble(d) => d; case _ => 0.0
    }))
    val xEnc = ("field" -> "log2_bayes_factor") ~ ("type" -> "quantitative") ~
      ("title" -> "Match weight (log2 Bayes factor)") ~
      ("scale" -> ("domain" -> dom))
    val prior: JObject =
      ("transform" -> JArray(List(("filter" -> "datum.comparison_name == 'Prior'"): JValue))) ~
      ("mark" -> "bar") ~ ("height" -> 40) ~
      ("encoding" -> ((("x" -> xEnc) ~
        ("y" -> (("field" -> "label_for_charts") ~ ("type" -> "nominal") ~ ("title" -> ""))) ~
        ("tooltip" -> levelTooltip): JObject) ~ mwColor))
    val levels: JObject =
      ("transform" -> JArray(List(("filter" -> "datum.comparison_name != 'Prior'"): JValue))) ~
      ("mark" -> "bar") ~
      ("encoding" -> ((("x" -> xEnc) ~
        ("y" -> (("field" -> "label_for_charts") ~ ("type" -> "nominal") ~
          ("sort" -> (("field" -> "comparison_vector_value") ~ ("order" -> "descending"))) ~
          ("title" -> "Comparison level"))) ~
        ("row" -> (("field" -> "comparison_name") ~ ("type" -> "nominal") ~
          ("header" -> ("labelAngle" -> 0)))) ~
        ("tooltip" -> levelTooltip): JObject) ~ mwColor))
    ChartSpec(mkSpec(recs,
      titled("Model match weights") ~ ("vconcat" -> JArray(List(prior: JValue, levels)))))
  }

  /** m and u probabilities per level (`charts.py:261` MUParametersChart):
    * two log-scaled probability panels side by side, row-faceted. */
  def muParametersChart(settings: LinkSettings): ChartSpec = {
    val recs = comparisonLevelRecords(settings)
      .filter(r => r \ "comparison_name" != JString("Prior"))
    def panel(field: String, title: String): JObject =
      ("mark" -> "bar") ~
      ("encoding" ->
        (("x" -> (("field" -> field) ~ ("type" -> "quantitative") ~ ("title" -> title) ~
          ("scale" -> (("type" -> "log") ~ ("domain" -> List(1e-8, 1.0)))))) ~
         ("y" -> (("field" -> "label_for_charts") ~ ("type" -> "nominal") ~
           ("title" -> ""))) ~
         ("row" -> (("field" -> "comparison_name") ~ ("type" -> "nominal") ~
           ("header" -> ("labelAngle" -> 0)))) ~
         ("color" -> (("field" -> "comparison_name") ~ ("type" -> "nominal") ~
           ("legend" -> JNull))) ~
         ("tooltip" -> levelTooltip)))
    ChartSpec(mkSpec(recs, titled("m and u probabilities") ~
      ("hconcat" -> JArray(List(
        panel("m_probability", "m probability (match)"): JValue,
        panel("u_probability", "u probability (non-match)"))))))
  }

  /** Every training session's m/u estimate per level
    * (`charts.py:558` ParameterEstimateComparisonsChart) — shows whether
    * independent sessions agree before the median is taken. */
  def parameterEstimateComparisonsChart(settings: LinkSettings): ChartSpec = {
    val recs = for {
      c <- settings.comparisons.toList
      lv <- c.activeLevels.toList
      (which, tv) <- lv.trainedM.toList.map(("m", _)) ++
        lv.trainedU.toList.map(("u", _))
    } yield record(
      "comparison_name" -> c.outputColumnName,
      "label_for_charts" -> lv.label,
      "parameter" -> which,
      "probability" -> tv.probability,
      "estimate_description" -> tv.description,
      "observed" -> tv.observed)
    ChartSpec(mkSpec(recs, titled("Parameter estimates across training sessions") ~
      ("mark" -> (("type" -> "point") ~ ("filled" -> true) ~ ("size" -> 80))) ~
      ("encoding" ->
        (("x" -> (("field" -> "probability") ~ ("type" -> "quantitative") ~
           ("scale" -> (("type" -> "log") ~ ("domain" -> List(1e-8, 1.0)))))) ~
         ("y" -> (("field" -> "label_for_charts") ~ ("type" -> "nominal") ~ ("title" -> ""))) ~
         ("row" -> (("field" -> "comparison_name") ~ ("type" -> "nominal"))) ~
         ("column" -> (("field" -> "parameter") ~ ("type" -> "nominal"))) ~
         ("color" -> (("field" -> "estimate_description") ~ ("type" -> "nominal"))) ~
         ("shape" -> (("field" -> "observed") ~ ("type" -> "nominal"))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "estimate_description") ~ ("type" -> "nominal"): JValue,
           ("field" -> "probability") ~ ("type" -> "quantitative") ~ ("format" -> ".6g"),
           ("field" -> "observed") ~ ("type" -> "nominal"))))))))
  }

  // ------------------------------------------------------------------- EM

  /** λ per EM iteration (`charts.py:283`). */
  def probabilityTwoRandomRecordsMatchIterationChart(em: EMResult): ChartSpec = {
    val recs = em.lambdaHistory.toList.zipWithIndex.map { case (l, i) =>
      record("iteration" -> i, "probability_two_random_records_match" -> l)
    }
    ChartSpec(mkSpec(recs,
      titled("Probability two random records match, by EM iteration") ~
      ("mark" -> (("type" -> "line") ~ ("point" -> true))) ~
      ("encoding" ->
        (("x" -> (("field" -> "iteration") ~ ("type" -> "quantitative") ~
           ("axis" -> ("tickMinStep" -> 1)))) ~
         ("y" -> (("field" -> "probability_two_random_records_match") ~
           ("type" -> "quantitative") ~ ("axis" -> ("format" -> ".2e")))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "iteration") ~ ("type" -> "quantitative"): JValue,
           ("field" -> "probability_two_random_records_match") ~
             ("type" -> "quantitative") ~ ("format" -> ".6e"))))))))
  }

  /** Per-iteration per-level records of one EM session — the data behind
    * both interactive-history charts (`em_training_session.py`
    * `_iteration_history_records`). */
  def emIterationRecords(em: EMResult): List[JObject] = {
    val comps = em.activeComparisons.map(em.settings.comparisonByName)
    // uHistory may be absent (results built before it was recorded) — fall
    // back to the final u per level for every iteration, not to 1 iteration
    val n = if (em.uHistory.isEmpty) em.mHistory.size
      else math.min(em.mHistory.size, em.uHistory.size)
    (0 until n).toList.flatMap { it =>
      comps.toList.zipWithIndex.flatMap { case (c, ci) =>
        c.activeLevelsWithGamma.toList.map { case (lv, g) =>
          val m = math.max(em.mHistory(it)(ci).getOrElse(g, Model.UnobservedSentinel),
            Model.ProbFloor)
          val u = math.max(
            (if (em.uHistory.isEmpty) lv.u.getOrElse(Model.UnobservedSentinel)
             else em.uHistory(it)(ci).getOrElse(g, Model.UnobservedSentinel)),
            Model.ProbFloor)
          record(
            "iteration" -> it,
            "comparison_name" -> c.outputColumnName,
            "label_for_charts" -> lv.label,
            "comparison_vector_value" -> g,
            "m_probability" -> m,
            "u_probability" -> u,
            "log2_bayes_factor" -> math.log(m / u) / math.log(2.0))
        }
      }
    }
  }

  private def iterationSlider(maxIter: Int): JArray = JArray(List(
    ("name" -> "iteration_slider") ~
      ("value" -> maxIter) ~
      ("bind" -> (("input" -> "range") ~ ("min" -> 0) ~ ("max" -> maxIter) ~
        ("step" -> 1) ~ ("name" -> "EM iteration "))): JValue))

  /** Match weights per level with an iteration slider (`charts.py:289`
    * MatchWeightsInteractiveHistoryChart). */
  def matchWeightsInteractiveHistoryChart(em: EMResult): ChartSpec = {
    val recs = emIterationRecords(em)
    val maxIter = recs.map(r => r \ "iteration" match {
      case JInt(i) => i.toInt; case _ => 0
    }).foldLeft(0)(math.max)
    ChartSpec(mkSpec(recs, titled("Match weight history of EM training") ~
      ("params" -> iterationSlider(maxIter)) ~
      ("transform" -> JArray(List(("filter" -> "datum.iteration == iteration_slider"): JValue))) ~
      ("mark" -> "bar") ~
      ("encoding" ->
        (("x" -> (("field" -> "log2_bayes_factor") ~ ("type" -> "quantitative") ~
           ("title" -> "Match weight (log2 Bayes factor)") ~
           ("scale" -> ("domain" -> symDomain(recs.map(r =>
             r \ "log2_bayes_factor" match { case JDouble(d) => d; case _ => 0.0 })))))) ~
         ("y" -> (("field" -> "label_for_charts") ~ ("type" -> "nominal") ~ ("title" -> ""))) ~
         ("row" -> (("field" -> "comparison_name") ~ ("type" -> "nominal"))) ~
         ("tooltip" -> levelTooltip): JObject) ~ mwColor)))
  }

  /** m / u probabilities with an iteration slider (`charts.py:322`). */
  def muParametersInteractiveHistoryChart(em: EMResult): ChartSpec = {
    val recs = emIterationRecords(em)
    val maxIter = recs.map(r => r \ "iteration" match {
      case JInt(i) => i.toInt; case _ => 0
    }).foldLeft(0)(math.max)
    def panel(field: String, title: String): JObject =
      ("mark" -> "bar") ~
      ("encoding" ->
        (("x" -> (("field" -> field) ~ ("type" -> "quantitative") ~ ("title" -> title) ~
           ("scale" -> (("type" -> "log") ~ ("domain" -> List(1e-8, 1.0)))))) ~
         ("y" -> (("field" -> "label_for_charts") ~ ("type" -> "nominal") ~ ("title" -> ""))) ~
         ("row" -> (("field" -> "comparison_name") ~ ("type" -> "nominal")))))
    ChartSpec(mkSpec(recs, titled("m and u probability history of EM training") ~
      ("params" -> iterationSlider(maxIter)) ~
      ("transform" -> JArray(List(("filter" -> "datum.iteration == iteration_slider"): JValue))) ~
      ("hconcat" -> JArray(List(
        panel("m_probability", "m probability"): JValue,
        panel("u_probability", "u probability"))))))
  }

  // ------------------------------------------------------------ waterfall

  /** Waterfall of one scored pair (`charts.py:349`, fed by the same
    * records as the oracle-checked q_waterfall): floating bars from the
    * prior through each comparison's log2 Bayes factor to the final
    * weight. Input = `Evaluation.waterfallData` rows for ONE (l, r) pair;
    * cumulative extents are computed here, driver-side. */
  def waterfallChart(pairRows: DataFrame): ChartSpec = {
    val rows = pairRows
      .select("term", "bar_sort_order", "log2_bayes_factor")
      .orderBy("bar_sort_order").collect().toList
    var cum = 0.0
    val recs = rows.map { r =>
      val term = r.getString(0)
      val order = r.get(1).toString.toInt
      val bf = r.get(2).toString.toDouble
      val (start, end) =
        if (term == "final") (0.0, bf) else { val s = cum; cum += bf; (s, cum) }
      record("term" -> term, "bar_sort_order" -> order,
        "log2_bayes_factor" -> bf, "start" -> start, "end" -> end,
        "is_final" -> (term == "final"))
    }
    ChartSpec(mkSpec(recs, titled("Match weight waterfall") ~
      ("mark" -> "bar") ~
      ("encoding" ->
        (("x" -> (("field" -> "term") ~ ("type" -> "nominal") ~
           ("sort" -> ("field" -> "bar_sort_order")) ~ ("title" -> ""))) ~
         ("y" -> (("field" -> "start") ~ ("type" -> "quantitative") ~
           ("title" -> "Cumulative match weight"))) ~
         ("y2" -> JObject(List(JField("field", JString("end"))))) ~
         ("color" -> (("condition" ->
             (("test" -> "datum.is_final") ~ ("value" -> "#1f77b4"))) ~
           ("field" -> "log2_bayes_factor") ~ ("type" -> "quantitative") ~
           ("scale" -> (("scheme" -> "redyellowgreen") ~ ("domainMid" -> 0))) ~
           ("legend" -> JNull)) : JObject) ~
         ("tooltip" -> JArray(List(
           ("field" -> "term") ~ ("type" -> "nominal"): JValue,
           ("field" -> "log2_bayes_factor") ~ ("type" -> "quantitative") ~
             ("format" -> ".4g"))))))))
  }

  // ---------------------------------------------------------- truth space

  private def truthRecords(truthSpace: DataFrame): List[JObject] =
    dfRecords(truthSpace.withColumn("tp_rate",
        col("tp").cast("double") / (col("tp") + col("fn")))
      .withColumn("fp_rate", col("fp").cast("double") / (col("fp") + col("tn"))))

  /** ROC curve over the truth-space table (`charts.py:372`). */
  def rocChart(truthSpace: DataFrame): ChartSpec =
    ChartSpec(mkSpec(truthRecords(truthSpace), titled("ROC curve") ~
      ("mark" -> (("type" -> "line") ~ ("point" -> true) ~ ("interpolate" -> "step"))) ~
      ("encoding" ->
        (("x" -> (("field" -> "fp_rate") ~ ("type" -> "quantitative") ~
           ("title" -> "False positive rate"))) ~
         ("y" -> (("field" -> "tp_rate") ~ ("type" -> "quantitative") ~
           ("title" -> "True positive rate"))) ~
         ("tooltip" -> truthTooltip)))))

  /** Precision-recall curve (`charts.py:395`). */
  def precisionRecallChart(truthSpace: DataFrame): ChartSpec =
    ChartSpec(mkSpec(truthRecords(truthSpace), titled("Precision-recall curve") ~
      ("mark" -> (("type" -> "line") ~ ("point" -> true) ~ ("interpolate" -> "step"))) ~
      ("encoding" ->
        (("x" -> (("field" -> "recall") ~ ("type" -> "quantitative"))) ~
         ("y" -> (("field" -> "precision") ~ ("type" -> "quantitative"))) ~
         ("tooltip" -> truthTooltip)))))

  private val truthTooltip: JArray = JArray(List(
    ("field" -> "truth_threshold") ~ ("type" -> "quantitative") ~ ("format" -> ".4g"): JValue,
    ("field" -> "precision") ~ ("type" -> "quantitative") ~ ("format" -> ".4g"),
    ("field" -> "recall") ~ ("type" -> "quantitative") ~ ("format" -> ".4g"),
    ("field" -> "f1") ~ ("type" -> "quantitative") ~ ("format" -> ".4g"),
    ("field" -> "tp") ~ ("type" -> "quantitative"),
    ("field" -> "fp") ~ ("type" -> "quantitative"),
    ("field" -> "tn") ~ ("type" -> "quantitative"),
    ("field" -> "fn") ~ ("type" -> "quantitative")))

  /** Accuracy metrics vs threshold (`charts.py:421` AccuracyChart):
    * precision / recall / F1 folded into one multi-line chart. */
  def accuracyChart(truthSpace: DataFrame): ChartSpec =
    ChartSpec(mkSpec(truthRecords(truthSpace), titled("Accuracy vs match-weight threshold") ~
      ("transform" -> JArray(List(
        ("fold" -> List("precision", "recall", "f1")) ~
          ("as" -> List("metric", "value")): JValue))) ~
      ("mark" -> (("type" -> "line") ~ ("point" -> true))) ~
      ("encoding" ->
        (("x" -> (("field" -> "truth_threshold") ~ ("type" -> "quantitative") ~
           ("title" -> "Match weight threshold"))) ~
         ("y" -> (("field" -> "value") ~ ("type" -> "quantitative") ~
           ("scale" -> ("domain" -> List(0.0, 1.0))))) ~
         ("color" -> (("field" -> "metric") ~ ("type" -> "nominal"))) ~
         ("tooltip" -> truthTooltip)))))

  /** Interactive threshold-selection tool (`charts.py:483`): accuracy
    * lines plus a draggable threshold rule showing the confusion counts. */
  def thresholdSelectionTool(truthSpace: DataFrame): ChartSpec = {
    val recs = truthRecords(truthSpace)
    val thresholds = recs.map(r => r \ "truth_threshold" match {
      case JDouble(d) => d; case JInt(i) => i.toDouble; case _ => 0.0
    })
    // empty truth space renders an empty chart like the other truth-space
    // charts do, instead of throwing on thresholds.min
    val (lo, hi) =
      if (thresholds.isEmpty) (0.0, 1.0)
      else (thresholds.min, thresholds.max)
    val lines: JObject =
      ("transform" -> JArray(List(
        ("fold" -> List("precision", "recall", "f1")) ~
          ("as" -> List("metric", "value")): JValue))) ~
      ("mark" -> "line") ~
      ("encoding" ->
        (("x" -> (("field" -> "truth_threshold") ~ ("type" -> "quantitative") ~
           ("title" -> "Match weight threshold"))) ~
         ("y" -> (("field" -> "value") ~ ("type" -> "quantitative"))) ~
         ("color" -> (("field" -> "metric") ~ ("type" -> "nominal"))) ~
         ("tooltip" -> truthTooltip)))
    val rule: JObject =
      ("mark" -> (("type" -> "rule") ~ ("color" -> "grey") ~ ("size" -> 2))) ~
      ("encoding" -> ("x" ->
        (("datum" -> ("expr" -> "threshold_slider")) ~ ("type" -> "quantitative"))))
    ChartSpec(mkSpec(recs, titled("Threshold selection tool") ~
      ("params" -> JArray(List(
        ("name" -> "threshold_slider") ~ ("value" -> (lo + hi) / 2) ~
          ("bind" -> (("input" -> "range") ~ ("min" -> lo) ~ ("max" -> hi) ~
            ("step" -> math.max((hi - lo) / 100.0, 1e-6)) ~
            ("name" -> "Match weight threshold ")): JObject): JValue))) ~
      ("layer" -> JArray(List(lines: JValue, rule)))))
  }

  // ------------------------------------------------------ distribution etc.

  /** Histogram of match weights (`charts.py:544`, fed by the
    * oracle-checked q_mw_histogram aggregate — columns
    * (bin, bin_start, n_pairs) from `Evaluation.matchWeightHistogram`). */
  def matchWeightsHistogramChart(hist: DataFrame,
      binWidth: Double = 0.5): ChartSpec =
    ChartSpec(mkSpec(dfRecords(hist), titled("Histogram of match weights") ~
      ("transform" -> JArray(List(
        (("calculate" -> s"datum.bin_start + $binWidth") ~ ("as" -> "bin_end")): JValue))) ~
      ("mark" -> "bar") ~
      ("encoding" ->
        (("x" -> (("field" -> "bin_start") ~ ("type" -> "quantitative") ~
           ("title" -> "Match weight bin"))) ~
         ("x2" -> JObject(List(JField("field", JString("bin_end"))))) ~
         ("y" -> (("field" -> "n_pairs") ~ ("type" -> "quantitative") ~
           ("scale" -> ("type" -> "symlog")) ~ ("title" -> "Count of pairs"))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "bin_start") ~ ("type" -> "quantitative"): JValue,
           ("field" -> "n_pairs") ~ ("type" -> "quantitative"))))))))

  /** Unlinkable-records chart (`charts.py:564`, q_unlinkables data):
    * cumulative proportion of records below a self-match weight. */
  def unlinkablesChart(unlinkables: DataFrame): ChartSpec =
    ChartSpec(mkSpec(dfRecords(unlinkables), titled("Unlinkable records") ~
      ("mark" -> (("type" -> "line") ~ ("point" -> true) ~ ("interpolate" -> "step-after"))) ~
      ("encoding" ->
        (("x" -> (("field" -> "match_weight") ~ ("type" -> "quantitative") ~
           ("title" -> "Self-match weight threshold"))) ~
         ("y" -> (("field" -> "cum_prop") ~ ("type" -> "quantitative") ~
           ("axis" -> ("format" -> ".0%")) ~
           ("title" -> "Proportion of unlinkable records"))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "match_weight") ~ ("type" -> "quantitative") ~ ("format" -> ".4g"): JValue,
           ("field" -> "match_probability") ~ ("type" -> "quantitative") ~ ("format" -> ".4g"),
           ("field" -> "cum_prop") ~ ("type" -> "quantitative") ~ ("format" -> ".2%"))))))))

  /** Completeness of each column per source dataset (`charts.py:611`,
    * q_completeness data). */
  def completenessChart(completeness: DataFrame): ChartSpec =
    ChartSpec(mkSpec(dfRecords(completeness), titled("Column completeness") ~
      ("mark" -> "bar") ~
      ("encoding" ->
        (("x" -> (("field" -> "completeness") ~ ("type" -> "quantitative") ~
           ("scale" -> ("domain" -> List(0.0, 1.0))) ~
           ("axis" -> ("format" -> ".0%")))) ~
         ("y" -> (("field" -> "column_name") ~ ("type" -> "nominal") ~ ("title" -> ""))) ~
         ("row" -> (("field" -> "source_dataset") ~ ("type" -> "nominal") ~
           ("header" -> ("labelAngle" -> 0)))) ~
         ("color" -> (("field" -> "completeness") ~ ("type" -> "quantitative") ~
           ("scale" -> (("scheme" -> "blues") ~ ("domain" -> List(0.0, 1.0)))) ~
           ("legend" -> JNull))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "column_name") ~ ("type" -> "nominal"): JValue,
           ("field" -> "source_dataset") ~ ("type" -> "nominal"),
           ("field" -> "total_rows") ~ ("type" -> "quantitative"),
           ("field" -> "non_null_rows") ~ ("type" -> "quantitative"),
           ("field" -> "completeness") ~ ("type" -> "quantitative") ~
             ("format" -> ".2%"))))))))

  /** Comparisons generated per blocking rule, marginal + cumulative
    * (`charts.py:617`, q_cumulative_comparisons data). */
  def cumulativeComparisonsChart(perRule: DataFrame): ChartSpec =
    ChartSpec(mkSpec(dfRecords(perRule),
      titled("Comparisons generated by blocking rule") ~
      ("mark" -> "bar") ~
      ("encoding" ->
        (("x" -> (("field" -> "row_count") ~ ("type" -> "quantitative") ~
           ("title" -> "Comparisons generated (marginal)"))) ~
         ("y" -> (("field" -> "rule") ~ ("type" -> "nominal") ~
           ("sort" -> ("field" -> "cumulative_rows")) ~ ("title" -> "Blocking rule"))) ~
         ("color" -> (("field" -> "rule") ~ ("type" -> "nominal") ~ ("legend" -> JNull))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "rule") ~ ("type" -> "nominal"): JValue,
           ("field" -> "match_key") ~ ("type" -> "nominal"),
           ("field" -> "row_count") ~ ("type" -> "quantitative"),
           ("field" -> "cumulative_rows") ~ ("type" -> "quantitative"),
           ("field" -> "cartesian") ~ ("type" -> "quantitative"))))))))

  /** TF-adjustment chart (`charts.py:650`, q_tf_chart data): adjusted
    * match weight of the most/least frequent values of a TF column. */
  def tfAdjustmentChart(tfChart: DataFrame): ChartSpec =
    ChartSpec(mkSpec(dfRecords(tfChart), titled("Term-frequency adjustments") ~
      ("mark" -> "bar") ~
      ("encoding" ->
        (("x" -> (("field" -> "value") ~ ("type" -> "nominal") ~
           ("sort" -> ("field" -> "tf")) ~ ("title" -> "Column value"))) ~
         ("y" -> (("field" -> "tf") ~ ("type" -> "quantitative") ~
           ("scale" -> ("type" -> "symlog")) ~ ("title" -> "Term frequency"))) ~
         ("column" -> (("field" -> "side") ~ ("type" -> "nominal") ~
           ("title" -> JNull))) ~
         ("color" -> (("field" -> "tf") ~ ("type" -> "quantitative") ~
           ("scale" -> ("scheme" -> "purples")) ~ ("legend" -> JNull))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "column_name") ~ ("type" -> "nominal"): JValue,
           ("field" -> "value") ~ ("type" -> "nominal"),
           ("field" -> "value_count") ~ ("type" -> "quantitative"),
           ("field" -> "tf") ~ ("type" -> "quantitative") ~ ("format" -> ".3e"))))))))

  /** Column-profile charts (`profile_data.json` layout): value-frequency
    * distribution plus top/bottom-k bars, one hconcat per column, fed by
    * the oracle-checked q_profile / q_profile_dist queries. */
  def profileColumnsChart(dist: DataFrame, topBottom: DataFrame): ChartSpec = {
    val distPanel: JObject =
      ("data" -> ("values" -> JArray(dfRecords(dist)))) ~
      ("mark" -> (("type" -> "line") ~ ("interpolate" -> "step-after"))) ~
      ("encoding" ->
        (("x" -> (("field" -> "percentile") ~ ("type" -> "quantitative") ~
           ("title" -> "Percentile of rows"))) ~
         ("y" -> (("field" -> "value_count") ~ ("type" -> "quantitative") ~
           ("scale" -> ("type" -> "symlog")) ~ ("title" -> "Value count"))) ~
         ("row" -> (("field" -> "column_name") ~ ("type" -> "nominal"))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "column_name") ~ ("type" -> "nominal"): JValue,
           ("field" -> "value_count") ~ ("type" -> "quantitative"),
           ("field" -> "percentile") ~ ("type" -> "quantitative") ~ ("format" -> ".2%"))))))
    val rankPanel: JObject =
      ("data" -> ("values" -> JArray(dfRecords(topBottom)))) ~
      ("mark" -> "bar") ~
      ("encoding" ->
        (("x" -> (("field" -> "value") ~ ("type" -> "nominal") ~
           ("sort" -> ("field" -> "rank")) ~ ("title" -> "Most frequent values"))) ~
         ("y" -> (("field" -> "value_count") ~ ("type" -> "quantitative"))) ~
         ("row" -> (("field" -> "column_name") ~ ("type" -> "nominal"))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "value") ~ ("type" -> "nominal"): JValue,
           ("field" -> "value_count") ~ ("type" -> "quantitative"),
           ("field" -> "rank") ~ ("type" -> "quantitative"))))))
    ChartSpec(("$schema" -> VegaLite.SchemaUrl) ~
      titled("Column profile") ~
      ("hconcat" -> JArray(List(distPanel: JValue, rankPanel))))
  }

  /** Comparator score heatmap (`charts.py:707`): similarity / distance of
    * example string pairs under every string kernel, evaluated with the
    * engine's own native expressions (one local Spark job over the
    * example list). */
  def comparatorScoreChart(spark: SparkSession,
      pairs: Seq[(String, String)]): ChartSpec = {
    import spark.implicits._
    val df = pairs.toDF("s1", "s2")
    val scored = df.select(col("s1"), col("s2"),
      expr("jaro_sim(s1, s2)").as("jaro"),
      expr("jaro_winkler(s1, s2)").as("jaro_winkler"),
      expr("jaccard_sim(s1, s2)").as("jaccard"),
      expr("levenshtein(s1, s2)").cast("double").as("levenshtein"),
      expr("damerau_levenshtein(s1, s2)").cast("double").as("damerau_levenshtein"))
    val recs = dfRecords(scored)
    ChartSpec(mkSpec(recs, titled("Comparator scores") ~
      ("transform" -> JArray(List(
        (("calculate" -> "datum.s1 + ' / ' + datum.s2") ~ ("as" -> "pair")): JValue,
        ("fold" -> List("jaro", "jaro_winkler", "jaccard",
          "levenshtein", "damerau_levenshtein")) ~ ("as" -> List("metric", "score"))))) ~
      ("mark" -> "rect") ~
      ("encoding" ->
        (("x" -> (("field" -> "metric") ~ ("type" -> "nominal") ~ ("title" -> ""))) ~
         ("y" -> (("field" -> "pair") ~ ("type" -> "nominal") ~ ("title" -> ""))) ~
         ("color" -> (("field" -> "score") ~ ("type" -> "quantitative") ~
           ("scale" -> ("scheme" -> "viridis")))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "pair") ~ ("type" -> "nominal"): JValue,
           ("field" -> "metric") ~ ("type" -> "nominal"),
           ("field" -> "score") ~ ("type" -> "quantitative") ~ ("format" -> ".4g"))))))))
  }
}
