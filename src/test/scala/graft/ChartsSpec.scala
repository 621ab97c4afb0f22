package graft

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.charts.{Charts, ChartSpec, Dashboards, VegaLite}
import graft.training.Training
import graft.model._
import graft.model.{LevelLibrary => ll}

/** Vega-Lite chart emitters + HTML dashboards (reference
  * `charts.py` / `splink_comparison_viewer.py` / `cluster_studio.py`). */
class ChartsSpec extends SparkSpec {
  import spark.implicits._

  def people = Seq(
    (0L, "John", "Smith", "1990-01-01", "js@x.com"),
    (1L, "Jhon", "Smith", "1990-01-01", "js@x.com"),
    (2L, "Mary", "Jones", "1985-05-05", "mj@y.com"),
    (3L, "Mary", "Jones", "1985-05-06", "mj@y.com"),
    (4L, "Peter", "Brown", "1970-12-31", "pb@z.com"),
    (5L, "Pete", "Brown", "1970-12-31", null),
    (6L, "Alice", "Smith", "2000-07-07", "as@w.com"),
    (7L, null, "Nguyen", "1999-09-09", "nn@v.com")
  ).toDF("unique_id", "first_name", "surname", "dob", "email")

  def settings: LinkSettings = LinkSettings(
    linkType = LinkType.DedupeOnly,
    blockingRules = Seq(BlockingRule.blockOn("surname")),
    comparisons = Seq(
      Comparison("first_name", Seq(
        ll.nullLevel("first_name"),
        ll.exactMatch("first_name").withM(0.7).withU(0.1),
        ll.levenshtein("first_name", 2).withM(0.2).withU(0.1),
        ll.elseLevel.withM(0.1).withU(0.8))),
      Comparison("dob", Seq(
        ll.nullLevel("dob"),
        ll.exactMatch("dob").withM(0.9).withU(0.02),
        ll.elseLevel.withM(0.1).withU(0.98)))),
    probabilityTwoRandomRecordsMatch = 0.01)

  private def parse(c: ChartSpec): JValue = JsonMethods.parse(c.json)

  private def arr(j: JValue): List[JValue] =
    j match { case JArray(vs) => vs; case _ => fail(s"not an array: $j") }

  test("comparisonLevelRecords: one record per active level plus the prior") {
    val recs = Charts.comparisonLevelRecords(settings)
    assert(recs.size == 1 + 3 + 2) // prior + first_name(3 active) + dob(2)
    val prior = recs.head
    assert(prior \ "comparison_name" == JString("Prior"))
    assert(prior \ "log2_bayes_factor" ==
      JDouble(settings.priorMatchWeight))
    // exact first_name level: log2(0.7/0.1)
    val exact = recs.find(r => r \ "sql_condition" ==
      JString("first_name_l = first_name_r")).get
    val JDouble(bf) = (exact \ "log2_bayes_factor"): @unchecked
    assert(math.abs(bf - math.log(7.0) / math.log(2.0)) < 1e-12)
  }

  test("matchWeightsChart: prior panel + level panel on a shared symmetric domain") {
    val c = Charts.matchWeightsChart(settings)
    val j = parse(c)
    assert(c.dataRowCount == 6)
    val panels = arr(j \ "vconcat")
    assert(panels.size == 2)
    val dom = arr(panels.head \ "encoding" \ "x" \ "scale" \ "domain")
      .map { case JDouble(d) => d; case JInt(i) => i.toDouble; case x => fail(x.toString) }
    assert(dom.size == 2 && dom(0) == -dom(1) && dom(1) > 0)
    // both panels share the same domain
    assert(panels(1) \ "encoding" \ "x" \ "scale" \ "domain" ==
      panels.head \ "encoding" \ "x" \ "scale" \ "domain")
  }

  test("muParametersChart: two log-scaled panels") {
    val j = parse(Charts.muParametersChart(settings))
    val panels = arr(j \ "hconcat")
    assert(panels.size == 2)
    assert(panels.head \ "encoding" \ "x" \ "field" == JString("m_probability"))
    assert(panels(1) \ "encoding" \ "x" \ "field" == JString("u_probability"))
    assert(panels.head \ "encoding" \ "x" \ "scale" \ "type" == JString("log"))
  }

  test("EM history charts: one record per iteration x level, slider bound to max iteration") {
    val linker = new Linker(people, settings)
    val em = linker.training.estimateParametersUsingExpectationMaximisation(
      BlockingRule.blockOn("surname"))
    assert(em.lambdaHistory.size == em.iterations + 1)
    assert(em.uHistory.size == em.mHistory.size)

    val lam = Charts.probabilityTwoRandomRecordsMatchIterationChart(em)
    assert(lam.dataRowCount == em.iterations + 1)

    val mw = Charts.matchWeightsInteractiveHistoryChart(em)
    val j = parse(mw)
    val activeLevels = em.activeComparisons
      .map(em.settings.comparisonByName).map(_.activeLevels.size).sum
    assert(mw.dataRowCount == (em.iterations + 1) * activeLevels)
    val JInt(sliderMax) =
      (arr(j \ "params").head \ "bind" \ "max"): @unchecked
    assert(sliderMax.toInt == em.iterations)

    val mu = Charts.muParametersInteractiveHistoryChart(em)
    assert(mu.dataRowCount == mw.dataRowCount)
    assert(arr(parse(mu) \ "hconcat").size == 2)
  }

  test("parameterEstimateComparisonsChart: a record per training-session estimate") {
    val linker = new Linker(people, settings)
    linker.training.estimateParametersUsingExpectationMaximisation(
      BlockingRule.blockOn("surname"))
    val c = Charts.parameterEstimateComparisonsChart(linker.settings)
    assert(c.dataRowCount > 0)
    val recs = arr(parse(c) \ "data" \ "values")
    assert(recs.forall(r => (r \ "parameter") match {
      case JString("m") | JString("u") => true; case _ => false
    }))
  }

  test("waterfallChart: floating bars accumulate to the final weight") {
    val linker = new Linker(people, settings)
    val wf = graft.evaluation.Evaluation
      .waterfallData(linker.predict(), linker.settings)
      .filter(col("unique_id_l") === 0 && col("unique_id_r") === 1)
    val c = Charts.waterfallChart(wf)
    val recs = arr(parse(c) \ "data" \ "values")
    assert(recs.size == 2 + settings.comparisons.size) // prior + comps + final
    val byTerm = recs.map(r => ((r \ "term"): @unchecked) match {
      case JString(t) => t -> r }).toMap
    val JDouble(finalEnd) = (byTerm("final") \ "end"): @unchecked
    val JDouble(lastCumEnd) = (recs(recs.size - 2) \ "end"): @unchecked
    assert(math.abs(finalEnd - lastCumEnd) < 1e-6)
    assert(byTerm("final") \ "start" == JDouble(0.0))
  }

  def truthSpace = Seq(
    (-5.0, 10L, 5L, 85L, 0L, 0.667, 1.0, 0.8),
    (0.0, 9L, 2L, 88L, 1L, 0.818, 0.9, 0.857),
    (5.0, 6L, 0L, 90L, 4L, 1.0, 0.6, 0.75)
  ).toDF("truth_threshold", "tp", "fp", "tn", "fn", "precision", "recall", "f1")

  test("truth-space charts: roc rates derived, accuracy folds 3 metrics, tool has a threshold param") {
    val roc = parse(Charts.rocChart(truthSpace))
    val first = arr(roc \ "data" \ "values").head
    val JDouble(fpr) = (first \ "fp_rate"): @unchecked
    assert(math.abs(fpr - 5.0 / 90.0) < 1e-9)
    val JDouble(tpr) = (first \ "tp_rate"): @unchecked
    assert(math.abs(tpr - 1.0) < 1e-9)

    val pr = parse(Charts.precisionRecallChart(truthSpace))
    assert(pr \ "encoding" \ "x" \ "field" == JString("recall"))

    val acc = parse(Charts.accuracyChart(truthSpace))
    val fold = arr(acc \ "transform").head \ "fold"
    assert(arr(fold).map { case JString(s) => s; case x => fail(x.toString) } ==
      List("precision", "recall", "f1"))

    val tool = parse(Charts.thresholdSelectionTool(truthSpace))
    assert(arr(tool \ "params").head \ "name" == JString("threshold_slider"))
    assert(arr(tool \ "layer").size == 2)
  }

  test("histogram / unlinkables / completeness / cumulative charts render from their queries") {
    val linker = new Linker(people, settings)
    val hist = linker.visualisations.matchWeightsHistogram(linker.predict())
    assert(hist.dataRowCount > 0)
    assert(parse(hist) \ "encoding" \ "y" \ "scale" \ "type" == JString("symlog"))

    val unl = linker.visualisations.unlinkablesChart()
    assert(unl.dataRowCount > 0)

    val comp = linker.visualisations.completenessChart(
      Seq("first_name", "email"))
    assert(comp.dataRowCount == 2) // one source dataset x two columns
    val compRecs = arr(parse(comp) \ "data" \ "values")
    val em = compRecs.find(r => r \ "column_name" == JString("email")).get
    assert(em \ "non_null_rows" == JInt(7) && em \ "total_rows" == JInt(8))

    val cum = linker.visualisations.cumulativeNumComparisonsFromBlockingRulesChart()
    assert(cum.dataRowCount == settings.blockingRules.size)
  }

  test("comparatorScoreChart evaluates the native kernels") {
    val c = Charts.comparatorScoreChart(spark,
      Seq(("martha", "marhta"), ("smith", "smyth")))
    val recs = arr(parse(c) \ "data" \ "values")
    assert(recs.size == 2)
    val JDouble(jaro) = (recs.head \ "jaro"): @unchecked
    assert(math.abs(jaro - 0.9444444444444445) < 1e-9) // published Jaro example
    assert(recs.forall(r => (r \ "levenshtein") match {
      case JDouble(_) | JInt(_) => true; case _ => false
    }))
  }

  test("viewerExampleRows: <=N deterministic examples per pattern, counts and proportions correct") {
    val linker = new Linker(people, settings)
    val rows = Dashboards.viewerExampleRows(linker.predict(), linker.settings, 2)
      .collect()
    val byPattern = rows.groupBy(_.getAs[String]("gam_concat"))
    assert(byPattern.values.forall(_.length <= 2))
    // group counts sum (once per pattern) to the total pair count
    val totalPairs = linker.predict().count()
    val counts = byPattern.view.mapValues(
      _.head.getAs[Long]("count_rows_in_comparison_vector_group")).toMap
    assert(counts.values.sum == totalPairs)
    val props = byPattern.view.mapValues(
      _.head.getAs[Double]("proportion_of_comparisons")).toMap
    assert(math.abs(props.values.sum - 1.0) < 1e-9)
    // deterministic: lowest (uid_l, uid_r) per pattern is example index 1
    rows.filter(_.getAs[Int]("row_example_index") == 1).foreach { r =>
      val pat = r.getAs[String]("gam_concat")
      val min = byPattern(pat).map(x =>
        (x.getAs[Long]("unique_id_l"), x.getAs[Long]("unique_id_r"))).min
      assert((r.getAs[Long]("unique_id_l"), r.getAs[Long]("unique_id_r")) == min)
    }
  }

  test("comparison viewer HTML embeds the rows and model as a parseable data island") {
    val linker = new Linker(people, settings)
    val html = Dashboards.comparisonViewerHtml(linker.predict(), linker.settings)
    assert(html.contains("<!DOCTYPE html>"))
    val island = html.split("""<script type="application/json" id="data">""")(1)
      .split("</script>")(0)
    val data = JsonMethods.parse(island.replace("<\\/", "</"))
    val rows = arr(data \ "rows")
    assert(rows.nonEmpty)
    assert(arr(data \ "comparisons").size == settings.comparisons.size)
    // no external JS dependency — the page must work fully offline
    assert(!html.contains("cdn.") && !html.contains("http"))
  }

  test("cluster studio HTML embeds sampled clusters' nodes and edges") {
    val linker = new Linker(people, settings)
    val preds = linker.predict()
    val clusters = linker.clusterPairwisePredictionsAtThreshold(preds, 0.5)
    val html = linker.visualisations.clusterStudioDashboard(
      preds, clusters, "/tmp/cluster_studio_test.html",
      samplingMethod = "by_cluster_size", sampleSize = 2)
    val island = html.split("""<script type="application/json" id="data">""")(1)
      .split("</script>")(0)
    val data = JsonMethods.parse(island.replace("<\\/", "</"))
    val nodes = arr(data \ "nodes")
    assert(nodes.nonEmpty)
    val clusterIds = nodes.map(n => n \ "cluster_id").distinct
    assert(clusterIds.size <= 2)
    // every embedded edge belongs to a sampled cluster
    arr(data \ "edges").foreach { e =>
      assert(clusterIds.contains(e \ "cluster_id"))
    }
    assert(new java.io.File("/tmp/cluster_studio_test.html").length() > 0)
  }

  test("ChartSpec.html inlines the spec as a JSON island") {
    val c = Charts.matchWeightsChart(settings)
    val html = c.html("test chart")
    val island = html.split("""<script type="application/json" id="spec">""")(1)
      .split("</script>")(0)
    val j = JsonMethods.parse(island.replace("<\\/", "</"))
    assert(j \ "$schema" == JString(VegaLite.SchemaUrl))
    assert(arr(j \ "data" \ "values").size == c.dataRowCount)
  }

  test("labelling tool: full-block candidates above threshold, exportable labels UI") {
    val linker = new Linker(people, settings)
    // threshold low enough to keep everything: 8 records -> 7 candidates
    // for record 0 (self pair excluded only if it scores, crossJoin keeps
    // it — the reference keeps the self-comparison too)
    val cands = linker.visualisations.labellingToolComparisons(
      0L, matchWeightThreshold = -1000.0)
    assert(cands.count() == 8) // record 0 vs all 8 (incl. itself), full block
    // threshold filters: only pairs scoring above it survive
    val strict = linker.visualisations.labellingToolComparisons(
      0L, matchWeightThreshold = 5.0)
    assert(strict.count() < 8)
    strict.select("match_weight").collect()
      .foreach(r => assert(r.getDouble(0) > 5.0))

    val html = Dashboards.labellingToolHtml(cands, linker.settings)
    val island = html.split("""<script type="application/json" id="data">""")(1)
      .split("</script>")(0)
    val data = JsonMethods.parse(island.replace("<\\/", "</"))
    assert(arr(data \ "rows").size == 8)
    assert(html.contains("clerical_match_score"))
    assert(!html.contains("cdn.") && !html.contains("http"))
  }

  test("tf adjustment and profile charts render") {
    val linker = new Linker(people, settings)
    val tf = linker.visualisations.tfAdjustmentChart("surname", 3)
    assert(tf.dataRowCount > 0)

    val dist = graft.evaluation.Evaluation.profileDistribution(
      people, Seq("surname"))
    val top = graft.evaluation.Evaluation.profileColumns(
      people, Seq("surname"), 3)
    val prof = Charts.profileColumnsChart(dist, top)
    val panels = arr(parse(prof) \ "hconcat")
    assert(panels.size == 2)
    assert(panels.forall(p => arr(p \ "data" \ "values").nonEmpty))
  }

  test("cluster studio keeps an edge only when BOTH endpoints share the " +
      "sampled cluster") {
    // 2-3 bridges two sampled clusters (a sub-threshold edge in the full
    // predict output): it must not surface in either cluster's view —
    // the reference's edge query filters on both endpoints
    // (cluster_studio.py:101-155)
    val nodes = Seq((1L, 100L), (2L, 100L), (3L, 200L), (4L, 200L))
      .toDF("node_id", "cluster_id")
    val edges = Seq((1L, 2L, 0.9), (3L, 4L, 0.8), (2L, 3L, 0.4))
      .toDF("unique_id_l", "unique_id_r", "match_probability")
    val ids = Seq(100L, 200L).toDF("cluster_id")
    val (keptNodes, keptEdges) =
      Dashboards.clusterStudioData(nodes, edges, ids)
    assert(keptNodes.count() == 4)
    val kept = keptEdges.select("unique_id_l", "unique_id_r", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept == Set((1L, 2L, 100L), (3L, 4L, 200L)), s"got $kept")
  }

  test("dashboard JS escapes data-derived markup") {
    val linker = new Linker(people, settings)
    val html = Dashboards.comparisonViewerHtml(linker.predict(), settings)
    // the esc() helper must exist and guard every innerHTML interpolation
    // of row values / labels (the JSON island itself is injection-safe)
    assert(html.contains("function esc("))
    assert(html.contains("esc(b.label)") && html.contains("esc(r[c])"))
  }

  test("emIterationRecords covers every m iteration when uHistory is absent") {
    val em = Training.EMResult(settings, iterations = 2, converged = true,
      history = Seq(0.1, 0.01), trainedLambda = 0.3,
      trainedLambdaGlobal = 0.3, deactivated = Nil,
      lambdaHistory = Seq(0.2, 0.3),
      mHistory = Seq(
        Array(Map(1 -> 0.6, 2 -> 0.2, 0 -> 0.2), Map(1 -> 0.8, 0 -> 0.2)),
        Array(Map(1 -> 0.7, 2 -> 0.1, 0 -> 0.2), Map(1 -> 0.9, 0 -> 0.1))),
      uHistory = Nil, // results recorded before uHistory existed
      activeComparisons = Seq("first_name", "dob"))
    val recs = Charts.emIterationRecords(em)
    val iters = recs.map(r => r \ "iteration").collect {
      case JInt(i) => i.toInt }.distinct.sorted
    assert(iters == List(0, 1), s"expected both iterations, got $iters")
    // u falls back to the settings' final u per level, never 0
    assert(recs.forall(r => (r \ "u_probability") match {
      case JDouble(d) => d > 0; case _ => false }))
  }

  test("dashboard JS executes end-to-end under node (DOM shim)") {
    // run the embedded dashboard scripts for real — dropdown render,
    // waterfall SVG, labelling buttons, offline chart fallback — via
    // tools/dashboard_smoke.js; skipped when node is not on PATH
    val node = scala.util.Try(
      scala.sys.process.Process(Seq("node", "--version")).!!).isSuccess
    assume(node, "node not available")
    val dir = java.nio.file.Files.createTempDirectory("graft-dash").toString
    val linker = new Linker(people, settings)
    val preds = linker.predict()
    val clusters = linker.clusterPairwisePredictionsAtThreshold(preds, 0.2)
    linker.visualisations.comparisonViewerDashboard(
      preds, s"$dir/viewer.html")
    linker.visualisations.clusterStudioDashboard(
      preds, clusters, s"$dir/studio.html", sampleSize = 2)
    linker.visualisations.labellingToolForRecord(0L, s"$dir/label.html")
    graft.charts.Dashboards.saveHtml(
      Charts.matchWeightsChart(settings).html("mw"), s"$dir/chart.html")
    Seq("viewer", "studio", "label", "chart").foreach { f =>
      val code = scala.sys.process.Process(
        Seq("node", "tools/dashboard_smoke.js", s"$dir/$f.html")).!
      assert(code == 0, s"dashboard smoke failed for $f.html")
    }
  }

  test("threshold selection tool renders an empty truth space") {
    val empty = Seq.empty[(Double, Long, Long, Long, Long, Double, Double, Double)]
      .toDF("truth_threshold", "tp", "fp", "tn", "fn",
        "precision", "recall", "f1")
    val spec = Charts.thresholdSelectionTool(empty)
    val j = parse(spec)
    assert(arr(j \ "data" \ "values").isEmpty)
  }
}
