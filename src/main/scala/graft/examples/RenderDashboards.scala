package graft.examples

import org.apache.spark.sql.SparkSession
import graft.Linker
import graft.model._
import graft.model.{LevelLibrary => ll}

/** Render every offline HTML dashboard against the synthetic `customer`
  * table — the three interactive surfaces a linkage analyst uses
  * (comparison viewer, cluster studio, labelling tool) plus the Vega-Lite
  * chart shell, written as self-contained files a browser opens with no
  * network access. Usage:
  * `runMain graft.examples.RenderDashboards [sfDir] [outDir]`. */
object RenderDashboards {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/graft-dash"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .withColumnRenamed("c_custkey", "unique_id")
    val settings = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(
        BlockingRule.blockOn("c_nationkey", "c_mktsegment"),
        BlockingRule.blockOn("c_nationkey", "round(c_acctbal, -2)")),
      comparisons = Seq(
        Comparison("c_name", Seq(
          ll.nullLevel("c_name"),
          ll.exactMatch("c_name").withM(0.9).withU(0.001),
          ll.levenshtein("c_name", 3).withM(0.08).withU(0.01),
          ll.jaroWinkler("c_name", 0.85).withM(0.01).withU(0.05),
          ll.elseLevel.withM(0.01).withU(0.939))),
        Comparison("c_acctbal", Seq(
          ll.nullLevel("c_acctbal"),
          ll.absoluteDifference("c_acctbal", 100.0).withM(0.7).withU(0.02),
          ll.elseLevel.withM(0.3).withU(0.98)))),
      probabilityTwoRandomRecordsMatch = 0.001)

    val linker = new Linker(customer, settings)
    val preds = linker.predict()
    val clusters = linker.clusterPairwisePredictionsAtThreshold(preds, 0.2)

    new java.io.File(out).mkdirs()
    linker.visualisations.comparisonViewerDashboard(
      preds, s"$out/comparison_viewer.html")
    linker.visualisations.clusterStudioDashboard(
      preds, clusters, s"$out/cluster_studio.html",
      samplingMethod = "by_cluster_size", sampleSize = 5)
    linker.visualisations.labellingToolForRecord(
      customer.head().getAs[Long]("unique_id"), s"$out/labelling_tool.html")
    graft.charts.Dashboards.saveHtml(
      linker.visualisations.matchWeightsChart().html("Match weights"),
      s"$out/match_weights.html")
    println(s"dashboards written to $out")
    spark.stop()
  }
}
