package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Linker
import graft.model._
import graft.model.{LevelLibrary => ll}

/** Verification probes: injected duplicate must link+cluster; bad column
  * names must fail with a clear error; CC must handle an empty edge set. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumnRenamed("c_custkey", "unique_id")
    // inject a near-duplicate of customer 7 with a typo'd name
    val dup = customer.filter(col("unique_id") === 7)
      .withColumn("unique_id", lit(9007L))
      .withColumn("c_name", concat(col("c_name"), lit("x")))
    val data = customer.unionByName(dup)

    val settings = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(BlockingRule.blockOn("c_nationkey")),
      comparisons = Seq(
        Comparison("c_name", Seq(
          ll.nullLevel("c_name"),
          ll.exactMatch("c_name").withM(0.9).withU(0.001),
          ll.jaroWinkler("c_name", 0.9).withM(0.08).withU(0.001),
          ll.elseLevel.withM(0.02).withU(0.998))),
        Comparison("c_acctbal", Seq(
          ll.nullLevel("c_acctbal"),
          ll.absoluteDifference("c_acctbal", 1.0).withM(0.9).withU(0.001),
          ll.elseLevel.withM(0.1).withU(0.999)))),
      probabilityTwoRandomRecordsMatch = 0.001)

    val linker = new Linker(data, settings)
    val preds = linker.predict(thresholdMatchProbability = Some(0.9))
    println("PROBE1 high-confidence pairs:")
    preds.select("unique_id_l", "unique_id_r", "match_probability").show(5, false)
    val clusters = linker.clusterPairwisePredictionsAtThreshold(linker.predict(), 0.9)
    println("PROBE1 cluster of 7 and 9007:")
    clusters.filter(col("unique_id").isin(7L, 9007L)).select("unique_id", "cluster_id").show()

    println("PROBE2 nonexistent blocking column:")
    try {
      val bad = settings.copy(blockingRules = Seq(BlockingRule.blockOn("no_such_col")))
      new Linker(data, bad).blockedIdPairs().count()
      println("PROBE2 UNEXPECTED SUCCESS")
    } catch {
      case e: Exception =>
        println("PROBE2 error class: " + e.getClass.getSimpleName)
        println("PROBE2 message head: " + e.getMessage.linesIterator.next())
    }

    println("PROBE3 comparison referencing missing column:")
    try {
      val bad = settings.copy(comparisons = settings.comparisons :+
        Comparison("ghost", Seq(ll.nullLevel("ghost"),
          ll.exactMatch("ghost").withM(0.5).withU(0.5), ll.elseLevel)))
      new Linker(data, bad).predict().count()
      println("PROBE3 UNEXPECTED SUCCESS")
    } catch {
      case e: Exception =>
        println("PROBE3 error class: " + e.getClass.getSimpleName)
        println("PROBE3 message head: " + e.getMessage.linesIterator.next())
    }

    println("PROBE4 clustering with zero edges above threshold:")
    val none = linker.clusterPairwisePredictionsAtThreshold(linker.predict(), 1.1)
    println(s"PROBE4 rows=${none.count()} distinct=${none.select("cluster_id").distinct().count()}")

    println("PROBE5 articulation on a DISCONNECTED cluster frame (violated " +
      "CC contract must fail loudly, not hang or mislabel):")
    try {
      import spark.implicits._
      // nodes 1..4 labelled one cluster but edges connect only (1,2), (3,4)
      val badClusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L))
        .toDF("node_id", "cluster_id")
      val splitEdges = Seq((1L, 2L), (3L, 4L))
        .toDF("unique_id_l", "unique_id_r")
      graft.clustering.ClusteringOps.articulationPoints(badClusters,
        splitEdges, maxClusterSize = 1, distributeOversize = true).count()
      println("PROBE5 UNEXPECTED SUCCESS")
    } catch {
      case e: Exception =>
        println("PROBE5 error class: " + e.getClass.getSimpleName)
        println("PROBE5 message head: " + e.getMessage.linesIterator.next())
    }

    println("PROBE6 autoSalt leaves exploding + custom rules untouched and " +
      "predict output identical:")
    locally {
      val before = linker.predict().count()
      spark.conf.set("spark.graft.autoSalt", "true")
      try {
        val after = new Linker(data, settings).predict().count()
        println(s"PROBE6 pairs unsalted=$before autosalted=$after " +
          (if (before == after) "IDENTICAL" else "MISMATCH"))
      } finally spark.conf.unset("spark.graft.autoSalt")
    }
    spark.stop()
  }
}
