package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Linker
import graft.model._
import graft.model.{LevelLibrary => ll}

/** Example: dedupe-style linkage over the synthetic TPC-H `customer` table
  * — the library consumed exactly as a user would. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .withColumnRenamed("c_custkey", "unique_id")
    println(s"input rows: ${customer.count()}")

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
    val pairs = linker.blockedIdPairs()
    println(s"blocked pairs: ${pairs.count()}")
    pairs.groupBy("match_key").count().show()

    val preds = linker.predict()
    println("prediction sample (top by weight):")
    preds.orderBy(desc("match_weight"))
      .select("match_weight", "match_probability", "unique_id_l", "unique_id_r",
        "gamma_c_name", "gamma_c_acctbal")
      .show(5, truncate = false)

    println("physical plan for predict:")
    preds.explain("formatted")

    val clusters = linker.clusterPairwisePredictionsAtThreshold(preds, 0.5)
    println(s"clustered rows: ${clusters.count()}, " +
      s"distinct clusters: ${clusters.select("cluster_id").distinct().count()}")
    spark.stop()
  }
}
