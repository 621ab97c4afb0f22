package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.clustering.ConnectedComponents

object ProfileCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val edges = o.select(col("o_custkey"), col("o_orderkey"),
      lag("o_orderkey", 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .select(col("prev").as("unique_id_l"), col("o_orderkey").as("unique_id_r"))
      .cache()
    edges.count()
    for (eager <- Seq(true, false); trial <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = ConnectedComponents.run(edges, eager = eager).count()
      println(f"CC eager=$eager trial$trial: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    spark.stop()
  }
}
