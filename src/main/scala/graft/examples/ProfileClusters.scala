package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiler for the cluster-family bench queries (not part of the
  * driver contract): times each stage of the orders path-graph pipeline so
  * the per-query ~2s warm cost can be attributed. */
object ProfileClusters {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup pass (same shape, absorb codegen)
    (1 to 2).foreach { pass =>
      println(s"=== pass $pass ===")
      val o = t("read orders")(
        spark.read.parquet(s"$dir/orders.parquet"))
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val edges = t("edges window+checkpoint") {
        o.select(col("o_orderkey"), lag("o_orderkey", 1).over(w).as("prev"))
          .filter(col("prev").isNotNull)
          .select(col("prev").as("unique_id_l"), col("o_orderkey").as("unique_id_r"))
          .localCheckpoint(true)
      }
      println(s"[profile] edge rows: ${edges.count()}")
      val clusters = t("CC.run total")(
        graft.clustering.ConnectedComponents.run(edges))
      t("clusters materialise (count)")(clusters.count())
      val metrics = t("clusterMetrics+collect") {
        graft.clustering.ClusteringOps.clusterMetrics(clusters, edges)
          .agg(bit_xor(xxhash64(struct(col("cluster_id"), col("n_nodes"), col("n_edges"))))).collect()
      }
      val _ = metrics
    }
    spark.stop()
  }
}
