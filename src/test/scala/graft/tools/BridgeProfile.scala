package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.clustering.ClusteringOps

/** Scratch profiler for the q_bridges phases (not a test; run via
  * `sbt "Test/runMain graft.tools.BridgeProfile"`). */
object BridgeProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val jobTimes = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    val starts = scala.collection.mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts(js.jobId) = js.time
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobTimes += ((je.jobId, starts.getOrElse(je.jobId, je.time),
            je.time))
      })
    def t[A](name: String)(body: => A): A = {
      jobTimes.clear()
      val t0 = System.nanoTime(); val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val js = jobTimes.sortBy(_._1)
      val detail = js.map { case (id, s, e) => f"j$id:${(e - s) / 1e3}%.1f" }
        .mkString(" ")
      println(f"PROFILE $name%-24s $wall%6.2f s  jobs=${js.size} [$detail]")
      r
    }
    // warmup
    spark.read.parquet(s"$dir/nation.parquet").count()

    val base = spark.read.parquet(s"$dir/customer.parquet")
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

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val out = t("edgeBridges TOTAL") {
        val r = ClusteringOps.edgeBridges(clusters, edges, maxClusterSize = 3,
          distributeOversize = true)
        r.select(xxhash64(struct(r.columns.map(col): _*)).as("h"))
          .agg(bit_xor(col("h"))).collect()
      }
      // distributed-only slice: feed ONLY the oversized half straight in
      t("DistributedBridges only") {
        val odd = base.filter(col("odd") === 1)
        val oe = odd.select(col("b"), explode(array(
            e(col("b"), col("b") + 1), e(col("b"), col("b") + 2),
            e(col("b"), col("b") + 3), e(col("b"), col("b") + 4),
            e(col("b") + 1, col("b") + 2))).as("ed"))
          .select(col("b").cast("string").as("cluster_id"),
            col("ed.l").as("unique_id_l"), col("ed.r").as("unique_id_r"))
        val r = graft.clustering.DistributedBridges.bridges(oe)
        r.select(xxhash64(struct(r.columns.map(col): _*)).as("h"))
          .agg(bit_xor(col("h"))).collect()
      }
      t("tarjan only") {
        val r = ClusteringOps.edgeBridges(clusters, edges,
          maxClusterSize = 5, distributeOversize = true)
        r.select(xxhash64(struct(r.columns.map(col): _*)).as("h"))
          .agg(bit_xor(col("h"))).collect()
      }
    }
    spark.stop()
  }
}
