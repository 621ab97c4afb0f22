package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.clustering.{ClusteringOps, ConnectedComponents}

/** Scale exercise for the distributed Tarjan–Vishkin articulation pass:
  * a planted multi-million-edge graph whose cut vertices are known by
  * construction. Each group of 1000 nodes is 10 chained hub blocks —
  * hub + 99 leaves, consecutive hubs linked — so exactly the 10 hubs per
  * group are articulation points (every hub separates its leaves; interior
  * hubs also separate the chain). Diameter ~22 keeps the BFS + three
  * depth-peeling folds at a bounded round count while the graph itself is
  * far beyond any task-side solve.
  *
  * Usage: `runMain graft.examples.StressArticulation [nEdgesMillions]`
  * (default 2).
  */
object StressArticulation {
  def main(args: Array[String]): Unit = {
    val millions = if (args.nonEmpty) args(0).toInt else 2
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.graft.breakLineage", "parquet")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ~1000 edges per 1000-node group
    val groups = millions * 1000L
    val n = groups * 1000L
    // NB Spark's long/long column division is TRUE division — cast back
    val base = spark.range(n).select(col("id"),
      (col("id") / 1000L).cast("long").as("g"),                 // group
      (pmod(col("id"), lit(1000L)) / 100L).cast("long").as("b"), // block
      pmod(col("id"), lit(100L)).as("i"))                       // in block
    def hub(g: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      g * 1000L + b * 100L
    // leaf -> its block hub
    val leafEdges = base.filter(col("i") > 0)
      .select(col("id").as("unique_id_l"),
        hub(col("g"), col("b")).as("unique_id_r"))
    // hub chain inside the group
    val hubEdges = base.filter(col("i") === 0 && col("b") > 0)
      .select(col("id").as("unique_id_l"),
        hub(col("g"), col("b") - 1L).as("unique_id_r"))
    val edges = leafEdges.unionByName(hubEdges)

    val t0 = System.nanoTime()
    val clusters = ConnectedComponents.run(edges)
      .withColumnRenamed("node_id", "node_id")
    val flagged = ClusteringOps.articulationPoints(clusters, edges,
      maxClusterSize = 1, distributeOversize = true) // force distributed
    val (nNodes, nCut) = flagged.agg(count(lit(1)),
      sum(when(col("is_articulation"), 1L).otherwise(0L)))
      .as[(Long, Long)].head()
    val secs = (System.nanoTime() - t0) / 1e9

    // wrong hubs? every flagged node must be a hub id (i == 0)
    val nonHubFlagged = flagged.filter(col("is_articulation") &&
      pmod(col("node_id"), lit(100L)) =!= 0).count()
    val expectedCut = groups * 10L
    val ok = nCut == expectedCut && nonHubFlagged == 0 && nNodes == n
    println(f"edges=${edges.count()}%,d nodes=$nNodes%,d " +
      f"cutVertices=$nCut%,d (expected $expectedCut%,d) " +
      f"nonHubFlagged=$nonHubFlagged wall=$secs%.1fs " +
      (if (ok) "OK" else "MISMATCH"))
    if (!ok) sys.exit(1)
    spark.stop()
  }
}
