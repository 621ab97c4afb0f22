package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.clustering.{ClusteringOps, DistributedBridges}

/** Phase breakdown for the q_bridges / q_articulation bench shape — the
  * largest remaining sf10 cost block. Reproduces the bench's closed-form
  * family (even custkeys: triangles through the task-side Tarjan; odd:
  * 5-node stars forced through the fully distributed path by
  * maxClusterSize=3) and times each branch separately:
  *
  *   T  task-side Tarjan only  (maxClusterSize raised: nothing distributes)
  *   S  skipOversize           (Tarjan branch + NULL rows: no distributed work)
  *   D  distributed only       (only the oversized clusters, direct call)
  *   F  full query shape       (what the bench measures)
  *
  * D-vs-(F-S) cross-checks attribution; inside D the DistributedBridges
  * phases surface through SPARK_GRAFT_BRIDGE_VERBOSE.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.examples.ProfileGraph`
  * (defaults to /root/testdata/sf0.1).
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val custPath = {
      val bare = new java.io.File(s"$dir/customer")
      if (bare.exists()) bare.getPath else s"$dir/customer.parquet"
    }
    val base = spark.read.parquet(custPath)
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

    val taskCount = new java.util.concurrent.atomic.AtomicLong
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            ev: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          taskCount.incrementAndGet()
          if (ev.taskInfo != null) taskTimeMs.addAndGet(ev.taskInfo.duration)
        }
      })
    def timed(label: String)(body: => Long): Unit = {
      val (c0, m0) = (taskCount.get(), taskTimeMs.get())
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[graph-profile] $label%-36s $sec%8.2fs wall " +
        f"${(taskTimeMs.get() - m0) / 1e3}%8.1fs task-time / " +
        f"${taskCount.get() - c0}%d tasks  (rows=$n%d)")
      spark.catalog.clearCache()
    }

    println(s"[graph-profile] dir=$dir")
    val oversizedOnly = edges.alias("e")
      .join(clusters.alias("c"), col("e.unique_id_l") === col("c.node_id"))
      .select(col("c.cluster_id"), col("e.unique_id_l"), col("e.unique_id_r"))
      .filter(pmod(col("cluster_id") / 10, lit(2)) === 1)

    // --- bridges family ---
    timed("bridges T tarjan-only (cap 16)") {
      ClusteringOps.edgeBridges(clusters, edges, maxClusterSize = 16).count()
    }
    timed("bridges S skipOversize (cap 3)") {
      ClusteringOps.edgeBridges(clusters, edges, maxClusterSize = 3,
        skipOversize = true).count()
    }
    timed("bridges D distributed-only") {
      DistributedBridges.bridges(oversizedOnly).count()
    }
    timed("bridges F full bench shape") {
      ClusteringOps.edgeBridges(clusters, edges, maxClusterSize = 3,
        distributeOversize = true).count()
    }
    // --- articulation family ---
    timed("artic   T tarjan-only (cap 16)") {
      ClusteringOps.articulationPoints(clusters, edges,
        maxClusterSize = 16).count()
    }
    timed("artic   S skipOversize (cap 3)") {
      ClusteringOps.articulationPoints(clusters, edges, maxClusterSize = 3,
        skipOversize = true).count()
    }
    timed("artic   D distributed-only") {
      DistributedBridges.articulationPoints(oversizedOnly).count()
    }
    timed("artic   F full bench shape") {
      ClusteringOps.articulationPoints(clusters, edges, maxClusterSize = 3,
        distributeOversize = true).count()
    }
    spark.stop()
  }
}
