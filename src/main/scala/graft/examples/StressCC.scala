package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.clustering.ConnectedComponents
import graft.operators.Materialise

/** Scale exercise for the distributed clustering loop under the
  * cluster-default parquet lineage-break policy: a synthetic multi-million-
  * edge graph (far above the 2M-edge driver fast-path gate) with a mix of
  * long chains (deep diameter — many pointer-jumping rounds), hub stars
  * (skew) and random noise edges. Checks the answer against the known
  * construction and reports wall time plus peak scratch footprint —
  * the loop's superseded neighbour frames must be reclaimed per round,
  * not accumulate one full copy per iteration.
  *
  * Usage: `runMain graft.examples.StressCC [nEdgesMillions]` (default 4).
  */
object StressCC {
  def main(args: Array[String]): Unit = {
    val millions = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.graft.breakLineage", "parquet")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = millions * 1000000L
    // chain edges inside groups of 1000 -> components of a known size with
    // diameter ~1000 (stresses pointer jumping); every 10th group gets a
    // hub star on top (skew); plus intra-group noise edges
    val groups = n / 1000L
    val base = spark.range(n)
      .select(col("id"),
        (col("id") / 1000L).cast("long").as("g"),
        pmod(col("id"), lit(1000L)).as("i"))
    val chain = base.filter(col("i") > 0)
      .select(col("id").as("unique_id_l"), (col("id") - 1L).as("unique_id_r"))
    val star = base.filter(col("i") > 0 && pmod(col("g"), lit(10L)) === 0)
      .select(col("id").as("unique_id_l"), (col("g") * 1000L).as("unique_id_r"))
    val noise = base.filter(pmod(col("id"), lit(7L)) === 3)
      .select(col("id").as("unique_id_l"),
        (col("g") * 1000L + pmod(col("id") * 2654435761L, lit(1000L)))
          .as("unique_id_r"))
    val edges = chain.unionByName(star).unionByName(noise)
      .filter(col("unique_id_l") =!= col("unique_id_r"))

    val scratch = java.nio.file.Files
      .createTempDirectory("graft-stress-scratch").toString
    spark.conf.set(Materialise.ScratchDirKey, scratch)

    def scratchBytes(): Long = {
      def size(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).fold(0L)(_.map(size).sum)
        else f.length
      size(new java.io.File(scratch))
    }

    val t0 = System.nanoTime()
    // force the distributed loop — this is a distributed-scale exercise
    val cc = ConnectedComponents.run(edges, smallGraphThreshold = 0L)
    val clusters = cc.groupBy("cluster_id").count()
    val (nClusters, maxSize) = clusters
      .agg(count(lit(1)), max(col("count")))
      .as[(Long, Long)].head()
    val secs = (System.nanoTime() - t0) / 1e9

    // every group of 1000 ids is one component by construction
    val ok = nClusters == groups && maxSize == 1000L
    println(f"edges=${edges.count()}%,d clusters=$nClusters%,d " +
      f"(expected $groups%,d) maxSize=$maxSize%,d " +
      f"wall=${secs}%.1fs scratchAfter=${scratchBytes() / 1e6}%.1fMB " +
      (if (ok) "OK" else "MISMATCH"))
    if (!ok) sys.exit(1)
    spark.stop()
  }
}
