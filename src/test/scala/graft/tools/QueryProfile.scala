package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: run named SparkEntry queries twice (cold + warm) with
  * per-job wall timings. `sbt "Test/runMain graft.tools.QueryProfile q_a q_b"` */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobTimes = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    val starts = scala.collection.mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts(js.jobId) = js.time
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobTimes += ((je.jobId, starts.getOrElse(je.jobId, je.time), je.time))
      })
    spark.read.parquet(s"$dir/nation.parquet").count() // warmup
    args.foreach { name =>
      (1 to 2).foreach { pass =>
        jobTimes.clear()
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(bit_xor(col("h"))).collect()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val js = jobTimes.sortBy(_._1)
        val jsum = js.map(j => j._3 - j._2).sum / 1e3
        println(f"PROFILE $name pass$pass $wall%6.2f s jobs=${js.size} " +
          f"jobtime=$jsum%.1f s gap=${wall - jsum}%.1f s")
      }
    }
    spark.stop()
  }
}
