package graft.examples

import org.apache.spark.sql.SparkSession

/** Plan-inspection aid: prints the formatted physical plan (and optionally
  * runs) one SparkEntry query. Usage:
  *   sbt "runMain graft.examples.Explain q_predict /root/testdata/sf0.01 [run]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val run = args.contains("run")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (run) {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(bit_xor(org.apache.spark.sql.functions.col("h"))).collect()
      System.err.println(f"[explain] $name ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
