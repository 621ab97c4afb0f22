package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.DedupOps

object ProfileSimhash {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("count")(d.count())
    time("shingles sum")(
      d.select(size(DedupOps.shingles(col("text"), 8)).as("n")).agg(sum("n")).collect())
    time("minhash sig")(
      d.select(size(DedupOps.minhashSignature(col("text"), 8, 32)).as("n")).agg(sum("n")).collect())
    time("simhash")(
      d.select(DedupOps.simhash(DedupOps.shingles(col("text"), 8)).as("sh")).agg(max("sh")).collect())
    val full = DedupOps.simhashDedupPairs(d, "doc_id", "text", 6)
    time("simhash pairs")(println("rows=" + full.count()))
    val mh = DedupOps.minhashDedupPairs(d, "doc_id", "text", 32, 4, 0.5)
    time("minhash pairs")(println("rows=" + mh.count()))
    spark.stop()
  }
}
