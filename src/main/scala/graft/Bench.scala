package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (also written to bench_out.json for the driver).
  *
  * Each query is forced to FULL evaluation by hashing every output column
  * (xxhash64 over a struct of all columns, summed) — a bare count() lets
  * Catalyst prune unused projections, which benches pure-projection
  * queries as scan-only.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BENCH_REPEAT > 1 reruns the whole suite in-JVM and
    // reports the LAST pass, separating codegen/JIT warmup from data cost
    // (profiling aid; the driver uses the default single cold pass).
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "1").toInt
    // Untimed warmup: exercise the scan/join/window/agg/codegen machinery
    // once so one-time JVM costs (class loading, Janino, JIT) do not land
    // in whichever query happens to run first. Standard bench hygiene —
    // every query's own work is still measured cold.
    locally {
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val grouped = n.alias("a")
        .join(n.alias("b"), col("a.n_regionkey") === col("b.n_regionkey"))
        .groupBy(col("a.n_regionkey")).agg(count(lit(1)).as("c"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy("c")
      grouped.withColumn("r", row_number().over(win))
        .agg(bit_xor(xxhash64(struct(col("c"), col("r"))))).collect()
    }
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the suite (profiling aid)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None => SparkEntry.queries
    }
    def onePass(): Map[String, Double] = selected.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          // bit_xor, not sum: ANSI mode makes a LONG sum of 2^63-range hashes
          // throw ARITHMETIC_OVERFLOW; xor is closed over Long.
          df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
            .agg(bit_xor(col("h"))).collect()
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage.take(300)}")
        }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val results = (1 to repeat).map(_ => onePass()).last
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    // Stop Spark BEFORE emitting the JSON so no shutdown log line can land
    // after it: with run/outputStrategy=StdoutOutput and showSuccess=false
    // (build.sbt) the bare JSON is the final line of `sbt runMain` output.
    spark.stop()
    println(json)
    System.err.println(json)
  }
}
