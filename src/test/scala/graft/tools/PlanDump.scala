package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan dumper for the optimization-round evidence files: writes
  * `.explain("formatted")` for each named SparkEntry query to
  * `<outdir>/<query>_<suffix>.txt`. Usage:
  * `sbt "Test/runMain graft.tools.PlanDump <outdir> <suffix> q_a q_b ..."`
  * with the data dir from SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    Files.createDirectories(outDir)
    // Same core count / shuffle parallelism the bench uses: dumped "bench
    // plan evidence" must come from the partitioning and AQE context the
    // bench actually plans under, not a hardcoded local[8].
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var failures = 0
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val txt =
          df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"wrote ${name}_$suffix.txt (${txt.length} chars)")
      } catch {
        case e: Exception =>
          // No placeholder file: a broken evidence run must fail loudly
          // instead of committing ERROR text as plan evidence.
          failures += 1
          System.err.println(s"ERROR dumping $name: $e")
      }
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
