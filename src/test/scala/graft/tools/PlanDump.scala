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
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names.foreach { name =>
      val txt =
        try {
          val df = graft.SparkEntry.queries(name)(spark, dir)
          df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        } catch { case e: Exception => s"ERROR dumping $name: $e" }
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
