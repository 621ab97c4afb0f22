package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (also written to bench_out.json for the driver).
  *
  * Each query is forced to FULL evaluation by hashing every output column
  * (xxhash64 over a struct of all columns, summed) — a bare count() lets
  * Catalyst prune unused projections, which benches pure-projection
  * queries as scan-only.
  *
  * Flight recorder: alongside wall time the JSON carries per-query task
  * counts and shuffle/input byte totals (from a TaskEnd listener) plus
  * the host's 1-minute load average before and after the run, so a slow
  * recording can be classified — plan regression (more tasks / more
  * shuffled bytes) vs environment contention (same plan stats, high
  * loadavg) — without a controlled re-run.
  */
object Bench {

  /** Accumulates executor task metrics; listener events are async, so
    * [[drain]] polls until the task counter stops moving before a
    * snapshot is attributed to a query. */
  private final class FlightRecorder extends SparkListener {
    val tasks = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val input = new AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = te.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def drain(): Unit = {
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 500) {
        val t = tasks.get
        if (t == last) stable += 1 else { stable = 0; last = t }
        Thread.sleep(10)
        waited += 10
      }
    }
    def snapshot(): Array[Long] =
      Array(tasks.get, shufRead.get, shufWrite.get, input.get)
  }

  private final case class QStat(sec: Double, tasks: Long,
      shufReadB: Long, shufWriteB: Long, inputB: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val loadStart = ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    if (loadStart > 0.5 * Runtime.getRuntime.availableProcessors)
      System.err.println(f"[bench] WARNING: 1-min loadavg $loadStart%.1f on " +
        s"${Runtime.getRuntime.availableProcessors} cpus before the run — " +
        "timings may be contention noise; prefer an idle box")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recorder = new FlightRecorder
    spark.sparkContext.addSparkListener(recorder)
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
    def onePass(): Map[String, QStat] = selected.map {
      case (name, fn) =>
        recorder.drain()
        val before = recorder.snapshot()
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
        val sec = (System.nanoTime() - t0) / 1e9
        recorder.drain()
        val after = recorder.snapshot()
        name -> QStat(sec, after(0) - before(0), after(1) - before(1),
          after(2) - before(2), after(3) - before(3))
    }
    val results = (1 to repeat).map(_ => onePass()).last
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.sec }
      .mkString("{", ",", "}")
    val stats = results.map { case (k, v) =>
      s"\"$k\":{\"sec\":${v.sec},\"tasks\":${v.tasks}," +
        s"\"shuffle_read_bytes\":${v.shufReadB}," +
        s"\"shuffle_write_bytes\":${v.shufWriteB}," +
        s"\"input_bytes\":${v.inputB}}"
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_.sec).sum else 0.0
    val loadEnd = ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val env = s"""{"procs":${Runtime.getRuntime.availableProcessors},""" +
      s""""spark_cpus":$cpus,"loadavg_start":$loadStart,"loadavg_end":$loadEnd}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""stats":$stats,"env":$env,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    // Stop Spark BEFORE emitting the JSON so no shutdown log line can land
    // after it: with run/outputStrategy=StdoutOutput and showSuccess=false
    // (build.sbt) the bare JSON is the final line of `sbt runMain` output.
    spark.stop()
    println(json)
    System.err.println(json)
  }
}
