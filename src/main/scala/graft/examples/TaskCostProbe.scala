package graft.examples

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-task FIXED-cost probe. The r15 scaling data shows the graph-family
  * queries spending a near-constant ~260-300ms of executorCpuTime PER TASK
  * at both 8 and 32 cores (total CPU tracks task count, not data). This
  * probe isolates that constant on trivial stages: tiny shuffles and tiny
  * checkpoint jobs, measured with the same counters the bench records.
  *
  * Usage: `SPARK_GRAFT_MASTER=local[32] runMain graft.examples.TaskCostProbe`
  */
object TaskCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Materialise.Ops

    val tasks = new AtomicLong
    val cpuNs = new AtomicLong
    val runMs = new AtomicLong
    val gcMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = te.taskMetrics
        if (m != null) {
          cpuNs.addAndGet(m.executorCpuTime)
          runMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
        }
      }
    })
    def timed(label: String)(body: => Unit): Unit = {
      Thread.sleep(300) // let listener drain
      val (t0, c0, r0, g0) = (tasks.get, cpuNs.get, runMs.get, gcMs.get)
      val w0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(300)
      val dt = tasks.get - t0
      val dc = (cpuNs.get - c0) / 1e6
      val dr = runMs.get - r0
      val dg = gcMs.get - g0
      println(f"[task-probe] $label%-40s wall=$wall%7.2fs tasks=$dt%5d " +
        f"cpu=${dc / 1000}%8.2fs run=${dr / 1000.0}%8.2fs gc=${dg / 1000.0}%6.2fs " +
        f"cpu/task=${if (dt > 0) dc / dt else 0}%6.0fms")
    }

    // warmup: class loading, codegen, JIT
    (1 to 3).foreach { _ =>
      spark.range(1000000).select((col("id") % 97).as("k"))
        .groupBy("k").agg(count(lit(1))).collect()
    }

    // 1. tiny shuffle stages, repeated: fixed per-task cost of an exchange
    timed("20x tiny groupBy (1M rows, 32 parts)") {
      (1 to 20).foreach { _ =>
        spark.range(1000000).select((col("id") % 9973).as("k"))
          .groupBy("k").agg(count(lit(1)))
          .agg(bit_xor(xxhash64(col("k")))).collect()
      }
    }
    // 2. same data, 4 shuffle partitions via repartition
    timed("20x tiny groupBy via repartition(4)") {
      (1 to 20).foreach { _ =>
        spark.range(1000000).select((col("id") % 9973).as("k"))
          .repartition(4, col("k"))
          .groupBy("k").agg(count(lit(1)))
          .agg(bit_xor(xxhash64(col("k")))).collect()
      }
    }
    // 3. eager localCheckpoint jobs over a medium frame (the scaffold's
    // bread and butter): 35M-row 4-long frame, like `visited` at sf10
    val big = spark.range(35000000).select(col("id").as("a"),
      (col("id") * 7).as("b"), (col("id") % 1000).as("c"),
      (col("id") % 7).as("d"))
    timed("eager localCheckpoint of 35M x 4 longs") {
      val f = big.breakLineage(eager = true)
      graft.operators.Materialise.releaseConsumed(f)
    }
    // 4. join of two checkpointed 35M frames (one fold round shape), per
    // checkpoint storage level: the scaffold's GC bill comes from
    // DESERIALIZED on-heap blocks (70M+ row objects the collector re-walks)
    import org.apache.spark.storage.StorageLevel
    def ckAt(df: org.apache.spark.sql.DataFrame, lvl: StorageLevel) =
      org.apache.spark.sql.GraftSqlBridge.freshStats(
        df.localCheckpoint(true, lvl))
    for ((name, lvl) <- Seq(
        "DESER(default)" -> StorageLevel.MEMORY_AND_DISK,
        "SER           " -> StorageLevel.MEMORY_AND_DISK_SER,
        "DISK_ONLY     " -> StorageLevel.DISK_ONLY)) {
      val l = ckAt(big, lvl)
      val r = ckAt(big.select(col("a"), col("b").as("x")), lvl)
      timed(s"join 35Mx35M ck=$name") {
        l.join(r, Seq("a")).agg(bit_xor(xxhash64(col("b"), col("x")))).collect()
      }
      timed(s"3x groupBy re-read ck=$name") {
        (1 to 3).foreach { _ =>
          l.groupBy(col("d")).agg(sum(col("b"))).collect()
        }
      }
      graft.operators.Materialise.releaseConsumed(l)
      graft.operators.Materialise.releaseConsumed(r)
      System.gc()
    }
    spark.stop()
  }
}
