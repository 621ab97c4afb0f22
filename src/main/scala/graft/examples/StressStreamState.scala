package graft.examples

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingLink

/** Streaming state at production cardinality: >= 1M live dedup-state rows
  * under the RocksDB state-store provider with a deliberately small JVM
  * heap, proving the state lives OFF-heap (RocksDB memtables + SST files)
  * rather than in the executor heap — the property that makes the
  * streaming dedup ops long-running-safe on a real cluster. The HDFS-
  * backed default provider holds every state row in heap maps, which is
  * exactly what a 100 TB ingest stream cannot afford.
  *
  * The run feeds batches of DISTINCT documents through
  * [[StreamingLink.dedupStream]] (fingerprint `dropDuplicatesWithinWatermark`
  * — each unique fingerprint is one state row), records per-batch state
  * rows / state memory / RocksDB SST bytes from the query progress and the
  * JVM's peak heap, then advances the watermark a day and checks the state
  * actually EVICTS (bounded-state discipline, not grow-forever).
  *
  * Usage: `SPARK_DRIVER_MEM=2g sbt "runMain graft.examples.StressStreamState
  * [nBatches] [batchSize]"` (defaults 5 x 250k = 1.25M state rows; see
  * README scale notes for a recorded run).
  */
object StressStreamState {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 5
    val batchSize = if (args.length > 1) args(1).toInt else 250000
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // small memtables so the run demonstrably SPILLS to SST files on
      // disk instead of absorbing the whole window in memory
      .config("spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB", "1")
      .config("spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF.toDF("doc_id", "text", "ts")
    // 2h watermark: batches 1..n sit inside it (state accumulates); the
    // final probe batch jumps a day ahead and flushes everything
    val query = StreamingLink.dedupStream(docs, "text", "ts",
        watermark = "2 hours")
      .writeStream.format("noop").outputMode("append").start()

    val t0 = System.nanoTime()
    def ts(offsetSec: Long) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime +
        offsetSec * 1000L)
    def stateStats(): (Long, Long, Long) = {
      val op = query.lastProgress.stateOperators.head
      def metric(k: String) = Option(op.customMetrics.get(k))
        .map(_.longValue).getOrElse(0L)
      (op.numRowsTotal, op.memoryUsedBytes, metric("rocksdbSstFileSize"))
    }
    var peakRows = 0L
    var peakSst = 0L
    (0 until nBatches).foreach { b =>
      // every document distinct -> every fingerprint is a new state row
      val rows = (0 until batchSize).map { i =>
        val id = b.toLong * batchSize + i
        (id, s"unique document body $id with stable fingerprint", ts(b * 60L))
      }
      input.addData(rows)
      query.processAllAvailable()
      val (n, mem, sst) = stateStats()
      peakRows = math.max(peakRows, n)
      peakSst = math.max(peakSst, sst)
      println(f"batch $b%d: state_rows=$n%,d state_mem=${mem / 1048576.0}%.1f MB " +
        f"sst_files=${sst / 1048576.0}%.1f MB " +
        f"elapsed=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val heapPeakMb = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum / 1048576.0
    // advance the watermark a day: every accumulated fingerprint is now
    // older than (event time + delay) and must evict
    input.addData(Seq((-1L, "late probe", ts(86400L))))
    query.processAllAvailable()
    // one more tick so the store commits the post-eviction snapshot
    input.addData(Seq((-2L, "late probe 2", ts(86460L))))
    query.processAllAvailable()
    val (finalRows, finalMem, finalSst) = stateStats()
    query.stop()
    println(f"peak: state_rows=$peakRows%,d heap_peak=${heapPeakMb}%.0f MB " +
      f"(Xmx=${Runtime.getRuntime.maxMemory / 1048576}%,d MB)")
    println(f"after watermark jump: state_rows=$finalRows%,d " +
      f"state_mem=${finalMem / 1048576.0}%.1f MB sst=${finalSst / 1048576.0}%.1f MB")
    require(peakRows >= nBatches.toLong * batchSize,
      s"expected >= ${nBatches.toLong * batchSize} live state rows, saw $peakRows")
    require(peakSst > 0,
      "expected RocksDB to hold SST files on disk (state did not spill)")
    require(finalRows <= 2,
      s"watermark advance must evict the window state, saw $finalRows rows")
    spark.stop()
  }

  // scala 2.13 JavaConverters without the deprecated import dance
  private implicit class JListOps[A](private val l: java.util.List[A])
      extends AnyVal {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }
}
