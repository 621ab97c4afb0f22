package graft

import org.apache.spark.sql.functions._

/** The bench flight recorder attributes task metrics by JOB GROUP, not by
  * time window: a straggler task from a neighbouring query must land in
  * its own query's counters, never the currently-measured one's. */
class BenchRecorderSpec extends SparkSpec {

  test("per-group attribution: two adjacent queries sharing a persisted " +
      "input have zero cross-query bleed") {
    val recorder = new Bench.FlightRecorder
    spark.sparkContext.addSparkListener(recorder)
    try {
      val shared = spark.range(0, 10000, 1, 4).toDF("id")
        .withColumn("k", col("id") % 7)
      shared.persist()
      try {
        shared.count() // materialise outside either group

        spark.sparkContext.setJobGroup("bench-a", "query a")
        shared.groupBy("k").agg(count(lit(1))).collect()
        spark.sparkContext.clearJobGroup()
        recorder.drain("bench-a")
        val a1 = recorder.snapshot("bench-a")

        spark.sparkContext.setJobGroup("bench-b", "query b")
        shared.groupBy("k").agg(sum("id")).collect()
        shared.groupBy("k").agg(max("id")).collect()
        spark.sparkContext.clearJobGroup()
        recorder.drain("bench-b")
        val b = recorder.snapshot("bench-b")
        val a2 = recorder.snapshot("bench-a")

        assert(a1(0) > 0, "group a ran tasks")
        assert(b(0) > 0, "group b ran tasks")
        // the load-bearing assertion: b's two jobs (and any of their
        // stragglers) moved NOTHING in a's counters
        assert(a2.toSeq == a1.toSeq,
          s"group a stats moved while b ran: ${a1.toSeq} -> ${a2.toSeq}")
        // b ran two jobs over the same shuffle shape: roughly 2x a's tasks,
        // never a + b merged into one window
        assert(b(0) >= a1(0), "b (two jobs) should not undercount vs a")
      } finally shared.unpersist()
    } finally spark.sparkContext.removeSparkListener(recorder)
  }

  test("a slow job still running on another thread never leaks into the " +
      "measured group") {
    val recorder = new Bench.FlightRecorder
    spark.sparkContext.addSparkListener(recorder)
    try {
      // job groups are thread-local: the background thread owns group
      // "slow" while the main thread measures group "fast"
      val slow = new Thread(() => {
        spark.sparkContext.setJobGroup("slow", "straggler")
        try {
          spark.range(0, 400, 1, 8)
            .withColumn("z", udf((x: Long) => { Thread.sleep(5); x })
              .apply(col("id")))
            .agg(sum("z")).collect()
        } finally spark.sparkContext.clearJobGroup()
      })
      slow.start()
      Thread.sleep(50) // let the slow job's tasks start
      spark.sparkContext.setJobGroup("fast", "measured query")
      spark.range(0, 1000, 1, 2).agg(count(lit(1))).collect()
      spark.sparkContext.clearJobGroup()
      recorder.drain("fast")
      val fast = recorder.snapshot("fast")
      slow.join(30000)
      recorder.drain("slow")
      val slowStats = recorder.snapshot("slow")
      assert(fast(0) > 0 && fast(0) <= 4,
        s"fast group must count only its own ~2 tasks, got ${fast(0)}")
      assert(slowStats(0) >= 8, "the straggler's tasks landed in ITS group")
    } finally spark.sparkContext.removeSparkListener(recorder)
  }
}
