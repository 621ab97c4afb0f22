package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.BlockingRule
import graft.operators.{Blocking, ComparisonVectors, VerticalConcat}
import graft.operators.TermFrequency

/** Phase breakdown for the EM training input pipeline (the q_em_mstep /
  * q_em_train shape): the whole thing fuses into one Spark stage by
  * design (pairs are generated and consumed in place, records broadcast),
  * so per-phase wall time cannot be read off the stage list — instead
  * this harness times progressively larger prefixes of the pipeline on
  * the same fixtures the bench uses:
  *
  *   A  blocked id pairs, count only        -> scan + blocking self-join
  *   B  pairs joined back to records, count -> + junction re-join
  *   C  gamma columns evaluated, count      -> + per-pair gamma CASEs
  *   D  agreement-pattern aggregate         -> + groupBy(gammas).count
  *   E  one distributed E/M aggregate       -> per-iteration marginal cost
  *
  * (C-B) isolates the string-similarity evaluation cost, (D-C) the
  * pattern shrink, and E says what each EXTRA training iteration costs
  * once the pattern frame is materialised.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.examples.ProfileEM`
  * (defaults to /root/testdata/sf0.1; pass a dir argument to override).
  */
object ProfileEM {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val settings = graft.SparkEntry.customerSettings
    val rule = BlockingRule.blockOn("c_nationkey", "c_mktsegment")
    val emSettings = settings.copy(blockingRules = Seq(rule))
    def customers = {
      // driver testdata lays tables out bare, the bench fixtures as *.parquet
      val bare = new java.io.File(s"$dir/customer")
      val path = if (bare.exists()) bare.getPath else s"$dir/customer.parquet"
      spark.read.parquet(path).withColumnRenamed("c_custkey", "unique_id")
    }

    // task accounting per probe: wall time alone cannot distinguish
    // "expensive per pair" from "not parallel" (AQE sizes post-shuffle
    // partitions on PRE-explosion bytes)
    val taskCount = new java.util.concurrent.atomic.AtomicLong
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          taskCount.incrementAndGet()
          if (e.taskInfo != null) taskTimeMs.addAndGet(e.taskInfo.duration)
        }
      })
    def timed(label: String)(body: => Long): Long = {
      val (c0, m0) = (taskCount.get(), taskTimeMs.get())
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      val tasks = taskCount.get() - c0
      val cpuSec = (taskTimeMs.get() - m0) / 1e3
      println(f"[em-profile] $label%-34s $sec%8.2fs wall " +
        f"$cpuSec%8.1fs task-time / $tasks%d tasks  (rows=$n%d)")
      n
    }

    val concat = VerticalConcat(Seq("customer" -> customers), emSettings)
    val bcast = ComparisonVectors.recordsBroadcastOk(concat)
    println(s"[em-profile] dir=$dir broadcastRecords=$bcast")

    // A: blocking self-join only
    timed("A pairs (blocking join)") {
      Blocking.blockedIdPairs(concat, emSettings).count()
    }
    // B: + junction re-join to records (no gamma evaluation)
    timed("B pairs -> records join") {
      ComparisonVectors.pairsFromIds(
        Blocking.blockedIdPairs(concat, emSettings),
        TermFrequency.joinAll(concat, settings.tfColumns), emSettings,
        broadcastRecords = bcast).count()
    }
    // C: + gamma CASE evaluation per pair. collect(), NOT count(): a
    // count over a no-grouping aggregate is constant-folded to one row
    // WITHOUT evaluating the sum, which silently skips the gamma
    // expressions and makes this phase look free.
    val cv = ComparisonVectors.compute(
      Blocking.blockedIdPairs(concat, emSettings),
      TermFrequency.joinAll(concat, settings.tfColumns), emSettings,
      broadcastRecords = bcast)
    val gammaCols = settings.comparisons.map(_.gammaColumnName)
    timed("C + gamma evaluation") {
      cv.agg(sum(gammaCols.map(col).reduce(_ + _))).collect(); 1L
    }
    // D: the agreement-pattern aggregate (what training actually runs)
    val aggPlan = cv.groupBy(gammaCols.map(col): _*).agg(count(lit(1)).as("n"))
    if (sys.env.get("SPARK_GRAFT_EM_EXPLAIN").contains("1")) {
      println("[em-profile] ---- C plan ----")
      cv.agg(sum(gammaCols.map(col).reduce(_ + _))).explain("formatted")
      println("[em-profile] ---- D plan ----")
      aggPlan.explain("formatted")
    }
    val patterns = timed("D pattern aggregate") { aggPlan.count() }
    // D2: same aggregate with the gammas pre-projected through a
    // breaklineage-free select (isolates whether the KEYED aggregate or
    // the expression placement is the cost)
    timed("D2 select(gammas) then aggregate") {
      cv.select(gammaCols.map(col): _*)
        .groupBy(gammaCols.map(col): _*).agg(count(lit(1)).as("n")).count()
    }
    // D3: keyed aggregate with CHEAP keys over the same joined frame —
    // isolates the hash-map aggregation cost from the gamma expressions
    timed("D3 cheap-key aggregate") {
      cv.groupBy(pmod(col("unique_id_l") + col("unique_id_r"), lit(7)))
        .agg(count(lit(1)).as("n")).count()
    }
    // D4: gammas forced through an intermediate exchange before the
    // aggregate (evaluation and aggregation in separate stages)
    timed("D4 repartition(gammas) then aggregate") {
      cv.select(gammaCols.map(col): _*)
        .repartition(32, gammaCols.map(col): _*)
        .groupBy(gammaCols.map(col): _*).agg(count(lit(1)).as("n")).count()
    }
    // C5/D5: codegen-mode probes. If C without whole-stage codegen costs
    // what D costs WITH it, D's stage is silently running interpreted
    // (generated method past the JIT/hugeMethodLimit threshold); if D
    // with a raised hugeMethodLimit drops to C's cost, same conclusion.
    def withConf[T](k: String, v: String)(body: => T): T = {
      val prev = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try body finally prev match {
        case Some(p) => spark.conf.set(k, p); case None => spark.conf.unset(k)
      }
    }
    timed("C5 sum, wholeStage codegen OFF") {
      withConf("spark.sql.codegen.wholeStage", "false") {
        cv.agg(sum(gammaCols.map(col).reduce(_ + _))).collect(); 1L
      }
    }
    timed("D5 aggregate, hugeMethodLimit 1M") {
      withConf("spark.sql.codegen.hugeMethodLimit", "1000000") {
        cv.groupBy(gammaCols.map(col): _*).agg(count(lit(1)).as("n")).count()
      }
    }
    // Which key expression is slow? One probe per similarity function,
    // each used once as a grouping key and once inside a sum.
    val eqKey = (col("c_name_l") === col("c_name_r")).cast("int")
    val levKey = (expr("levenshtein(c_name_l, c_name_r)") <= 3).cast("int")
    val jwKey = (expr("jaro_winkler(c_name_l, c_name_r)") >= 0.88).cast("int")
    // bounded 3-arg levenshtein: banded O(n*d) with early exit, returns
    // -1 above the threshold — same predicate, far less work per pair
    val levBoundedKey =
      (expr("levenshtein(c_name_l, c_name_r, 3)") >= 0).cast("int")
    // graft's own banded kernel (what ll.levenshtein levels compile to)
    val levLteKey = expr("levenshtein_lte(c_name_l, c_name_r, 3)").cast("int")
    for ((nm, k) <- Seq("equality" -> eqKey, "levenshtein" -> levKey,
        "lev_bounded(3)" -> levBoundedKey,
        "levenshtein_lte" -> levLteKey,
        "jaro_winkler" -> jwKey)) {
      timed(s"K group($nm)") {
        cv.groupBy(k.as("k")).agg(count(lit(1))).count()
      }
      timed(s"S sum($nm)") {
        cv.agg(sum(k)).collect(); 1L
      }
    }
    // E: marginal cost of ONE distributed E/M aggregate over the
    // persisted pattern frame
    val patternDf = cv.groupBy(gammaCols.map(col): _*)
      .agg(count(lit(1)).as("n")).persist()
    patternDf.count()
    timed("E one E/M aggregate (persisted)") {
      patternDf.agg(sum(col("n") * lit(0.5))).collect()
      patterns
    }
    patternDf.unpersist()
    spark.stop()
  }
}
