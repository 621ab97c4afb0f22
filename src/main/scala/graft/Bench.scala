package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
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
  * counts and shuffle/input byte totals plus the host's 1-minute load
  * average before and after the run, so a slow recording can be
  * classified — plan regression (more tasks / more shuffled bytes) vs
  * environment contention (same plan stats, high loadavg) — without a
  * controlled re-run. Attribution is JOB-KEYED, not time-windowed: each
  * query runs under its own `setJobGroup`, the listener maps job → stage
  * → group, and a straggler task from a neighbouring query lands in ITS
  * group — per-query stats never bleed across queries.
  */
object Bench {

  /** Accumulates executor task metrics PER JOB GROUP. `onJobStart` reads
    * the submitting thread's `spark.jobGroup.id` property and pins every
    * stage of the job to that group; `onTaskEnd` then attributes by stage.
    * Listener events are async, so [[drain]] polls until the group's task
    * counter stops moving before a snapshot is read. */
  private[graft] final class FlightRecorder extends SparkListener {
    private[graft] final class Counters {
      val tasks = new AtomicLong
      val shufRead = new AtomicLong
      val shufWrite = new AtomicLong
      val input = new AtomicLong
      // CPU-time accounting makes wall-clock deltas classifiable under
      // external load (CPU steal inflates wall and run-time but NOT
      // on-CPU nanoseconds): stats moved => PLAN; stats same but cpu
      // moved => KERNEL; stats and cpu same, wall moved => ENV/steal.
      val cpuNs = new AtomicLong // executorCpuTime (on-CPU ns)
      val runMs = new AtomicLong // executorRunTime (wall ms incl. wait)
      val gcMs = new AtomicLong // jvmGCTime (ms)
    }
    private val stageGroup = new ConcurrentHashMap[Int, String]()
    private val groups = new ConcurrentHashMap[String, Counters]()
    private def of(g: String): Counters =
      groups.computeIfAbsent(g, _ => new Counters)
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val g = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        .getOrElse("")
      js.stageIds.foreach(sid => stageGroup.put(sid, g))
    }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val c = of(stageGroup.getOrDefault(te.stageId, ""))
      c.tasks.incrementAndGet()
      val m = te.taskMetrics
      if (m != null) {
        c.shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        c.shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        c.input.addAndGet(m.inputMetrics.bytesRead)
        c.cpuNs.addAndGet(m.executorCpuTime)
        c.runMs.addAndGet(m.executorRunTime)
        c.gcMs.addAndGet(m.jvmGCTime)
      }
    }
    def drain(group: String): Unit = {
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 500) {
        val t = of(group).tasks.get
        if (t == last) stable += 1 else { stable = 0; last = t }
        Thread.sleep(10)
        waited += 10
      }
    }
    def snapshot(group: String): Array[Long] = {
      val c = of(group)
      Array(c.tasks.get, c.shufRead.get, c.shufWrite.get, c.input.get,
        c.cpuNs.get, c.runMs.get, c.gcMs.get)
    }
  }

  private final case class QStat(sec: Double, tasks: Long,
      shufReadB: Long, shufWriteB: Long, inputB: Long,
      cpuMs: Long, runMs: Long, gcMs: Long,
      canaryMs: Double = -1.0, canaryHiMs: Double = -1.0, canaryN: Int = 0,
      attempts: Int = 1, canaryClean: Boolean = true,
      extFrac: Double = -1.0)

  /** CPU-speed canary: a daemon thread runs FIXED deterministic spin work
    * (~6-8 ms on an idle core) every ~400 ms and records how long each spin
    * took. This box is a guest VM, and r13's recordings proved that guest
    * accounting CANNOT see all host-level contention: a contiguous window
    * of queries showed 5-10x inflated `executorCpuTime` with byte-identical
    * task/shuffle stats, zero task GC and ~0 measured external CPU
    * (/proc/stat busy INCLUDING the steal column, minus process CPU) —
    * i.e. the very metric added to be steal-proof was itself inflated by
    * invisible contention (unaccounted steal charged to thread CPU time,
    * or LLC/memory-bandwidth thrash from co-tenants degrading IPC). The
    * canary measures what no guest counter exposes: identical instructions
    * taking longer IS the contention, whatever its mechanism. Per-query
    * medians land in the stats block so `tools/bench_compare.py` can
    * classify a cpu_ms move that tracks a canary move as HOST noise rather
    * than a KERNEL change.
    *
    * The spin is a serial xorshift-multiply chain: no memory traffic (so
    * it under-detects pure bandwidth thieves, but detects scheduling theft
    * and frequency drops exactly), dead-code-proofed through a volatile
    * sink. One sample ~every 120 ms costs ~5% of ONE core of 32 (0.16% of
    * the box) — the cadence is deliberately fast because the r13 A/B
    * calibration run (bench_ab/) showed contention arrives in sub-second
    * BURSTS: a query window's canary MEDIAN sat at ~10 ms while the same
    * window's executorCpuTime inflated 3-7x (SMT siblings busy / IPC
    * thrash), so the per-window signal has to be a high percentile over
    * enough samples, not a median over three. */
  private final class CpuCanary extends Thread {
    setDaemon(true)
    setName("graft-bench-canary")
    private val SpinIters = 5000000
    // (endNanos, spinNanos) pairs; ~2.4 samples/s over a 20-min run is
    // a few thousand entries — negligible
    private val samples =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    @volatile private var sink = 0L
    override def run(): Unit =
      try {
        while (true) {
          var x = 0x9E3779B97F4A7C15L
          var i = 0
          val t0 = System.nanoTime()
          while (i < SpinIters) {
            x = x * 6364136223846793005L + 1442695040888963407L
            x ^= x >>> 33
            i += 1
          }
          val t1 = System.nanoTime()
          sink ^= x
          samples.add((t1, t1 - t0))
          Thread.sleep(120)
        }
      } catch { case _: InterruptedException => () }
    private def all(): Array[Long] = {
      val it = samples.iterator()
      val b = Array.newBuilder[Long]
      while (it.hasNext) b += it.next()._2
      b.result()
    }
    /** (median spin ms, p90 spin ms, sample count) inside [startNs,
      * endNs]. The p90 is the contention-detection signal (see the class
      * comment: bursts move the tail long before the median); the median
      * stays in the artifact as the direction-tracking signal. Windows
      * shorter than ~8 samples borrow +-1.5 s of neighbouring samples —
      * host contention is bursty at the seconds scale, so the box's state
      * just around a 0.5 s query still certifies that query's window. */
    def windowStats(startNs: Long, endNs: Long): (Double, Double, Int) = {
      def inWindow(s: Long, e: Long): Array[Long] = {
        val it = samples.iterator()
        val b = Array.newBuilder[Long]
        while (it.hasNext) {
          val (t, d) = it.next()
          if (t >= s && t <= e) b += d
        }
        b.result()
      }
      var w = inWindow(startNs, endNs)
      if (w.length < 8)
        w = inWindow(startNs - 1500000000L, endNs + 1500000000L)
      java.util.Arrays.sort(w)
      if (w.isEmpty) (-1.0, -1.0, 0)
      else (w(w.length / 2) / 1e6,
        w(math.min(w.length - 1, (0.90 * w.length).toInt)) / 1e6, w.length)
    }
    /** Run-wide percentile of the spin time, ms (p10 = the box's true
      * uncontended speed; p95 vs p10 spread = how noisy the run was). */
    def percentileMs(p: Double): Double = {
      val w = all().sorted
      if (w.isEmpty) -1.0
      else w(math.min(w.length - 1, (p * w.length).toInt)) / 1e6
    }
  }

  /** The ~10 headline queries re-run at the amplified sf1 scale point. */
  private val Sf1Queries = Seq("q_predict_tf", "q_cluster", "q_minhash_pairs",
    // the END-TO-END near-dup dedupe (banded pairs -> CC -> canonical):
    // the whole training-data dedup pipeline's slope in one number
    "q_dedup_docs",
    "q_dup_spans", "q_bridges", "q_estimate_u", "q_multi_threshold",
    // the FUSED bridges+articulation pass (one scaffold, both verdicts):
    // its target is <= ~65% of the q_bridges + q_articulation sum
    "q_graph_metrics",
    "q_snm_pairs", "q_ann_ivf", "q_tfidf",
    // the distributed Tarjan-Vishkin articulation pass — the suite's
    // slowest query, so its scaling slope matters most. (q_image_neardup
    // is deliberately NOT here: its corpus hashes are synthetic-random, so
    // 16-bit band collisions grow quadratically with corpus size — a
    // property of the fixture, not of the operator on real image sets.)
    "q_articulation",
    // the distributed-ONLY fallback paths, forced past their driver gates
    // (pattern-cap / union-find / mutual-best): the gated fast paths
    // dominate the main suite, so these three put the actual 100 TB code
    // paths on the measured scale point
    "q_em_mstep_dist", "q_cluster_dist", "q_one_to_one_dist",
    // the FULL multi-iteration EM training loop (pattern aggregate once,
    // three E/M rounds): the reference's training story, not just one
    // M-step, on a measured slope
    "q_em_train",
    // the pattern aggregate whose scan is dominated by the BOUNDED
    // DAMERAU-levenshtein predicate — the banded kernel's scale evidence
    "q_em_patterns_dl")

  /** Third scale decade: the iterative graph ops (their slopes are the
    * suite's steepest — round-count growth — and two points cannot pin a
    * curve) plus the flagship dedup family end-to-end (banded candidate
    * pairs and pairs->CC->canonical at 500k docs). The sf10 build
    * amplifies orders/customer/documents from the materialised sf1 set,
    * 10 more structurally-disjoint copies = 100x sf0.1: ~15M orders ->
    * ~13.5M path edges, above the CC driver gate, so this decade ALSO
    * exercises the fully distributed loops by size alone. */
  private val Sf10Queries = Seq("q_cluster", "q_multi_threshold",
    "q_bridges", "q_articulation", "q_graph_metrics",
    "q_minhash_pairs", "q_dedup_docs",
    // the flagship scoring workload (blocking + TF-aware predict — the
    // reference's headline "100M+ pairs on a cluster" shape) and the
    // forced distributed-only paths: one scale point pins no slope, so
    // all of these carry sf1 AND sf10 entries
    "q_predict_tf", "q_cluster_dist", "q_one_to_one_dist", "q_em_mstep_dist",
    // exact-substring span dedup — the OTHER flagship training-data dedup
    // shape (window hashes -> cross-doc spans -> removal), measured to a
    // third decade like the minhash family
    "q_dup_spans",
    // full 3-iteration EM training on the third decade (pairs ~90M here)
    "q_em_train",
    // bounded-damerau pattern aggregate at ~90M pairs (kernel evidence)
    "q_em_patterns_dl")

  /** Generation markers. target/ persists across rounds, so a changed
    * generator must not silently reuse a stale fixture — and since sf10
    * is DERIVED from the sf1 tables, its marker embeds the sf1 marker
    * name: bumping the sf1 generation automatically invalidates sf10. */
  private val Sf1Marker = "_DONE_v2"
  private val Sf10Marker = s"_DONE_v2_from${Sf1Marker}"

  private def ensureSf10(spark: SparkSession, sf1Dir: String, dir: String)
      : Unit = {
    if (Files.exists(Paths.get(dir, Sf10Marker))) return
    val copies = 10
    val off = 10000000000L // clear of the sf1 key space (< 10^9 + 15M)
    def write(name: String)(f: (org.apache.spark.sql.DataFrame, Int)
        => org.apache.spark.sql.DataFrame): Unit = {
      val base = spark.read.parquet(s"$sf1Dir/$name.parquet")
      (0 until copies).map(i => f(base, i)).reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    write("customer") { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * off))
        .withColumn("c_nationkey", col("c_nationkey") + lit(i * 10000))
    }
    write("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
        .withColumn("o_custkey", col("o_custkey") + lit(i * off))
    }
    // Documents: a per-copy SEEDED CHARACTER PERMUTATION (not another
    // rotation — sf1's copies already carry rotations R_i, and rotations
    // compose degenerately: P_j∘R_i = P_j'∘R_i' whenever i+j = i'+j', so
    // a second rotation decade would re-collide cross-copy vocabularies).
    // A seeded Fisher-Yates permutation per sf10 copy keeps every
    // intra-copy duplicate structure exactly isomorphic (bijection on
    // characters => bijection on shingles/tokens) while the 100 combined
    // maps are pairwise distinct, so cross-copy shingle collisions stay
    // at the random-hash floor and the dedup family scales linearly.
    write("documents") { (df, i) =>
      val d = df.withColumn("doc_id", col("doc_id") + lit(i * off))
      if (i == 0) d
      else {
        val alphabet = ("abcdefghijklmnopqrstuvwxyz" +
          "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789").toCharArray
        val rnd = new scala.util.Random(0xD0C5EEDL + i)
        val shuffled = rnd.shuffle(alphabet.toSeq).mkString
        d.withColumn("text",
          translate(col("text"), new String(alphabet), shuffled))
      }
    }
    Files.createFile(Paths.get(dir, Sf10Marker))
  }

  /** Fourth scale decade (~1000x sf0.1), OPT-IN via SPARK_GRAFT_SF100=1 —
    * the per-round driver run never pays it. Three queries whose 100 TB
    * story the fourth decade actually tests, and whose local[32] cost
    * stays tractable (~10-15 min): the forced fully-distributed CC at
    * 135M edges, and the minhash dedup family at 5M documents (banded
    * candidate shuffles reach ~26 GB — still linear or the fixture is
    * wrong). The EM/predict family is deliberately NOT here: at 15M
    * records the record-side broadcast correctly declines and the honest
    * sort-merge shuffles ~45 GB per query through one local disk —
    * a cluster-scale measurement this single box cannot host. */
  private val Sf100Queries =
    Seq("q_cluster_dist", "q_minhash_pairs", "q_dedup_docs",
      // the iterative mutual-best loop (merge rounds + per-round
      // checkpoints) at 135M candidate edges — the round-cadence
      // driver round-trips and checkpoint fan-out are exactly where the
      // next 100-TB cliff would hide; reads only orders, which the
      // sf100 generator already amplifies
      "q_one_to_one_dist",
      // the two heaviest sf10 queries never probed at the fourth decade
      // (r14 verdict): the iterative multi-threshold re-solve (stable-
      // cluster reuse + per-threshold checkpoint cadence over 135M edges)
      // and the fused bridges+articulation pass (per-cluster semi-joined
      // aggregate + BFS forest scaffold over 15M tiny clusters — the
      // aggregate/scaffold FAN-OUT is the scale axis here, cluster size
      // stays fixed by construction)
      "q_multi_threshold", "q_graph_metrics")

  // v3: customer joined the amplified set (q_graph_metrics' fourth decade)
  private val Sf100Marker = s"_DONE_v3_from${Sf10Marker}"

  private def ensureSf100(spark: SparkSession, sf10Dir: String, dir: String)
      : Unit = {
    if (Files.exists(Paths.get(dir, Sf100Marker))) return
    val copies = 10
    val off = 1000000000000L // clear of the sf10 key space (< 10^11 + sf1)
    def write(name: String)(f: (org.apache.spark.sql.DataFrame, Int)
        => org.apache.spark.sql.DataFrame): Unit = {
      val base = spark.read.parquet(s"$sf10Dir/$name.parquet")
      (0 until copies).map(i => f(base, i)).reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    // only the tables the sf100 subset reads are amplified
    write("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
        .withColumn("o_custkey", col("o_custkey") + lit(i * off))
    }
    // q_graph_metrics derives its 3-/5-node cluster fixture from customer
    // keys: shifting c_custkey keeps every per-copy cluster disjoint, so
    // the fourth decade scales CLUSTER COUNT (the aggregate/forest fan-out
    // axis) with per-cluster structure exactly isomorphic
    write("customer") { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * off))
    }
    // a third level of per-copy seeded permutations, seed namespace
    // disjoint from sf10's: the 1000 composed character maps
    // (P100_j ∘ P10_i ∘ R_k) stay pairwise distinct, so cross-copy
    // shingle collisions stay at the random floor and the dedup family's
    // fourth decade measures the operator, not fixture echoes.
    write("documents") { (df, i) =>
      val d = df.withColumn("doc_id", col("doc_id") + lit(i * off))
      if (i == 0) d
      else {
        val alphabet = ("abcdefghijklmnopqrstuvwxyz" +
          "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789").toCharArray
        val rnd = new scala.util.Random(0x5F100BEEFL + i)
        val shuffled = rnd.shuffle(alphabet.toSeq).mkString
        d.withColumn("text",
          translate(col("text"), new String(alphabet), shuffled))
      }
    }
    Files.createFile(Paths.get(dir, Sf100Marker))
  }

  /**
   * Materialise a 10x amplification of sf0.1 (~sf1: ~1.5M orders, 1.5M
   * customers, 100k docs) for the second scale point, built once and
   * cached under target/. Copies are made STRUCTURALLY DISJOINT so every
   * headline query's work scales linearly with input — the honest scaling
   * measurement — instead of quadratically through cross-copy collisions:
   * keys shift by a copy offset, block keys (c_nationkey) salt per copy,
   * and document text goes through a per-copy character rotation
   * (disjoint shingles AND word vocabularies, so shingle/minhash/tfidf
   * structure replicates exactly per copy).
   *
   * The marker is VERSIONED: target/ persists across rounds, so a changed
   * generator must not silently reuse a stale fixture.
   */
  private def ensureSf1(spark: SparkSession, sf01: String, dir: String): Unit = {
    if (Files.exists(Paths.get(dir, Sf1Marker))) return
    val copies = 10
    val off = 100000000L
    def write(name: String)(f: (org.apache.spark.sql.DataFrame, Int)
        => org.apache.spark.sql.DataFrame): Unit = {
      val base = spark.read.parquet(s"$sf01/$name.parquet")
      (0 until copies).map(i => f(base, i)).reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    write("customer") { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * off))
        .withColumn("c_nationkey", col("c_nationkey") + lit(i * 100))
    }
    write("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
        .withColumn("o_custkey", col("o_custkey") + lit(i * off))
    }
    write("documents") { (df, i) =>
      val d = df.withColumn("doc_id", col("doc_id") + lit(i * off))
      if (i == 0) d
      // Per-copy CHARACTER rotation (a bijective caesar map over letters
      // and digits), not a per-token suffix: a suffix keeps every 8-char
      // shingle that sits fully inside a long word identical across
      // copies, so cross-copy doc twins land near jaccard 0.5 and
      // MinHash-LSH candidate pairs grow QUADRATICALLY in the copy count
      // (a fixture artifact — measured 2.2 GB shuffle at sf1 vs 25 MB at
      // sf0.1). A per-copy bijection keeps every intra-copy structure
      // (duplicates, spans, token stats) exactly isomorphic while making
      // cross-copy shingles and word tokens disjoint, so the banded join
      // scales linearly — the honest slope.
      else {
        val lower = "abcdefghijklmnopqrstuvwxyz"
        val upper = lower.toUpperCase
        val digits = "0123456789"
        def rot(s: String, by: Int) = s.drop(by % s.length) + s.take(by % s.length)
        d.withColumn("text", translate(col("text"),
          lower + upper + digits,
          rot(lower, i) + rot(upper, i) + rot(digits, i)))
      }
    }
    write("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * off))
    }
    Files.createFile(Paths.get(dir, Sf1Marker))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val loadStart = ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    if (loadStart > 0.5 * Runtime.getRuntime.availableProcessors)
      System.err.println(f"[bench] WARNING: 1-min loadavg $loadStart%.1f on " +
        s"${Runtime.getRuntime.availableProcessors} cpus before the run — " +
        "timings may be contention noise; prefer an idle box")
    // NOTE deliberately NO adaptive initialPartitionNum override: starting
    // every shuffle wide costs the iterative loops (CC jumps, mutual-best
    // rounds) a ~2s 256-task wave per small stage — measured 3x wall on
    // q_cluster_dist — while the one workload that wanted wide sorts (the
    // sf10 predict's pair frame) no longer shuffles at all (record-side
    // broadcast).
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
    val canary = new CpuCanary
    canary.start()
    // SPARK_GRAFT_BENCH_REPEAT > 1 reruns the whole suite in-JVM and
    // reports the LAST pass, separating codegen/JIT warmup from data cost
    // (profiling aid; the driver uses the default single cold pass).
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "1").toInt
    // Untimed warmup: exercise the scan/join/window/agg/codegen machinery
    // once so one-time JVM costs (class loading, Janino, JIT) do not land
    // in whichever query happens to run first. Standard bench hygiene —
    // every query's own work is still measured cold.
    try {
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val grouped = n.alias("a")
        .join(n.alias("b"), col("a.n_regionkey") === col("b.n_regionkey"))
        .groupBy(col("a.n_regionkey")).agg(count(lit(1)).as("c"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy("c")
      grouped.withColumn("r", row_number().over(win))
        .agg(bit_xor(xxhash64(struct(col("c"), col("r"))))).collect()
    } catch { case _: Exception => () } // warmup table absent (subset dirs)
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the suite (profiling aid)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None => SparkEntry.queries
    }
    // Steal-resilient retries: this box's host contention arrives in
    // multi-second INVISIBLE bursts (bench_ab/: canary p90 inflated 4-9x
    // with ~0 guest-visible external CPU), so a single cold pass can land
    // any query inside a stolen window and poison the recording. A query
    // whose canary window p90 exceeded 1.35x the run's uncontended spin
    // speed is re-run (bounded per-query attempts + a run-global wall
    // budget) and the attempt with the CLEANEST canary is kept; the
    // artifact records attempts + cleanliness so a kept-dirty value is
    // never mistaken for a certified one. A retry is warmer than a first
    // attempt (page cache, JIT) — recorded honestly via `attempts`; the
    // steal bias it removes is measured 2-9x while the warmth bias on
    // these prewarmed fixtures is a few percent.
    // SPARK_GRAFT_BENCH_UNTIL_CLEAN=1: certification mode — retry each
    // query until its canary window is clean (bounded by a raised default
    // attempt cap + budget), never pausing on sustained steal. Use with a
    // BENCH_ONLY subset to produce the per-query certified-clean
    // measurements bench_compare's KERNEL/PLAN verdicts require.
    val untilClean =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_UNTIL_CLEAN", "0") == "1"
    val maxRetries = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES",
      if (untilClean) "8" else "2").toInt
    // PER-SECTION wall budget (reset at each onePass): the first retry
    // recording spent the whole run-global budget on the cheap sf0.1
    // queries and left the sf10 section — where one retry is worth the
    // most — with nothing.
    val retryBudgetDefault = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY_BUDGET",
      if (untilClean) "3600" else "600").toDouble
    var retryBudgetSec = retryBudgetDefault
    // Sustained-steal cutoff: retries only help when contamination is
    // BURSTY. When the box is continuously stolen (the first retry
    // recording: 146 retry attempts, canary_hi ~2x p10 for an hour),
    // every retry lands in the same steal and the budget burns for
    // nothing — after 5 consecutive queries whose retries all stayed
    // dirty, retrying pauses until some first attempt comes back clean
    // (the box recovered).
    var fruitlessRetries = 0
    val CanaryCleanFactor = 1.35 // same gate bench_compare's KERNEL uses
    // CPU readers shared by the per-QUERY external fraction (below) and
    // the per-SECTION accounting (further down)
    def load(): Double =
      ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    def procCpuNs(): Long = ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }
    // USER_HZ is 100 on every mainstream linux (sysconf(_SC_CLK_TCK))
    def sysBusyJiffies(): Long =
      try {
        val f = Files.readAllLines(Paths.get("/proc/stat")).get(0)
          .trim.split("\\s+").drop(1).map(_.toLong)
        f.indices.collect { case i if i != 3 && i != 4 => f(i) }.sum
      } catch { case _: Exception => -1L }
    // tag makes the job-group id unique per pass (cold/warm/sf1 rerun the
    // same query names; each (pass, query, attempt) gets its own counter)
    def onePass(sel: Iterable[(String, (SparkSession, String)
        => org.apache.spark.sql.DataFrame)], dir: String, tag: String)
        : Seq[(String, QStat)] = {
      retryBudgetSec = retryBudgetDefault
      sel.toSeq.map {
      case (name, fn) =>
        def runOnce(attempt: Int): QStat = {
          // UNTIMED pre-query full GC in the scale sections: a heavy
          // query otherwise starts with the heap full of its
          // predecessors' tenured garbage and pays for it in TASK GC
          // mid-query (measured: in-suite sf10 q_one_to_one_dist task GC
          // 1013s vs 36s isolated at identical plan stats). Main-pass
          // queries (p1/p2) skip it — 114 small queries x ~1s GC would
          // stretch the recording for noise that per-query cleanup
          // already bounds at sf0.1 heap sizes.
          if (tag.startsWith("sf")) { System.gc(); Thread.sleep(100) }
          val group =
            if (attempt == 1) s"$tag:$name" else s"$tag:$name:a$attempt"
          spark.sparkContext.setJobGroup(group, s"bench $name")
          // per-QUERY external CPU: the per-section fraction cannot
          // separate one stolen query from nine quiet ones, and the
          // canary cannot separate host steal from the query's OWN
          // full-width saturation — external_frac ~0 + dirty canary +
          // unchanged stats reads as self-pressure, not steal
          val p0 = procCpuNs()
          val s0 = sysBusyJiffies()
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, dir)
            // bit_xor, not sum: ANSI mode makes a LONG sum of 2^63-range
            // hashes throw ARITHMETIC_OVERFLOW; xor is closed over Long.
            df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
              .agg(bit_xor(col("h"))).collect()
          } catch {
            case e: Throwable =>
              System.err.println(
                s"[bench] $name FAILED: ${e.getMessage.take(300)}")
          } finally spark.sparkContext.clearJobGroup()
          val t1 = System.nanoTime()
          val sec = (t1 - t0) / 1e9
          // read the CPU counters at t1, before the untimed cleanup below
          val extFrac =
            if (p0 < 0 || s0 < 0 || sec <= 0) -1.0
            else {
              val ext = math.max(0.0,
                (sysBusyJiffies() - s0) / 100.0 - (procCpuNs() - p0) / 1e9)
              ext / (sec * Runtime.getRuntime.availableProcessors)
            }
          recorder.drain(group)
          val s = recorder.snapshot(group)
          val (canMs, canHiMs, canN) = canary.windowStats(t0, t1)
          // UNTIMED cleanup: queries persist/localCheckpoint intermediates
          // and rely on the ContextCleaner (GC-driven) to reap them — in a
          // 200+-execution suite the leaked blocks accumulate into heap
          // pressure that taxes LATER queries' GC (the sf10 section used to
          // run 2x slower in-suite than in a fresh JVM, identical plans).
          // No cross-query state exists (every query builds its own frames),
          // so dropping all persisted RDDs between queries is safe — and it
          // also resets state between retry attempts of the same query.
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          spark.catalog.clearCache()
          QStat(sec, s(0), s(1), s(2), s(3), s(4) / 1000000L, s(5), s(6),
            canMs, canHiMs, canN, extFrac = extFrac)
        }
        // "clean" = this attempt's canary p90 sat at the box's uncontended
        // spin speed (run-wide p10, recomputed as samples accumulate). A
        // window with no samples can't be judged — treated as clean.
        def isClean(st: QStat): Boolean = {
          val p10 = canary.percentileMs(0.10)
          st.canaryN == 0 || p10 <= 0 ||
            (st.canaryHiMs >= 0 && st.canaryHiMs <= CanaryCleanFactor * p10)
        }
        var best = runOnce(1)
        var attempt = 1
        if (isClean(best) && fruitlessRetries >= 5) {
          fruitlessRetries = 0 // box recovered: re-arm retries
          System.err.println(s"[bench] clean first attempt ($name); " +
            "re-enabling retries")
        }
        while (!isClean(best) && (untilClean || fruitlessRetries < 5) &&
            attempt <= maxRetries && retryBudgetSec > 0) {
          attempt += 1
          // certification mode: give a steal burst a moment to pass so
          // consecutive attempts are decorrelated (untimed)
          if (untilClean) Thread.sleep(2000)
          System.err.println(f"[bench] $name canary_hi=${best.canaryHiMs}%.1f" +
            f"ms contaminated (uncontended p10=${canary.percentileMs(0.10)}%.1f" +
            f"ms); retry attempt $attempt")
          val next = runOnce(attempt)
          retryBudgetSec -= next.sec
          // a clean attempt always wins — including one whose window was
          // too short to collect any canary sample (canaryHiMs = -1), which
          // is clean by definition; without this a sub-window-length query
          // could never escape a dirty first attempt
          if (isClean(next)) best = next
          else if (next.canaryHiMs >= 0 &&
              (best.canaryHiMs < 0 || next.canaryHiMs < best.canaryHiMs))
            best = next
        }
        if (attempt > 1) {
          if (isClean(best)) fruitlessRetries = 0
          else {
            fruitlessRetries += 1
            // in until-clean mode the counter still tracks but never
            // pauses — don't print a pause that will not happen
            if (fruitlessRetries == 5 && !untilClean) System.err.println(
              "[bench] 5 consecutive fruitless retries — sustained steal; " +
                "pausing retries until a clean first attempt")
          }
        }
        name -> best.copy(attempts = attempt, canaryClean = isClean(best))
    }
    }
    // untimed full GC between suite sections: lets the ContextCleaner
    // finish reaping unpersisted/checkpoint blocks so a section starts
    // from a quiet heap instead of inheriting the previous section's
    // garbage (stabilises the iterative graph ops' sf10 timings)
    def quiesce(): Unit = { System.gc(); Thread.sleep(200) }
    // untimed fixture pre-read before a timed scale section: the sf10
    // fixtures are ~2 GB on disk but ~21 GB of cumulative reads across
    // the section, and PAGE-CACHE state was measured to swing identical
    // same-head runs up to 1.8x (byte-identical task/shuffle stats). One
    // sequential pass over every fixture file pins them hot, so every
    // recording starts from the same deterministic cache state; the pass
    // itself is reported (prewarm_sec) but never timed into a query.
    def prewarm(dir: String): Double = {
      val t0 = System.nanoTime()
      def readAll(f: java.io.File): Unit =
        // Option-guard: listFiles returns null on I/O error, and one
        // unreadable subdirectory must not NPE the whole bench run.
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(readAll)
        else {
          val buf = new Array[Byte](1 << 20) // per-file: readAll runs parallel
          val in = new java.io.FileInputStream(f)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      val root = new java.io.File(dir)
      if (root.exists()) {
        // parallel over top-level tables, sequential within a file
        val tables = Option(root.listFiles()).getOrElse(Array.empty)
        java.util.Arrays.stream(tables.asInstanceOf[Array[AnyRef]]).parallel()
          .forEach(f => readAll(f.asInstanceOf[java.io.File]))
      }
      (System.nanoTime() - t0) / 1e9
    }
    def qsJson(results: Seq[(String, QStat)]): String =
      results.map { case (k, v) => s"\"" + k + "\":" + v.sec }
        .mkString("{", ",", "}")
    def statsJson(results: Seq[(String, QStat)]): String =
      results.map { case (k, v) =>
        s"\"$k\":{\"sec\":${v.sec},\"tasks\":${v.tasks}," +
          s"\"shuffle_read_bytes\":${v.shufReadB}," +
          s"\"shuffle_write_bytes\":${v.shufWriteB}," +
          s"\"input_bytes\":${v.inputB}," +
          s"\"cpu_ms\":${v.cpuMs},\"run_ms\":${v.runMs}," +
          s"\"gc_ms\":${v.gcMs}," +
          s"\"canary_ms\":${v.canaryMs},\"canary_hi_ms\":${v.canaryHiMs}," +
          s"\"canary_n\":${v.canaryN},\"attempts\":${v.attempts}," +
          s"\"canary_clean\":${v.canaryClean}," +
          s"\"external_frac\":${v.extFrac}}"
      }.mkString("{", ",", "}")
    // Per-SECTION external-CPU accounting: a run can start idle and take
    // an external load spike mid-way (r12: 0.47 -> 16.2 loadavg), but
    // mid-run LOADAVG cannot certify anything — the bench's own 32
    // threads dominate it. The steal-proof signal is cumulative CPU:
    // /proc/stat's system busy jiffies (user+nice+system+irq+softirq+
    // steal — steal included, so hypervisor-level theft counts too)
    // minus THIS JVM's process CPU time. The difference is CPU burned by
    // someone else during the section; its fraction of machine capacity
    // is what `contended` keys on (plus the pre-run loadavg, which IS
    // meaningful because Spark has not started yet).
    final case class SectionCpu(wallSec: Double, loadStart: Double,
      loadEnd: Double, procCpuSec: Double, sysBusySec: Double) {
      def externalCpuSec: Double = math.max(0.0, sysBusySec - procCpuSec)
      def externalFrac(procs: Int): Double =
        if (wallSec <= 0) 0.0 else externalCpuSec / (wallSec * procs)
    }
    val sectionCpu = scala.collection.mutable.LinkedHashMap[String, SectionCpu]()
    def timedSection[A](name: String)(body: => A): A = {
      val l0 = load()
      val p0 = procCpuNs()
      val s0 = sysBusyJiffies()
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      sectionCpu(name) = SectionCpu(wall, l0, load(),
        if (p0 < 0) -1.0 else (procCpuNs() - p0) / 1e9,
        if (s0 < 0) -1.0 else (sysBusyJiffies() - s0) / 100.0)
      r
    }

    // pass 1 = cold (codegen + data), later passes = warm (data only);
    // both land in the artifact so no judge has to re-litigate noise
    val passes = (1 to math.max(repeat, 2)).map(i =>
      timedSection(s"p$i")(onePass(selected, sfDir, s"p$i")))
    val results = passes.head
    val warm = passes.last
    // per-section results retained for the compact driver line below
    val sectionResults =
      scala.collection.mutable.LinkedHashMap[String, Seq[(String, QStat)]]()
    sectionResults("sf0.1") = results
    val total = results.map(_._2.sec).sum
    val warmTotal = warm.map(_._2.sec).sum

    // second scale point: ~10 headline queries over the 10x-amplified
    // sf0.1 (~sf1); structural disjointness keeps the honest linear slope.
    // SPARK_GRAFT_SF1=0 skips it; only runs when benching sf0.1 itself.
    // A BENCH_ONLY subset restricts this section too (and skips it
    // entirely when none of its headline queries are selected) — a
    // narrowed profiling run must not pay the 10x dataset build.
    val sf1Selected = only match {
      case Some(names) => Sf1Queries.filter(names)
      case None => Sf1Queries
    }
    val sf1Dir = "target/bench_sf1"
    val sf1Ran = !(sys.env.getOrElse("SPARK_GRAFT_SF1", "1") == "0" ||
      !sfDir.contains("sf0.1") || sf1Selected.isEmpty)
    val sf1Json =
      if (!sf1Ran) ""
      else {
        val tGen0 = System.nanoTime()
        ensureSf1(spark, sfDir, sf1Dir)
        val genSec = (System.nanoTime() - tGen0) / 1e9
        val sel = SparkEntry.queries.filter(q => sf1Selected.contains(q._1))
        quiesce()
        val warmSec = prewarm(sf1Dir)
        val r = timedSection("sf1")(onePass(sel, sf1Dir, "sf1"))
        sectionResults("sf1") = r
        s""","sf1":{"dir":"$sf1Dir","gen_sec":$genSec,""" +
          s""""prewarm_sec":$warmSec,""" +
          s""""total":${r.map(_._2.sec).sum},"queries":${qsJson(r)},""" +
          s""""stats":${statsJson(r)}}"""
      }

    // third decade: graph-op slopes at 100x sf0.1 (needs the sf1 tables
    // as its amplification base, so only runs when the sf1 section did)
    val sf10Selected = only match {
      case Some(names) => Sf10Queries.filter(names)
      case None => Sf10Queries
    }
    val sf10Json =
      if (!sf1Ran || sf10Selected.isEmpty ||
          sys.env.getOrElse("SPARK_GRAFT_SF10", "1") == "0") ""
      else {
        val sf10Dir = "target/bench_sf10"
        val tGen0 = System.nanoTime()
        ensureSf10(spark, sf1Dir, sf10Dir)
        val genSec = (System.nanoTime() - tGen0) / 1e9
        val sel = SparkEntry.queries.filter(q => sf10Selected.contains(q._1))
        quiesce()
        val warmSec = prewarm(sf10Dir)
        val r = timedSection("sf10")(onePass(sel, sf10Dir, "sf10"))
        sectionResults("sf10") = r
        s""","sf10":{"dir":"$sf10Dir","gen_sec":$genSec,""" +
          s""""prewarm_sec":$warmSec,""" +
          s""""total":${r.map(_._2.sec).sum},"queries":${qsJson(r)},""" +
          s""""stats":${statsJson(r)}}"""
      }

    // fourth decade: OPT-IN (SPARK_GRAFT_SF100=1) — a one-off scale
    // probe, never part of the per-round driver run
    val sf100Selected = only match {
      case Some(names) => Sf100Queries.filter(names)
      case None => Sf100Queries
    }
    val sf100Json =
      if (sf10Json.isEmpty || sf100Selected.isEmpty ||
          sys.env.getOrElse("SPARK_GRAFT_SF100", "0") != "1") ""
      else {
        val sf100Dir = "target/bench_sf100"
        val tGen0 = System.nanoTime()
        ensureSf100(spark, "target/bench_sf10", sf100Dir)
        val genSec = (System.nanoTime() - tGen0) / 1e9
        val sel = SparkEntry.queries.filter(q => sf100Selected.contains(q._1))
        quiesce()
        val warmSec = prewarm(sf100Dir)
        val r = timedSection("sf100")(onePass(sel, sf100Dir, "sf100"))
        sectionResults("sf100") = r
        s""","sf100":{"dir":"$sf100Dir","gen_sec":$genSec,""" +
          s""""prewarm_sec":$warmSec,""" +
          s""""total":${r.map(_._2.sec).sum},"queries":${qsJson(r)},""" +
          s""""stats":${statsJson(r)}}"""
      }

    val loadEnd = ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val procs = Runtime.getRuntime.availableProcessors
    // contended = the box was busy BEFORE Spark started (loadavg is only
    // meaningful then), or someone else burned > 5% of machine capacity
    // during any section (the /proc/stat external-CPU delta — the
    // steal-proof certification the loadavg flag never was).
    val maxExternalFrac = (0.0 +: sectionCpu.values.toSeq
      .filter(s => s.sysBusySec >= 0 && s.procCpuSec >= 0)
      .map(_.externalFrac(procs))).max
    val contended = loadStart > 2.0 || maxExternalFrac > 0.05
    val sectionCpuJson = sectionCpu.map { case (k, s) =>
      s""""$k":{"wall_sec":${s.wallSec},"load_start":${s.loadStart},""" +
        s""""load_end":${s.loadEnd},"proc_cpu_sec":${s.procCpuSec},""" +
        s""""sys_busy_sec":${s.sysBusySec},""" +
        s""""external_cpu_sec":${s.externalCpuSec},""" +
        s""""external_frac":${s.externalFrac(procs)}}"""
    }.mkString("{", ",", "}")
    // run-wide canary percentiles: p10 = the box's uncontended speed for
    // the fixed spin (comparable across recordings on the same box);
    // p95/p10 spread = how much host-level noise the run absorbed. A
    // query's canary_ms far above canary_p10_ms marks a contended window
    // even when every guest-side counter (external CPU, steal, GC) is 0.
    val canP10 = canary.percentileMs(0.10)
    val canP50 = canary.percentileMs(0.50)
    val canP95 = canary.percentileMs(0.95)
    val env = s"""{"procs":$procs,""" +
      s""""spark_cpus":$cpus,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,""" +
      s""""max_external_frac":$maxExternalFrac,""" +
      s""""canary_p10_ms":$canP10,"canary_p50_ms":$canP50,""" +
      s""""canary_p95_ms":$canP95,"sections":$sectionCpuJson}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""cold":$total,"warm":$warmTotal,"contended":$contended,""" +
        s""""queries":${qsJson(results)},"warm_queries":${qsJson(warm)},""" +
        s""""stats":${statsJson(results)},"env":$env,"sf":"$sfDir"""" +
        sf1Json + sf10Json + sf100Json + "}"
    // SPARK_GRAFT_BENCH_OUT redirects the artifact — any ad-hoc
    // `runMain graft.Bench` otherwise overwrites the committed recording
    // in the working tree (a documented gotcha that has eaten recordings)
    Files.writeString(Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")),
      json + "\n")
    // Compact driver line: the per-round BENCH_r{N}.json keeps only a
    // ~2KB stdout TAIL, and the full recording (per-query stats) is tens
    // of KB — every round's driver artifact so far has been an
    // unparseable mid-line cut. The LAST stdout line is therefore a
    // <2KB self-contained summary (totals, per-section totals, noise
    // indicators, the slowest queries) that fits the tail whole; the
    // full recording precedes it on stdout and lives in BENCH_OUT.
    // Locale.ROOT: f"$d%.3f" uses the JVM default locale, which on a
    // comma-decimal locale (de_DE) would emit invalid JSON.
    def f3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    // BYTE-budgeted slowest-N (was a fixed top-12): the driver keeps only a
    // 2000-byte stdout TAIL and parses the last line, so the whole compact
    // line must fit that tail — but a fixed 12 made round-over-round
    // comparisons mistake ordinary top-12 churn for dropped queries. The
    // budget fits ~45 entries (every sf1/sf10 scale-section query plus the
    // slowest sf0.1 tier) while keeping the line comfortably under 2000
    // bytes. Entries stay slowest-first and stop at the first non-fit so
    // the set is a contiguous prefix of the ranking. Additions-only: the
    // key format and every previously-emitted entry's name are unchanged.
    val slowestBudgetBytes = 1280
    val rankedQ = sectionResults.iterator.flatMap { case (sec, rs) =>
      rs.map { case (n, st) => (s"$sec:$n", st.sec) }
    }.toSeq.sortBy(-_._2)
    val slowestItems = {
      val b = Seq.newBuilder[String]
      var used = 0
      var stop = false
      rankedQ.foreach { case (n, s) =>
        val item = s""""$n":${f3(s)}"""
        if (!stop && used + item.length + 1 <= slowestBudgetBytes) {
          b += item; used += item.length + 1
        } else stop = true
      }
      b.result()
    }
    val slowest = slowestItems.mkString("{", ",", "}")
    val slowestTruncated = slowestItems.size < rankedQ.size
    val secTotals = sectionResults.map { case (sec, rs) =>
      s""""$sec":${f3(rs.map(_._2.sec).sum)}"""
    }.mkString("{", ",", "}")
    val nClean = sectionResults.valuesIterator.flatten
      .count(_._2.canaryClean)
    val nQ = sectionResults.valuesIterator.map(_.size).sum
    val compact =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir",""" +
        s""""cold":${f3(total)},"warm":${f3(warmTotal)},""" +
        s""""contended":$contended,"sections":$secTotals,""" +
        s""""n_timed":$nQ,"n_canary_clean":$nClean,""" +
        s""""canary_p10_ms":${f3(canP10)},"canary_p50_ms":${f3(canP50)},""" +
        s""""max_external_frac":${f3(maxExternalFrac)},""" +
        s""""queries":$slowest,"queries_truncated":$slowestTruncated,""" +
        s""""artifact":"bench_out.json"}"""
    // Stop Spark BEFORE emitting the JSON so no shutdown log line can land
    // after it: with run/outputStrategy=StdoutOutput and showSuccess=false
    // (build.sbt) the bare JSON is the final line of `sbt runMain` output.
    spark.stop()
    println(json)
    println(compact)
    System.err.println(compact)
  }
}
