package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.training.Training

/** Scale exercise for the distributed EM M-step: a synthetic
  * agreement-pattern frame with millions of DISTINCT patterns (the shape a
  * 100TB TF vocabulary produces — far beyond what a driver collect should
  * hold as a matter of course) runs both [[Training.emCoreDistributed]]
  * and, for the equivalence check, the driver [[Training.emCore]] on the
  * same data. Asserts parameter identity to 1e-9 across all iterations
  * and reports wall time per path.
  *
  * Usage: `runMain graft.examples.StressEM [nPatternsMillions]` (default 5).
  */
object StressEM {
  def main(args: Array[String]): Unit = {
    val millions = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = millions * 1000000L
    // three comparisons with gammas in {-1,0,1,2}; one TF term column with
    // a bounded value set (log2 of a synthetic term frequency), NaN where
    // the pattern is not at the TF level — exactly the frame
    // expectationMaximisation builds
    val patternDf = spark.range(n).select(
        (pmod(hash(col("id")), lit(4)) - 1).cast("int").as("g0"),
        (pmod(hash(col("id"), lit(1)), lit(3))).cast("int").as("g1"),
        (pmod(hash(col("id"), lit(2)), lit(3))).cast("int").as("g2"),
        when(pmod(hash(col("id")), lit(4)) - 1 === 2,
            -(pmod(hash(col("id"), lit(3)), lit(1000)) + 1).cast("double") / 50.0)
          .otherwise(lit(Double.NaN)).as("__tft0"),
        (pmod(hash(col("id"), lit(4)), lit(100)) + 1).cast("long").as("n"))
      .persist()
    val distinctPatterns = patternDf.count()

    val mInit = Array(
      Map(0 -> 0.2, 1 -> 0.3, 2 -> 0.5),
      Map(0 -> 0.3, 1 -> 0.7),
      Map(0 -> 0.4, 1 -> 0.6))
    val uInit = Array(
      Map(0 -> 0.6, 1 -> 0.3, 2 -> 0.1),
      Map(0 -> 0.8, 1 -> 0.2),
      Map(0 -> 0.7, 1 -> 0.3))
    val tfSpecs = Seq(Training.TfSpec(0, Map(2 -> 0.7)))
    val iters = 5

    val t0 = System.nanoTime()
    val dist = Training.emCoreDistributed(patternDf, Seq("g0", "g1", "g2"),
      Seq("__tft0"), mInit, uInit, 0.1, fixU = false,
      maxIterations = iters, tolerance = 0.0, tfSpecs = tfSpecs)
    val distSecs = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val patterns = patternDf.collect().map { r =>
      Training.Pattern(Array(r.getInt(0), r.getInt(1), r.getInt(2)),
        r.getLong(4), Array(r.getDouble(3)))
    }
    val driver = Training.emCore(patterns.toIndexedSeq, mInit, uInit, 0.1,
      fixU = false, maxIterations = iters, tolerance = 0.0, tfSpecs = tfSpecs)
    val driverSecs = (System.nanoTime() - t1) / 1e9

    val lamDelta = driver.lambdaHistory.zip(dist.lambdaHistory)
      .map { case (a, b) => math.abs(a - b) }.max
    val mDelta = driver.mHistory.zip(dist.mHistory).map { case (ma, mb) =>
      ma.zip(mb).map { case (ta, tb) =>
        ta.map { case (g, v) => math.abs(v - tb(g)) }.max }.max }.max
    val ok = lamDelta < 1e-9 && mDelta < 1e-9
    println(f"patterns=$distinctPatterns%,d iters=$iters " +
      f"distributed=$distSecs%.1fs driver=$driverSecs%.1fs " +
      f"maxDelta(λ)=$lamDelta%.2e maxDelta(m)=$mDelta%.2e " +
      (if (ok) "OK" else "MISMATCH"))
    if (!ok) sys.exit(1)
    spark.stop()
  }
}
