package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway calibration probe: at what (columns, grouping sets) does the
  * Expand stage stop compiling under janino's 64KB method limit? */
object ExpandCodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .config("spark.sql.adaptive.enabled", false)
      .appName("expand-codegen-probe").getOrCreate()
    import org.apache.spark.sql.execution.debug._
    for (m <- Seq(4, 8, 12, 16, 20, 24); maxSets <- Seq(32, 64, 96, 136, 300, 1000)) {
      val allSets = (1 to 2).flatMap(a => (0 until m).combinations(a)).take(maxSets)
      if (allSets.size == maxSets || (maxSets > allSets.size && maxSets == 1000)) {
        val df = spark.range(10).select(
          (0 until m).map(i => concat(lit("v"), (col("id") % 3).cast("string")).as(s"__k$i")): _*)
        val keyCols = (0 until m).map(i => col(s"__k$i"))
        val grouped = df
          .groupingSets(allSets.map(_.map(i => keyCols(i))), keyCols: _*)
          .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        val plan = grouped.queryExecution.executedPlan
        val res = codegenStringSeq(plan)
        val worst = res.map(_._3.maxMethodCodeSize)
        val hasExpandWSC = plan.toString.linesIterator
          .exists(l => l.contains("Expand") && l.trim.startsWith("+- *"))
        println(s"PROBE m=$m sets=${allSets.size} subtrees=${res.size} " +
          s"expandInWSC=$hasExpandWSC maxMethod=${worst.mkString(",")}")
      }
    }
    spark.stop()
  }
}
