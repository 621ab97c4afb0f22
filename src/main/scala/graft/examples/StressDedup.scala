package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.DedupOps

/** Scale exercise for the corpus dedup family: a synthetic corpus far
  * above the driver-testdata size (default 200k documents, ~60 tokens
  * each) with planted structure — every 10th document is an exact copy
  * of its predecessor, every 7th shares a 20-token run with a template —
  * run through exact dedup, minhash-LSH candidate pairs, and
  * cross-document duplicated-span detection. Each stage checks its
  * planted-duplicate recall against the construction and reports wall
  * time; the point is that the shapes (hash groupBy, banded bucket join,
  * scalar-only window shuffle) hold when the document count is 40x the
  * bench corpus, not that local[8] is fast.
  *
  * Usage: `runMain graft.examples.StressDedup [nDocsThousands]`
  * (default 200).
  */
object StressDedup {
  def main(args: Array[String]): Unit = {
    val thousands = if (args.nonEmpty) args(0).toInt else 200
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = thousands * 1000L
    // deterministic word soup: 60 tokens drawn from a 1k vocabulary by a
    // per-(doc, slot) hash; every 10th doc copies its predecessor
    // verbatim; every 7th doc splices in a fixed 20-token template run
    val vocabExpr = (slot: org.apache.spark.sql.Column) =>
      concat(lit("w"), pmod(xxhash64(col("base_id"), slot), lit(1000L)))
    val template = (0 until 20).map(i => s"T$i").mkString(" ")
    val body = (0 until 60).map(s => vocabExpr(lit(s)))
    val docs = spark.range(n)
      .select(col("id"),
        when(pmod(col("id"), lit(10L)) === 9, col("id") - 1L)
          .otherwise(col("id")).as("base_id"))
      .select(col("id").as("doc_id"),
        // template keyed on base_id so an exact copy stays exact
        when(pmod(col("base_id"), lit(7L)) === 3,
          concat_ws(" ", concat_ws(" ", body: _*), lit(template)))
          .otherwise(concat_ws(" ", body: _*)).as("text"))
      .persist()
    val total = docs.count()
    println(s"corpus: $total docs")

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // exact dedup: every copy pair collapses onto its predecessor
    val exact = timed("exactDedup") {
      DedupOps.exactDedup(docs, "doc_id", "text")
        .filter(col("n_copies") > 1).count()
    }
    val expectedExact = n / 10L
    println(s"exact duplicate groups: $exact (planted >= $expectedExact)")
    require(exact >= expectedExact,
      s"exact dedup missed planted copies: $exact < $expectedExact")

    // minhash candidates: exact copies must collide in every band
    val mh = timed("minhashDedupPairs") {
      DedupOps.minhashDedupPairs(docs.filter(col("doc_id") < 20000L),
          "doc_id", "text", threshold = 0.8)
        .filter(col("id_r") === col("id_l") + 1L &&
          pmod(col("id_r"), lit(10L)) === 9)
        .count()
    }
    println(s"minhash copy pairs (first 20k docs): $mh of ${20000L / 10L}")
    require(mh == 20000L / 10L, s"minhash missed exact copies: $mh")

    // duplicated spans: the 20-token template run is shared by every 7th
    // doc -> each such doc reports a span covering it
    val spans = timed("duplicatedSpans") {
      DedupOps.duplicatedSpans(docs.filter(col("doc_id") < 20000L),
          "doc_id", "text", k = 10)
        .filter(col("span_end") - col("span_start") >= 19).count()
    }
    val templateDocs = docs.filter(col("doc_id") < 20000L &&
      col("text").contains(template)).count()
    println(s"template spans: $spans (planted $templateDocs docs)")
    require(spans >= templateDocs,
      s"span detection missed template runs: $spans < $templateDocs")

    println("STRESS-DEDUP OK")
    spark.stop()
  }
}
