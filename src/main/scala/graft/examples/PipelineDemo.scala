package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusOps, DedupOps, TextOps}

/** End-to-end training-data pipeline over the driver's documents table:
  * quality gate -> exact dedup -> minhash near-dup removal -> cross-doc
  * duplicated-span stripping -> token budgeting -> split assignment ->
  * sequence packing. Demonstrates that the corpus operators COMPOSE —
  * each stage consumes the previous stage's frame — and prints per-stage
  * row/token counts as the funnel narrows.
  *
  * Usage: `runMain graft.examples.PipelineDemo [sfDir]`
  * (default /root/testdata/sf0.01).
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def funnel(label: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(f"$label%-28s rows=${df.count()}%6d")
    funnel("raw corpus", docs)

    // 1. rule-based quality gate (thresholds tuned to the short synthetic docs)
    val kept = TextOps.gopherRules(docs, "doc_id", "text",
        minTokens = 20, minStopHits = 1)
      .filter(col("keep") === 1).select("doc_id")
      .join(docs, "doc_id")
    funnel("after quality gate", kept)

    // 2. exact dedup: keep the min-id representative of each fingerprint
    val exactKeep = DedupOps.exactDedup(kept, "doc_id", "text")
      .select(col("keep_id").as("doc_id")).join(kept, "doc_id")
    funnel("after exact dedup", exactKeep)

    // 3. minhash near-dup: drop the higher id of every candidate pair
    val dupIds = DedupOps.minhashDedupPairs(exactKeep, "doc_id", "text",
        threshold = 0.9)
      .select(col("id_r").as("doc_id")).distinct()
    val nearKeep = exactKeep.join(dupIds, Seq("doc_id"), "left_anti")
    funnel("after near-dup removal", nearKeep)

    // 4. strip cross-document duplicated spans (one copy survives)
    val stripped = DedupOps.removeDuplicatedSpans(nearKeep, "doc_id", "text")
      .withColumnRenamed("text_deduped", "text")
    val removedTokens = stripped.agg(sum("n_removed")).collect()(0).getLong(0)
    funnel("after span stripping", stripped)
    println(f"  duplicated tokens removed: $removedTokens")

    // 5. token budget report
    val budget = TextOps.tokenCounts(stripped, "doc_id", "text")
      .agg(sum("ws_tokens").as("ws"), sum("bpe_tokens").as("bpe")).collect()(0)
    println(s"  corpus budget: ${budget.getLong(0)} ws tokens, " +
      s"${budget.getLong(1)} bpe-ish tokens")

    // 6. leakage-safe splits on the surviving ids
    val splits = CorpusOps.assignSplits(stripped, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    splits.groupBy("split").count().orderBy("split").collect()
      .foreach(r => println(f"  split ${r.getString(0)}%-6s ${r.getLong(1)}%6d"))

    // 7. pack the train split into ~256-token sequences
    val packed = CorpusOps.packSequences(
      splits.filter(col("split") === "train"), "doc_id", "text", 256, 8)
    funnel("pack assignments (1/doc)", packed)
    val nSeqs = packed.select("bucket", "seq_id").distinct().count()
    println(s"  packed into $nSeqs ~256-token sequences")

    println("PIPELINE OK")
    spark.stop()
  }
}
