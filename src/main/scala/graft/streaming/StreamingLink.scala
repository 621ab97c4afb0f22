package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.Linker

/**
 * Streaming linkage (beyond the reference: it is batch-only —
 * `SURVEY.md §2.13`; its "realtime" API scores a handful of records against
 * a trained model). The natural Spark extension: a stream of new records is
 * scored against the static trained corpus per micro-batch with
 * `foreachBatch` + [[Linker.findMatchesToNewRecords]] — the static side's
 * TF tables and model constants are reused across batches.
 */
object StreamingLink {

  /**
   * Attach micro-batch find-matches scoring to a stream of new records.
   * Each batch is blocked + scored against the linker's corpus; `sink`
   * receives (scoredBatch, batchId).
   */
  def findMatchesStream(linker: Linker, newRecords: DataFrame,
      thresholdMatchProbability: Option[Double] = None)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    newRecords.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sink(linker.findMatchesToNewRecords(batch, thresholdMatchProbability),
            batchId)
        }
      }
  }

  /**
   * Stateful streaming exact-dedup: drop documents whose normalised
   * fingerprint was already seen, with event-time state bounded by a
   * watermark (Spark's native streaming `dropDuplicates` state store —
   * the streaming form of `DedupOps.exactDedup`).
   */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs.withColumn("fingerprint",
        graft.pipeline.TextOps.fingerprint(org.apache.spark.sql.functions.col(textCol)))
      .withWatermark(tsCol, watermark)
      // dropDuplicatesWithinWatermark, NOT dropDuplicates("fingerprint"):
      // without the event-time column in the key set, Spark never evicts
      // dedup state on watermark advance — unbounded state in a
      // long-running stream.
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Convenience: run the stream into an in-memory accumulator (testing /
    * small sinks); returns the started query. */
  def startCollecting(linker: Linker, newRecords: DataFrame,
      threshold: Option[Double],
      out: scala.collection.mutable.Buffer[Row]): StreamingQuery =
    findMatchesStream(linker, newRecords, threshold) { (scored, _) =>
      out ++= scored.collect()
    }.trigger(Trigger.AvailableNow()).start()
}
