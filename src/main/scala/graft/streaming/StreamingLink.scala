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
 *
 * State-store sizing: the stateful ops here (band buckets, window
 * ownership, session state, live clusters) accumulate one entry per
 * distinct band value / window hash / session key — at production corpus
 * cardinalities that outgrows the default in-heap
 * HDFSBackedStateStoreProvider. Run them on RocksDB
 * (`spark.sql.streaming.stateStore.providerClass =
 * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`),
 * which spills state to local disk and bounds heap by block cache, not by
 * key count. Outputs are provider-independent (StreamingSpec runs the
 * band-bucket and span-ownership ops under both providers and asserts
 * identical results).
 */
/** One exploded (doc, band) observation on the stream. */
case class BandObs(docId: String, band: Int, bandVal: Long,
    eventTime: java.sql.Timestamp)
/** Per-(doc, band) dedup verdict emitted by the stateful op. */
case class BandVerdict(docId: String, band: Int, firstInBucket: Boolean)
/** Streaming state per band bucket. */
case class BucketState(seen: Boolean)
/** One event on the sessionization stream. */
case class WindowObs(docId: String, pos: Int, h: Long,
  eventTime: java.sql.Timestamp)
case class WindowVerdict(docId: String, pos: Int, foreign: Boolean,
  eventTime: java.sql.Timestamp = null)
/** Ownership state per window hash: the earliest observed
  * (eventTime, docId) plus the owner's positions, so a later batch can
  * demote an arrival-order owner and emit corrections.
  *
  * `stateVersion` exists purely to FAIL LOUDLY across kernel upgrades:
  * the window-hash state key changed values (not schema) when the
  * xxhash64 token chain was replaced by the FNV `token_window_hashes`
  * kernel, so a checkpoint written by the old build would otherwise
  * restore silently and never match any new key (missed duplicates,
  * stale state until timeout). Adding this field bumps the persisted
  * state SCHEMA, so Spark's state-schema compatibility check rejects
  * old-format checkpoints with a clear error instead. Bump
  * [[StreamingLink.SpanStateVersion]] on any future key-semantics
  * change for the same reason. */
case class WindowOwnerState(owner: String, ownerTime: Long = 0L,
  ownerPositions: Seq[Int] = Nil,
  stateVersion: Int = StreamingLink.SpanStateVersion)
/** Union row for [[StreamingLink.dedupSpansApplyStream]]: either a doc
  * (tokens) or one foreign-window verdict (pos). */
case class DedupApplyObs(docId: String, isDoc: Boolean, pos: Int,
  tokens: Seq[String], eventTime: java.sql.Timestamp)
/** Per-doc apply state: tokens + foreign starts seen so far. `hasDoc`
  * distinguishes "doc row not seen yet" from a seen doc whose text
  * tokenises to nothing (blank docs must still be emitted). */
case class DedupApplyState(tokens: Seq[String], foreignStarts: Seq[Int],
  emitted: Boolean, hasDoc: Boolean)
/** One deduped document; `corrected = true` re-emissions supersede the
  * earlier row for the same doc (late ownership corrections). */
case class DedupedDoc(docId: String, textDeduped: String, nRemoved: Int,
  corrected: Boolean)

case class SessEvent(entity: Long, eventTime: java.sql.Timestamp, value: Double)
/** Open-session state per entity (epoch millis bounds). */
case class SessState(startMs: Long, lastMs: Long, n: Long, sumMicros: Long)
/** A closed session emitted by the stateful op. */
case class SessionOut(entity: Long, startMs: Long, endMs: Long,
    nEvents: Long, sumValueMicros: Long)

object StreamingLink {

  /** Version of the span-dedup streaming state format. v2 = FNV
    * `token_window_hashes` keys (the batch-parity kernel); v1 (never
    * tagged) was the interpreted xxhash64 chain. v1→v2 changed every
    * state KEY, so v2 also added [[WindowOwnerState.stateVersion]] to
    * the state schema: restoring a v1 checkpoint fails Spark's
    * state-schema compatibility check with a clear error rather than
    * silently re-owning every window. Upgrading across this boundary
    * requires a fresh checkpoint directory (and re-feeding any
    * documents whose ownership must survive). */
  val SpanStateVersion: Int = 2

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

  /**
   * Stateful streaming NEAR-dup detection: SimHash 4x16-bit band buckets
   * with explicit per-bucket state via `flatMapGroupsWithState` (the
   * streaming form of [[graft.pipeline.DedupOps.simhashDedupPairs]]'s
   * band blocking). Emits one verdict per (doc, band): `firstInBucket`
   * is true iff no earlier document (by event time, then id, within this
   * batch or any previous one whose state is still live) hashed into the
   * same band bucket. A document is a near-dup CANDIDATE iff any of its
   * four bands collides — i.e. keep a doc when all 4 verdicts are first
   * (same pigeonhole guarantee as the batch operator: every pair within
   * hamming <= 3 shares a band; collision-only filtering is the
   * documented recall/precision dial, no pairwise verify in-stream).
   *
   * State is bounded: each bucket's entry carries an event-time timeout
   * at `watermark past its last hit` and is removed when it fires —
   * long-running-stream safe, same discipline as [[dedupStream]].
   */
  def simhashBandDedupStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermarkDelay: String = "1 hour",
      shingleQ: Int = 8): org.apache.spark.sql.Dataset[BandVerdict] = {
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = graft.pipeline.DedupOps.simhash(
      graft.pipeline.DedupOps.shingles(col(textCol), shingleQ))
    val banded = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).cast("string").as("docId"), sh.as("sh"),
        col(tsCol).as("eventTime"))
      .select(col("docId"), col("eventTime"),
        explode(graft.pipeline.DedupOps.bands64(col("sh"), "bandVal")).as("b"))
      .select(col("docId"), col("b.band"), col("b.bandVal"), col("eventTime"))
      .as[BandObs]
    bandBucketVerdicts(banded, watermarkDelay)
  }

  /**
   * Stateful streaming PERCEPTUAL IMAGE near-dup — the streaming twin of
   * [[graft.pipeline.DedupOps.imageNearDuplicates]]: payloads decode to
   * pixels in-stream (real PNG/BMP parsers, [[graft.pipeline.Codecs]]),
   * hash to a 64-bit aHash, and band-collide against live bucket state
   * exactly like [[simhashBandDedupStream]] (any pair within hamming < 4
   * shares one of the 4x16-bit bands, so brightness/contrast-shifted or
   * lightly edited copies collide). Undecodable payloads are dropped.
   * Bucket state carries the same event-time timeout discipline.
   */
  def imageBandDedupStream(media: DataFrame, idCol: String,
      payloadCol: String, tsCol: String, watermarkDelay: String = "1 hour")
      : org.apache.spark.sql.Dataset[BandVerdict] = {
    import org.apache.spark.sql.functions._
    val spark = media.sparkSession
    import spark.implicits._
    val banded = media
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).cast("string").as("docId"),
        graft.functions.funcs.ahash64(col(payloadCol)).as("sh"),
        col(tsCol).as("eventTime"))
      .filter(col("sh").isNotNull)
      .select(col("docId"), col("eventTime"),
        explode(graft.pipeline.DedupOps.bands64(col("sh"), "bandVal")).as("b"))
      .select(col("docId"), col("b.band"), col("b.bandVal"), col("eventTime"))
      .as[BandObs]
    bandBucketVerdicts(banded, watermarkDelay)
  }

  /**
   * Stateful streaming MinHash-LSH near-dup detection — the streaming twin
   * of [[graft.pipeline.DedupOps.minhashDedupPairs]], over the SAME
   * [[graft.pipeline.DedupOps.lshBands]] banding kernel (k minhash slots,
   * `k / rowsPerBand` bands; two documents share a band iff all
   * `rowsPerBand` slots agree). Emits one [[BandVerdict]] per (doc, band);
   * a document is a near-dup CANDIDATE iff any of its bands collides with
   * a live earlier document. Same recall dial as the batch operator
   * (P[band collision] = jaccard^rowsPerBand per band); collision-only —
   * in-stream state holds band hashes, never shingle sets, so there is no
   * exact-jaccard verify step (route candidates to the batch verifier
   * when precision matters).
   *
   * Documents whose normalised text is empty produce no shingles and are
   * dropped (mirrors the batch operator's `size(toks) > 0` filter — an
   * all-sentinel signature would otherwise collide every empty doc).
   *
   * State per bucket is one boolean with an event-time timeout at
   * `watermark past its last hit` — long-running-stream safe, identical
   * discipline to [[simhashBandDedupStream]].
   */
  def minhashBandDedupStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermarkDelay: String = "1 hour", shingleQ: Int = 8,
      k: Int = 32, rowsPerBand: Int = 4)
      : org.apache.spark.sql.Dataset[BandVerdict] = {
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = graft.pipeline.DedupOps.minhashSignature(col(textCol), shingleQ, k)
    val banded = docs
      .withWatermark(tsCol, watermarkDelay)
      .filter(trim(col(textCol)) =!= "") // no shingles -> no bands
      .select(col(idCol).cast("string").as("docId"), sig.as("sig"),
        col(tsCol).as("eventTime"))
      .select(col("docId"), col("eventTime"),
        explode(graft.pipeline.DedupOps.lshBands(col("sig"), k, rowsPerBand))
          .as("b"))
      .select(col("docId"), col("b.band"), col("b.band_hash").as("bandVal"),
        col("eventTime"))
      .as[BandObs]
    bandBucketVerdicts(banded, watermarkDelay)
  }

  /**
   * Stateful streaming duplicated-window detection — the streaming twin
   * of [[graft.pipeline.DedupOps.duplicatedSpans]] /
   * [[graft.pipeline.DedupOps.removeDuplicatedSpans]], over the SAME
   * [[graft.pipeline.DedupOps.windowHashesText]] kernel: each k-token window
   * hash is a state key owned by the document with the smallest
   * (eventTime, docId) observed so far — the streaming analogue of the
   * batch operator's min-id ownership. Ownership holds ACROSS batches: a
   * late record still inside the watermark whose event time is strictly
   * earlier than the current owner's TAKES the ownership, and the demoted
   * owner's previously-owned positions are re-emitted as corrections
   * (`foreign = true`), so verdicts converge to the event-time order
   * regardless of arrival order. Every occurrence in a non-owning
   * document emits `foreign = true` at its token position. Downstream
   * consumers aggregate foreign hits into per-doc dup ratios or a removal
   * mask (gaps-and-islands over `pos`, exactly as the batch operator
   * does); [[dedupSpansApplyStream]] is the packaged apply half.
   *
   * Contract: each document carries ONE event time. Idempotent
   * re-delivery (same doc, same event time) converges — verdicts
   * recompute identically. Re-delivering a doc with a MODIFIED event
   * time is out of contract: corrections are demotion-only (the demoted
   * owner's positions turn foreign), and a doc promoted to owner by its
   * own re-timestamped copy does not retract the foreign verdicts its
   * earlier copy produced. Precise retraction would need per-contender
   * position state on every window hash — unbounded for
   * boilerplate-grade duplication — so timestamp corrections belong
   * upstream of this operator.
   *
   * State per window hash is the owner (id, event time, owned positions)
   * with an event-time timeout a full watermark delay past its last hit —
   * long-running-stream safe, the same discipline as
   * [[simhashBandDedupStream]].
   *
   * '''Checkpoint compatibility''': state keys are FNV
   * `token_window_hashes` values ([[StreamingLink.SpanStateVersion]] = 2).
   * Checkpoints written by the earlier xxhash64-keyed build cannot be
   * restored — the state schema carries [[WindowOwnerState.stateVersion]]
   * precisely so such a restore fails loudly (state-schema mismatch)
   * instead of silently matching nothing. Use a fresh checkpoint
   * directory when upgrading across a kernel version bump.
   */
  def dupWindowStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, k: Int = 10, watermarkDelay: String = "1 hour")
      : org.apache.spark.sql.Dataset[WindowVerdict] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val spark = docs.sparkSession
    import spark.implicits._
    val obs = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).cast("string").as("docId"), col(tsCol).as("eventTime"),
        posexplode(graft.pipeline.DedupOps.windowHashesText(
          col(textCol), k)).as(Seq("pos", "h")))
      .select(col("docId"), col("pos"), col("h"), col("eventTime"))
      .as[WindowObs]
    obs
      .groupByKey(_.h)
      .flatMapGroupsWithState[WindowOwnerState, WindowVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[WindowOwnerState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toSeq.sortBy(o => (o.eventTime.getTime, o.docId, o.pos))
            val head = batch.head
            val prev = state.getOption
            // owner = smallest (eventTime, docId) across state and batch
            val keepPrev = prev.exists(s =>
              s.ownerTime < head.eventTime.getTime ||
                (s.ownerTime == head.eventTime.getTime && s.owner <= head.docId))
            val (owner, ownerTime) =
              if (keepPrev) (prev.get.owner, prev.get.ownerTime)
              else (head.docId, head.eventTime.getTime)
            // the demoted owner's previously-owned positions turn foreign
            val corrections = prev match {
              case Some(s) if s.owner != owner =>
                s.ownerPositions.map(p => WindowVerdict(s.owner, p,
                  foreign = true, head.eventTime))
              case _ => Nil
            }
            val verdicts = batch.map(o =>
              WindowVerdict(o.docId, o.pos, foreign = o.docId != owner,
                o.eventTime))
            val carried =
              prev.collect { case s if s.owner == owner => s.ownerPositions }
                .getOrElse(Nil)
            state.update(WindowOwnerState(owner, ownerTime,
              (carried ++ batch.filter(_.docId == owner).map(_.pos)).distinct))
            state.setTimeoutTimestamp(
              batch.map(_.eventTime.getTime).max, watermarkDelay)
            (corrections ++ verdicts).iterator
          }
      }
  }

  /**
   * The APPLY half of streaming span dedup — the cross-batch twin of
   * [[graft.pipeline.DedupOps.removeDuplicatedSpans]]: every document is
   * emitted with the tokens of its foreign duplicated windows dropped
   * (single-space re-joined, whitespace-normalised, `n_removed` counting
   * dropped tokens, exactly the batch operator's output shape). Built as
   * two chained stateful stages: [[dupWindowStream]] produces per-window
   * ownership verdicts (hash-keyed state), then a per-document stage
   * unions those verdicts with the document rows and masks covered
   * tokens. A document and its own verdicts land in the same micro-batch,
   * so the normal path emits each doc once, immediately; a LATE ownership
   * correction (an earlier-event-time claimant arriving in a later batch)
   * re-emits the affected doc with `corrected = true` — consumers keep
   * the last row per doc. Per-doc token state is held until the
   * event-time timeout (one watermark delay past the doc's last
   * activity), which is what buys the cross-batch correction.
   *
   * Spark's static chained-stateful check must be opted out
   * (`spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`,
   * enforced with a clear error here): the check guards against a stateful
   * stage emitting rows OLDER than the watermark into a downstream
   * stateful stage, but every row this pipeline emits — verdicts and
   * corrections alike — carries the event time of the micro-batch that
   * triggered it, so nothing arrives late at the per-doc stage.
   */
  def dedupSpansApplyStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, k: Int = 10, watermarkDelay: String = "1 hour")
      : org.apache.spark.sql.Dataset[DedupedDoc] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val spark = docs.sparkSession
    import spark.implicits._
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    require(spark.conf.get(checkKey, "true") == "false",
      s"dedupSpansApplyStream chains two stateful operators (window-hash " +
        s"ownership, then per-doc assembly); Spark's static checker rejects " +
        s"that shape even though every emitted row carries the triggering " +
        s"batch's event time. Set $checkKey=false to run it.")
    val verdictObs = dupWindowStream(docs, idCol, textCol, tsCol, k,
        watermarkDelay)
      .filter(_.foreign)
      .map(v => DedupApplyObs(v.docId, isDoc = false, v.pos, Nil, v.eventTime))
    // stays COLUMNAR so the watermark tag on the event-time column
    // survives into the union (an object map would strip it, and a fresh
    // withWatermark after the stateful stage is a disallowed redefinition)
    val docObs = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).cast("string").as("docId"),
        lit(true).as("isDoc"), lit(-1).as("pos"),
        graft.pipeline.TextOps.tokens(col(textCol)).as("tokens"),
        col(tsCol).as("eventTime"))
      .as[DedupApplyObs]
    docObs.union(verdictObs)
      .groupByKey(_.docId)
      .flatMapGroupsWithState[DedupApplyState, DedupedDoc](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (docId, rows, state: GroupState[DedupApplyState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toSeq
            val prev = state.getOption
              .getOrElse(DedupApplyState(Nil, Nil, emitted = false,
                hasDoc = false))
            val docRow = batch.find(_.isDoc)
            val hasDoc = prev.hasDoc || docRow.isDefined
            val tokens = docRow.map(_.tokens).getOrElse(prev.tokens)
            val starts = (prev.foreignStarts ++
              batch.filterNot(_.isDoc).map(_.pos)).distinct
            state.setTimeoutTimestamp(
              batch.map(_.eventTime.getTime).max, watermarkDelay)
            if (!hasDoc) {
              // verdict before doc (possible only if the doc row itself is
              // missing from the stream) — hold the starts, emit nothing
              state.update(DedupApplyState(tokens, starts, prev.emitted,
                hasDoc = false))
              Iterator.empty
            } else {
              state.update(DedupApplyState(tokens, starts, emitted = true,
                hasDoc = true))
              val kept = tokens.zipWithIndex.collect {
                case (t, i) if !starts.exists(s => i >= s && i <= s + k - 1) => t
              }
              Iterator.single(DedupedDoc(docId, kept.mkString(" "),
                tokens.size - kept.size, corrected = prev.emitted))
            }
          }
      }
  }

  /** Shared stateful band-bucket op: `firstInBucket` is true iff no
    * earlier document (by event time, then id, within this batch or any
    * previous one whose state is still live) hashed into the same
    * (band, bandVal) bucket. Bucket state evicts one full watermark delay
    * after its last hit. */
  private def bandBucketVerdicts(
      banded: org.apache.spark.sql.Dataset[BandObs],
      watermarkDelay: String): org.apache.spark.sql.Dataset[BandVerdict] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(o => (o.band, o.bandVal))
      .flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toSeq.sortBy(o => (o.eventTime.getTime, o.docId))
            val occupied = state.exists
            val verdicts = batch.zipWithIndex.map { case (o, i) =>
              BandVerdict(o.docId, o.band, firstInBucket = !occupied && i == 0)
            }
            state.update(BucketState(seen = true))
            // evict one full watermark delay after this bucket's last hit
            state.setTimeoutTimestamp(
              batch.map(_.eventTime.getTime).max, watermarkDelay)
            verdicts.iterator
          }
      }
  }

  /**
   * Stateful streaming sessionization — the streaming twin of
   * [[graft.pipeline.TimeOps.sessionize]]: per entity, an open session
   * lives in state and closes when the event-time watermark passes
   * `last event + gap` (or earlier, when a later in-stream event opens the
   * next session). Emits one [[SessionOut]] row per CLOSED session; state
   * per entity is one fixed-size record with an event-time timeout —
   * long-running-stream safe.
   *
   * Events are processed in event-time order within each micro-batch;
   * cross-batch late events within the watermark extend the open session
   * only at its tail (a late event older than the open session's start is
   * counted into that session rather than re-opening history — the
   * standard state-store trade-off, documented rather than hidden).
   */
  def sessionizeStream(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, gapMs: Long,
      watermarkDelay: String = "1 hour")
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(entityCol).cast("long").as("entity"),
        col(tsCol).as("eventTime"), col(valueCol).cast("double").as("value"))
      .as[SessEvent]
      .groupByKey(_.entity)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (entity, rows, state: GroupState[SessState]) =>
          def close(s: SessState) =
            SessionOut(entity, s.startMs, s.lastMs, s.n, s.sumMicros)
          if (state.hasTimedOut) {
            val closed = state.getOption.map(close)
            state.remove()
            closed.iterator
          } else {
            val batch = rows.toSeq.sortBy(_.eventTime.getTime)
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            batch.foreach { e =>
              val t = e.eventTime.getTime
              val micros = math.floor(e.value * 1000000).toLong
              cur match {
                case Some(s) if t - s.lastMs > gapMs =>
                  out += close(s)
                  cur = Some(SessState(t, t, 1, micros))
                case Some(s) =>
                  cur = Some(SessState(s.startMs, math.max(s.lastMs, t),
                    s.n + 1, s.sumMicros + micros))
                case None =>
                  cur = Some(SessState(t, t, 1, micros))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes the session's gap horizon
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            out.iterator
          }
      }
  }

  /** Streaming decontamination: each micro-batch of documents is scored
    * for word-n-gram overlap against a static probe (benchmark) set —
    * `foreachBatch` + [[graft.pipeline.CorpusOps.contaminationReport]].
    * The probe gram set broadcasts once per batch; the batch itself never
    * reshuffles, so ingestion-time contamination checks stay O(batch). */
  def contaminationStream(docs: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeTextCol: String, n: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sink(graft.pipeline.CorpusOps.contaminationReport(
            batch, idCol, textCol, probes, probeTextCol, n), batchId)
        }
      }

  /** Convenience: run the stream into an in-memory accumulator (testing /
    * small sinks); returns the started query. */
  def startCollecting(linker: Linker, newRecords: DataFrame,
      threshold: Option[Double],
      out: scala.collection.mutable.Buffer[Row]): StreamingQuery =
    findMatchesStream(linker, newRecords, threshold) { (scored, _) =>
      out ++= scored.collect()
    }.trigger(Trigger.AvailableNow()).start()

  /**
   * Streaming entity resolution: maintain a LIVE clustering across
   * micro-batches. Each batch of new records is blocked + scored against
   * the linker's corpus (find-matches), edges at or above `threshold`
   * fold into the maintained clustering via
   * [[graft.clustering.ClusteringOps.incrementalCluster]] — per batch the
   * connected-components work is bounded by that batch's edge count, not
   * the corpus. The maintained frame is persisted and swapped atomically
   * per batch (old copy released). Batch records that match nothing stay
   * out of the frame — absence means singleton, as in the batch API.
   *
   * Returns a handle whose `clusters()` reads the current
   * (node_id, cluster_id) state; call after `processAllAvailable()` (or
   * any time — you get the latest completed batch's view).
   */
  final class LiveClustering private[streaming] (
      @volatile private[streaming] var state: DataFrame) {
    def clusters(): DataFrame = state
  }

  def incrementalClusterStream(linker: Linker, newRecords: DataFrame,
      threshold: Double,
      initial: Option[DataFrame] = None): (DataStreamWriter[Row], LiveClustering) = {
    val spark = linker.spark
    import org.apache.spark.sql.types._
    val uid = linker.settings.uniqueIdColumn
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](),
      StructType(Seq(StructField("node_id", LongType),
        StructField("cluster_id", LongType))))
    val live = new LiveClustering(initial.getOrElse(empty).persist())
    val writer = newRecords.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val edges = linker.findMatchesToNewRecords(batch, Some(threshold))
            .select(org.apache.spark.sql.functions.col(s"${uid}_l"),
              org.apache.spark.sql.functions.col(s"${uid}_r"))
          val next = graft.clustering.ClusteringOps
            .incrementalCluster(live.state, edges, s"${uid}_l", s"${uid}_r")
            .persist()
          next.count() // materialise BEFORE releasing the predecessor
          val old = live.state
          live.state = next
          old.unpersist()
          ()
        }
      }
    (writer, live)
  }
}
