package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column operators: image/audio/video payloads are opaque
 * `binary` columns with typed metadata. The Spark-side plumbing — schema,
 * partition-wise batch iteration, frame slicing, feature schema — is real
 * and tested. Decode dispatches on magic bytes to REAL pure-JVM parsers for
 * public container formats (PNG / BMP / WAV, [[Codecs]]); payloads in no
 * known format fall back to a deterministic FNV stub so synthetic corpora
 * stay oracle-replayable. Richer codecs (JPEG entropy decode, FFmpeg via
 * JNI) slot into [[Codecs.parse]] without touching the surrounding plan:
 * the operator shape (mapPartitions over an iterator of rows, one output
 * row per media item) is exactly what a Pandas-UDF / `mapInPandas` decode
 * does in the reference-adjacent pipelines.
 */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("declared_bytes", LongType, nullable = true))), nullable = true)))

  /** Wrap any (id, string) frame as an opaque-binary media table — the
    * stand-in for reading real image bytes. */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String,
      kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(textCol).cast("binary").as("payload"),
      struct(lit("synthetic").as("source"),
        length(col(textCol)).cast("long").as("declared_bytes")).as("meta"))

  /** Pure-Column metadata extraction (no decode): byte length, content
    * digest, magic-byte prefix. Fully codegen'd; what you'd run to triage
    * 100TB of blobs before any expensive decode. */
  def payloadMetadata(payload: Column): Seq[(String, Column)] = Seq(
    "n_bytes" -> length(payload).cast("long"),
    "digest" -> md5(payload),
    "prefix_hex" -> hex(substring(payload, 1, 8)))

  /** Evenly-spaced byte-range "frames" (video frame-sampling shape):
    * n slices of `frameBytes` bytes each. */
  def frameSample(payload: Column, n: Int, frameBytes: Int): Column = {
    val total = length(payload)
    array((0 until n).map { i =>
      // start_i = 1 + i * max(total - frameBytes, 0) / max(n-1, 1)
      val start = lit(1) + (lit(i) * greatest(total - frameBytes, lit(0))
        / lit(math.max(n - 1, 1))).cast("int")
      payload.substr(start, lit(frameBytes))
    }: _*)
  }

  /** Decoded-feature schema produced by [[decode]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_channels", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** Deterministic synthetic "decode" for payloads in NO known container
    * format: derives dimensions + a feature vector from an FNV-1a walk of
    * the bytes. Portable by construction — the DuckDB oracle replays it
    * bit-for-bit over the synthetic text corpus. */
  def decodeStub(mediaId: Long, payload: Array[Byte]): Row = {
    if (payload == null) return Row(mediaId, null, null, null, null, null)
    var h = 0xcbf29ce484222325L
    payload.foreach { b => h ^= (b & 0xFF); h *= 0x100000001b3L }
    val width = 64 + (math.abs(h) % 1024).toInt
    val height = 64 + (math.abs(h >>> 17) % 1024).toInt
    val feature = Array.tabulate(8) { i =>
      (((h >>> (8 * (i % 8))) & 0xFF).toInt / 255.0f) }
    Row(mediaId, "synthetic", width, height, 3, feature.toSeq)
  }

  /** Decode one payload: real container parsers (PNG/BMP/WAV headers +
    * content stats, [[Codecs.parse]]) with the deterministic stub as the
    * unknown-format fallback. */
  def decodeOne(mediaId: Long, payload: Array[Byte]): Row =
    Codecs.parse(payload) match {
      case Some(d) =>
        Row(mediaId, d.format, d.width, d.height, d.nChannels, d.feature.toSeq)
      case None => decodeStub(mediaId, payload)
    }

  /** Partition-wise decode: one pass over each partition's rows, one
    * output row per media item (the mapInPandas batch shape). */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        decodeOne(r.getLong(0),
          if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Schema produced by [[imageHashes]]. */
  val imageHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("ahash", LongType, nullable = true),
    StructField("dhash", LongType, nullable = true)))

  /** Perceptual 64-bit image hashes (aHash + dHash, [[Codecs.aHash64]] /
    * [[Codecs.dHash64]]) from the real pixel decode: one partition-wise
    * pass, one output row per media item; payloads with no decodable
    * pixels keep NULL hashes. The signatures feed the same band-join
    * near-dup machinery as SimHash
    * ([[DedupOps.imageNearDuplicates]]). */
  def imageHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        Codecs.gray(payload) match {
          case Some(g) =>
            val fmt = if (Codecs.isPng(payload)) "png" else "bmp"
            Row(id, fmt, Codecs.aHash64(g), Codecs.dHash64(g))
          case None => Row(id, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, imageHashSchema)
  }
}
